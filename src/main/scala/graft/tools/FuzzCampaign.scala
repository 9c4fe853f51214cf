package graft.tools

import graft.sources.pbf._

/** Long-run corruption campaign over the whole decode surface — the
  * in-suite fuzz legs (DecodeFuzzSpec, ~3.4k cases, seeded) scaled two
  * orders of magnitude for an artifact the suite can't afford per-run.
  * Totality contract unchanged: every corrupted input must decode
  * (garbage values are indistinguishable from data) or fail with the
  * typed PbfFormatException (framing additionally admits EOFException at
  * the IO layer); anything else is an ESCAPE and the campaign exits 1
  * with the reproducer (seed, trial, surface) printed.
  *
  * Surfaces: block payload decode + zone-map walk, HeaderBlock decode,
  * framed blob decode (zlib + zstd), file framing enumerate.
  *
  * Usage: scripts/run.sh graft.tools.FuzzCampaign [outJson] [trialsPerSurface]
  */
object FuzzCampaign {

  private def validPayload(): Array[Byte] = {
    import PbfWriter._
    primitiveBlock(
      (0 until 200).map(i => DenseNode(1000L + i, 52000000000L + i * 1000,
        11000000000L + i * 700, if (i % 7 == 0) Seq("k" -> s"v$i") else Nil,
        1, 1049522828000L + i, 10L, 17, "u")),
      ways = Seq(WayData(900001L, (1000L to 1015L), Seq("highway" -> "x"))),
      relations = Seq(RelationData(800001L,
        Seq((1000L, 0, "outer"), (900001L, 1, "")), Seq("type" -> "mp"))))
  }

  private def validHeader(): Array[Byte] = {
    val bbox = new PbfWriter.MessageBuilder
    bbox.writeZigzagField(1, -180000000000L)
    bbox.writeZigzagField(2, 180000000000L)
    bbox.writeZigzagField(3, 90000000000L)
    bbox.writeZigzagField(4, -90000000000L)
    val h = new PbfWriter.MessageBuilder
    h.writeMessageField(1, bbox)
    h.writeStringField(4, "OsmSchema-V0.6")
    h.writeStringField(4, "DenseNodes")
    h.writeStringField(16, "graft-pbf-writer")
    h.writeVarintField(32, 1700000000L)
    h.writeVarintField(33, 424242L)
    h.result()
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new Array[Byte](data.length * 2 + 64)
    val n = d.deflate(out); d.end()
    java.util.Arrays.copyOf(out, n)
  }

  def main(args: Array[String]): Unit = {
    val outJson = args.headOption.getOrElse("FUZZ_r16.json")
    val trials = if (args.length > 1) args(1).toInt else 100000
    val seed = 20260815L
    val rnd = new scala.util.Random(seed)

    val payload = validPayload()
    val header = validHeader()
    val zlibBlob = {
      val b = new PbfWriter.MessageBuilder
      b.writeVarintField(2, payload.length.toLong)
      b.writeBytesField(3, deflate(payload))
      b.result()
    }
    val zstdBlob = {
      val b = new PbfWriter.MessageBuilder
      b.writeVarintField(2, payload.length.toLong)
      b.writeBytesField(7, com.github.luben.zstd.Zstd.compress(payload))
      b.result()
    }
    val framedFile = {
      val dir = java.nio.file.Files.createTempDirectory("graft-fuzzcamp")
      val p = dir.resolve("f.osm.pbf").toString
      PbfWriter.writeFile(p, Seq(payload, payload))
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
      bytes
    }

    var escapes = 0
    def mutate(base: Array[Byte]): (Array[Byte], String) = rnd.nextInt(10) match {
      case 0 => // truncation
        (java.util.Arrays.copyOf(base, rnd.nextInt(base.length)), "truncate")
      case 1 => // random suffix
        val junk = new Array[Byte](rnd.nextInt(64) + 1); rnd.nextBytes(junk)
        (base ++ junk, "suffix")
      case 2 => // pure noise
        val junk = new Array[Byte](rnd.nextInt(512)); rnd.nextBytes(junk)
        (junk, "noise")
      case 3 => // multi-flip (2-8 bytes)
        val b = base.clone()
        (1 to rnd.nextInt(7) + 2).foreach { _ =>
          val at = rnd.nextInt(b.length); b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
        }
        (b, "multiflip")
      case 4 => // splice: a random window duplicated elsewhere
        val b = base.clone()
        val w = rnd.nextInt(math.min(32, b.length)) + 1
        val from = rnd.nextInt(b.length - w + 1); val to = rnd.nextInt(b.length - w + 1)
        System.arraycopy(base, from, b, to, w)
        (b, "splice")
      case _ => // single-byte flip (the common case)
        val b = base.clone()
        val at = rnd.nextInt(b.length); b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
        (b, "flip")
    }

    def run(surface: String, base: Array[Byte], n: Int,
        allowEof: Boolean)(decode: Array[Byte] => Unit): Map[String, Long] = {
      val outcomes = scala.collection.mutable.Map(
        "decoded" -> 0L, "typed" -> 0L, "eof" -> 0L)
      (1 to n).foreach { i =>
        val (mutated, kind) = mutate(base)
        try { decode(mutated); outcomes("decoded") += 1 }
        catch {
          case _: PbfFormatException => outcomes("typed") += 1
          case _: java.io.EOFException if allowEof => outcomes("eof") += 1
          case e: Throwable =>
            escapes += 1
            println(s"ESCAPE [$surface] trial=$i kind=$kind seed=$seed: " +
              s"${e.getClass.getName}: ${e.getMessage}")
        }
      }
      println(s"$surface: $n trials ${outcomes.toMap}")
      outcomes.toMap
    }

    val t0 = System.nanoTime()
    // writer surface: adversarial rows through the ROTATING writer (many
    // small files), read back bit-exactly — the WriterFuzzSpec generator
    // at campaign scale
    // bounded regardless of decode-trial scale: these rows are a
    // driver-collected LOCAL collection (big strings) — 100k of them
    // OOM'd an 8g driver through ParallelCollectionRDD serialization
    val writerRows = math.min(20000, math.max(2000, trials / 10))
    val writerOutcome: Map[String, Long] = {
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master("local[8]").appName("graft-fuzz-writer")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      try {
        import org.apache.spark.sql.Row
        def rndString(): String = {
          val n = rnd.nextInt(3) match {
            case 0 => rnd.nextInt(8); case 1 => rnd.nextInt(200); case _ => rnd.nextInt(4000)
          }
          val sb = new StringBuilder
          (1 to n).foreach(_ => sb.append((rnd.nextInt(0xD7FF) + 1).toChar))
          sb.toString
        }
        def opt[T](v: => T): Any = if (rnd.nextInt(4) == 0) null else v
        def rndDouble(): Double = rnd.nextInt(6) match {
          case 0 => Double.NaN
          case 1 => -0.0
          case 2 => java.lang.Double.longBitsToDouble(rnd.nextLong())
          case _ => rnd.nextDouble() * 360 - 180
        }
        val rows = (1 to writerRows).map { i =>
          Row(i.toLong,
            opt((1 to rnd.nextInt(6)).map(_ => rndString() ->
              (if (rnd.nextBoolean()) rndString() else null)).toMap),
            opt(rndDouble()), opt(rndDouble()),
            opt((1 to rnd.nextInt(5)).map(_ => Row(rnd.nextLong()))),
            opt((1 to rnd.nextInt(4)).map(_ => Row(
              if (rnd.nextBoolean()) rndString() else null,
              if (rnd.nextBoolean()) java.lang.Long.valueOf(rnd.nextLong()) else null,
              if (rnd.nextBoolean()) rndString() else null))),
            opt(rnd.nextLong()), null, opt(rnd.nextInt()), opt(rndString()),
            opt(rnd.nextInt()), opt(rnd.nextBoolean()), "node")
        }
        import scala.jdk.CollectionConverters._
        val df = spark.createDataFrame(rows.asJava, OsmSchema.schema)
        val internal = df.queryExecution.toRdd.collect()
        val dir = java.nio.file.Files.createTempDirectory("graft-fuzz-writer").toString
        try {
          val w = new DirectParquet.RotatingWriter(
            new org.apache.hadoop.fs.Path(dir), new org.apache.hadoop.conf.Configuration(),
            org.apache.parquet.hadoop.metadata.CompressionCodecName.ZSTD,
            taskId = 1, fileTargetBytes = 256 << 10, maxRecords = 1000,
            rowGroupBytes = 64 << 10, rowGroupRows = Some(500))
          internal.foreach(w.write)
          w.close()
          val back = spark.read.parquet(dir)
          // cheap bit-exact proxy over every column: count + grouped
          // checksums of the canonical string form match exactly
          import org.apache.spark.sql.functions._
          def digest(d: org.apache.spark.sql.DataFrame): (Long, Long) = {
            // bit_xor: order-independent, overflow-free (ANSI sum() of
            // xxhash64 overflows Long)
            val quoted = d.columns.filterNot(_ == "type").sorted
              .map(c => s"`$c`").mkString(",")
            val r = d.select(
              expr(s"bit_xor(xxhash64(to_json(struct($quoted))))").as("h"),
              count(lit(1)).as("n")).head()
            (r.getLong(1), r.getLong(0))
          }
          val (nIn, hIn) = digest(df)
          val (nOut, hOut) = digest(back)
          val files = new java.io.File(dir).listFiles()
            .count(_.getName.endsWith(".parquet"))
          if (nIn == nOut && hIn == hOut)
            Map("rows" -> nIn, "files" -> files.toLong, "match" -> 1L)
          else {
            escapes += 1
            println(s"ESCAPE [writer_roundtrip]: n $nIn->$nOut hash $hIn->$hOut")
            Map("rows" -> nIn, "files" -> files.toLong, "match" -> 0L)
          }
        } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      } finally spark.stop()
    }
    println(s"writer_roundtrip: $writerRows rows $writerOutcome")

    val results = Map(
      "writer_roundtrip" -> writerOutcome,
      "block_decode" -> run("block_decode", payload, trials, allowEof = false) { b =>
        BlockDecoder.decodeBlock(b).length; BlockDecoder.idRanges(b); ()
      },
      "header_decode" -> run("header_decode", header, trials, allowEof = false) { b =>
        BlockDecoder.decodeHeader(b); ()
      },
      "blob_zlib" -> run("blob_zlib", zlibBlob, trials, allowEof = false) { b =>
        Blobs.decode(b); ()
      },
      "blob_zstd" -> run("blob_zstd", zstdBlob, trials, allowEof = false) { b =>
        Blobs.decode(b); ()
      },
      "file_framing" -> run("file_framing", framedFile, trials, allowEof = true) { b =>
        Blobs.enumerate(new java.io.ByteArrayInputStream(b)); ()
      })
    val secs = (System.nanoTime() - t0) / 1e9

    val json = new StringBuilder
    json ++= s"""{"seed":$seed,"trials_per_surface":$trials,"escapes":$escapes,"""
    json ++= f""""wall_sec":$secs%.1f,"mutators":["flip","multiflip","truncate","suffix","noise","splice"],"""
    json ++= """"contract":"every corrupted input decodes (garbage ok) or fails PbfFormatException (framing may EOF at the IO layer); anything else is an escape","surfaces":{"""
    json ++= results.map { case (k, m) =>
      s""""$k":{${m.map { case (o, c) => s""""$o":$c""" }.mkString(",")}}"""
    }.mkString(",")
    json ++= "}}"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json.toString)
    println(json.toString)
    if (escapes > 0) sys.exit(1)
  }
}
