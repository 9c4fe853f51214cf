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
    val results = Map(
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
