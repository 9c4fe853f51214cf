package graft.sources.pbf

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}


/** Spark-native OSM PBF source: `.osm.pbf` → DataFrame(OsmSchema.schema).
  *
  * Architecture (the Spark re-expression of the reference's pipeline,
  * osm-pbf-parquet/src/pbf.rs:51-98):
  *
  *  1. Driver enumerates blob spans with a header-only skip-scan
  *     ([[Blobs.enumerate]]) — cheap metadata pass, same as
  *     osmpbf/src/blob.rs:426-448 / indexed.rs:145-172.
  *  2. Spans are grouped into tasks of ~`splitTargetBytes` compressed input
  *     so task count scales with file size, not blob count. Each task is a
  *     narrow partition: seek → read → inflate → decode → rows. No shuffle
  *     anywhere — scan→project→write is one stage, like the reference.
  *  3. IO goes through the Hadoop FileSystem API, so `file:`, `hdfs:` and
  *     `s3a:` paths all work — the reference's local/S3 split
  *     (pbf.rs:24-49) for free, with ranged reads on object stores.
  *
  * Dense-node delta chains are sequential *within* a blob, so the blob is
  * the minimum parallelism unit — identical to the reference's per-blob
  * task spawn (pbf.rs:79).
  */
object OsmPbf {

  /** Driver-side plan: spans of every blob in the file. */
  def blobSpans(spark: SparkSession, path: String): Seq[Blobs.BlobSpan] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try Blobs.enumerate(in)
    finally in.close()
  }

  /** File header metadata (bbox, features, replication info) — the
    * reference's S6 operator (osmpbf/src/block.rs:15-86). One blob read. */
  def header(spark: SparkSession, path: String): Option[OsmHeader] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    blobSpans(spark, path).find(_.blobType == Blobs.TypeOsmHeader).map { span =>
      val in = fs.open(p)
      try {
        in.seek(span.offset)
        val buf = new Array[Byte](span.length)
        in.readFully(buf)
        BlockDecoder.decodeHeader(Blobs.decode(buf))
      } finally in.close()
    }
  }

  /** Full scan → DataFrame via the DataSourceV2 connector
    * ([[OsmPbfDataSource]]): the decoder emits Catalyst InternalRows
    * straight into the scan (no external-Row conversion layer) and the
    * connector adds column pruning + type-predicate pushdown.
    * `splitTargetBytes` groups small blobs into one task (planet files
    * have ~10k blobs of ~4-16MB; 64MB targets keep task count ~= a few
    * thousand at planet scale — right-sized for 1000 executors without
    * scheduler pressure).
    */
  def read(spark: SparkSession, path: String,
           splitTargetBytes: Long = 64L << 20): DataFrame =
    spark.read.format("osmpbf")
      .option("splitMb", math.max(1L, splitTargetBytes >> 20).toString)
      .load(path)

  /** Typed view: same scan (pruning/pushdown included — the typed fields
    * Catalyst sees unused still prune), `Dataset[OsmElement]` on top. */
  def readTyped(spark: SparkSession, path: String,
                splitTargetBytes: Long = 64L << 20): org.apache.spark.sql.Dataset[OsmElement] = {
    import spark.implicits._
    read(spark, path, splitTargetBytes).as[OsmElement]
  }

  /** The reference's whole CLI pipeline (main.rs → pbf_driver →
    * write parquet): transcode a PBF into hive-partitioned zstd parquet,
    * `type=node/way/relation` (sink.rs:166-179 path layout).
    *
    * Three concurrent per-type jobs instead of one
    * `partitionBy("type")` write:
    *  - no dynamic-partition sort (the partitionBy writer sorts every
    *    task's rows by the partition column first — pure overhead when
    *    there are exactly 3 values);
    *  - each scan's `type=` pushdown decodes only its own primitive
    *    groups, so the 3 scans cost ~1 full decode (nodes dominate);
    *  - the `type` column stays directory-only, exactly like the
    *    reference (osm_arrow.rs:52-54) — readers get it back through
    *    partition discovery.
    */
  /** Estimate of parquet bytes/row from a sample of decoded rows: measure
    * their UnsafeRow footprint and apply a conservative on-disk factor
    * (columnar encoding + zstd typically lands well under in-memory row
    * size). Used to turn the reference's byte-targeted file rotation
    * (--file-target-mb, sink.rs:82-105) into `maxRecordsPerFile` — Spark's
    * writer counts rows, not bytes (SURVEY.md §2.3 K4).
    */
  def estimateRowBytes(spark: SparkSession, path: String, sampleRows: Int = 10000): Double = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val span = blobSpans(spark, path).find(_.blobType == Blobs.TypeOsmData)
      .getOrElse(throw new PbfFormatException(s"no data blobs in $path"))
    val in = fs.open(p)
    val rows = try {
      in.seek(span.offset)
      val buf = new Array[Byte](span.length)
      in.readFully(buf)
      BlockDecoder.decodeBlockInternal(Blobs.decode(buf), BlockDecoder.FullProjection)
        .take(sampleRows).toSeq
    } finally in.close()
    val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(OsmSchema.schema)
    val memBytes = rows.map(r => proj(r).getSizeInBytes.toLong).sum
    val onDiskFactor = 0.35 // columnar + zstd vs UnsafeRow, conservative
    math.max(memBytes.toDouble / math.max(rows.size, 1) * onDiskFactor, 8.0)
  }

  /** Returns per-type element counts (the reference's A1 global element
    * counter, util.rs:20 / pbf.rs:192-210, via the Observation API — the
    * counts ride the write jobs for free, no extra pass).
    */
  def transcode(spark: SparkSession, config: PbfConfig): Map[String, Long] = {
    config.validate()
    import org.apache.spark.sql.functions.{col, count, lit}
    val codec = if (config.compression == 0) "uncompressed" else "zstd"
    val maxRecords = config.fileTargetMb match {
      case Some(mb) =>
        (mb.toLong << 20) / estimateRowBytes(spark, config.input).round
      case None => config.maxRecordsPerFile
    }
    val types = Seq(OsmSchema.TypeNode, OsmSchema.TypeWay, OsmSchema.TypeRelation)
    val counts = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(types.size)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    types.foreach { t =>
      pool.submit(new Runnable {
        override def run(): Unit =
          try {
            val obs = org.apache.spark.sql.Observation(s"transcode_$t")
            read(spark, config.input, config.inputBufferSizeMb.toLong << 20)
              .filter(col("type") === t)
              .drop("type")
              .observe(obs, count(lit(1)).as("n"))
              .write
              .mode("overwrite")
              .option("compression", codec)
              // parquet-mr codec-level knob; 1-22 like the reference (util.rs:100-104)
              .option("parquet.compression.codec.zstd.level", config.compression.toString)
              .option("maxRecordsPerFile", maxRecords)
              .parquet(s"${config.output.stripSuffix("/")}/type=$t")
            counts.put(t, obs.get("n").asInstanceOf[Long])
          } catch { case e: Throwable => failures.add(e) }
      })
    }
    pool.shutdown()
    pool.awaitTermination(24, java.util.concurrent.TimeUnit.HOURS)
    if (!failures.isEmpty) throw failures.peek()
    import scala.jdk.CollectionConverters._
    counts.asScala.toMap
  }

}

/** CLI/config surface mirroring the reference's clap Args
  * (osm-pbf-parquet/src/util.rs:24-64) with its validation rules
  * (util.rs:80-127).
  */
final case class PbfConfig(
    input: String,
    output: String = "./parquet",
    compression: Int = 3,
    inputBufferSizeMb: Int = 16,
    maxRecordsPerFile: Long = 5000000L,
    fileTargetMb: Option[Int] = None) {

  def validate(): Unit = {
    require(input.endsWith(".pbf") || input.endsWith(".osm.pbf"),
      s"input must end with .pbf/.osm.pbf: $input") // util.rs:81-85
    require(compression >= 0 && compression <= 22,
      s"compression must be 0-22 (0 = uncompressed): $compression") // util.rs:100-104
    require(inputBufferSizeMb > 0, "input buffer must be positive")
    require(maxRecordsPerFile > 0, "maxRecordsPerFile must be positive")
    require(fileTargetMb.forall(_ > 0), "file target must be positive") // util.rs:121-125
    val scheme = input.takeWhile(_ != ':')
    require(!input.contains("://") || Seq("s3", "s3a", "file", "hdfs").contains(scheme),
      s"unsupported input scheme: $scheme") // util.rs:129-151 (s3/plain only)
  }
}
