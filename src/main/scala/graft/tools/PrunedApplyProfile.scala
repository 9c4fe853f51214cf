package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase-level attribution for one pruned CDC apply at the SOAK_r14
  * 16M/2-bucket regime: where does the wall go — metastore ops, the
  * merge+stage write, the copy relay, or protocol FS round-trips?
  * Throwaway measurement harness behind SOAK_r14's adjudication.
  *
  * Usage: scripts/run.sh graft.tools.PrunedApplyProfile [rows]
  */
object PrunedApplyProfile {

  private val Buckets = 32

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(16000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val target = graft.Scratch.tempDir("graft-papf").toString
    val prefix = "graft_papf"
    // seed + 2 warm applies via the real entry points
    val seed = s.range(rows).select(col("id").as("user_id"),
      (pmod(xxhash64(col("id"), lit(7L)), lit(1000L)) / 100.0).as("value"))
    graft.streaming.EventStreams.applyChangesetBucketedPruned(
      seed, 0L, target, prefix, buckets = Buckets)
    def skew(salt: Long): DataFrame = s.range(rows)
      .select(col("id").as("user_id"))
      .filter(pmod(hash(col("user_id")), lit(Buckets)) < 2)
      .limit(20000)
      .select(col("user_id"),
        (pmod(xxhash64(col("user_id"), lit(salt)), lit(1000L)) / 100.0).as("value"))
    graft.streaming.EventStreams.applyChangesetBucketedPruned(
      skew(1L), 1L, target, prefix, buckets = Buckets)
    graft.streaming.EventStreams.applyChangesetBucketedPruned(
      skew(2L), 2L, target, prefix, buckets = Buckets)

    // now a HAND-UNROLLED apply of batch 3 with per-phase timers,
    // mirroring applyChangesetBucketedPruned exactly
    println(s"profile of one pruned apply at $rows rows:")
    val batchId = 3L
    val fsP = new org.apache.hadoop.fs.Path(target)
    val fs = fsP.getFileSystem(s.sparkContext.hadoopConfiguration)
    val vDir = new org.apache.hadoop.fs.Path(fsP, s"v$batchId")
    val batch = skew(3L)
    val priorDir = t("latestVersion") {
      graft.streaming.EventStreams.latestVersion(target, below = batchId).get }
    val pPath = new org.apache.hadoop.fs.Path(priorDir)
    val chg = t("chg agg + persist") {
      batch.groupBy(col("user_id"))
        .agg(count(lit(1)).as("dn"),
          sum(floor(col("value") * 100 + 0.5).cast("long")).as("dc"))
        .persist()
    }
    val touched = t("touched distinct+collect") {
      chg.select(pmod(hash(col("user_id")), lit(Buckets)).as("b"))
        .distinct().collect().map(_.getInt(0)).toSet
    }
    val allFiles = t("listStatus+validate") {
      fs.listStatus(pPath).toSeq.filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }.map(st => st.getPath)
    }
    val byBucket = allFiles.groupBy(p => p.getName match {
      case graft.streaming.EventStreams.BucketFileId(id) => id.toInt
      case n => sys.error(s"non-bucketed data file in a bucketed dir: $n")
    })
    val touchedFiles = byBucket.filter(kv => touched.contains(kv._1))
      .values.flatten.map(_.toString).toSeq
    val priorTouched = s.read.parquet(touchedFiles: _*)
    val stageName = s"${prefix}_stage_v$batchId"
    val stageDir = new org.apache.hadoop.fs.Path(fsP, s".stage_v$batchId")
    fs.delete(stageDir, true)
    t("merge(aligned inputs)+stage write") {
      graft.streaming.EventStreams.mergedSnapshot(
        priorTouched.repartition(Buckets, col("user_id")).hint("merge"),
        chg.repartition(Buckets, col("user_id")))
        .write.bucketBy(Buckets, "user_id").sortBy("user_id")
        .option("path", stageDir.toString).mode("overwrite")
        .saveAsTable(stageName)
    }
    t("delete+mkdirs vDir") { fs.delete(vDir, true); fs.mkdirs(vDir) }
    val staged = fs.listStatus(stageDir).toSeq.collect {
      case st if st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith(".") => st.getPath
    }
    val forward = byBucket.filter(kv => !touched.contains(kv._1))
      .values.flatten.toSeq
    t(s"copyAll ${staged.size}+${forward.size} files") {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
      try {
        val tasks = (staged ++ forward).map { src =>
          new java.util.concurrent.Callable[Unit] {
            def call(): Unit = { org.apache.hadoop.fs.FileUtil.copy(fs, src, fs,
              new org.apache.hadoop.fs.Path(vDir, src.getName), false,
              s.sparkContext.hadoopConfiguration); () }
          }
        }
        pool.invokeAll(java.util.Arrays.asList(tasks: _*)).forEach(_.get())
      } finally pool.shutdown()
    }
    t("DROP stage table") { s.sql(s"DROP TABLE IF EXISTS $stageName") }
    t("delete stageDir") { fs.delete(stageDir, true) }
    t("_SUCCESS + _BUCKETS") {
      fs.create(new org.apache.hadoop.fs.Path(vDir, "_SUCCESS"), true).close()
      val out = fs.create(new org.apache.hadoop.fs.Path(vDir, "_BUCKETS"), true)
      out.write(Buckets.toString.getBytes); out.close()
    }
    val vName = s"${prefix}_v$batchId"
    t("DROP vName IF EXISTS") { s.sql(s"DROP TABLE IF EXISTS $vName") }
    t("CREATE vName") {
      s.sql(s"""CREATE TABLE $vName (user_id BIGINT, n_events BIGINT,
        cents BIGINT) USING PARQUET CLUSTERED BY (user_id)
        SORTED BY (user_id) INTO $Buckets BUCKETS LOCATION '$vDir'""")
    }

    // and the comparison point: one FULL bucketed apply of batch 4
    val t0 = System.nanoTime()
    graft.streaming.EventStreams.applyChangesetBucketed(
      skew(4L), 4L, target, prefix, buckets = Buckets)
    println(f"  full apply (whole)           ${(System.nanoTime() - t0) / 1e9}%.3f s")

    (0 to 4).foreach(i => s.sql(s"DROP TABLE IF EXISTS ${prefix}_v$i"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(target))
    spark.stop()
  }
}
