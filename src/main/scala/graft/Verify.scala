package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dev-loop filter: SPARK_GRAFT_ONLY=q01_agg,st22_version_diff gates a
    // subset (the driver never sets it → full sweep). A name matching no
    // registered query fails loudly — a typo'd filter would otherwise
    // run an empty sweep that exits 0 looking like a clean pass.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names.filterNot(SparkEntry.queries.contains)
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names no registered query: ${unknown.mkString(", ")}")
    }
    def pick[T](m: Map[String, T]): Map[String, T] =
      only.fold(m)(names => m.view.filterKeys(names).toMap)
    val queries = pick(SparkEntry.queries)
    val oracles = pick(SparkEntry.oracleSql)
    // dump queries concurrently (independent jobs on one session) — halves
    // the driver's correctness-gate wall time vs sequential
    // DAEMON workers: a query hung in driver-side code (the FDICT
    // infinite-inflate class) must not keep the JVM alive past the pool
    // timeout — non-daemon threads would make main() return while the
    // process lives forever, and the driver gate would wait indefinitely
    // instead of reading the not_run manifest
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4,
      (r: Runnable) => { val t = new Thread(r); t.setDaemon(true); t })
    val status = new java.util.concurrent.ConcurrentHashMap[String, String]()
    // pre-populate so a query still queued/hung at the pool timeout shows
    // up as non-ok in the manifest instead of silently vanishing
    queries.keys.foreach(status.put(_, "not_run"))
    queries.foreach { case (name, fn) =>
      pool.submit(new Runnable {
        override def run(): Unit =
          try {
            fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            status.put(name, "ok")
          } catch { case e: Throwable =>
            System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
            status.put(name, s"error: ${e.getClass.getSimpleName}")
          }
      })
    }
    pool.shutdown()
    val timedOut = !pool.awaitTermination(2, java.util.concurrent.TimeUnit.HOURS)
    if (timedOut) {
      System.err.println("[verify] pool timeout: some queries did not finish (left as not_run)")
      pool.shutdownNow() // interrupt stragglers; daemon threads can't pin the JVM
    }
    val failed = {
      import scala.jdk.CollectionConverters._
      status.asScala.filter(_._2 != "ok").keys.toSeq.sorted
    }
    if (failed.nonEmpty)
      System.err.println(s"[verify] ${failed.size} queries FAILED to dump: ${failed.mkString(", ")}")
    // shared escaper (JsonEscape.q): a tab or CR in builder-authored SQL
    // would otherwise make the driver's json.load fail and silently zero
    // the round's correctness
    def q(s: String): String = JsonEscape.q(s)
    val json = oracles
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // manifest of EVERY query's dump outcome — a query that throws must
    // fail the gate loudly, not silently vanish from the result dirs
    val manifest = {
      import scala.jdk.CollectionConverters._
      status.asScala.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    }
    Files.writeString(Paths.get(s"$outDir/queries.json"), manifest)
    spark.stop()
    // loud exit on timeout — manifests are already on disk for the gate
    if (timedOut) sys.exit(3)
  }
}
