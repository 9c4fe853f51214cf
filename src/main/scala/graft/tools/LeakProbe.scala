package graft.tools
import org.apache.spark.sql.SparkSession

/** Session-lifetime leak probe: runs the ENTIRE query surface N times in
  * one session and reports the persisted-RDD count after each sweep
  * (post-GC, so the ContextCleaner has had its chance). localCheckpoint
  * intermediates are expected to be reclaimed once their DataFrames are
  * unreachable — a count that grows linearly with sweeps means some
  * query pins cached state for the session lifetime (the r3 IndexedPbf
  * persist finding's failure mode, now guarded here for the whole
  * surface).
  *
  * Usage: scripts/run.sh graft.tools.LeakProbe [sfDir] [sweeps]
  */
object LeakProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val sweeps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    val counts = (1 to sweeps).map { round =>
      graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        try fn(spark, sfDir).count()
        catch { case e: Throwable =>
          System.err.println(s"[leakprobe] $name failed: ${e.getMessage}") }
      }
      System.gc()
      Thread.sleep(3000) // let the ContextCleaner drain its weak-ref queue
      val n = spark.sparkContext.getPersistentRDDs.size
      println(s"sweep $round: persistentRDDs=$n")
      n
    }
    // steady state, not monotone growth: the last sweep must not exceed
    // the first by more than a small slack (in-flight cleaner items)
    val ok = counts.last <= counts.head + 8
    println(if (ok) "LEAKPROBE OK" else
      s"LEAKPROBE FAIL: persistent RDD count grew ${counts.head} -> ${counts.last}")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
