package graft.tools
import org.apache.spark.sql.SparkSession

/** Times one SparkEntry query solo (best of 2, after a warm run at
  * sf0.001): scripts/run.sh graft.tools.OneQuery <name> [sfDir] */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    fn(spark, "/root/testdata/sf0.001").count() // warm
    val times = (1 to 2).map { _ =>
      val t = System.nanoTime(); fn(spark, sfDir).count(); (System.nanoTime() - t) / 1e9
    }
    println(f"$name: best ${times.min}%.2fs of ${times.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
