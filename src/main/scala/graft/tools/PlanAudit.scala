package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    val dir = "/root/testdata/sf0.01"
    for (name <- args) {
      println(s"===== $name =====")
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      println(plan.split("\n").filter(l =>
        l.contains("Join") || l.contains("Exchange") || l.contains("Scan ") ||
        l.contains("HashAggregate") || l.contains("Sort ") || l.contains("Window")).take(25).mkString("\n"))
    }
    spark.stop()
  }
}
