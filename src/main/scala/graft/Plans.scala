package graft
import org.apache.spark.sql.SparkSession
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("q02_filter_pushdown", "q03_join_broadcast", "q04_join_shuffle", "q05_semi_join", "q13_topk")) {
      println(s"===== $name =====")
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      println(plan.split("\n").filter(l =>
        l.contains("PushedFilters") || l.contains("ReadSchema") ||
        l.contains("Join") || l.contains("TakeOrdered") || l.contains("Exchange") ||
        l.contains("WholeStageCodegen")).take(12).mkString("\n"))
    }
    spark.stop()
  }
}
