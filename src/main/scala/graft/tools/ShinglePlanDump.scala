package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: dump the full physical plan of the shingle projection (the
  * d04/d14 family's front stage) to audit how many times the
  * array-construction expression is evaluated per row. */
object ShinglePlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.operators.DedupQueries.shingles(
      graft.Tables.documents(spark, "/root/testdata/sf0.01"))
    println(df.queryExecution.executedPlan.toString)
  }
}
