package graft.tools

import graft.plans.TopKPerKey
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measures the TopKPerKey-vs-window crossover that the operator's
  * Scaladoc documents: 30M rows, varying key cardinality, k=5.
  * Run: scripts/run.sh graft.tools.TopKBench
  */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = 30000000L
    for (keys <- Seq(1000L, 100000L, 1000000L)) {
      val df = spark.range(rows).select(
        (col("id") % keys).as("k"),
        ((col("id") * 7919) % 1000000).as("score"),
        col("id"))
      def time(f: => Long): Double = {
        f // warm
        val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
      }
      val custom = time(TopKPerKey.perKey(df, Seq("k"), Seq("score" -> false, "id" -> true), 5).count())
      val w = Window.partitionBy(col("k")).orderBy(col("score").desc, col("id"))
      val window = time(df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5).drop("rn").count())
      println(f"keys=$keys%8d  topKPerKey=$custom%6.2fs  window=$window%6.2fs")
    }
    spark.stop()
  }
}
