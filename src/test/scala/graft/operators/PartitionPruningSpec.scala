package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q40 dynamic partition pruning: the hive-partitioned fact scan must
  * carry a runtime `dynamicpruning` partition filter fed by the filtered
  * dim's broadcast — and actually read FEWER partitions than the layout
  * holds. The dim predicate is opaque to constant folding by design, so
  * static pruning cannot claim the credit.
  */
class PartitionPruningSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("partition-pruning-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("q40's fact scan is dynamically pruned and result matches the plain join") {
    val dir = "/root/testdata/sf0.001"
    val q40 = RelationalQueries.all("q40_partition_pruned_join")(spark, dir)
    q40.collect()
    // the dynamic pruning subquery is visible in the INITIAL plan's scan
    // (AQE's final-plan rendering folds it into the executed stages)
    val plan = q40.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), s"expected a dynamic pruning filter:\n$plan")

    // and it prunes: fewer partitions read than the layout holds
    val layout = RelationalQueries.ensurePartitioned(spark, dir)
    val allMonths = new java.io.File(layout).listFiles()
      .count(_.getName.startsWith("l_shipmonth="))
    val monthsKept = q40.collect().length
    assert(monthsKept < allMonths,
      s"dim filter must be selective: kept $monthsKept of $allMonths months")

    // layout never changes the answer
    val plain = spark.read.parquet(s"$dir/lineitem.parquet")
      .withColumn("l_shipmonth", date_format(col("l_shipdate"), "yyyy-MM"))
      .join(
        spark.read.parquet(s"$dir/orders.parquet")
          .filter(col("o_orderkey") % 9973 === 7)
          .select(date_format(col("o_orderdate"), "yyyy-MM").as("m")).distinct(),
        col("l_shipmonth") === col("m"))
      .groupBy(col("l_shipmonth"))
      .agg(count(lit(1)).as("n_rows"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("l_shipmonth"))
      .collect().map(_.toSeq).toSeq
    assert(q40.collect().map(_.toSeq).toSeq === plain)
  }
}
