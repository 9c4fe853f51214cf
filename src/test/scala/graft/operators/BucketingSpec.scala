package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join — the pre-shuffle technique for recurring
  * big×big joins at scale: both tables bucketed by the join key at write
  * time join without any Exchange (each bucket pair joins locally).
  * At 100 TB this converts the dominant repeated shuffle into a one-time
  * layout cost.
  */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val warehouse = java.nio.file.Files.createTempDirectory("wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("bucketing-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("join of co-bucketed tables has no Exchange") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    spark.read.parquet(s"$dir/orders.parquet")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    val joined = spark.table("li_b")
      .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")

    // and it is still correct
    val expected = spark.read.parquet(s"$dir/lineitem.parquet")
      .join(spark.read.parquet(s"$dir/orders.parquet"),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() === expected)
  }

  test("q37's join+per-order-agg fragment runs with zero Exchange") {
    val dir = "/root/testdata/sf0.001"
    val frag = RelationalQueries.bucketedPerOrder(spark, dir)
    frag.collect() // materialize THIS QueryExecution so AQE finalizes it
    // the adaptive plan's toString appends an "== Initial Plan ==" copy —
    // read only the final plan section
    val plan = frag.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(plan.contains("Bucketed: true"), s"expected bucketed scans:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join+agg fragment must not shuffle:\n$plan")
    // The two Sort nodes under the SMJ are WITHIN-PARTITION sorts of
    // already-bucket-sorted files — no shuffle, linear merge work. Spark
    // 3+ deliberately never reports bucket sort order from the scan
    // (spark.sql.legacy.bucketedTableScan.outputOrdering), so they can't
    // be elided without a legacy conf; the scale win is the Exchange
    // elision pinned above.
    val sortNodes = plan.linesIterator.filter(
      _.replaceAll("^[\\s:+*()\\d-]*", "").startsWith("Sort [")).toSeq
    assert(sortNodes.size === 2, s"expected the 2 local SMJ sorts: $sortNodes")

    // and the layout never changes the answer: q37 vs the plain-parquet join
    val viaBuckets = RelationalQueries.all("q37_bucketed_colocated")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val plain = spark.read.parquet(s"$dir/orders.parquet")
      .join(spark.read.parquet(s"$dir/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("qty"))
      .groupBy(col("n_items"))
      .agg(count(lit(1)).as("n_orders"), sum(col("qty")).as("sum_qty"))
      .orderBy(col("n_items"))
      .collect().map(_.toSeq).toSeq
    assert(viaBuckets === plain)
  }
}
