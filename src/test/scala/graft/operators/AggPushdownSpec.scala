package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q42 parquet aggregate pushdown: the DSv2 scan must answer the
  * per-partition COUNT/MIN/MAX from footer statistics — `PushedAggregation`
  * AND `PushedGroupBy` on the scan node — and the stats-path numbers must
  * equal the data-path recompute bit-for-bit. Also pins the eligibility
  * cliff: adding a data filter forfeits the pushdown (stats can't answer
  * a filtered aggregate), so the operator's no-filter shape is structural,
  * not stylistic.
  */
class AggPushdownSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("agg-pushdown-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  test("q42's scan carries PushedAggregation + PushedGroupBy and matches the data path") {
    val q42 = RelationalQueries.all("q42_agg_pushdown")(spark, dir)
    val got = q42.collect()
    val plan = q42.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation: [COUNT(*), MIN(l_quantity), " +
      "MAX(l_quantity), MIN(l_extendedprice), MAX(l_extendedprice)]"),
      s"expected the aggregate pushed into the scan:\n$plan")
    assert(plan.contains("PushedGroupBy: [l_shipmonth]"),
      s"expected the partition-column group-by pushed into the scan:\n$plan")

    // stats path ≡ data path: recompute from the raw rows on the default
    // (V1, no-pushdown) reader of the gate session
    val want = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("l_shipmonth"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_quantity")).as("min_qty"), max(col("l_quantity")).as("max_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))
      .orderBy(col("l_shipmonth"))
      .collect()
    assert(got.map(_.toSeq).toSeq === want.map(_.toSeq).toSeq)
  }

  test("a data filter forfeits the pushdown — the no-filter shape is structural") {
    val layout = RelationalQueries.ensurePartitioned(spark, dir)
    val s = spark.newSession()
    s.conf.set("spark.sql.sources.useV1SourceList", "")
    s.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    val filtered = s.read.parquet(layout)
      .filter(col("l_quantity") > 10)
      .groupBy(col("l_shipmonth"))
      .agg(count(lit(1)).as("n_rows"))
    filtered.collect()
    val plan = filtered.queryExecution.executedPlan.toString
    assert(!plan.contains("PushedAggregation: [COUNT"),
      s"a filtered aggregate must NOT claim footer stats:\n$plan")
  }
}
