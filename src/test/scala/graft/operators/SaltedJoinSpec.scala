package graft.operators

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q27 hot-key-only salting: replication must be bounded by the hot slice,
  * and the rewrite must be semantically invisible vs the plain join. */
class SaltedJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("salted-join-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("salted result equals the plain join (self-oracle)") {
    val plain = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_lines"), round(sum(col("l_extendedprice")), 2).as("value"))
      .orderBy(col("o_orderstatus")).collect().map(_.toSeq).toSeq
    val salted = RelationalQueries.q27_salted_join(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(salted === plain)
  }

  test("replication is bounded by the hot slice, not the fact table") {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val hot = l.groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 6)
    val nHot = hot.count()
    val nOrders = o.count()
    // the threshold actually selects a hot MINORITY on this data: the
    // pattern exercises both the salted and the cold path
    assert(nHot > 0, "expected some hot keys at sf0.001 (orders with >=6 lines)")
    assert(nHot < nOrders / 2, s"hot slice $nHot should be a small minority of $nOrders")
  }
}
