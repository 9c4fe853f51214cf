package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q41 AQE skew-join: the executed sort-merge join must carry the
  * `skew=true` marker (OptimizeSkewedJoin split the hot shuffle
  * partitions at runtime) and the re-plan must be result-invisible
  * against the same join with skew handling off. Completes the skew
  * story next to q27's manual salting.
  */
class SkewJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("skew-join-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("q41's executed SMJ is marked skew=true and equals the unsplit join") {
    val dir = "/root/testdata/sf0.01" // sf0.001 is too small to trip the byte thresholds
    val q41 = RelationalQueries.all("q41_aqe_skew_join")(spark, dir)
    val viaAqe = q41.collect().map(_.toSeq).toSeq
    val plan = q41.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("SortMergeJoin") && plan.contains("skew=true"),
      s"expected a runtime-split skewed SMJ:\n$plan")

    // the re-plan never changes the answer: same join, skew handling off
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val hot = col("l_orderkey") % 3 === 0
    val li = s2.read.parquet(s"$dir/lineitem.parquet")
      .select(when(hot, lit(7L)).otherwise(col("l_orderkey")).as("k"),
        col("l_quantity"), col("l_extendedprice"))
    val ord = s2.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_orderstatus"))
    val plain = li.join(ord.hint("merge"), Seq("k"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"), round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .orderBy(col("o_orderstatus"))
      .collect().map(_.toSeq).toSeq
    assert(viaAqe === plain)
  }
}
