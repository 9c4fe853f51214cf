package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 additions: t16 phrase search, t17 median/MAD outliers,
  * q45 join-view IVM, q46 exact correlation components. Each is checked
  * against an INDEPENDENT driver-side recompute (plain Scala over the
  * collected sf0.001 rows — a different algorithm and a different
  * execution substrate than the Catalyst plan under test), plus plan
  * assertions where the plan IS the claim (q45's broadcast deltas).
  */
class PhraseStatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("phrase-stats-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("t16: positional intersection equals a scalar adjacency count") {
    val expected = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val toks = r.getString(1).split(" ", -1)
        val n = toks.indices.dropRight(1)
          .count(i => toks(i) == "hash" && toks(i + 1) == "value")
        r.getLong(0) -> n.toLong
      }
      .filter(_._2 > 0).sortBy(_._1)
    val got = TextQueries.t16_phrase_search(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got === expected.toSeq)
    assert(got.nonEmpty, "sf0.001 corpus should contain the phrase")
  }

  test("t17: lower-median/MAD outliers equal a driver-side recompute") {
    val rows = graft.Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def lowerMedian(vs: Seq[Long]): Long = {
      val s = vs.sorted
      s((s.size + 1) / 2 - 1) // rank ⌊(n+1)/2⌋, 1-based
    }
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (lang, rs) =>
      val med = lowerMedian(rs.map(_._3).toSeq)
      val dev = rs.map { case (_, id, nc) => (id, nc, math.abs(nc - med)) }
      val mad = lowerMedian(dev.map(_._3).toSeq)
      dev.filter(_._3 > 2 * mad)
        .map { case (id, nc, dv) => (lang, id, nc, dv) }
    }.sortBy(t => (t._1, t._2))
    val got = TextQueries.t17_outlier_mad(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
  }

  test("t17b: histogram selection equals the sort-window medians row-for-row") {
    val a = TextQueries.t17_outlier_mad(spark, dir).collect().map(_.toString).toSeq
    val b = TextQueries.t17b_outlier_mad_hist(spark, dir).collect().map(_.toString).toSeq
    assert(b === a)
    // and the histogram plan never sorts the corpus: its only row_number/
    // sort windows run over (lang, value) histogram rows
    val plan = TextQueries.t17b_outlier_mad_hist(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("row_number"), s"histogram path must not rank rows:\n$plan")
  }

  test("q46: moment identities equal a driver-side integer recompute") {
    val rows = graft.Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity"), col("l_discount"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1).toLong,
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    val expected = rows.groupBy(_._1).toSeq.map { case (f, rs) =>
      val n = rs.size.toLong
      val sx = rs.map(_._2).sum; val sy = rs.map(_._3).sum
      val sxx = rs.map(t => t._2 * t._2).sum
      val syy = rs.map(t => t._3 * t._3).sum
      val sxy = rs.map(t => t._2 * t._3).sum
      (f, n, n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy)
    }.sortBy(_._1)
    val got = RelationalQueries.q46_exact_corr(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === expected)
  }

  test("q45: maintained join view equals the full recompute; deltas broadcast") {
    val q = RelationalQueries.q45_ivm_join(spark, dir)
    val got = q.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val expected = graft.Tables.orders(spark, dir)
      .join(graft.Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("sum_cents"))
      .orderBy(col("c_mktsegment")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    // the refresh's two delta joins must BROADCAST the changeset side —
    // that's the O(changeset) claim; the only SMJ/shuffle join allowed is
    // the V_old materialization
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val bhj = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bhj >= 2, s"expected both delta joins broadcast:\n$plan")
  }
}
