package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q44 cost-based join reorder: with ANALYZE'd statistics and CBO on,
  * the deliberately mis-associated three-table join must flip its
  * INNERMOST join to the small orders⋈customer pair (fact table joined
  * last); without CBO the syntactic fact-first association survives.
  * Results must be identical either way — statistics change the order,
  * never the answer.
  */
class CboSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("cbo-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  /** The innermost (deepest) Join node's condition text. */
  private def innermostJoinCond(plan: LogicalPlan): String = {
    val joins = plan.collect { case j: Join => j }
    joins.last.condition.map(_.sql).getOrElse("")
  }

  test("ANALYZE stats are visible to the planner") {
    val (_, ordT, _) = RelationalQueries.ensureStats(spark, dir)
    // rowCount only propagates into plan statistics under CBO, and
    // `plan.stats` reads the THREAD-ACTIVE session's conf (the gate
    // entry is safe — optimization runs under the child's withActive;
    // only this direct .stats read needs the active session pinned)
    val s = spark.newSession()
    s.conf.set("spark.sql.cbo.enabled", "true")
    val prev = SparkSession.getActiveSession
    SparkSession.setActiveSession(s)
    try {
      val stats = s.table(ordT).queryExecution.optimizedPlan.stats
      assert(stats.rowCount.isDefined && stats.rowCount.get.longValue > 0,
        s"expected an exact ANALYZE'd rowCount, got $stats")
    } finally prev.foreach(SparkSession.setActiveSession)
  }

  test("CBO flips the innermost join to the small dimension pair; results match") {
    val (liT, ordT, custT) = RelationalQueries.ensureStats(spark, dir)
    val on = RelationalQueries.all("q44_cbo_reorder")(spark, dir)
    val onInner = innermostJoinCond(on.queryExecution.optimizedPlan)
    assert(onInner.contains("c_custkey") && !onInner.contains("l_orderkey"),
      s"CBO must join orders to customer FIRST, got innermost: $onInner")

    val off = spark.newSession()
    off.conf.set("spark.sql.cbo.enabled", "false")
    val q2 = RelationalQueries.cboShape(off, liT, ordT, custT)
    val offInner = innermostJoinCond(q2.queryExecution.optimizedPlan)
    assert(offInner.contains("l_orderkey"),
      s"without CBO the syntactic fact-first association survives, got: $offInner")

    assert(on.collect().map(_.toSeq).toSeq === q2.collect().map(_.toSeq).toSeq)
  }
}
