package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the PHYSICAL-PLAN shapes the engine's 100 TB claims rest on —
  * the `.explain` properties the scaladocs assert, turned into
  * regression tests. A refactor that silently un-pushes a filter,
  * un-broadcasts a dimension, or drops map-side partial aggregation
  * passes every value-level check at sf0.001 and only shows up as a
  * 100× cost at scale; these specs make the plan itself the contract.
  * (Global invariants — no CartesianProduct, no unpartitioned Window —
  * are swept across every query in SparkEntrySmokeSpec.)
  */
class PlanShapeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    // AQE off: these specs assert the STATIC plan (an AQE plan prints
    // `isFinalPlan=false` before execution, hiding codegen spans and
    // deferring strategy picks to runtime stats that don't exist at
    // 100 TB planning time). The production sessions keep AQE on — it
    // can only improve on the shapes pinned here.
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("plan-shape-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString

  test("q02: both predicates and the projection reach the parquet scan") {
    val p = plan("q02_filter_pushdown")
    // the quantity predicate pushes as-is; the shipdate range pushes as
    // two bounds — all three must be in PushedFilters, not post-scan-only
    assert(p.contains("PushedFilters:"), p)
    val pushed = p.linesIterator.filter(_.contains("PushedFilters:")).mkString
    assert(pushed.contains("l_quantity") && pushed.contains("l_shipdate"),
      s"filters not pushed to the scan: $pushed")
    // column pruning: the scan must read exactly the 4 consumed columns,
    // not the 16-column table
    val read = p.linesIterator.filter(_.contains("ReadSchema:")).mkString
    Seq("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate").foreach(c =>
      assert(read.contains(c), s"$c missing from ReadSchema: $read"))
    assert(!read.contains("l_extendedprice") && !read.contains("l_comment"),
      s"scan reads unneeded columns: $read")
  }

  test("q03: dimension joins broadcast — the fact side never shuffles") {
    val p = plan("q03_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      s"dimension join fell back to a fact-shuffling strategy:\n$p")
  }

  test("q04 shuffles fact-fact, q03 still broadcasts, when nothing is auto-broadcastable") {
    // at 100 TB neither lineitem nor orders fits the auto-broadcast
    // threshold — simulate that by disabling it: q04 must degrade to an
    // equi-SHUFFLE join (proving no stray broadcast() hint pins a fact
    // broadcast), while q03's explicit dimension hints must KEEP
    // broadcasting (proving the dims don't silently fall back to
    // shuffling the fact when stats disappear)
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val p04 = graft.SparkEntry.queries("q04_join_shuffle")(s, dir)
      .queryExecution.executedPlan.toString
    assert(p04.contains("SortMergeJoin") || p04.contains("ShuffledHashJoin"), p04)
    assert(!p04.contains("BroadcastHashJoin"), p04)
    val p03 = graft.SparkEntry.queries("q03_join_broadcast")(s, dir)
      .queryExecution.executedPlan.toString
    assert(p03.contains("BroadcastHashJoin") && !p03.contains("SortMergeJoin"), p03)
  }

  test("q01: aggregation combines map-side before the exchange") {
    val p = plan("q01_agg")
    assert(p.contains("partial_sum"),
      s"no partial aggregation — every row would cross the shuffle:\n$p")
    // `*(n)` prefixes are the whole-stage-codegen stage markers in the
    // simple plan string: both aggregate halves must carry one
    val aggLines = p.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggLines.nonEmpty && aggLines.forall(_.contains("*(")),
      s"aggregation fell out of whole-stage codegen:\n${aggLines.mkString("\n")}")
  }

  test("p02: way lengths is a single narrow stage — no join, no aggregate exchange") {
    val p = plan("p02_way_lengths")
    assert(!p.contains("Join"), s"LocationsOnWays query should not join:\n$p")
    // the only exchange tolerated is the final rangepartitioning for the
    // deterministic orderBy — no hash-partitioned (aggregate/join) shuffle
    val hashEx = p.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.isEmpty, s"unexpected shuffle in the no-join path: $hashEx")
  }

  test("q05: the filtered key set semi-joins without shuffling the big side") {
    val p = plan("q05_semi_join")
    assert(p.contains("LeftSemi"), p)
    // (r16: the test previously asserted only LeftSemi — a fallback to a
    // fact-shuffling SMJ semi-join would have passed its own title.) The
    // filtered key set must ride as the BROADCAST side; the lineitem scan
    // feeds the join with no Exchange between scan and join.
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"semi-join must broadcast the filtered key set:\n$p")
  }

  test("p04: spatial join is ONE broadcast hash equi-join — no nested loop") {
    val p = plan("p04_spatial_join")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"per-box OR-chains degrade to a nested loop:\n${p.take(3000)}")
    // the cell table rides as a broadcast, never a shuffle side
    assert(p.contains("BroadcastExchange"), p.take(3000))
    // the z-range pre-filter is selectivity-GATED (round 8): p04's box
    // set has one dominant box whose cover is ~82% of the envelope, so
    // the driver-side estimate keeps the filter OUT of this plan (it
    // would keep ~90% of rows — pure per-row overhead). The expression's
    // in-plan presence + codegen on a selective cover is pinned in
    // ZRangeContainsSpec instead.
    assert(!p.contains("graft_z_in_ranges"),
      s"z-range pre-filter should be gated off for p04's dominant-box cover:\n${p.take(3000)}")
  }

  test("q36: bloom probe filters the fact side BELOW its shuffle") {
    val p = plan("q36_bloom_pruned_join")
    // the probe must sit between the fact scan and the exchange feeding
    // the join — on the scan side of the plan, not above the join
    val lines = p.linesIterator.toSeq
    val probeIdx = lines.indexWhere(_.contains("might_contain"))
    val joinIdx = lines.indexWhere(_.contains("ShuffledHashJoin"))
    assert(probeIdx >= 0, s"bloom probe missing:\n${p.take(3000)}")
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      s"probe should print below the join (scan side):\n${p.take(3000)}")
  }

  test("d11: the doc table spreads BEFORE the gram explode") {
    val p = graft.SparkEntry.queries("d11_shared_passages")(spark, dir)
      .queryExecution.optimizedPlan.toString
    // the pre-amplification repartition must survive optimization — its
    // loss costs nothing at sf0.001 and a single-task stage at scale
    // (measured 6.0s -> 1.25s at sf0.1)
    val repIdx = p.linesIterator.indexWhere(l =>
      l.contains("Repartition") || l.contains("RepartitionByExpression"))
    val genIdx = p.linesIterator.indexWhere(_.contains("Generate explode"))
    assert(repIdx >= 0, s"pre-explode repartition lost:\n${p.take(3000)}")
    assert(genIdx >= 0 && repIdx > genIdx,
      s"repartition must sit BELOW the explode (runs first):\n${p.take(3000)}")
  }
}
