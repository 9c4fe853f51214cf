package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Hand-graph pins for the quantized PageRank core: fixed points,
  * convergence direction, dangling-mass semantics, and exact integer
  * reproducibility across partitionings. The DuckDB gate (g02) proves
  * engine-equality of the full kNN-graph pipeline; this pins the
  * ITERATE's semantics on graphs small enough to compute by hand.
  */
class PageRankSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("pagerank-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def run(vs: Seq[Long], es: Seq[(Long, Long)], iters: Int = 8): Map[Long, Long] = {
    val sp = spark; import sp.implicits._
    GraphQueries.pagerank(vs.toDF("vx"), es.toDF("src", "dst"), iters = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private val S = GraphQueries.RankScale

  test("a directed cycle is a uniform fixed point (exact in micro-units)") {
    // Every vertex has odeg 1 and exactly one in-edge, so S/3 mass cycles
    // unchanged: rank = floor(0.15*S/3) + floor(0.85*(S div 3)).
    val out = run(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    val expected = math.floor((1.0 - 0.85) * S.toDouble / 3).toLong +
      math.floor(0.85 * (S / 3)).toLong
    assert(out === Map(1L -> expected, 2L -> expected, 3L -> expected))
  }

  test("a sink hub outranks its spokes; dangling mass is not redistributed") {
    // 1→3, 2→3; 3 has no out-edges (dangling). Alpha-only: 3's mass
    // vanishes each step instead of teleporting, so total mass < S, and
    // the hub holds teleport + 0.85 * (two spoke contributions).
    val out = run(Seq(1L, 2L, 3L), Seq((1L, 3L), (2L, 3L)))
    val teleport = math.floor((1.0 - 0.85) * S.toDouble / 3).toLong
    assert(out(1L) === teleport && out(2L) === teleport)
    assert(out(3L) === teleport + math.floor(0.85 * (2 * teleport)).toLong)
    assert(out.values.sum < S)
  }

  private def runFull(vs: Seq[Long], es: Seq[(Long, Long)], iters: Int = 8): Map[Long, Long] = {
    val sp = spark; import sp.implicits._
    GraphQueries.pagerank(vs.toDF("vx"), es.toDF("src", "dst"), iters = iters,
      redistributeDangling = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("g02b full form conserves rank mass up to floor losses where alpha-only leaks") {
    // same sink-hub graph as the dangling test: 1→3, 2→3, vertex 3
    // dangling. Full form teleports 3's mass back uniformly each step.
    val vs = Seq(1L, 2L, 3L)
    val es = Seq((1L, 3L), (2L, 3L))
    val full = runFull(vs, es)
    val alphaOnly = run(vs, es)
    // conservation: every term loses < 1 unit per floor (2 floors/vertex)
    // plus < n_v units on the dmass share, per iteration; 8 iterations of
    // a 3-vertex graph bound the total deficit far under 100 units of S
    assert(full.values.sum <= S)
    assert(full.values.sum >= S - 100)
    // alpha-only provably leaks on this graph; full holds strictly more
    assert(alphaOnly.values.sum < full.values.sum)
    // and the dangling hub still outranks its spokes
    assert(full(3L) > full(1L) && full(1L) === full(2L))
  }

  test("full form equals alpha-only exactly when no vertex dangles") {
    // directed cycle: no dangling mass to move — the two formulations
    // must produce identical integers
    val vs = Seq(1L, 2L, 3L, 4L)
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(runFull(vs, es) === run(vs, es))
  }

  test("iterate is exactly reproducible across partitionings") {
    // 12 vertices, chain + chords: quantized arithmetic must give the
    // same integers under 1 partition and under 7.
    val vs = (1L to 12L)
    val es = vs.init.map(v => (v, v + 1)) ++ Seq((12L, 1L), (4L, 9L), (9L, 2L))
    val sp = spark; import sp.implicits._
    val a = GraphQueries.pagerank(
      vs.toDF("vx").repartition(1), es.toDF("src", "dst").repartition(1), iters = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = GraphQueries.pagerank(
      vs.toDF("vx").repartition(7), es.toDF("src", "dst").repartition(7), iters = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a === b)
    // a vertex with two in-edges (vertex 2: from 1 and from 9) must
    // outrank a pure chain vertex with one in-edge from an equal-degree
    // source once ranks settle
    val m = a.toMap
    assert(m(2L) > m(6L))
  }
}
