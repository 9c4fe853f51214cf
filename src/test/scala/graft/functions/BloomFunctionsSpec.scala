package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class BloomFunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("bloom-functions-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  test("no false negatives: every inserted key might-contains true") {
    val sp = spark; import sp.implicits._
    val keys = (1L to 500L).map(_ * 7L)
    val dim = keys.toDF("k")
    val bloom = BloomFunctions.build(dim, col("k"), keys.size.toLong, keys.size * 10L)
    assert(bloom != null)
    val hits = dim.filter(BloomFunctions.mightContain(bloom, col("k"))).count()
    assert(hits === keys.size) // a bloom filter NEVER false-negatives
  }

  test("false-positive rate near the sized 1% on disjoint probes") {
    val sp = spark; import sp.implicits._
    val dim = (1L to 1000L).map(_ * 2L).toDF("k") // even keys
    val bloom = BloomFunctions.build(dim, col("k"), 1000L, 10000L)
    val probes = 100001L to 200001L by 2L // odd keys: none inserted
    val fp = probes.toDF("k")
      .filter(BloomFunctions.mightContain(bloom, col("k"))).count()
    // ~9.6 bits/key ≈ 1% fpp; allow generous slack — the assertion is
    // "selective", not an exact-rate pin (the sketch is impl-defined)
    assert(fp < probes.size / 20, s"fpp way above sized rate: $fp/${probes.size}")
  }

  test("empty build side prunes everything") {
    val sp = spark; import sp.implicits._
    val empty = Seq.empty[Long].toDF("k")
    val bloom = BloomFunctions.build(empty, col("k"), 1L, 64L)
    // empty aggregate yields a null sketch → probe is constant-false
    val n = (1L to 10L).toDF("k")
      .filter(BloomFunctions.mightContain(bloom, col("k"))).count()
    assert(n === 0L)
  }

  test("q36 equals the unpruned join bit-for-bit (fp removal by exact join)") {
    val pruned = graft.operators.RelationalQueries
      .q36_bloom_pruned_join(spark, sf).collect().toSeq
    val plain = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice")), 2).as("value"))
      .orderBy(col("o_orderstatus")).collect().toSeq
    assert(pruned === plain)
    // caller-sized sketch: a deliberately UNDERSIZED filter (512 bits for
    // ~thousands of keys → fpp near 1) must still produce the identical
    // result — the exact join removes every false positive; sizing is a
    // perf knob, never a correctness one
    val tiny = graft.operators.RelationalQueries
      .bloomPrunedJoin(spark, sf, estKeys = 100L, numBits = 512L)
      .collect().toSeq
    assert(tiny === plain)
  }

  test("string keys: build + probe work end-to-end (Catalyst's other key type)") {
    val sp = spark; import sp.implicits._
    val dim = Seq("alpha", "bravo", "charlie", "delta").toDF("k")
    val bloom = BloomFunctions.build(dim, col("k"), 4L, 1024L)
    assert(bloom != null)
    val probes = Seq("alpha", "delta", "echo", "foxtrot", "golf").toDF("k")
    val hits = probes.filter(BloomFunctions.mightContain(bloom, col("k")))
      .collect().map(_.getString(0)).toSet
    assert(hits.contains("alpha") && hits.contains("delta")) // no false negatives
    // 256 bits/key: the three non-members virtually never all collide
    assert(hits.size < 5, s"every probe hit — filter is degenerate: $hits")
  }

  test("plan shape: probe precedes the exchange; join is shuffle-hash") {
    val plan = graft.operators.RelationalQueries
      .q36_bloom_pruned_join(spark, sf)
      .queryExecution.executedPlan.toString
    // the might_contain filter must exist (it prunes the fact side
    // BEFORE the shuffle — Catalyst keeps filters below exchanges)
    assert(plan.contains("might_contain"), plan.take(2000))
    assert(plan.contains("ShuffledHashJoin"), plan.take(2000))
    // and the probe side's filter reads only the two consumed columns
    assert(plan.contains("l_orderkey") && !plan.contains("l_comment"))
  }
}
