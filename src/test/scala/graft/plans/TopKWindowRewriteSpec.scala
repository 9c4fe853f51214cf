package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** [[TopKWindowRewrite]]: the injectOptimizerRule tier. Pins (1) the
  * canonical window-top-k pattern rewrites to the bounded-heap operator
  * with an identical result, (2) residual predicates survive, (3) every
  * declared skip case is actually skipped, (4) the conf gate works.
  */
class TopKWindowRewriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("topk-rewrite-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def li: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  /** total order: price desc, then unique (orderkey, linenumber). */
  private def topk(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("l_returnflag"), col("rk"), col("l_orderkey"), col("l_linenumber"))
  }

  private def optimized(df: DataFrame): String = df.queryExecution.optimizedPlan.toString

  test("gate entry q09b executes through the heap stages; q09 keeps the plain window") {
    val dir = "/root/testdata/sf0.001"
    // q09b builds its own child session with the rule registered via
    // experimental — run it off THIS spec's parent to prove the
    // registration path Verify exercises (not the extensions conf above)
    val q09b = graft.operators.RelationalQueries.all(
      "q09b_window_topk_rewritten")(spark, dir)
    q09b.collect()
    val planB = q09b.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(planB.contains("TopKPerKeyPartial") && planB.contains("TopKPerKeyFinal"),
      s"q09b must run the heap stages:\n$planB")
    assert(!planB.contains("WindowGroupLimit"), s"Spark's sort-based prune stays off:\n$planB")
    // the child-session registration must not leak into the parent's
    // sibling queries: q09 on the PARENT (rule conf-gated off here to
    // mimic a plain Verify session) keeps the window plan
    spark.conf.set(TopKWindowRewrite.EnabledKey, "false")
    try {
      val q09 = graft.operators.RelationalQueries.all("q09_window_topk")(spark, dir)
      q09.collect()
      val planA = q09.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(!planA.contains("TopKPerKey"), s"q09 stays on the window path:\n$planA")
      // and the rewrite is result-invisible
      assert(q09b.collect().map(_.toSeq).toSeq === q09.collect().map(_.toSeq).toSeq)
    } finally spark.conf.unset(TopKWindowRewrite.EnabledKey)
  }

  test("window-top-k rewrites to TopKPerKeyNode; result identical to the window path") {
    val df = topk(li, 3)
    val plan = optimized(df)
    assert(plan.contains("TopKPerKeyNode"), s"expected rewrite:\n$plan")
    // the rank-bound filter is dropped: pruned rows all rank <= k
    assert(!plan.contains("Filter"), s"rank-bound filter should be gone:\n$plan")

    val rewritten = df.orderBy(col("l_returnflag"), col("rk")).collect().toSeq
    spark.conf.set(TopKWindowRewrite.EnabledKey, "false")
    try {
      val viaWindow = topk(li, 3)
      assert(!optimized(viaWindow).contains("TopKPerKeyNode"))
      assert(viaWindow.orderBy(col("l_returnflag"), col("rk")).collect().toSeq
        === rewritten)
    } finally spark.conf.unset(TopKWindowRewrite.EnabledKey)
  }

  test("physical plan runs the heap operator, not WindowGroupLimit") {
    val df = topk(li, 3)
    df.collect()
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("TopKPerKeyPartial") && phys.contains("TopKPerKeyFinal"),
      s"expected heap operator stages:\n$phys")
    assert(!phys.contains("WindowGroupLimit"),
      s"Spark's sort-based limit should not also fire:\n$phys")
  }

  test("residual conjuncts survive in a Filter above the re-applied Window") {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val df = li.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2 && col("l_returnflag") =!= "X")
      .select(col("l_returnflag"), col("rk"))
    val plan = optimized(df)
    assert(plan.contains("TopKPerKeyNode"), s"expected rewrite:\n$plan")
    // NOT NULL/<>X residue: some filter must remain, but not on rk.
    // (The <>X conjunct cannot be pushed below the window's partition col.)
    assert(plan.contains("Filter"), s"residual predicate must survive:\n$plan")
    assert(!plan.contains("rk#") || !plan.linesIterator.exists(l =>
      l.contains("Filter") && l.contains("rk#")),
      s"rank bound must not survive in a filter:\n$plan")
    // and the result matches the pure-window formulation
    spark.conf.set(TopKWindowRewrite.EnabledKey, "false")
    try {
      val expect = li.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 2 && col("l_returnflag") =!= "X")
        .select(col("l_returnflag"), col("rk"))
        .orderBy(col("l_returnflag"), col("rk")).collect().toSeq
      assert(df.orderBy(col("l_returnflag"), col("rk")).collect().toSeq === expect)
    } finally spark.conf.unset(TopKWindowRewrite.EnabledKey)
  }

  test("rk = 1 (argmax-per-key) rewrites with k = 1") {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val df = li.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("l_returnflag"), col("l_orderkey"))
    assert(optimized(df).contains("TopKPerKeyNode 1,"))
    assert(df.count() === li.select(col("l_returnflag")).distinct().count())
  }

  test("1 = rk (flipped literal) rewrites identically") {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val df = li.withColumn("rk", row_number().over(w)).filter(lit(1) === col("rk"))
      .select(col("l_returnflag"), col("l_orderkey"))
    assert(optimized(df).contains("TopKPerKeyNode 1,"))
    assert(df.count() === li.select(col("l_returnflag")).distinct().count())
  }

  test("skip: rank() — tie semantics admit more than k rows") {
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
    val df = li.withColumn("rk", rank().over(w)).filter(col("rk") <= 3)
    assert(!optimized(df).contains("TopKPerKeyNode"))
  }

  test("skip: multi-expression window") {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val df = li
      .withColumn("rk", row_number().over(w))
      .withColumn("tot", sum(col("l_quantity")).over(
        Window.partitionBy(col("l_returnflag"))))
      .filter(col("rk") <= 3)
    assert(!optimized(df).contains("TopKPerKeyNode"))
  }

  test("skip: double partition key (raw-byte heap grouping vs -0.0/NaN)") {
    val w = Window.partitionBy(col("l_discount"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val df = li.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
    assert(!optimized(df).contains("TopKPerKeyNode"))
  }

  test("long-typed bound still rewrites (UnwrapCastInBinaryComparison runs first)") {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val df = li.withColumn("rk", row_number().over(w)).filter(col("rk") <= lit(3L))
    // rk <= 3L analyzes as cast(rk as bigint) <= 3L; the operator batch
    // unwraps the cast back to an int bound before this rule fires, so the
    // rewrite composes with Spark's own normalization instead of requiring
    // syntactic luck.
    assert(optimized(df).contains("TopKPerKeyNode 3,"))
  }

  test("skip: lower bound only / non-literal bound") {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val lower = li.withColumn("rk", row_number().over(w)).filter(col("rk") >= 2)
    assert(!optimized(lower).contains("TopKPerKeyNode"))
    val nonLit = li.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("l_linenumber"))
    assert(!optimized(nonLit).contains("TopKPerKeyNode"))
  }

  test("conf gate: disabled sessions keep the window plan") {
    spark.conf.set(TopKWindowRewrite.EnabledKey, "false")
    try assert(!optimized(topk(li, 3)).contains("TopKPerKeyNode"))
    finally spark.conf.unset(TopKWindowRewrite.EnabledKey)
  }
}
