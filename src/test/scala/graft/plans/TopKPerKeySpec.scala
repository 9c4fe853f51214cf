package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class TopKPerKeySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("topk-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def data(rows: Int, keys: Int) = {
    val sp = spark; import sp.implicits._
    (1 to rows).map(i => (i.toLong % keys, (i * 7919L) % 1000, i.toLong))
      .toDF("k", "score", "id")
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "score", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq

  test("matches the window+rank formulation exactly (total order)") {
    val df = data(5000, 37)
    val got = TopKPerKey.perKey(df, Seq("k"),
      Seq("score" -> false, "id" -> true), k = 3)
    val w = Window.partitionBy(col("k")).orderBy(col("score").desc, col("id"))
    val want = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
    assert(sortedRows(got) === sortedRows(want))
  }

  test("keys with fewer than k rows keep all rows") {
    val df = data(20, 15) // several keys have 1 row
    val got = TopKPerKey.perKey(df, Seq("k"), Seq("score" -> false, "id" -> true), 5)
    assert(sortedRows(got) === sortedRows(df))
  }

  test("plan shape: partial stage, clustered exchange, external sort, final stage") {
    val got = TopKPerKey.perKey(data(1000, 7), Seq("k"),
      Seq("score" -> false, "id" -> true), 2)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange hashpartitioning(k#"), s"expected key exchange:\n$plan")
    // stage order top-down: final (streaming group scan) over the
    // planner-inserted EXTERNAL sort (the spill path) over the exchange
    // over the partial (map-side pruning)
    val lines = plan.linesIterator.toSeq
    val finalIdx = lines.indexWhere(_.contains("TopKPerKeyFinal"))
    val sortIdx = lines.indexWhere(_.contains("Sort ["))
    val exIdx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    val partialIdx = lines.indexWhere(_.contains("TopKPerKeyPartial"))
    assert(finalIdx >= 0 && sortIdx >= 0 && partialIdx >= 0
      && finalIdx < sortIdx && sortIdx < exIdx && exIdx < partialIdx,
      s"stage order wrong:\n$plan")
  }

  test("partial-stage flush keeps results exact under a tiny key budget") {
    // threshold of 3 distinct keys forces many flush epochs over 23 keys —
    // several ≤k partials per key reach the final stage and must re-prune
    val df = data(5000, 23)
    val got = TopKPerKey.perKey(df, Seq("k"),
      Seq("score" -> false, "id" -> true), k = 3, flushKeyThreshold = 3)
    val w = Window.partitionBy(col("k")).orderBy(col("score").desc, col("id"))
    val want = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
    assert(sortedRows(got) === sortedRows(want))
  }

  test("result is partitioning-invariant") {
    val df = data(3000, 11)
    val a = TopKPerKey.perKey(df.repartition(1), Seq("k"), Seq("score" -> false, "id" -> true), 4)
    val b = TopKPerKey.perKey(df.repartition(13), Seq("k"), Seq("score" -> false, "id" -> true), 4)
    assert(sortedRows(a) === sortedRows(b))
  }

  test("ascending order and multi-column keys work") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      ("a", 1L, 10L, 1L), ("a", 1L, 5L, 2L), ("a", 1L, 7L, 3L),
      ("a", 2L, 1L, 4L), ("b", 1L, 3L, 5L))
      .toDF("g1", "g2", "score", "id")
    val got = TopKPerKey.perKey(df, Seq("g1", "g2"), Seq("score" -> true, "id" -> true), 2)
      .select("g1", "g2", "score").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got === Seq(("a", 1L, 5L), ("a", 1L, 7L), ("a", 2L, 1L), ("b", 1L, 3L)))
  }
}
