package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[MinGramMd5Expr]] bit-identical to the HOF form it replaced
  * (t06's previous body) across the edge cases: multi-byte UTF-8 (char
  * vs byte grams), text shorter than the gram, empty text, null text. */
class MinGramMd5Spec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[2]").appName("min-gram-md5-spec")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("native expression equals the HOF form on edge-case corpus") {
    TextFunctions.register(spark)
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "abcdefgh",          // exactly one gram
      "abcdefg",           // shorter than the gram -> whole text
      "",                  // empty -> md5("")
      "héllo wörld ünïcode çhärs",  // multi-byte chars
      "ααββγγδδεεζζ",       // all multi-byte
      "a",
      null
    ).toDF("text").withColumn("doc_id", monotonically_increasing_id())
    val out = docs.select(
      call_function("graft_min_gram_md5", col("text"), lit(8)).as("fast"),
      array_min(expr(
        "transform(sequence(1, greatest(length(text) - 7, 1)), i -> md5(substring(text, i, 8)))"))
        .as("hof"))
      .collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getString(0) == r.getString(1),
        s"fast=${r.getString(0)} hof=${r.getString(1)}")
    }
  }

  test("matches for several gram sizes on random-ish strings") {
    TextFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val texts = (1 to 50).map(i =>
      rnd.alphanumeric.take(rnd.nextInt(40)).mkString + (if (i % 3 == 0) "é" else ""))
    val df = texts.toDF("text")
    Seq(1, 3, 8).foreach { n =>
      val bad = df.select(
        call_function("graft_min_gram_md5", col("text"), lit(n)).as("fast"),
        array_min(expr(
          s"transform(sequence(1, greatest(length(text) - ${n - 1}, 1)), i -> md5(substring(text, i, $n)))"))
          .as("hof"))
        .filter(not(col("fast") <=> col("hof"))).count()
      assert(bad == 0L, s"n=$n mismatches: $bad")
    }
  }
}
