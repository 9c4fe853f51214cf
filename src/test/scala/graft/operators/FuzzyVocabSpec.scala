package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Hand-pins for d16 fuzzy vocabulary matching: the edit-distance
  * threshold, the completeness of length blocking at the maximum length
  * gap (|Δlen| = 2 pairs must still join — distance ≥ length gap, so the
  * three-bucket explode loses nothing), pair uniqueness, and frequency
  * attachment. The DuckDB gate proves engine levenshtein parity at scale.
  */
class FuzzyVocabSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("fuzzy-vocab-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def run(docs: Seq[(Long, String)]): Seq[(String, String, Int, Long, Long)] = {
    val sp = spark; import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fuzzy").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    DedupQueries.all("d16_fuzzy_vocab")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4)))
      .toSeq
  }

  test("typo pairs within distance 2 emit once with frequencies; far pairs don't") {
    // vocabulary: join ×3, jion ×1 (transposition, dist 2), joint ×1
    // (insertion from join, dist 1; from jion it's 3 — excluded), zebra
    // ×1 (far). Same-length pair dedups by token order (jion < join).
    val out = run(Seq(
      (1L, "join join join jion"),
      (2L, "joint zebra")))
    assert(out === Seq(
      ("jion", "join", 2, 1L, 3L),
      ("join", "joint", 1, 3L, 1L)))
  }

  test("a |len|=2 gap at distance exactly 2 is still caught by the bucket explode") {
    val out = run(Seq((1L, "ab abcd")))
    assert(out === Seq(("ab", "abcd", 2, 1L, 1L)))
  }
}
