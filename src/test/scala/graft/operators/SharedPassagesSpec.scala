package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for d11 (exact shared-passage detection) on constructed
  * corpora — the DuckDB gate proves engine-equality at sf scale; these
  * pin the SEMANTICS on cases small enough to verify by hand, chiefly
  * the short-doc guard: Spark's `sequence(1, len-39)` for len<40 yields
  * the DESCENDING [1, 0] (not an empty list), so an unguarded short doc
  * would emit whole-text grams and phantom pairs.
  */
class SharedPassagesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("shared-passages-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def run(docs: Seq[(Long, String)]): Seq[(Long, Long, Long)] = {
    val sp = spark; import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("passages").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    DedupQueries.all("d11_shared_passages")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("a 45-char shared passage yields exactly 6 shared 40-grams") {
    val passage = "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHI" // 45 chars
    assert(passage.length === 45)
    // boundary chars DIFFER across docs (1/2 vs 3/4) so the shared run is
    // exactly the passage — a shared space on either side would extend it
    val pairs = run(Seq(
      (1L, s"left context1${passage}2right side one"),
      (2L, s"totally different lead-in3${passage}4other tail"),
      (3L, "unrelated text that is comfortably longer than forty characters")))
    // a shared run of length L contributes L-39 distinct shared grams
    assert(pairs === Seq((1L, 2L, 6L)))
  }

  test("short docs are excluded, not collapsed to whole-text grams") {
    val dup = "this exact short string!" // 24 chars, shared verbatim
    assert(dup.length < 40)
    val pairs = run(Seq((1L, dup), (2L, dup),
      (3L, "a third document that is long enough to produce grams normally")))
    // without the len>=40 guard, sequence(1, len-39) = [1, 0] would emit
    // docs 1 and 2's whole text as a "gram" and fabricate the (1,2) pair
    assert(pairs.isEmpty)
  }

  test("a repeated passage INSIDE one doc never pairs the doc with itself") {
    val p = "zyxwvutsrqponmlkjihgfedcba9876543210ZYXW" // exactly 40
    assert(p.length === 40)
    val pairs = run(Seq(
      (1L, s"A${p}B and then again C${p}D"), // twice within one doc
      (2L, s"elsewhere E${p}F appears once in this second document")))
    // dedup inside the posting list: doc 1 contributes ONE entry for p
    // (distinct boundary chars again pin the shared run to exactly p)
    assert(pairs === Seq((1L, 2L, 1L)))
  }
}
