package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The minhash family's bucket cap (`pairsFromBands(bucketCap)`) — the
  * d12/d13 discipline applied to the band buckets: a viral exact-dup
  * group puts every copy in one (band, h) bucket, whose C(m,2) pair
  * array materializes in ONE row before explode; the cap skips the
  * flooded bucket (deliberate recall loss) and leaves every other
  * bucket's pairs intact.
  */
class MinhashCapSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("minhash-cap-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("a flooded band bucket is skipped; bounded buckets keep their pairs") {
    val sp = spark
    import sp.implicits._
    // 12 identical docs (a viral dup group: every band bucket holds all
    // 12) + one small near-dup pair with distinct text
    val viral = (0L until 12L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
    val pairTxt = "one two three four five six seven"
    val small = Seq(100L -> pairTxt, 101L -> pairTxt) // identical: collides for sure
    val docs = (viral ++ small).toDF("doc_id", "text")
    val bands = graft.streaming.DocStreams.bandRows(docs).toDF()

    val uncapped = DedupQueries.pairsFromBands(bands).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((100L, 101L)), "the small pair must band-collide")
    assert(uncapped.count(p => p._1 < 12L && p._2 < 12L) === 12 * 11 / 2,
      "uncapped: the viral group contributes all C(12,2) pairs")

    val capped = DedupQueries.pairsFromBands(bands, bucketCap = Some(8)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!capped.exists(p => p._1 < 12L && p._2 < 12L),
      "capped: the flooded bucket contributes no pairs (declared recall loss)")
    assert(capped.contains((100L, 101L)),
      "capped: bounded buckets keep their pairs")
  }
}
