package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Ring-expansion spatial kNN (p05b) vs the one-probe 3×3 form (p05):
  * constructs the corner the fixed neighborhood gets WRONG — a query near
  * its cell's edge whose true nearest neighbor lies two cells away while
  * decoy points sit inside the 3×3 at larger distance — and pins that the
  * ring expansion recovers exact brute-force kNN there. The sf0.01 gate
  * separately pins p05b ≡ brute force on the real p04 cloud.
  */
class SpatialKnnSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val C = 1L << 26 // cell width in nano-degrees

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("spatial-knn-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  // query id=1 at the low corner of cell (0,0); two decoys in the far
  // corner of diagonal cell (1,1); the TRUE nearest (id=4) two cells up
  // in lat — outside the 3×3 but closer than both decoys
  private val cloud = Seq(
    (1L, 5L, 5L),
    (2L, 2 * C - 10, 2 * C - 10),
    (3L, 2 * C - 20, 2 * C - 20),
    (4L, 2 * C + 1, 5L))

  private def bruteTop(k: Int): Seq[(Long, Int, Long, Long)] = {
    val (qid, qla, qlo) = (cloud.head._1, cloud.head._2, cloud.head._3)
    cloud.drop(1)
      .map { case (id, la, lo) =>
        (id, (la - qla) * (la - qla) + (lo - qlo) * (lo - qlo))
      }
      .sortBy { case (id, d2) => (d2, id) }
      .take(k).zipWithIndex
      .map { case ((id, d2), i) => (qid, i + 1, id, d2) }
  }

  private def run(k: Int, fixed: Option[Int]): Seq[(Long, Int, Long, Long)] = {
    val sp = spark; import sp.implicits._
    val pts = cloud.toDF("id", "latn", "lonn")
    PbfQueries.ringKnn(pts, col("id") === 1, k, fixed)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  test("the one-probe 3x3 form returns the in-ring decoys, missing the true nearest") {
    val out = run(k = 2, fixed = Some(1))
    assert(out.map(_._3) === Seq(3L, 2L)) // decoys only — id=4 is invisible
    assert(out !== bruteTop(2))
  }

  test("ring expansion recovers exact brute-force kNN on the same corner") {
    val out = run(k = 2, fixed = None)
    assert(out === bruteTop(2))
    assert(out.head._3 === 4L) // the out-of-neighborhood true nearest leads
  }

  test("insufficient in-ring candidates force expansion; k beyond the cloud degrades gracefully") {
    // k=3 needs all three non-query points; only 2 decoys are in the 3x3
    assert(run(k = 3, fixed = None) === bruteTop(3))
    // k larger than the cloud: expansion runs to the cover-all bound and
    // returns everything there is
    assert(run(k = 9, fixed = None) === bruteTop(9))
  }
}
