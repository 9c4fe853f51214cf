package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("cc-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val sp = spark; import sp.implicits._
    DedupQueries.connectedComponents(pairs.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("empty pair list yields an empty clustering (no NPE on null label sum)") {
    assert(cc(Seq.empty) === Map.empty)
  }

  test("long chain collapses to one component (pointer jumping, not 1-hop)") {
    // a 64-node path: 1-hop-only propagation would need 63 rounds; the
    // jump step must close it in a handful. Every node labels to the min.
    val chain = (1L until 64L).map(i => (i, i + 1))
    val got = cc(chain)
    assert(got.keySet === (1L to 64L).toSet)
    assert(got.values.toSet === Set(1L))
  }

  test("separate components keep separate min labels") {
    val got = cc(Seq((5L, 3L), (3L, 9L), (20L, 21L), (40L, 41L), (41L, 42L)))
    assert(got === Map(3L -> 3L, 5L -> 3L, 9L -> 3L,
      20L -> 20L, 21L -> 20L, 40L -> 40L, 41L -> 40L, 42L -> 40L))
  }

  test("cycles and duplicate edges converge to the same fixpoint") {
    val got = cc(Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 2L), (7L, 8L), (8L, 7L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("result is partitioning-invariant") {
    val sp = spark; import sp.implicits._
    val pairs = (1L to 40L).flatMap(i => Seq((i, i + 60), (i + 60, i + 120)))
    val a = DedupQueries.connectedComponents(pairs.toDF("doc_a", "doc_b").repartition(1))
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    val b = DedupQueries.connectedComponents(pairs.toDF("doc_a", "doc_b").repartition(7))
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    assert(a.toSeq === b.toSeq)
  }
}
