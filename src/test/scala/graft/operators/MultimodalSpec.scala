package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("multimodal-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def items(n: Int) = {
    val sp = spark; import sp.implicits._
    (1 to n).map(i => Multimodal.MediaItem(i.toLong, "img", s"src${i % 3}",
      Array.tabulate(16 + i)(j => ((i * 31 + j) % 251).toByte))).toDS()
  }

  test("feature extraction is deterministic and partitioning-invariant") {
    val a = Multimodal.extractFeatures(items(20).repartition(1)).collect().sortBy(_.media_id)
    val b = Multimodal.extractFeatures(items(20).repartition(7)).collect().sortBy(_.media_id)
    assert(a.map(_.checksum).toSeq === b.map(_.checksum).toSeq)
    assert(a.map(_.features.toSeq).toSeq === b.map(_.features.toSeq).toSeq)
    assert(a.forall(_.features.length === Multimodal.StubCodec.Dim))
  }

  test("frame sampling covers the payload exactly once") {
    val frames = Multimodal.sampleFrames(items(5), 4).collect()
    assert(frames.length === 20)
    val byMedia = frames.groupBy(_.media_id)
    byMedia.foreach { case (id, fs) =>
      assert(fs.map(_.frame_idx).sorted.toSeq === Seq(0, 1, 2, 3))
      assert(fs.map(_.n_bytes).sum === 16 + id) // spans partition the payload
    }
  }

  test("m02 pipeline runs over testdata documents") {
    val df = Multimodal.m02_media_features(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSeq === Seq("source", "n_items", "total_bytes", "f0_sum", "min_checksum"))
    // deterministic under re-run
    val again = Multimodal.m02_media_features(spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }
}
