package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** [[Checkpoints.stage]] — the iterative operators' staging seam. Local
  * mode (default) is pinned everywhere else; this pins the RELIABLE arm:
  * same results from connected components and PageRank, real checkpoint
  * files on disk (executor loss recovers from them — the 1000-executor
  * deployment's requirement), flag-without-dir fails loud, and the flag
  * is session-scoped.
  */
class CheckpointsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("checkpoints-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("reliable staging: identical results, real checkpoint files, loud without a dir") {
    val sp = spark
    val rel = sp.newSession()
    rel.conf.set(Checkpoints.ReliableKey, "true")

    // flag without a checkpoint dir must fail LOUD, not silently degrade
    // to the fragile local mode
    {
      import rel.implicits._
      val e = intercept[IllegalArgumentException](
        Checkpoints.stage(Seq((1L, 2L)).toDF("doc_a", "doc_b")))
      assert(e.getMessage.contains(Checkpoints.ReliableKey))
    }

    // same discipline for an UNPARSEABLE flag value: "1"/"ture" must not
    // silently map to the fragile local mode the flag exists to escape
    {
      val bad = sp.newSession()
      bad.conf.set(Checkpoints.ReliableKey, "1")
      import bad.implicits._
      val e = intercept[IllegalArgumentException](
        Checkpoints.stage(Seq((1L, 2L)).toDF("doc_a", "doc_b")))
      assert(e.getMessage.contains(Checkpoints.ReliableKey) &&
        e.getMessage.contains("'1'"))
    }

    val ckptDir = java.nio.file.Files.createTempDirectory("graft-relckpt").toString
    sp.sparkContext.setCheckpointDir(ckptDir)
    try {
      // connected components: chain + groups, reliable ≡ local
      val pairs = (1L until 64L).map(i => (i, i + 1)) ++ Seq((100L, 101L), (200L, 201L))
      def ccOn(s: SparkSession) = {
        import s.implicits._
        operators.DedupQueries.connectedComponents(pairs.toDF("doc_a", "doc_b"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      }
      val local = ccOn(sp) // session without the flag: localCheckpoint path
      val reliable = ccOn(rel)
      assert(reliable === local)
      assert(reliable.count(_._2 == 1L) === 64)

      // PageRank: quantized integers must be identical across the arms
      def prOn(s: SparkSession) = {
        import s.implicits._
        operators.GraphQueries.pagerank(
          (1L to 12L).toDF("vx"),
          ((1L to 11L).map(v => (v, v + 1)) :+ ((12L, 1L))).toDF("src", "dst"),
          iters = 4)
          .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      }
      assert(prOn(rel) === prOn(sp))

      // and the reliable runs actually WROTE checkpoints (the recovery
      // artifact executor loss replays from)
      val files = new java.io.File(ckptDir).listFiles()
      assert(files != null && files.nonEmpty, s"no checkpoint dirs under $ckptDir")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckptDir))
    }
  }
}
