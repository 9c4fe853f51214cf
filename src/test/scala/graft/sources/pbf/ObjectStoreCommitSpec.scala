package graft.sources.pbf

import graft.tools.HostileObjectStoreFs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The commit protocol under OBJECT-STORE semantics (r18 verdict #1).
  *
  * [[HostileObjectStoreFs]] models what S3 actually gives a committer:
  * PUT-visible creates, NO atomic rename (rename = per-object copy +
  * delete, observable and killable mid-loop), and optionally laggy
  * listing. This spec drives BOTH transcode commit protocols through it:
  *
  *  - the default `rename` protocol is shown to be exactly as strong as
  *    its documentation claims on such a store: correct when renames
  *    complete, and under a mid-swap death the root can MIX generations —
  *    but `_SUCCESS` is absent across that whole window, so the gated
  *    reader ([[OsmPbf.readCommitted]]) refuses, and a re-run heals. That
  *    is the loud adjudication: rename commit is for HDFS-class stores;
  *    object stores take the pointer protocol.
  *  - the `pointer` protocol is held to the object-store bar: ZERO
  *    renames (counted by the FS), write-once data files, a single
  *    `_CURRENT` pointer PUT as the only commit action, zombie files
  *    never read, a death during the pointer PUT leaving the previous
  *    generation fully live, and indifference to listing lag (the commit
  *    is manifest-driven, never listing-driven).
  */
class ObjectStoreCommitSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var scratch: java.nio.file.Path = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4,2]") // in-process retries for the race pin
      .appName("objectstore-commit-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.hadoopConfiguration
      .set("fs.grafts3.impl", classOf[HostileObjectStoreFs].getName)
    spark.sparkContext.setLogLevel("ERROR")
    scratch = java.nio.file.Files.createTempDirectory("objstore")
  }

  override def afterAll(): Unit = {
    HostileObjectStoreFs.reset()
    if (spark != null) spark.stop()
    org.apache.commons.io.FileUtils.deleteDirectory(scratch.toFile)
  }

  private def freshOut(tag: String): String =
    s"grafts3://$scratch/$tag"

  /** A synthesized input with a known element mix, n files per type. */
  private def synth(tag: String, blocks: Int): (String, Long) = {
    val p = s"$scratch/$tag.osm.pbf"
    val n = PbfWriter.synthesize(p, blocks, nodesPerBlock = 2000,
      waysPerBlock = 225, relationsPerBlock = 3)
    (p, n)
  }

  test("pointer commit: zero renames, exact round-trip, zombies never read") {
    HostileObjectStoreFs.reset()
    val (pbf, n) = synth("pa", 4)
    val out = freshOut("p1")
    val counts = OsmPbf.transcode(spark, PbfConfig(input = s"grafts3://$pbf",
      output = out, commitMode = PbfConfig.CommitPointer))
    assert(counts.values.sum === n)
    assert(HostileObjectStoreFs.renameCalls.get() === 0L,
      "the pointer protocol must never call rename on the output store")
    val back = OsmPbf.readCommitted(spark, out)
    assert(back.count() === n)
    assert(back.select("type").distinct().count() === 3)
    // a zombie attempt drops a file into the LIVE generation dir after
    // commit — manifest-driven reads must not see it
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val outPath = fs.makeQualified(new org.apache.hadoop.fs.Path(out))
    val gen = OsmPbf.currentGenToken(fs, outPath).get
    val zombieSrc = fs.listStatus(new org.apache.hadoop.fs.Path(outPath, s"$gen/type=node"))
      .filter(_.isFile).head.getPath
    org.apache.hadoop.fs.FileUtil.copy(fs, zombieSrc, fs,
      new org.apache.hadoop.fs.Path(outPath, s"$gen/type=node/part-9999-azombie-0000.zstd.parquet"),
      false, spark.sparkContext.hadoopConfiguration)
    assert(OsmPbf.readCommitted(spark, out).count() === n,
      "a zombie file in the generation dir leaked into a manifest-driven read")
  }

  test("pointer commit: the injected retry race publishes exactly one attempt per partition") {
    HostileObjectStoreFs.reset()
    val (pbf, n) = synth("pb", 6)
    val out = freshOut("p2")
    val hc = spark.sparkContext.hadoopConfiguration
    hc.setInt("graft.test.transcode.failPartitionOnce", 0)
    try {
      val counts = OsmPbf.transcode(spark, PbfConfig(input = s"grafts3://$pbf",
        output = out, commitMode = PbfConfig.CommitPointer))
      assert(counts.values.sum === n)
    } finally hc.unset("graft.test.transcode.failPartitionOnce")
    assert(HostileObjectStoreFs.renameCalls.get() === 0L)
    val back = OsmPbf.readCommitted(spark, out)
    assert(back.count() === n)
    assert(back.groupBy(col("id"), col("type")).count()
      .filter(col("count") > 1).count() === 0L,
      "the losing attempt's durable files were read back (duplicates)")
    // exactly one attempt tag per published partition
    val gen = {
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val outPath = fs.makeQualified(new org.apache.hadoop.fs.Path(out))
      new java.io.File(s"$scratch/p2/${OsmPbf.currentGenToken(fs, outPath).get}")
    }
    // validate against the MANIFEST (the read surface), not the dir
    // listing: the loser's durable files legitimately remain on disk
    val manifest = java.nio.file.Files.readAllLines(
      new java.io.File(gen, "_MANIFEST").toPath)
    val tagsByPartition = OsmValidate.attemptTagsOfManifest(
      OsmPbf.manifestEntries(
        manifest.toArray(Array.empty[String]).toSeq, "_MANIFEST"))
    assert(tagsByPartition.values.forall(_.size == 1),
      s"multiple attempts published for one partition: $tagsByPartition")
  }

  test("pointer commit: a death during the _CURRENT PUT leaves the previous generation live") {
    HostileObjectStoreFs.reset()
    val (pbfA, nA) = synth("pc-a", 3)
    val (pbfB, nB) = synth("pc-b", 5)
    val out = freshOut("p3")
    OsmPbf.transcode(spark, PbfConfig(input = s"grafts3://$pbfA",
      output = out, commitMode = PbfConfig.CommitPointer))
    assert(OsmPbf.readCommitted(spark, out).count() === nA)

    HostileObjectStoreFs.failPointerPutOnce.set(true)
    val e = intercept[java.io.IOException] {
      OsmPbf.transcode(spark, PbfConfig(input = s"grafts3://$pbfB",
        output = out, commitMode = PbfConfig.CommitPointer))
    }
    assert(e.getMessage.contains("injected"), e.getMessage)
    // the pointer never flipped: generation A is fully live, no mix
    assert(OsmPbf.readCommitted(spark, out).count() === nA,
      "a failed pointer PUT must leave the previous generation untouched")

    // the re-run heals: the orphaned generation is GC'd at start, a new
    // one commits
    OsmPbf.transcode(spark, PbfConfig(input = s"grafts3://$pbfB",
      output = out, commitMode = PbfConfig.CommitPointer))
    assert(OsmPbf.readCommitted(spark, out).count() === nB)
    assert(HostileObjectStoreFs.renameCalls.get() === 0L)
  }

  test("pointer commit is indifferent to listing lag (manifest-driven, never listing-driven)") {
    HostileObjectStoreFs.reset()
    val (pbf, n) = synth("pd", 3)
    val out = freshOut("p4")
    HostileObjectStoreFs.listingLagMs = 3600 * 1000L // hide everything young
    try {
      OsmPbf.transcode(spark, PbfConfig(input = s"grafts3://$pbf",
        output = out, commitMode = PbfConfig.CommitPointer))
      assert(OsmPbf.readCommitted(spark, out).count() === n,
        "the pointer commit consulted a (laggy) listing somewhere")
    } finally HostileObjectStoreFs.listingLagMs = 0L
  }

  test("rename commit on an object store: correct when renames complete; a mid-swap death " +
      "can MIX generations at the root but never behind the _SUCCESS gate; re-run heals") {
    HostileObjectStoreFs.reset()
    // fileTargetMb keeps one file per (task, type); blocks=1 → 1 task →
    // exactly one file per type, so the injected copy-death lands at a
    // KNOWN point of the three-dir swap
    val (pbfA, nA) = synth("ra", 1)
    val (pbfB, nB) = synth("rb", 2) // different content AND count than A
    val out = freshOut("r1")
    OsmPbf.transcode(spark, PbfConfig(input = s"grafts3://$pbfA", output = out))
    assert(HostileObjectStoreFs.renameCalls.get() > 0L,
      "the rename protocol renames; that is exactly its store requirement")
    assert(OsmPbf.readCommitted(spark, out).count() === nA)
    val nodesA = spark.read.parquet(out).filter(col("type") === "node")
      .agg(org.apache.spark.sql.functions.sum(col("id"))).head().getLong(0)

    // run B dies mid-swap: publish copies 3 files (one per type), the
    // node-dir swap copies 1 more; cap after that 4th copy → the death
    // lands while swapping type=way. Live root at that instant: node =
    // generation B, way = deleted, relation = generation A. `_SUCCESS`
    // was deleted before the first swap, so the gated reader refuses the
    // whole window.
    val base = HostileObjectStoreFs.copiedFiles.get()
    HostileObjectStoreFs.failAfterFileCopies = base + 4
    val e = intercept[java.io.IOException] {
      OsmPbf.transcode(spark, PbfConfig(input = s"grafts3://$pbfB", output = out))
    }
    HostileObjectStoreFs.failAfterFileCopies = -1L
    assert(e.getMessage.contains("injected") || e.getMessage.contains("rename"),
      e.getMessage)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val outPath = fs.makeQualified(new org.apache.hadoop.fs.Path(out))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(outPath, "_SUCCESS")),
      "_SUCCESS must be absent across the whole mid-swap window")
    val gated = intercept[IllegalArgumentException] {
      OsmPbf.readCommitted(spark, out)
    }
    assert(gated.getMessage.contains("refusing an ungated read"), gated.getMessage)
    // the documented hazard, demonstrated: an UNGATED root read mixes
    // generations (node is already B while relation is still A)
    val mixed = spark.read.parquet(out)
    val nodesMixed = mixed.filter(col("type") === "node")
      .agg(org.apache.spark.sql.functions.sum(col("id"))).head().getLong(0)
    assert(nodesMixed !== nodesA, "expected the node dir to carry generation B")
    assert(mixed.filter(col("type") === "way").count() === 0L,
      "expected the way dir to be mid-swap (deleted)")

    // recovery: a clean re-run republishes everything and restores the gate
    OsmPbf.transcode(spark, PbfConfig(input = s"grafts3://$pbfB", output = out))
    assert(OsmPbf.readCommitted(spark, out).count() === nB)
    assert(fs.exists(new org.apache.hadoop.fs.Path(outPath, "_SUCCESS")))
  }

  test("mode switch on one output path: each commit retires the other protocol's gate") {
    HostileObjectStoreFs.reset()
    val (pbf, n) = synth("ms", 3)
    val out = freshOut("m1")
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val outPath = fs.makeQualified(new org.apache.hadoop.fs.Path(out))
    OsmPbf.transcode(spark, PbfConfig(input = s"grafts3://$pbf", output = out,
      commitMode = PbfConfig.CommitPointer))
    assert(OsmPbf.currentGenToken(fs, outPath).nonEmpty)
    // re-run the SAME output with the default rename commit (an operator
    // dropping --commit-mode): the root becomes the committed truth, so
    // the stale pointer must not keep readCommitted on the old
    // generation. The retired generation DIR deliberately survives (the
    // protocol's reader grace window — GC happens at the NEXT run's
    // start, either mode), invisible to root reads via its _ prefix.
    OsmPbf.transcode(spark, PbfConfig(input = s"grafts3://$pbf", output = out))
    assert(OsmPbf.currentGenToken(fs, outPath).isEmpty,
      "rename commit left a stale _CURRENT pointer behind")
    assert(Option(fs.globStatus(new org.apache.hadoop.fs.Path(outPath, "_gen-*")))
      .getOrElse(Array.empty).exists(_.isDirectory),
      "the retired generation should survive the commit for reader grace")
    assert(OsmPbf.readCommitted(spark, out).count() === n)
    // and the reverse switch: a pointer re-run supersedes the root
    // type= dirs, so BOTH root gates must be retired — the _SUCCESS
    // marker (committer-gated readers refuse instead of reading stale)
    // and the dirs themselves (a fully ungated root read cannot keep
    // serving the old rows); and this run's start GC reclaims the
    // generation the rename commit retired.
    OsmPbf.transcode(spark, PbfConfig(input = s"grafts3://$pbf", output = out,
      commitMode = PbfConfig.CommitPointer))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(outPath, "_SUCCESS")),
      "pointer commit left the superseded root's _SUCCESS marker live")
    assert(!Option(fs.globStatus(new org.apache.hadoop.fs.Path(outPath, "type=*")))
      .getOrElse(Array.empty).exists(_.isDirectory),
      "pointer commit left the superseded root type= dirs readable")
    val gens = Option(fs.globStatus(new org.apache.hadoop.fs.Path(outPath, "_gen-*")))
      .getOrElse(Array.empty).filter(_.isDirectory).map(_.getPath.getName).toSet
    assert(gens === Set(OsmPbf.currentGenToken(fs, outPath).get),
      s"start GC should leave exactly the live generation, got $gens")
    assert(OsmPbf.readCommitted(spark, out).count() === n)
  }

  test("a pointer re-run dying at the _CURRENT PUT leaves the rename-committed previous generation FULLY live") {
    HostileObjectStoreFs.reset()
    val (pbf, n) = synth("sw", 3)
    val out = freshOut("m2")
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val outPath = fs.makeQualified(new org.apache.hadoop.fs.Path(out))
    OsmPbf.transcode(spark, PbfConfig(input = s"grafts3://$pbf", output = out))
    // the protocol's crash guarantee across the MODE SWITCH: retirement
    // of the rename root happens only after the flip, so a commit dying
    // AT the pointer PUT must leave the old generation intact — marker,
    // dirs, and gated read
    HostileObjectStoreFs.failPointerPutOnce.set(true)
    intercept[Exception] {
      OsmPbf.transcode(spark, PbfConfig(input = s"grafts3://$pbf", output = out,
        commitMode = PbfConfig.CommitPointer))
    }
    assert(fs.exists(new org.apache.hadoop.fs.Path(outPath, "_SUCCESS")),
      "the failed pointer commit destroyed the previous generation's marker")
    assert(Option(fs.globStatus(new org.apache.hadoop.fs.Path(outPath, "type=*")))
      .getOrElse(Array.empty).count(_.isDirectory) === 3,
      "the failed pointer commit destroyed previous-generation root dirs")
    assert(OsmPbf.readCommitted(spark, out).count() === n)
  }

  test("a committed EMPTY output is readable through readCommitted in both modes") {
    HostileObjectStoreFs.reset()
    // header-only PBF: zero data blobs commit zero files — committed
    // means readable, so the gated reader must return an empty frame
    // with the engine schema, not crash on parquet schema inference
    val p = s"$scratch/empty.osm.pbf"
    PbfWriter.synthesize(p, blocks = 0, nodesPerBlock = 0)
    val outP = freshOut("e1")
    val counts = OsmPbf.transcode(spark, PbfConfig(input = s"grafts3://$p",
      output = outP, commitMode = PbfConfig.CommitPointer))
    assert(counts.values.sum === 0L)
    val backP = OsmPbf.readCommitted(spark, outP)
    assert(backP.count() === 0L)
    assert(backP.schema.fieldNames.toSeq.contains("type"))
    val outR = freshOut("e2")
    OsmPbf.transcode(spark, PbfConfig(input = s"grafts3://$p", output = outR))
    assert(OsmPbf.readCommitted(spark, outR).count() === 0L)
  }
}
