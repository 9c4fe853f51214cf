package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** st17's versioned-snapshot MERGE protocol (`EventStreams.applyChangeset`
  * / `latestVersion`): commit-marker idempotence keyed on batchId alone,
  * torn-write recovery from the prior version, strictly-below version
  * derivation, and maintain ≡ recompute over an applied sequence. The
  * gate pins the streamed loop end-to-end (including a hostile-payload
  * retry); this pins the protocol arms a green gate can't distinguish.
  */
class CdcApplySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("cdc-apply-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def batchDf(rows: Seq[(Long, Double)]) = {
    val sp = spark; import sp.implicits._
    rows.toDF("user_id", "value")
  }

  private def readLatest(target: String) =
    spark.read.parquet(EventStreams.latestVersion(target).get)
      .orderBy(col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("applied sequence equals recompute; committed batch skips on batchId alone") {
    val target = java.nio.file.Files.createTempDirectory("cdc").toString
    EventStreams.applyChangeset(batchDf(Seq((1L, 1.00), (2L, 2.50))), 0L, target)
    EventStreams.applyChangeset(batchDf(Seq((1L, 0.49), (3L, 10.0))), 1L, target)
    val settled = readLatest(target)
    // user 1: 2 events, 100+49 cents; user 2: 1, 250; user 3: 1, 1000
    assert(settled === Seq((1L, 2L, 149L), (2L, 1L, 250L), (3L, 1L, 1000L)))
    // hostile replay of a committed batch: must be a no-op whatever the payload
    EventStreams.applyChangeset(batchDf(Seq((9L, 999.0))), 1L, target)
    assert(readLatest(target) === settled)
  }

  test("torn write (no _SUCCESS) is rewritten from the prior version") {
    val target = java.nio.file.Files.createTempDirectory("cdc").toString
    EventStreams.applyChangeset(batchDf(Seq((1L, 1.00))), 0L, target)
    EventStreams.applyChangeset(batchDf(Seq((1L, 2.00))), 1L, target)
    val settled = readLatest(target)
    // simulate a crash after data files landed but before the commit marker
    val v1 = new java.io.File(target, "v1")
    assert(new java.io.File(v1, "_SUCCESS").delete())
    assert(EventStreams.latestVersion(target).get.endsWith("v0"),
      "an uncommitted version must be invisible")
    EventStreams.applyChangeset(batchDf(Seq((1L, 2.00))), 1L, target)
    assert(readLatest(target) === settled)
  }

  test("version derivation is strictly-below: a later id never reads itself") {
    val target = java.nio.file.Files.createTempDirectory("cdc").toString
    EventStreams.applyChangeset(batchDf(Seq((1L, 1.00))), 3L, target) // sparse id
    assert(EventStreams.latestVersion(target, below = 3L).isEmpty)
    assert(EventStreams.latestVersion(target, below = 4L).get.endsWith("v3"))
    assert(readLatest(target) === Seq((1L, 1L, 100L)))
  }

  // --- q38b-composed apply: the O(target)-regime layout ---

  private def planChildren(n: org.apache.spark.sql.execution.SparkPlan):
      Seq[org.apache.spark.sql.execution.SparkPlan] = n match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      Seq(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
    case other => other.children
  }

  private def collectNodes(n: org.apache.spark.sql.execution.SparkPlan):
      Seq[org.apache.spark.sql.execution.SparkPlan] =
    n +: planChildren(n).flatMap(collectNodes)

  test("bucketed apply: maintain equals plain apply; only the changeset side shuffles") {
    val plainT = java.nio.file.Files.createTempDirectory("cdcplain").toString
    val bktT = java.nio.file.Files.createTempDirectory("cdcbkt").toString
    val prefix = "graft_cdcspec_bkt"
    val b0 = batchDf((1L to 300L).map(i => (i, (i % 17) / 4.0)))
    val b1 = batchDf(Seq((5L, 1.25), (301L, 2.0), (7L, 0.75)))
    EventStreams.applyChangeset(b0, 0L, plainT)
    EventStreams.applyChangeset(b1, 1L, plainT)
    EventStreams.applyChangesetBucketed(b0, 0L, bktT, prefix)
    EventStreams.applyChangesetBucketed(b1, 1L, bktT, prefix)
    assert(readLatest(bktT) === readLatest(plainT),
      "the layout must never change the answer")
    // the _SUCCESS protocol carries over: hostile replay is a no-op
    EventStreams.applyChangesetBucketed(batchDf(Seq((1L, 999.0))), 1L, bktT, prefix)
    assert(readLatest(bktT) === readLatest(plainT))
    // the NEXT apply's merge reads the prior version as a bucketed scan:
    // zero Exchange above the target side, the delta side shuffles to it
    val chg = batchDf(Seq((9L, 1.0))).groupBy(col("user_id"))
      .agg(count(lit(1)).as("dn"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("dc"))
    val merged = EventStreams.mergedSnapshot(
      spark.table(s"${prefix}_v1").hint("merge"), chg)
    merged.collect() // finalize AQE
    val plan = merged.queryExecution.executedPlan
    val planStr = plan.toString.split("== Initial Plan ==").head
    def isTargetScan(n: org.apache.spark.sql.execution.SparkPlan): Boolean = n match {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.bucketedScan && f.tableIdentifier.exists(_.table.startsWith(prefix))
      case _ => false
    }
    val smj = collectNodes(plan).collectFirst {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
          if j.joinType.toString == "FullOuter" => j
    }.getOrElse(fail(s"expected full-outer SMJ:\n$planStr"))
    val (targetSide, chgSide) =
      Seq(smj.left, smj.right).map(collectNodes).partition(_.exists(isTargetScan)) match {
        case (Seq(t), Seq(c)) => (t, c)
        case other => fail(s"expected the bucketed scan on exactly one side: $other")
      }
    def shuffles(ns: Seq[org.apache.spark.sql.execution.SparkPlan]) =
      ns.count(_.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
    assert(shuffles(targetSide) === 0,
      s"no Exchange may sit between the merge join and the bucketed snapshot scan:\n$planStr")
    assert(shuffles(chgSide) >= 1,
      s"the changeset side is the one that shuffles to the bucket layout:\n$planStr")
  }

  test("bucketed apply recovers after catalog loss: re-registers from the committed dir") {
    val target = java.nio.file.Files.createTempDirectory("cdcrec").toString
    val prefix = "graft_cdcspec_rec"
    EventStreams.applyChangesetBucketed(
      batchDf(Seq((1L, 1.00), (2L, 2.50))), 0L, target, prefix)
    EventStreams.applyChangesetBucketed(
      batchDf(Seq((1L, 0.49))), 1L, target, prefix)
    // simulate a fresh JVM: the session-scoped catalog entries are gone,
    // only the committed dirs + markers remain
    spark.sql(s"DROP TABLE IF EXISTS ${prefix}_v0")
    spark.sql(s"DROP TABLE IF EXISTS ${prefix}_v1")
    EventStreams.applyChangesetBucketed(
      batchDf(Seq((3L, 10.0))), 2L, target, prefix)
    assert(readLatest(target) ===
      Seq((1L, 2L, 149L), (2L, 1L, 250L), (3L, 1L, 1000L)))
    // and the recovered prior really was read as a BUCKETED scan: the
    // re-registered v1 feeds a merge with zero target-side Exchange
    spark.sql(s"DROP TABLE IF EXISTS ${prefix}_v1")
    spark.sql(s"""CREATE TABLE ${prefix}_v1 (user_id BIGINT, n_events BIGINT,
      cents BIGINT) USING PARQUET CLUSTERED BY (user_id)
      SORTED BY (user_id) INTO 8 BUCKETS LOCATION '$target/v1'""")
    val chg = batchDf(Seq((9L, 1.0))).groupBy(col("user_id"))
      .agg(count(lit(1)).as("dn"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("dc"))
    val merged = EventStreams.mergedSnapshot(
      spark.table(s"${prefix}_v1").hint("merge"), chg)
    merged.collect()
    val nodes = collectNodes(merged.queryExecution.executedPlan)
    val bucketedScan = nodes.exists {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f.bucketedScan
      case _ => false
    }
    assert(bucketedScan, "the re-registered external table must scan bucketed")
  }

  test("bucketed recovery validates the on-disk layout instead of trusting the call") {
    val b0 = batchDf(Seq((1L, 1.00), (2L, 2.50)))
    val b1 = batchDf(Seq((1L, 0.49)))
    val settled = Seq((1L, 2L, 149L), (2L, 1L, 250L))

    // (a) recovery with a DIFFERENT bucket count than the files carry
    // must fail loudly — a smaller on-disk count would keep every file's
    // bucket id valid and silently merge misaligned buckets
    val tA = java.nio.file.Files.createTempDirectory("cdclayoutA").toString
    EventStreams.applyChangesetBucketed(b0, 0L, tA, "graft_cdcspec_layA", buckets = 4)
    spark.sql("DROP TABLE IF EXISTS graft_cdcspec_layA_v0")
    val exA = intercept[IllegalStateException] {
      EventStreams.applyChangesetBucketed(b1, 1L, tA, "graft_cdcspec_layA", buckets = 8)
    }
    assert(exA.getMessage.contains("4 buckets") && exA.getMessage.contains("8"))

    // (b) a stale same-named catalog entry pointing at ANOTHER dir must
    // fail loudly, not feed the merge someone else's data
    val other = java.nio.file.Files.createTempDirectory("cdclayoutB-other").toString
    spark.sql(s"""CREATE TABLE graft_cdcspec_layA_v0 (user_id BIGINT,
      n_events BIGINT, cents BIGINT) USING PARQUET CLUSTERED BY (user_id)
      SORTED BY (user_id) INTO 4 BUCKETS LOCATION '$other'""")
    val exB = intercept[IllegalStateException] {
      EventStreams.applyChangesetBucketed(b1, 1L, tA, "graft_cdcspec_layA", buckets = 4)
    }
    assert(exB.getMessage.contains("stale catalog entry"))
    spark.sql("DROP TABLE IF EXISTS graft_cdcspec_layA_v0")

    // (c) a forged marker over PLAIN (un-bucketed) files must fail
    // loudly: the files carry no bucket-id suffix to align to
    val tC = java.nio.file.Files.createTempDirectory("cdclayoutC").toString
    EventStreams.applyChangeset(b0, 0L, tC)
    val fsC = new org.apache.hadoop.fs.Path(tC)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val outC = fsC.create(new org.apache.hadoop.fs.Path(s"$tC/v0/_BUCKETS"), true)
    outC.write("4".getBytes(java.nio.charset.StandardCharsets.UTF_8)); outC.close()
    val exC = intercept[IllegalStateException] {
      EventStreams.applyChangesetBucketed(b1, 1L, tC, "graft_cdcspec_layC", buckets = 4)
    }
    assert(exC.getMessage.contains("no bucket-id"))

    // (d) a committed dir MISSING the marker (torn metadata / legacy)
    // degrades to a plain scan — correct answer, never a misalignment
    val tD = java.nio.file.Files.createTempDirectory("cdclayoutD").toString
    EventStreams.applyChangesetBucketed(b0, 0L, tD, "graft_cdcspec_layD", buckets = 4)
    spark.sql("DROP TABLE IF EXISTS graft_cdcspec_layD_v0")
    assert(new java.io.File(s"$tD/v0", "_BUCKETS").delete())
    EventStreams.applyChangesetBucketed(b1, 1L, tD, "graft_cdcspec_layD", buckets = 4)
    assert(readLatest(tD) === settled)

    // and the happy recovery still registers from the persisted marker,
    // regardless of what earlier sessions used
    val tE = java.nio.file.Files.createTempDirectory("cdclayoutE").toString
    EventStreams.applyChangesetBucketed(b0, 0L, tE, "graft_cdcspec_layE", buckets = 4)
    spark.sql("DROP TABLE IF EXISTS graft_cdcspec_layE_v0")
    EventStreams.applyChangesetBucketed(b1, 1L, tE, "graft_cdcspec_layE", buckets = 4)
    assert(readLatest(tE) === settled)
  }

  test("pruned apply: equals the full apply, rewrites only touched buckets") {
    val b0 = batchDf((1L to 200L).map(i => (i, (i % 13) / 4.0)))
    // a deliberately CLUSTERED changeset: three users — at most three
    // touched buckets of the 8
    val b1 = batchDf(Seq((5L, 1.25), (5L, 0.50), (7L, 0.75)))
    val b2 = batchDf(Seq((201L, 2.00))) // a NEW user (insert path)

    val fullT = java.nio.file.Files.createTempDirectory("cdcpfull").toString
    val prunedT = java.nio.file.Files.createTempDirectory("cdcppruned").toString
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
      EventStreams.applyChangesetBucketed(b, i.toLong, fullT, "graft_cdcspec_pf")
      EventStreams.applyChangesetBucketedPruned(b, i.toLong, prunedT, "graft_cdcspec_pp")
    }
    assert(readLatest(prunedT) === readLatest(fullT),
      "pruning must never change the answer")

    // the pruned version really did copy-forward: untouched bucket files
    // in v1 are byte-identical (same name, same length) to v0's
    val fs = new org.apache.hadoop.fs.Path(prunedT)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files(v: String) = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$prunedT/$v")).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .map(st => st.getPath.getName -> st.getLen).toMap
    val v0f = files("v0"); val v1f = files("v1")
    assert(v0f.size <= 8 && v1f.size <= 8,
      "alignment: at most one file per bucket per version (r13 fix — " +
        "an unaligned write emits tasks × buckets files)")
    val carried = v0f.keySet.intersect(v1f.keySet)
    assert(carried.nonEmpty, "a 3-user changeset must leave buckets untouched")
    assert(carried.forall(n => v0f(n) == v1f(n)),
      "carried-forward files must be the prior's bytes, not a rewrite")
    assert(v1f.size >= v0f.size - 3 && (v1f.keySet -- v0f.keySet).nonEmpty,
      "touched buckets get NEW files; the rest are the carried names")

    // recovery + retention still hold on the hand-assembled dirs:
    // marker present, hostile replay skips, prune reaps
    assert(EventStreams.readBucketCount(fs,
      new org.apache.hadoop.fs.Path(s"$prunedT/v2")) === Some(8))
    val settled = readLatest(prunedT)
    EventStreams.applyChangesetBucketedPruned(
      batchDf(Seq((1L, 999.0))), 2L, prunedT, "graft_cdcspec_pp")
    assert(readLatest(prunedT) === settled)
    assert(EventStreams.pruneVersions(spark, prunedT, keepLast = 2,
      tablePrefix = Some("graft_cdcspec_pp")) === Seq("v0"))
    assert(readLatest(prunedT) === settled)

    // fallback legs: no prior (first batch) and an UNMARKED prior both
    // route through the full apply — correct answer, no pruning
    val tF = java.nio.file.Files.createTempDirectory("cdcpfall").toString
    EventStreams.applyChangesetBucketedPruned(b0, 0L, tF, "graft_cdcspec_pfb")
    assert(new java.io.File(s"$tF/v0", "_BUCKETS").delete())
    spark.sql("DROP TABLE IF EXISTS graft_cdcspec_pfb_v0")
    EventStreams.applyChangesetBucketedPruned(b1, 1L, tF, "graft_cdcspec_pfb")
    assert(readLatest(tF) === readLatest(fullT).filterNot(_._1 == 201L))
  }

  test("stale pruned-apply staging is reaped: fallback branch and pruneVersions") {
    val fs = new org.apache.hadoop.fs.Path("/")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mkStage(target: String, id: Long, prefix: String): Unit = {
      // simulate a crash between the stage saveAsTable and its cleanup:
      // the dir and the catalog entry both survive the dead JVM
      val d = new org.apache.hadoop.fs.Path(s"$target/.stage_v$id")
      fs.mkdirs(d)
      spark.sql(s"""CREATE TABLE ${prefix}_stage_v$id (user_id BIGINT)
        USING PARQUET LOCATION '$d'""")
    }

    // (a) the retry lands on the FALLBACK branch (prior unmarked): the
    // full apply knows nothing about staging, so the pruned entry point
    // reaps its own batch's leftovers before delegating
    val tA = java.nio.file.Files.createTempDirectory("cdcreapA").toString
    EventStreams.applyChangesetBucketedPruned(
      batchDf(Seq((1L, 1.00))), 0L, tA, "graft_cdcspec_reapA")
    assert(new java.io.File(s"$tA/v0", "_BUCKETS").delete())
    spark.sql("DROP TABLE IF EXISTS graft_cdcspec_reapA_v0")
    mkStage(tA, 1L, "graft_cdcspec_reapA")
    EventStreams.applyChangesetBucketedPruned(
      batchDf(Seq((1L, 0.50))), 1L, tA, "graft_cdcspec_reapA")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$tA/.stage_v1")),
      "fallback must reap its own stale stage dir")
    assert(!spark.catalog.tableExists("graft_cdcspec_reapA_stage_v1"),
      "fallback must drop its own stale stage catalog entry")
    assert(readLatest(tA) === Seq((1L, 2L, 150L)))

    // (b) an ABANDONED stage (batch never retried down the pruned path):
    // pruneVersions reaps stage ids <= latest committed, keeps in-flight
    // ids above it
    val tB = java.nio.file.Files.createTempDirectory("cdcreapB").toString
    EventStreams.applyChangesetBucketedPruned(
      batchDf(Seq((1L, 1.00))), 0L, tB, "graft_cdcspec_reapB")
    EventStreams.applyChangesetBucketedPruned(
      batchDf(Seq((2L, 2.00))), 1L, tB, "graft_cdcspec_reapB")
    mkStage(tB, 1L, "graft_cdcspec_reapB") // stale: v1 is committed
    mkStage(tB, 2L, "graft_cdcspec_reapB") // in-flight: above latest
    EventStreams.pruneVersions(spark, tB, keepLast = 2,
      tablePrefix = Some("graft_cdcspec_reapB"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$tB/.stage_v1")) &&
      !spark.catalog.tableExists("graft_cdcspec_reapB_stage_v1"),
      "stage at or below latest committed is stale and must be reaped")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$tB/.stage_v2")) &&
      spark.catalog.tableExists("graft_cdcspec_reapB_stage_v2"),
      "stage above latest committed is in-flight and must be kept")
    spark.sql("DROP TABLE IF EXISTS graft_cdcspec_reapB_stage_v2")
  }

  test("committed-skip heals a missing _BUCKETS marker from the data, exactly") {
    val b0 = batchDf(Seq((1L, 1.00), (2L, 2.50)))
    val b1 = batchDf(Seq((1L, 0.49)))
    def markerOf(target: String) = {
      val p = new org.apache.hadoop.fs.Path(s"$target/v0")
      EventStreams.readBucketCount(
        p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
    }

    // (a) crash window between the parquet commit and writeBucketCount:
    // the replayed batch's committed-skip path heals the marker (payload
    // irrelevant — it must not re-apply), restoring the Exchange-free
    // scan for every later apply instead of degrading permanently
    val tA = java.nio.file.Files.createTempDirectory("cdchealA").toString
    EventStreams.applyChangesetBucketed(b0, 0L, tA, "graft_cdcspec_healA", buckets = 4)
    assert(new java.io.File(s"$tA/v0", "_BUCKETS").delete())
    EventStreams.applyChangesetBucketed(
      batchDf(Seq((9L, 999.0))), 0L, tA, "graft_cdcspec_healA", buckets = 4)
    assert(markerOf(tA) === Some(4), "the replayed batch must heal the marker")
    // and the healed version recovers as a real bucketed prior
    spark.sql("DROP TABLE IF EXISTS graft_cdcspec_healA_v0")
    EventStreams.applyChangesetBucketed(b1, 1L, tA, "graft_cdcspec_healA", buckets = 4)
    assert(readLatest(tA) === Seq((1L, 2L, 149L), (2L, 1L, 250L)))

    // (b) heal must refuse a count the DATA disproves: files written
    // 4-way, replay declares 8 — pmod(hash, 8) disagrees with some
    // file's suffix (20 users make a coincidental full match impossible
    // in practice), so the dir stays unmarked and keeps the safe
    // plain-scan degrade rather than a misaligned registration
    val wide = batchDf((1L to 20L).map(i => (i, 1.00)))
    val tB = java.nio.file.Files.createTempDirectory("cdchealB").toString
    EventStreams.applyChangesetBucketed(wide, 0L, tB, "graft_cdcspec_healB", buckets = 4)
    assert(new java.io.File(s"$tB/v0", "_BUCKETS").delete())
    EventStreams.applyChangesetBucketed(wide, 0L, tB, "graft_cdcspec_healB", buckets = 8)
    assert(markerOf(tB).isEmpty, "a count the data disproves must not be healed")

    // (c) heal must refuse plain (un-suffixed) files outright — a plain
    // apply's committed dir replayed through the bucketed entry point
    val tC = java.nio.file.Files.createTempDirectory("cdchealC").toString
    EventStreams.applyChangeset(b0, 0L, tC)
    EventStreams.applyChangesetBucketed(b0, 0L, tC, "graft_cdcspec_healC", buckets = 4)
    assert(markerOf(tC).isEmpty, "plain files must never gain a bucket marker")
  }

  test("pruneVersions: retention keeps the read path, reaps torn dirs below latest") {
    val target = java.nio.file.Files.createTempDirectory("cdcprune").toString
    (0 to 3).foreach(i =>
      EventStreams.applyChangeset(batchDf(Seq((1L, 1.00), (i.toLong + 10, 2.0))),
        i.toLong, target))
    val settled = readLatest(target)
    // torn v1 (crash artifact superseded by committed v2/v3)
    assert(new java.io.File(s"$target/v1", "_SUCCESS").delete())
    val pruned = EventStreams.pruneVersions(spark, target, keepLast = 2)
    assert(pruned.sorted === Seq("v0", "v1"),
      "old committed + torn-below-latest go; the keepLast window stays")
    assert(EventStreams.latestVersion(target).get.endsWith("v3"))
    assert(readLatest(target) === settled, "the prune never changes the read path")
    // an in-flight (torn ABOVE latest committed) dir is never touched
    val inflight = new java.io.File(s"$target/v9"); inflight.mkdirs()
    assert(EventStreams.pruneVersions(spark, target, keepLast = 1) === Seq("v2"))
    assert(inflight.exists(), "a torn dir above the latest committed version is in-flight")
    // and the next apply still derives from the surviving latest
    EventStreams.applyChangeset(batchDf(Seq((1L, 1.00))), 4L, target)
    assert(readLatest(target).find(_._1 == 1L).get._2 === 5L)
  }
}
