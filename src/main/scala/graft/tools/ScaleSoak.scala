package graft.tools

import java.util.concurrent.atomic.AtomicLong

import graft.operators.DedupQueries
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 at-scale soak (the two measurement gaps VERDICT r7 carried):
  *
  *  1. **d11 posting-list skew** — the shared-passages inverted index over
  *     boilerplate-injected corpora at two scales: posting-size histogram,
  *     predicted pair space Σ C(|posting|, 2) vs actual, shuffle bytes,
  *     and the d12 posting-cap's effect. The uncapped pipeline is run
  *     where the prediction says it is feasible and PREDICTED-ONLY where
  *     it says it is not (that asymmetry is the finding).
  *  2. **streaming state depth** — ~10M events replayed through st07's
  *     sessionize (the deepest-state operator) in 8 event-time chunks
  *     under RocksDB, recording per-batch state rows, store memory, and
  *     latency.
  *
  * Emits SOAK_r08.json: {"d11": …, "streaming": …}.
  *
  * Usage: scripts/run.sh graft.tools.ScaleSoak [outJson] [d11Scales…]
  */
object ScaleSoak {
  def main(args: Array[String]): Unit = {
    val outJson = args.headOption.getOrElse("SOAK_r08.json")
    val scales = if (args.length > 1) args.drop(1).toSeq.map(_.toLong)
      else Seq(25000L, 100000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d11 = D11SoakPhase.runJson(spark, scales)
    println(s"d11 phase done")
    val streaming = StreamingSoakPhase.runJson(spark,
      nEvents = 10000000L, nUsers = 200000L, chunks = 8)
    println(s"streaming phase done")
    val json = s"""{"d11":$d11,"streaming":$streaming}"""
    val w = new java.io.PrintWriter(new java.io.File(outJson),
      java.nio.charset.StandardCharsets.UTF_8)
    try w.println(json) finally w.close()
    println(s"SOAK OK -> $outJson")
    spark.stop()
  }
}

/** d11/d12 skew phase: REAL pipeline stages ([[DedupQueries.passageIndex]]
  * / [[DedupQueries.passagePairs]]) over a corpus with three deliberate
  * posting regimes — boilerplate (every 20th doc opens with the same
  * 60-char header → 21 grams with posting N/20), true shared passages
  * (doc pairs share a ~110-char run → posting 2), and unique filler.
  * All text is xxhash64-derived (deterministic, no RNG state). */
object D11SoakPhase {

  /** Standalone dev entry: scripts/run.sh graft.tools.D11SoakPhase [n…] */
  def main(args: Array[String]): Unit = {
    val scales = if (args.nonEmpty) args.toSeq.map(_.toLong) else Seq(25000L, 100000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(runJson(spark, scales))
    spark.stop()
  }

  val BoilerEvery = 20 // 1-in-20 docs carry the boilerplate header

  def corpus(s: SparkSession, nDocs: Long): DataFrame = {
    val boiler = "STANDARD-LICENSE-HEADER sixty chars of identical boiler!-=-=" // 60
    require(boiler.length == 60)
    s.range(nDocs).select(
      col("id").as("doc_id"),
      concat(
        // boilerplate regime: identical 60-char open on every 20th doc;
        // the doc id directly after stops gram runs from extending
        when(pmod(col("id"), lit(BoilerEvery)) === 0, lit(boiler))
          .otherwise(concat(lit("open"), col("id"))),
        lit("|"), col("id"), lit("|"),
        // shared-passage regime: doc PAIRS (id div 2) share this run —
        // 16 tokens ≈ 110 chars → ~70 grams at posting size 2
        concat_ws(" ", transform(sequence(lit(0), lit(15)),
          j => concat(lit("s"), pmod(xxhash64(expr("id div 2"), j), lit(99999L))))),
        lit("|"), col("id"), lit("|"),
        // unique filler: 15 tokens keyed by (id, j)
        concat_ws(" ", transform(sequence(lit(0), lit(14)),
          j => concat(lit("u"), pmod(xxhash64(col("id"), j, lit(7L)), lit(999999L)))))
      ).as("text"))
  }

  final case class Phase(docs: Long, grams: Long, maxPosting: Long,
                         hist: Seq[(String, Long)], predUncapped: Long,
                         predCapped: Long, cappedPairs: Long,
                         cappedEmitted: Long, cappedShuffleMb: Long,
                         cappedSecs: Double,
                         uncappedRun: Option[(Long, Long, Double)],
                         drained: Boolean = true)

  def runScale(s: SparkSession, nDocs: Long): Phase = {
    val shuffleBytes = new AtomicLong(0)
    val listener = new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(ev.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    val cap = DedupQueries.DefaultPassageCap
    val docs = corpus(s, nDocs)
    // one index build shared by the stats and both pair runs
    val inv = DedupQueries.passageIndex(s, docs).localCheckpoint()
    // bigint posting size up front: C(p,2) in int arithmetic would
    // overflow past p ≈ 46k, and Row.getLong rejects boxed Ints
    val sizes = inv.select(size(col("ds")).cast("long").as("p"))
    // posting-size histogram in log2 buckets + exact pair-space sums
    val histRows = sizes.groupBy(
        expr("power(2, ceil(log2(p)))").cast("long").as("bucket_hi"))
      .agg(count(lit(1)).as("n")).orderBy(col("bucket_hi"))
      .collect().map(r => (s"<=${r.getLong(0)}", r.getLong(1))).toSeq
    val stats = sizes.agg(
      count(lit(1)).as("grams"), max(col("p")).as("mx"),
      sum(expr("p * (p - 1) div 2")).as("pred_uncapped"),
      sum(when(col("p") <= cap, expr("p * (p - 1) div 2")).otherwise(0L))
        .as("pred_capped")).head()
    // capped pipeline, timed with shuffle telemetry
    s.sparkContext.addSparkListener(listener)
    var drained = true
    val (cappedPairs, cappedEmitted, cappedSecs) = try {
      val t0 = System.nanoTime()
      val out = DedupQueries.passagePairs(inv, Some(cap))
        .agg(count(lit(1)), sum(col("n_shared"))).head()
      (out.getLong(0), out.getLong(1), (System.nanoTime() - t0) / 1e9)
    } finally {
      // drain the async bus before detaching or the final stages' shuffle
      // bytes are nondeterministically dropped (timed above, so untimed)
      drained = org.apache.spark.GraftListenerBus.drain(s.sparkContext)
      s.sparkContext.removeSparkListener(listener)
    }
    // uncapped pipeline ONLY where the prediction says the explode is
    // feasible on this box (the larger scale's hot grams would build
    // multi-hundred-MB pair arrays from single rows — the prediction IS
    // the result there, and the cap is the guard)
    val uncapped = if (stats.getLong(2) <= 50000000L) {
      val t0 = System.nanoTime()
      val out = DedupQueries.passagePairs(inv, None)
        .agg(count(lit(1)), sum(col("n_shared"))).head()
      Some((out.getLong(0), out.getLong(1), (System.nanoTime() - t0) / 1e9))
    } else None
    Phase(nDocs, stats.getLong(0), stats.getLong(1), histRows,
      stats.getLong(2), stats.getLong(3), cappedPairs, cappedEmitted,
      shuffleBytes.get() >> 20, cappedSecs, uncapped, drained)
  }

  def runJson(s: SparkSession, scales: Seq[Long]): String = {
    val rs = scales.map(runScale(s, _))
    val items = rs.map { r =>
      val histJson = r.hist.map { case (b, n) => s""""$b":$n""" }.mkString("{", ",", "}")
      val uncappedJson = r.uncappedRun.map { case (pairs, emitted, secs) =>
        s"""{"distinct_pairs":$pairs,"emitted_pairs":$emitted,"seconds":${f"$secs%.1f"}}"""
      }.getOrElse("\"skipped: predicted pair explode exceeds single-row feasibility; prediction stands as the measurement\"")
      s"""{"docs":${r.docs},"distinct_grams":${r.grams},"max_posting":${r.maxPosting},
         |"posting_hist":$histJson,
         |"predicted_pairs_uncapped":${r.predUncapped},
         |"predicted_pairs_capped":${r.predCapped},
         |"capped":{"cap":${DedupQueries.DefaultPassageCap},"distinct_pairs":${r.cappedPairs},
         |"emitted_pairs":${r.cappedEmitted},"shuffle_mb":${r.cappedShuffleMb},
         |"seconds":${f"${r.cappedSecs}%.1f"},"listener_drained":${r.drained}},
         |"uncapped":$uncappedJson}""".stripMargin.replace("\n", "")
    }.mkString("[", ",", "]")
    val growthDocs = rs.last.docs.toDouble / rs.head.docs
    val growthCapped = rs.last.cappedEmitted.toDouble / math.max(rs.head.cappedEmitted, 1)
    val growthUncapped = rs.last.predUncapped.toDouble / math.max(rs.head.predUncapped, 1)
    f"""{"scales":$items,"docs_growth":$growthDocs%.2f,
       |"capped_pairs_growth":$growthCapped%.2f,
       |"uncapped_predicted_growth":$growthUncapped%.2f,
       |"note":"capped pair space grows ~linearly with docs; the uncapped prediction grows ~quadratically because boilerplate postings scale with N — the d12 cap is the hot-tail guard"}""".stripMargin.replace("\n", "")
  }
}

/** Streaming state-depth phase: synthesize ~10M events (200k users, 20-min
  * event cadence with ±30-min xxhash jitter so sessions stochastically
  * split at the 30-min gap), replay through sessionize in 8 event-time
  * chunks under RocksDB via [[graft.streaming.StreamReplay.soakSessionize]],
  * and record per-batch state rows / store memory / latency + peak heap. */
object StreamingSoakPhase {

  /** Standalone dev entry: scripts/run.sh graft.tools.StreamingSoakPhase [nEvents] */
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(runJson(spark, n, nUsers = n / 50, chunks = 8))
    spark.stop()
  }

  def runJson(s: SparkSession, nEvents: Long, nUsers: Long, chunks: Int): String =
    runJsonWith(s, nEvents, nUsers, chunks, "sessionize",
      (sp, d, c) => graft.streaming.StreamReplay.soakSessionize(sp, d, c, Some("rocksdb")))

  /** Same corpus + telemetry, parameterized over the replay hook — the
    * transformWithState soak (SOAK_r09f) reuses everything but the
    * stateful operator under test. */
  def runJsonWith(s: SparkSession, nEvents: Long, nUsers: Long, chunks: Int,
      opLabel: String,
      run: (SparkSession, String, Int) =>
        (Long, Seq[org.apache.spark.sql.streaming.StreamingQueryProgress]),
      stateStoreLabel: String = "rocksdb"): String = {
    import scala.jdk.CollectionConverters._
    val dir = graft.Scratch.tempDir("streamsoak")
    try {
      val baseUs = 1700000000000000L // fixed epoch anchor (µs)
      val stepUs = 20L * 60 * 1000000 // 20-min cadence per user round
      val jitterUs = 30L * 60 * 1000000
      s.range(nEvents).select(
        col("id").as("event_id"),
        timestamp_micros(lit(baseUs) + expr(s"id div $nUsers") * lit(stepUs) +
          pmod(xxhash64(col("id")), lit(jitterUs))).as("ts"),
        pmod(col("id"), lit(nUsers)).as("user_id"),
        element_at(
          array(lit("view"), lit("click"), lit("purchase"), lit("error"), lit("signup")),
          (pmod(xxhash64(col("id"), lit(7L)), lit(5L)) + 1).cast("int")).as("event_type"),
        round(pmod(xxhash64(col("id"), lit(13L)), lit(10000L)) / 100.0, 2).as("value"))
        .write.parquet(s"$dir/events.parquet")
      val heapPools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getType == java.lang.management.MemoryType.HEAP)
      heapPools.foreach(_.resetPeakUsage())
      import graft.CpuStat.{ticks => cpuTicks, pct => cpuPct}
      val c0 = cpuTicks()
      val t0 = System.nanoTime()
      val (sessions, progress) = run(s, dir.toString, chunks)
      val secs = (System.nanoTime() - t0) / 1e9
      val (stealPct, sysPct) = cpuPct(c0, cpuTicks())
      val peakHeapMb = heapPools.map(_.getPeakUsage.getUsed).sum >> 20
      val batches = progress.filter(_.numInputRows > 0).map { p =>
        val so = Option(p.stateOperators).toSeq.flatten.headOption
        val mem = so.map(_.memoryUsedBytes).getOrElse(0L)
        val rows = so.map(_.numRowsTotal).getOrElse(0L)
        val custom = so.map(_.customMetrics.asScala.map { case (k, v) => k -> v.longValue }.toMap)
          .getOrElse(Map.empty)
        val sst = custom.getOrElse("rocksdbSstFileSize", 0L)
        s"""{"batch":${p.batchId},"input_rows":${p.numInputRows},
           |"batch_ms":${p.batchDuration},
           |"state_rows":$rows,"state_mem_mb":${mem >> 20},
           |"rocksdb_sst_mb":${sst >> 20}}""".stripMargin.replace("\n", "")
      }.mkString("[", ",", "]")
      s"""{"events":$nEvents,"users":$nUsers,"chunks":$chunks,"op":"$opLabel",
         |"state_store":"$stateStoreLabel","rows_emitted":$sessions,
         |"seconds":${f"$secs%.1f"},"run_steal_pct":$stealPct,"run_sys_pct":$sysPct,
         |"peak_heap_mb":$peakHeapMb,"batches":$batches}""".stripMargin.replace("\n", "")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}

/** transformWithState state-depth soak (SOAK_r09f): the st13 per-user
  * profile processor replayed over the same 10M-event / 200k-user corpus
  * as the r8 sessionize soak — per batch, every active user's ValueState
  * folds and its event-time timer is deleted + re-registered, so this
  * measures the TWS timer registry under churn as well as value state at
  * depth. Usage: scripts/run.sh graft.tools.TwsSoak [outJson] [nEvents]
  */
object TwsSoak {
  private val ops: Map[String, (SparkSession, String, Int) =>
      (Long, Seq[org.apache.spark.sql.streaming.StreamingQueryProgress])] = Map(
    "profile" -> ((sp, d, c) => graft.streaming.StreamReplay.soakProfile(sp, d, c)),
    // r10: the ListState (last-3 merge) and MapState (type histogram)
    // processors at the same 10M-event depth — all three TWS state
    // shapes soaked under RocksDB churn
    "recent" -> ((sp, d, c) => graft.streaming.StreamReplay.soakRecent(sp, d, c)),
    "histogram" -> ((sp, d, c) => graft.streaming.StreamReplay.soakHistogram(sp, d, c)),
    // r10: the st17 CDC apply loop — NOT a state-store path: each batch
    // rewrites the parquet snapshot target (state_rows/sst columns read
    // 0 — the state lives in the table, not the store). Regime note,
    // per the SOAK_r10g measurement: with batch changesets (1.25M
    // events) much larger than the user-keyed target (200k rows) the
    // apply is CHANGESET-dominated and per-batch wall is flat (~1s);
    // the O(target)-rewrite growth regime is the opposite shape — small
    // changesets against a big table — which is exactly where q38b's
    // bucketed layout / table-format compaction takes over
    "cdc" -> ((sp, d, c) => graft.streaming.StreamReplay.soakCdcApply(sp, d, c)))

  /** Usage: scripts/run.sh graft.tools.TwsSoak [outJson] [nEvents] [op…]
    * (ops from {profile, recent, histogram, cdc}; default profile — the
    * SOAK_r09f shape; cdc is the st17 snapshot-apply loop that produced
    * SOAK_r10g). */
  def main(args: Array[String]): Unit = {
    val outJson = args.headOption.getOrElse("SOAK_r09f.json")
    // strictly positional — [outJson] [nEvents] [op…] — so a misplaced
    // numeric (`TwsSoak out profile 5000000`) is a LOUD usage error, not
    // a silently-dropped size that runs a multi-hour soak at 2× depth
    val rest = args.drop(1).toSeq
    val n = rest.headOption.filter(_.forall(_.isDigit)) match {
      case Some(d) => d.toLongOption.filter(_ > 0).getOrElse(sys.error(
        s"nEvents must be a positive long, got '$d'"))
      case None => 10000000L
    }
    val opArgs = if (rest.headOption.exists(_.forall(_.isDigit))) rest.tail else rest
    opArgs.filterNot(ops.contains).foreach(bad => sys.error(
      s"unknown op '$bad' (nEvents goes BEFORE the ops); " +
        s"usage: TwsSoak [outJson] [nEvents] [op…], ops: ${ops.keys.mkString(", ")}"))
    val selected = if (opArgs.nonEmpty) opArgs else Seq("profile")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val parts = selected.map { op =>
      // cdc is NOT a transformWithState path: the state lives in the
      // parquet snapshot table, not a store — label it what it is
      val (label, store) =
        if (op == "cdc") ("foreachBatch_cdc_apply", "parquet_table")
        else (s"transformWithState_$op", "rocksdb")
      val json = StreamingSoakPhase.runJsonWith(spark, n, nUsers = n / 50, chunks = 8,
        opLabel = label, ops(op), stateStoreLabel = store)
      println(s"$op phase done")
      s""""streaming_${if (op == "cdc") "cdc" else s"tws_$op"}":$json"""
    }
    val w = new java.io.PrintWriter(new java.io.File(outJson),
      java.nio.charset.StandardCharsets.UTF_8)
    try w.println(parts.mkString("{", ",", "}")) finally w.close()
    println(s"TWS SOAK OK -> $outJson")
    spark.stop()
  }
}
