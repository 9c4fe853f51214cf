package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** STREAMING NEAR-DUP INGEST GATE — the online twin of d02's MinHash+LSH
  * blocking (`DedupQueries.lshBands`, `DedupQueries.scala`): as documents
  * stream in, each is flagged near-dup iff some LOWER-doc_id document
  * anywhere in the corpus so far shares one of its four LSH band values.
  * This is the admission filter a crawl-ingest pipeline runs BEFORE
  * paying storage/compute for a document — the batch dedup family
  * (d01–d17) decides retroactively; this decides at the door, keeping
  * per-band minimum owners as keyed streaming state.
  *
  * Two deliberate design points:
  *
  *  - **The signature is computed STATELESSLY per row** (higher-order
  *    functions over the in-row shingle array: `array_min(transform(...))`
  *    per hash, then the four band md5s), not via d02's explode +
  *    groupBy(doc_id) aggregation — in a stream that aggregation would be
  *    a second stateful operator; per-row it is ordinary codegen'd
  *    expression work, and `min` over the same md5 set is the SAME number
  *    regardless of whether it is folded by an aggregate or an array
  *    function. The signature definition (16 md5 min-hashes over distinct
  *    3-gram token shingles, salted `"i:"`, 4 bands of 4 joined by '|')
  *    matches d02 EXACTLY, so the oracle reuses d02's CTEs.
  *  - **The dup rule is min-owner, not first-seen**: a doc is flagged iff
  *    `min(all doc_ids sharing the band so far) < doc_id`. Arrival order
  *    within a micro-batch is nondeterministic; the min rule makes the
  *    flags a pure function of the SET of documents delivered up to and
  *    including the doc's own batch — and with the replay's doc_id-ranged
  *    chunking (lower ids are never delivered later), a pure function of
  *    the corpus, equal to the batch rule. That is what makes the stream
  *    oracle-checkable AND backfill ≡ live.
  *
  * At 100 TB: state is one long per (band, value) bucket — the band-value
  * key space is the d02 bucket space, key-uniform by construction of the
  * md5; the d13 lesson (degenerate hot buckets) applies to the candidate
  * EMISSION side only, and here every doc emits exactly 4 band rows
  * regardless of bucket occupancy, so there is no quadratic tail at all:
  * the stream does O(1) state work per (doc, band). RocksDB moves the
  * bucket-owner map off-heap (`graft.stateStore=rocksdb`, the st-family
  * override).
  */
object DocStreams {

  final case class DocBand(doc_id: Long, band: Int, h: String)
  final case class BandDup(doc_id: Long, band: Int, dup: Long)

  /** A document carries a signature iff it has >= 3 tokens (one 3-gram
    * shingle) — THE eligibility rule, shared by [[bandRows]]'s filter and
    * [[expectedBandRows]]'s count so the replay's settlement target can
    * never drift from the emission rule. */
  private def hasSignature: Column = size(split(col("text"), " ")) >= 3

  /** The four (band, h) LSH rows per document, as stateless per-row
    * expressions — usable identically on a batch or streaming frame.
    * Signature constants (16 hashes, 3-gram shingles, 4×4 bands) are
    * d02's; see `DedupQueries.lshBands`. Docs under 3 tokens emit no
    * rows (they have no shingle, hence no signature — same as d02). */
  def bandRows(docs: DataFrame): Dataset[DocBand] = {
    import docs.sparkSession.implicits._
    val tk = split(col("text"), " ")
    val sh = array_distinct(transform(
      sequence(lit(1), size(col("tk")) - 2),
      i => concat_ws(" ",
        element_at(col("tk"), i), element_at(col("tk"), i + 1),
        element_at(col("tk"), i + 2))))
    val mins: Seq[Column] = (0 until 16).map(i =>
      array_min(transform(col("sh"), x => md5(concat(lit(s"$i:"), x)))).as(s"mh$i"))
    val bandCols = (0 until 4).map(b =>
      md5(concat_ws("|", (0 until 4).map(r => col(s"mh${b * 4 + r}")): _*)))
    docs
      .filter(hasSignature)
      // pre-amplification spread (the shingles/simhashes move): a replay
      // micro-batch scans ONE staged file (one task), so without this the
      // whole batch's 16-hash MinHash pass runs on one core — measured as
      // ~0.5s/batch of addBatch on st16/st18. A plain exchange before the
      // stateful operator's own (band,h) exchange; flags are a pure
      // function of the delivered doc SET, so placement cannot change
      // them. Hash on doc_id (deterministic under task retry).
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), tk.as("tk"))
      .select(col("doc_id"), sh.as("sh"))
      .select(col("doc_id") +: mins: _*)
      .select(col("doc_id"), posexplode(array(bandCols: _*)).as(Seq("band", "h")))
      .as[DocBand]
  }

  /** Exact size of [[bandRows]]'s output without computing a single
    * hash: 4 band rows per document with ≥ 3 tokens (the emission rule
    * above, kept in lockstep). The TTL'd replay uses this as its
    * settlement target — counting the real signature rows would cost a
    * full MinHash pass just to learn a number the filter already knows. */
  def expectedBandRows(docs: DataFrame): Long =
    4L * docs.filter(hasSignature).count()

  /** Per-(band, value) minimum-owner state: one ValueState[Long]. Each
    * batch folds its rows' min doc_id into the stored owner and emits
    * every input row with `dup = owner' < doc_id` — the min-owner rule
    * above. ONE body serves both gate variants (the st16/st18 parity
    * claim is structural, not a copy kept in sync by hand); only the
    * TTLConfig and the write policy differ:
    *
    *  - `TTLConfig.NONE` (st16): no timers, no watermark, state lives
    *    for the stream (an ingest gate never forgets an owner). The
    *    owner is REWRITTEN only when it actually changes — a hot bucket
    *    whose owner is already the global minimum costs zero state-store
    *    writes per batch (no RocksDB put, no changelog entry).
    *  - a real TTL (st18): every batch's write is LOAD-BEARING — it
    *    refreshes the owner's TTL horizon, so a bucket that keeps seeing
    *    traffic never forgets and only cold buckets age out. An expired
    *    owner reads as absent — exactly the forget semantics.
    *
    * Memory note: the batch's rows must be buffered (the owner is known
    * only after the fold, and every row emits a flag against it) — as
    * two primitive arrays, not boxed case classes, so a degenerate hot
    * bucket's per-batch occupancy costs 12 bytes/row, not object
    * headers. Compute stays O(rows); peak memory is the hot bucket's
    * single-batch occupancy, the bound a caller sizes micro-batches to. */
  class BandOwnerProcessor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, DocBand, BandDup] {
    @transient private var owner: ValueState[Long] = _
    private val refreshesTtl = ttl != TTLConfig.NONE

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      owner = getHandle.getValueState[Long]("owner",
        org.apache.spark.sql.Encoders.scalaLong, ttl)

    override def handleInputRows(key: String, rows: Iterator[DocBand],
        timerValues: TimerValues): Iterator[BandDup] = {
      val ids = Array.newBuilder[Long]
      val bands = Array.newBuilder[Int]
      val prior = if (owner.exists()) owner.get() else Long.MaxValue
      var newOwner = prior
      rows.foreach { b =>
        ids += b.doc_id; bands += b.band
        newOwner = math.min(newOwner, b.doc_id)
      }
      if (refreshesTtl || newOwner != prior) owner.update(newOwner)
      val (idArr, bandArr) = (ids.result(), bands.result())
      val o = newOwner
      Iterator.tabulate(idArr.length)(i =>
        BandDup(idArr(i), bandArr(i), if (o < idArr(i)) 1L else 0L))
    }
  }

  /** [[BandOwnerProcessor]] wiring: band rows keyed by (band, value). */
  def nearDupFlags(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    bandRows(docs)
      .groupByKey(b => s"${b.band}:${b.h}")
      .transformWithState(new BandOwnerProcessor(),
        TimeMode.None(), OutputMode.Append())
      .toDF()
  }

  /** The gate's persisted state, read back OUT of a settled checkpoint
    * via Spark 4's state data source — the production debugging surface
    * for a 100 TB ingest gate: inspect who owns a (band, value) bucket
    * without instrumenting the stream or replaying anything. The TWS
    * ValueState named "owner" surfaces as rows
    * `(key struct<value:string>, value struct<value:long>, partition_id)`;
    * this projects them back to the domain shape `(band, h, owner)`.
    * Works over [[nearDupFlags]] and [[nearDupFlagsTtl]] checkpoints
    * alike: a TTL'd ValueState surfaces as
    * `value: struct<value: struct<value:long>, ttlExpirationMs:long>`
    * (the payload nested one level deeper under the TTL bookkeeping),
    * so the projection picks the owner path by the loaded schema.
    * Scale note: the reader scans the store's checkpoint files
    * partition-parallel — no stream, no state-store locks, safe against
    * a live query's committed batches. */
  def ownerState(s: org.apache.spark.sql.SparkSession, ckpt: String): DataFrame = {
    val raw = s.read.format("statestore")
      .option("path", ckpt)
      .option("stateVarName", "owner")
      .load()
    val valueStruct = raw.schema("value").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val (owner, expiry) = valueStruct("value").dataType match {
      case _: org.apache.spark.sql.types.StructType =>
        // TTL'd layout: surface the expiry too — an owner past it is one
        // the GATE would read as absent, and a debugging read that hid
        // that would report owners the gate disagrees with. Consumers
        // filter `expires_ms > now` for the live view; the raw row is
        // kept (expired-but-unevicted entries are real checkpoint
        // contents, and the row count must keep matching the store's
        // own numRowsTotal).
        (col("value.value.value"), col("value.ttlExpirationMs"))
      case _ => (col("value.value"), lit(null).cast("long"))
    }
    raw.select(
      split(col("key.value"), ":", 2).getItem(0).cast("int").as("band"),
      split(col("key.value"), ":", 2).getItem(1).as("h"),
      owner.as("owner"),
      expiry.as("expires_ms"))
  }

  /** TTL'd [[BandOwnerProcessor]] wiring (processing-time mode, required
    * for state TTL). With `ttlMillis` far above the batch cadence this
    * is behaviorally identical to [[nearDupFlags]] — which is what the
    * st18 gate entry verifies against st16's own oracle; the recall
    * loss only appears when arrival gaps exceed the TTL.
    *
    * Deployment note: in processing-time mode the engine always has
    * "another batch to run" (TTL/timers may fire on empty input —
    * `shouldRunAnotherBatch` is unconditionally true), so a default
    * unthrottled trigger busy-loops empty batches between arrivals.
    * Production wiring should set `Trigger.ProcessingTime(...)` at the
    * ingest cadence; the gate replay instead detects settlement by
    * exact sink size. */
  def nearDupFlagsTtl(docs: DataFrame, ttlMillis: Long): DataFrame = {
    import docs.sparkSession.implicits._
    bandRows(docs)
      .groupByKey(b => s"${b.band}:${b.h}")
      .transformWithState(new BandOwnerProcessor(
          TTLConfig(java.time.Duration.ofMillis(ttlMillis))),
        TimeMode.ProcessingTime(), OutputMode.Append())
      .toDF()
  }
}
