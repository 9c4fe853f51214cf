package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQueryException}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint state-schema evolution must fail LOUD, never decode garbage.
  *
  * Round 15 converted the stateful money paths from Double accumulation to
  * integral cents — [[EventStreams.SessionState]]'s second field went
  * `totalAmount: Double` → `totalCents: Long`. State rows in a checkpoint
  * are UnsafeRow bytes: resuming a pre-conversion checkpoint with the new
  * encoder would reinterpret the Double's IEEE bits as a Long count
  * (4.6e18-cent sessions) if nothing intervened. The typed-error
  * discipline the decode surface holds for corrupt BYTES
  * (PbfFormatException) applies to state too: the pin below proves Spark's
  * state-schema compatibility check (`spark.sql.streaming.stateStore
  * .stateSchemaCheck`, default ON — the pin also proves we haven't turned
  * it off) rejects the resume with a typed, diagnosable error naming the
  * schema mismatch, BEFORE any batch emits rows.
  */
/** The PRE-r15 state shapes: money as Double. Top-level so the
  * case-class Encoders derive without OuterScopes. */
private[streaming] case class OldSessionState(nEvents: Long, totalAmount: Double,
                                              firstTs: Long, lastTs: Long)

private[streaming] case class OldProfileState(n: Long, purchases: Long,
    total: Double, lastMs: Long, timerMs: Long)

/** A pre-r15-shaped twin of [[EventStreams.RunningProfileProcessor]]:
  * same state variable NAME ("profile"), same query shape, Double money
  * state — only enough logic to populate real TWS state rows. */
private[streaming] class OldProfileProcessor(horizonMs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, EventStreams.Event, EventStreams.ProfileOut] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}
  @transient private var state: ValueState[OldProfileState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[OldProfileState]("profile",
      org.apache.spark.sql.Encoders.product[OldProfileState], TTLConfig.NONE)

  override def handleInputRows(userId: Long, rows: Iterator[EventStreams.Event],
      timerValues: TimerValues): Iterator[EventStreams.ProfileOut] = {
    var cur = if (state.exists()) state.get()
      else OldProfileState(0L, 0L, 0.0, Long.MinValue, 0L)
    rows.foreach { e =>
      cur = OldProfileState(cur.n + 1,
        cur.purchases + (if (e.event_type == "purchase") 1L else 0L),
        cur.total + e.value, math.max(cur.lastMs, e.ts.getTime), cur.timerMs)
    }
    if (cur.timerMs != 0L) getHandle.deleteTimer(cur.timerMs)
    val t = cur.lastMs + horizonMs
    getHandle.registerTimer(t)
    state.update(cur.copy(timerMs = t))
    Iterator.empty
  }

  override def handleExpiredTimer(userId: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[EventStreams.ProfileOut] = {
    val s = state.get()
    state.clear()
    Iterator.single(EventStreams.ProfileOut(userId, s.n, s.purchases, s.total))
  }
}

class StateSchemaSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("state-schema-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def ts(hour: Int, minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 $hour%02d:$minute%02d:00")

  /** A pre-r15-shaped sessionizer: same query shape as
    * [[EventStreams.sessionize]] (one flatMapGroupsWithState over the same
    * key/watermark), state schema = [[OldSessionState]]. Only enough logic
    * to populate real state rows — the resume never re-runs it. */
  private def oldSessionize(events: org.apache.spark.sql.Dataset[EventStreams.Event])
      : org.apache.spark.sql.Dataset[EventStreams.SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OldSessionState, EventStreams.SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[EventStreams.Event],
         state: GroupState[OldSessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(EventStreams.SessionOut(
              userId, s.nEvents, s.totalAmount, s.lastTs - s.firstTs))
          } else {
            var cur = state.getOption.getOrElse(
              OldSessionState(0L, 0.0, Long.MaxValue, Long.MinValue))
            rows.foreach { e =>
              val t = e.ts.getTime
              cur = OldSessionState(cur.nEvents + 1, cur.totalAmount + e.value,
                math.min(cur.firstTs, t), math.max(cur.lastTs, t))
            }
            state.update(cur)
            state.setTimeoutTimestamp(cur.lastTs + 30 * 60 * 1000L)
            Iterator.empty
          }
      }
  }

  test("resuming a pre-r15 Double-state checkpoint fails LOUD, not by decoding garbage") {
    val sp = spark; import sp.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stateschema").toString
    val (srcDir, ckpt, outDir) = (s"$root/src", s"$root/ckpt", s"$root/out")

    // batch 1 feeds the OLD query: two open sessions land in state
    Seq(
      EventStreams.Event(1, ts(1, 0), 10, "click", 1.25),
      EventStreams.Event(2, ts(1, 5), 10, "click", 2.50),
      EventStreams.Event(3, ts(1, 7), 11, "view", 7.75)
    ).toDS().write.mode("append").parquet(srcDir)

    val schema = sp.read.parquet(srcDir).schema
    def source = sp.readStream.schema(schema).parquet(srcDir).as[EventStreams.Event]

    val q1 = oldSessionize(source)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    q1.processAllAvailable()
    q1.stop()

    // batch 2 arrives; resume over the SAME checkpoint with the CURRENT
    // (Long totalCents) processor
    Seq(EventStreams.Event(4, ts(5, 0), 12, "view", 1.0))
      .toDS().write.mode("append").parquet(srcDir)

    val q2 = EventStreams.sessionize(source, gapMs = 30 * 60 * 1000L)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    val err = intercept[StreamingQueryException] { q2.processAllAvailable() }
    // loud AND diagnosable: the error chain names the state schema clash
    // (DoubleType stored vs LongType requested), not an opaque decode
    val chain = Iterator.iterate(err: Throwable)(_.getCause)
      .takeWhile(_ != null).map(e => s"${e.getClass.getName}: ${e.getMessage}")
      .mkString("\n").toLowerCase
    assert(chain.contains("schema") &&
      (chain.contains("double") || chain.contains("incompatible")), chain.take(2000))
    // and NOTHING was emitted from garbage state: only batch-1's (empty)
    // output exists — no session rows with reinterpreted cents
    val outSchema = org.apache.spark.sql.Encoders.product[EventStreams.SessionOut].schema
    val out = sp.read.schema(outSchema).parquet(outDir)
    assert(out.count() === 0, out.collect().mkString("; "))

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("transformWithState: a pre-r15 Double-state checkpoint also fails LOUD on resume") {
    // the r15 cents conversion also changed the TWS value-state encoders
    // (ProfileState.totalCents) — the same evolution discipline must hold
    // on the transformWithState surface, which records its own state
    // schemas in the checkpoint. RocksDB provider: TWS is RocksDB-only in
    // Spark 4 (the st13 note).
    val sp = spark.newSession()
    sp.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import sp.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stateschema-tws").toString
    val (srcDir, ckpt, outDir) = (s"$root/src", s"$root/ckpt", s"$root/out")

    Seq(
      EventStreams.Event(1, ts(1, 0), 10, "purchase", 1.25),
      EventStreams.Event(2, ts(1, 5), 11, "view", 2.50)
    ).toDS().write.mode("append").parquet(srcDir)
    val schema = sp.read.parquet(srcDir).schema
    def source = sp.readStream.schema(schema).parquet(srcDir).as[EventStreams.Event]

    def oldQuery = source
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .transformWithState(new OldProfileProcessor(40L * 86400 * 1000),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())

    val q1 = oldQuery.toDF()
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    q1.processAllAvailable()
    q1.stop()

    Seq(EventStreams.Event(3, ts(5, 0), 12, "view", 1.0))
      .toDS().write.mode("append").parquet(srcDir)

    val q2 = EventStreams.runningProfile(source).toDF()
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    val err = intercept[StreamingQueryException] { q2.processAllAvailable() }
    val chain = Iterator.iterate(err: Throwable)(_.getCause)
      .takeWhile(_ != null).map(e => s"${e.getClass.getName}: ${e.getMessage}")
      .mkString("\n").toLowerCase
    assert(chain.contains("schema") &&
      (chain.contains("double") || chain.contains("incompatible") ||
        chain.contains("evolution")), chain.take(2000))

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }
}
