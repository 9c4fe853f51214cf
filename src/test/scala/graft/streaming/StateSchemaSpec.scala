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
/** The PRE-r15 state shape: money as Double (field 2 of 4). Top-level so
  * the case-class Encoder derives without OuterScopes. */
private[streaming] case class OldSessionState(nEvents: Long, totalAmount: Double,
                                              firstTs: Long, lastTs: Long)

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
}
