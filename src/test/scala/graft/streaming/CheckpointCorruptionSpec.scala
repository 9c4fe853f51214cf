package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic pins for the r17 state-restore fuzz campaign's findings
  * (`FUZZ_STATE_r17.json`, tools/StateRestoreFuzz).
  *
  * The campaign's contract: corrupt one checkpoint file, resume — either
  * a LOUD failure or state equal to the exact batch recompute. Across the
  * committed campaign (hdfs + rocksdb + gate legs; see the artifact for
  * trial counts), every escape shares ONE signature, reproduced here
  * byte-for-byte:
  *
  *  1. A bit flip INSIDE a quoted file path of the FileStreamSource
  *     seen-files log (`sources/0/0`) keeps the JSON well-formed, so a
  *     resume parses it happily, believes the real chunk-1 file was never
  *     ingested, and RE-READS it — silently double-counting its rows.
  *     Exactly-once file ingestion rests entirely on the integrity of
  *     this log, which carries NO record-level checksum of its own.
  *  2. The Hadoop CRC sidecar does NOT close the hole: Spark's
  *     checkpoint file manager reads the log through a path that skips
  *     ChecksumFileSystem verification, so the silent re-ingest happens
  *     even on checksummed LOCAL storage with the sidecar intact. The
  *     exposure is therefore universal, not an object-store nuance.
  *  3. State-file corruption (a flipped byte in a state delta, sidecar
  *     removed) stays LOUD — Spark 4.1 guards state files with its OWN
  *     checksum (CHECKPOINT_FILE_CHECKSUM_VERIFICATION_FAILED). The gap
  *     is precisely that the source metadata log lacks the same guard.
  *
  * These pins hold the line on upstream behavior: if a Spark upgrade adds
  * integrity to the source log (making #1 loud), pin #1 fails and the
  * adjudication in COVERAGE gets updated rather than silently staling.
  *
  * Since r18 the engine DEFENDS against class #1 at its own layer
  * ([[IngestAudit]]: the harness checks the checkpoint's source log
  * against the staged file set after every run), so the upstream pins
  * run with `audit = false` — they pin what SPARK does — and the guard
  * pin below proves the same corruption is LOUD with the audit on.
  */
class CheckpointCorruptionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("ckpt-corruption-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  override def afterAll(): Unit = spark.stop()

  // the campaign's own harness (graft.tools.StateRestoreFuzz), so these
  // pins exercise exactly the protocol the artifact's trials ran — a
  // drifted copy would keep passing against a stale protocol. files=1:
  // the re-ingest pins need chunk 1 to be ONE file so the flipped path
  // re-ingests the whole chunk deterministically.
  private def writeChunk(inputDir: String, lo: Long, hi: Long): Unit =
    graft.tools.StateRestoreFuzz.writeChunk(spark, inputDir, lo, hi, files = 1)

  /** audit = false: the upstream pins assert SPARK's own behavior, which
    * the engine-layer ingest audit would (correctly) interrupt. */
  private def runStream(inputDir: String, ckpt: String): Unit =
    graft.tools.StateRestoreFuzz.runStream(spark, inputDir, ckpt, audit = false)

  private def runStreamGuarded(inputDir: String, ckpt: String): Unit =
    graft.tools.StateRestoreFuzz.runStream(spark, inputDir, ckpt, audit = true)

  private def readState(ckpt: String): Map[Long, Long] =
    graft.tools.StateRestoreFuzz.readState(spark, ckpt)

  /** Flip one alphanumeric byte inside the staged parquet filename's
    * occurrence in the seen-files log — the smallest corruption that
    * keeps the JSON valid while renaming a seen file away. */
  private def flipPathByte(log: java.io.File): Unit = {
    val bytes = java.nio.file.Files.readAllBytes(log.toPath)
    val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    val at = text.indexOf(".parquet")
    require(at > 4, s"no parquet path found in ${log.getPath}")
    // flip a hex-ish char of the part-file name a few bytes before the
    // extension: 'x' is never in the [0-9a-f-] name alphabet
    bytes(at - 4) = 'x'.toByte
    java.nio.file.Files.write(log.toPath, bytes)
  }

  private def dropCrc(f: java.io.File): Unit = {
    val crc = new java.io.File(f.getParent, s".${f.getName}.crc")
    if (crc.exists()) assert(crc.delete())
  }

  test("pin: source-log path flip WITHOUT read checksums silently re-ingests (upstream)") {
    val base = java.nio.file.Files.createTempDirectory("ckptcorr1").toFile
    try {
      val input = s"$base/in"; val ckpt = s"$base/ckpt"
      writeChunk(input, 0, 500)   // one file: every key 10
      runStream(input, ckpt)
      val log = new java.io.File(s"$ckpt/sources/0/0")
      assert(log.exists())
      flipPathByte(log); dropCrc(log)
      writeChunk(input, 500, 800) // every key +6 → expected 16
      runStream(input, ckpt)      // resumes WITHOUT error — that's the point
      val got = readState(ckpt)
      // the chunk-1 file is re-ingested whole: every key counts 10 extra
      assert(got === (0L until 50L).map(_ -> 26L).toMap,
        "silent re-ingest signature changed — did Spark's source log gain integrity?")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(base)
  }

  test("pin: the Hadoop CRC sidecar does NOT protect the source log (manager bypasses it)") {
    val base = java.nio.file.Files.createTempDirectory("ckptcorr2").toFile
    try {
      val input = s"$base/in"; val ckpt = s"$base/ckpt"
      writeChunk(input, 0, 500)
      runStream(input, ckpt)
      flipPathByte(new java.io.File(s"$ckpt/sources/0/0")) // sidecar KEPT intact
      writeChunk(input, 500, 800)
      runStream(input, ckpt) // no error — the sidecar is never consulted
      // and the damage is the same silent re-ingest as the no-sidecar pin
      assert(readState(ckpt) === (0L until 50L).map(_ -> 26L).toMap,
        "sidecar-intact flip no longer re-ingests silently — did the " +
          "checkpoint file manager start verifying CRCs?")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(base)
  }

  test("guard: the ingest audit converts the path-flip class to LOUD") {
    val base = java.nio.file.Files.createTempDirectory("ckptcorr4").toFile
    try {
      val input = s"$base/in"; val ckpt = s"$base/ckpt"
      writeChunk(input, 0, 500)
      runStreamGuarded(input, ckpt) // clean first leg: audit passes
      flipPathByte(new java.io.File(s"$ckpt/sources/0/0")) // sidecar KEPT
      writeChunk(input, 500, 800)
      // the resume still silently re-ingests inside Spark — but the
      // settle-time audit sees the flipped (unknown) path in the source
      // log AND the real file recorded twice, and fails the run loudly
      val e = intercept[IllegalStateException] { runStreamGuarded(input, ckpt) }
      assert(e.getMessage.contains("ingest audit FAILED"), e.getMessage)
      assert(e.getMessage.contains("unknown ingested paths") ||
        e.getMessage.contains("MULTIPLE batches"), e.getMessage)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(base)
  }

  test("guard: a clean two-chunk resume passes the ingest audit (no false alarm)") {
    val base = java.nio.file.Files.createTempDirectory("ckptcorr5").toFile
    try {
      val input = s"$base/in"; val ckpt = s"$base/ckpt"
      writeChunk(input, 0, 500)
      runStreamGuarded(input, ckpt)
      writeChunk(input, 500, 800)
      runStreamGuarded(input, ckpt)
      assert(readState(ckpt) === (0L until 50L).map(_ -> 16L).toMap)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(base)
  }

  test("pin: state-delta corruption stays LOUD even without read checksums") {
    val base = java.nio.file.Files.createTempDirectory("ckptcorr3").toFile
    try {
      val input = s"$base/in"; val ckpt = s"$base/ckpt"
      writeChunk(input, 0, 500)
      runStream(input, ckpt)
      val deltas = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(new java.io.File(s"$ckpt/state")).filter(_.getName.endsWith(".delta"))
          .filter(_.length() > 64) // a populated partition, not an empty stub
      }
      assert(deltas.nonEmpty)
      deltas.foreach { d =>
        val b = java.nio.file.Files.readAllBytes(d.toPath)
        b(b.length / 2) = (b(b.length / 2) ^ 0x41).toByte
        java.nio.file.Files.write(d.toPath, b)
        dropCrc(d)
      }
      writeChunk(input, 500, 800)
      intercept[Throwable] { runStream(input, ckpt) }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(base)
  }
}
