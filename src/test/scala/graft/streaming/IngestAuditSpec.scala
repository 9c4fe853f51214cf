package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for [[IngestAudit]]'s parser and decision rules in
  * isolation — the integration behavior (real checkpoints, the fuzz
  * campaign, the guard pins) lives in CheckpointCorruptionSpec and the
  * StateRestoreFuzz artifact; these tests pin the parser edges those
  * paths exercise only incidentally: compact-file deduplication, URI
  * normalization, the header-position rule, and each of the three
  * failure classes in isolation.
  */
class IngestAuditSpec extends AnyFunSuite {

  /** A scratch checkpoint with the given source-log files (name → lines). */
  private def ckptWith(files: (String, Seq[String])*): java.nio.file.Path = {
    val base = java.nio.file.Files.createTempDirectory("ingestaudit")
    val src = java.nio.file.Files.createDirectories(base.resolve("ckpt/sources/0"))
    files.foreach { case (name, lines) =>
      java.nio.file.Files.writeString(src.resolve(name), lines.mkString("\n"))
    }
    base
  }

  private def stageWith(base: java.nio.file.Path, names: String*): java.nio.file.Path = {
    val stage = java.nio.file.Files.createDirectories(base.resolve("in"))
    names.foreach(n => java.nio.file.Files.writeString(stage.resolve(n), "x"))
    stage
  }

  private def entry(stage: java.nio.file.Path, name: String, batch: Long): String =
    s"""{"path":"file://${stage.resolve(name)}","timestamp":1,"batchId":$batch}"""

  private def cleanup(base: java.nio.file.Path): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)

  test("clean log over the staged set passes; hidden files are invisible") {
    val base = ckptWith()
    try {
      val stage = stageWith(base, "a.parquet", "b.parquet")
      // _SUCCESS and dotfiles are invisible to FileStreamSource and must
      // be invisible to the manifest too
      java.nio.file.Files.writeString(stage.resolve("_SUCCESS"), "")
      java.nio.file.Files.writeString(stage.resolve(".hidden"), "")
      val src = base.resolve("ckpt/sources/0")
      java.nio.file.Files.writeString(src.resolve("0"),
        Seq("v1", entry(stage, "a.parquet", 0), entry(stage, "b.parquet", 0)).mkString("\n"))
      IngestAudit.audit(base.resolve("ckpt").toString, stage)
    } finally cleanup(base)
  }

  test("compact files legitimately repeat earlier entries (dedup, no false alarm)") {
    val base = ckptWith()
    try {
      val stage = stageWith(base, "a.parquet", "b.parquet")
      val src = base.resolve("ckpt/sources/0")
      java.nio.file.Files.writeString(src.resolve("0"),
        Seq("v1", entry(stage, "a.parquet", 0)).mkString("\n"))
      java.nio.file.Files.writeString(src.resolve("1"),
        Seq("v1", entry(stage, "b.parquet", 1)).mkString("\n"))
      // the compact repeats BOTH earlier entries verbatim — same
      // (path, batchId) pairs must not read as re-ingestion
      java.nio.file.Files.writeString(src.resolve("1.compact"),
        Seq("v1", entry(stage, "a.parquet", 0), entry(stage, "b.parquet", 1)).mkString("\n"))
      IngestAudit.audit(base.resolve("ckpt").toString, stage)
    } finally cleanup(base)
  }

  test("the three failure classes fire in isolation, with their own words") {
    val base = ckptWith()
    try {
      val stage = stageWith(base, "a.parquet", "b.parquet")
      val src = base.resolve("ckpt/sources/0")
      // re-ingestion: same path under two batchIds
      java.nio.file.Files.writeString(src.resolve("0"),
        Seq("v1", entry(stage, "a.parquet", 0), entry(stage, "b.parquet", 0),
          entry(stage, "a.parquet", 1)).mkString("\n"))
      val e1 = intercept[IllegalStateException] {
        IngestAudit.audit(base.resolve("ckpt").toString, stage) }
      assert(e1.getMessage.contains("MULTIPLE batches"), e1.getMessage)
      // unknown path (the flipped-twin class)
      java.nio.file.Files.writeString(src.resolve("0"),
        Seq("v1", entry(stage, "a.parquet", 0), entry(stage, "b.parquet", 0),
          entry(stage, "x.parquet", 0)).mkString("\n"))
      val e2 = intercept[IllegalStateException] {
        IngestAudit.audit(base.resolve("ckpt").toString, stage) }
      assert(e2.getMessage.contains("unknown ingested paths"), e2.getMessage)
      // omission: a staged file never recorded
      java.nio.file.Files.writeString(src.resolve("0"),
        Seq("v1", entry(stage, "a.parquet", 0)).mkString("\n"))
      val e3 = intercept[IllegalStateException] {
        IngestAudit.audit(base.resolve("ckpt").toString, stage) }
      assert(e3.getMessage.contains("never ingested"), e3.getMessage)
    } finally cleanup(base)
  }

  test("header-position rule: missing header and mid-file header lines are loud") {
    val base = ckptWith()
    try {
      val stage = stageWith(base, "a.parquet")
      val src = base.resolve("ckpt/sources/0")
      // no header at line 0 (e.g. truncation ate it)
      java.nio.file.Files.writeString(src.resolve("0"),
        Seq(entry(stage, "a.parquet", 0)).mkString("\n"))
      val e1 = intercept[IllegalStateException] {
        IngestAudit.audit(base.resolve("ckpt").toString, stage) }
      assert(e1.getMessage.contains("lacks a version header"), e1.getMessage)
      // an entry line corrupted toward a header shape must NOT be
      // silently skipped (pre-hardening it was, erasing the record of an
      // ingestion): with its fields intact it still PARSES and keeps its
      // record in the accounting — the stronger outcome than loud
      java.nio.file.Files.writeString(src.resolve("0"),
        Seq("v1", "v" + entry(stage, "a.parquet", 0).drop(1)).mkString("\n"))
      assert(IngestAudit.entries(base.resolve("ckpt").toString)
        .exists(_.path.endsWith("a.parquet")),
        "v-corrupted entry with intact fields lost its ingestion record")
      IngestAudit.audit(base.resolve("ckpt").toString, stage) // accounting correct
      // empty log file: loud
      java.nio.file.Files.writeString(src.resolve("0"), "")
      val e3 = intercept[IllegalStateException] {
        IngestAudit.audit(base.resolve("ckpt").toString, stage) }
      assert(e3.getMessage.contains("lacks a version header"), e3.getMessage)
    } finally cleanup(base)
  }

  test("an entry missing its fields is loud (corruption cannot hide in parse gaps)") {
    val base = ckptWith()
    try {
      val stage = stageWith(base, "a.parquet")
      val src = base.resolve("ckpt/sources/0")
      java.nio.file.Files.writeString(src.resolve("0"),
        Seq("v1", """{"timestamp":1,"batchId":0}""").mkString("\n"))
      val e1 = intercept[IllegalStateException] {
        IngestAudit.audit(base.resolve("ckpt").toString, stage) }
      assert(e1.getMessage.contains("no path field"), e1.getMessage)
      java.nio.file.Files.writeString(src.resolve("0"),
        Seq("v1", s"""{"path":"file://${stage.resolve("a.parquet")}","timestamp":1}""").mkString("\n"))
      val e2 = intercept[IllegalStateException] {
        IngestAudit.audit(base.resolve("ckpt").toString, stage) }
      assert(e2.getMessage.contains("no batchId field"), e2.getMessage)
    } finally cleanup(base)
  }

  test("a staged name containing '%' audits cleanly (no double URI-decode)") {
    // the log records file: URIs with %-encoding; getPath decodes the LOG
    // side back to the literal path — the STAGED side must stay verbatim,
    // else '/a%20b' would decode to '/a b' and a clean run would fail
    val base = ckptWith()
    try {
      val stage = stageWith(base, "a%20b.parquet")
      val src = base.resolve("ckpt/sources/0")
      // as Spark writes it: the literal '%' is URI-encoded to %25
      val uri = stage.resolve("a%20b.parquet").toUri.toString
      assert(uri.contains("%2520b") || uri.contains("a%2520b") || uri.contains("%25"),
        s"expected %-encoding in $uri")
      java.nio.file.Files.writeString(src.resolve("0"),
        Seq("v1", s"""{"path":"$uri","timestamp":1,"batchId":0}""").mkString("\n"))
      IngestAudit.audit(base.resolve("ckpt").toString, stage)
    } finally cleanup(base)
  }

  test("a second source dir fails loud instead of mis-auditing pooled entries") {
    val base = ckptWith()
    try {
      val stage = stageWith(base, "a.parquet")
      java.nio.file.Files.createDirectories(base.resolve("ckpt/sources/1"))
      val e = intercept[IllegalArgumentException] {
        IngestAudit.audit(base.resolve("ckpt").toString, stage) }
      assert(e.getMessage.contains("single-source"), e.getMessage)
    } finally cleanup(base)
  }

  test("batch ledger: a deleted middle batch file is loud") {
    val base = ckptWith()
    try {
      val stage = stageWith(base, "a.parquet", "b.parquet")
      val src = base.resolve("ckpt/sources/0")
      java.nio.file.Files.writeString(src.resolve("0"),
        Seq("v1", entry(stage, "a.parquet", 0)).mkString("\n"))
      java.nio.file.Files.writeString(src.resolve("2"),
        Seq("v1", entry(stage, "b.parquet", 2)).mkString("\n"))
      val e = intercept[IllegalStateException] {
        IngestAudit.audit(base.resolve("ckpt").toString, stage) }
      assert(e.getMessage.contains("not contiguous"), e.getMessage)
    } finally cleanup(base)
  }

  test("batch ledger: a batch file recording no ingestion for its own batch is loud") {
    // the line-erasure resume scenario: batch 0's entries were erased
    // (well-formed header-only file survives), the resume re-ingested
    // both files under batch 1 — entry checks all pass, the LEDGER fires
    val base = ckptWith()
    try {
      val stage = stageWith(base, "a.parquet", "b.parquet")
      val src = base.resolve("ckpt/sources/0")
      java.nio.file.Files.writeString(src.resolve("0"), "v1")
      java.nio.file.Files.writeString(src.resolve("1"),
        Seq("v1", entry(stage, "a.parquet", 1), entry(stage, "b.parquet", 1)).mkString("\n"))
      val e = intercept[IllegalStateException] {
        IngestAudit.audit(base.resolve("ckpt").toString, stage) }
      assert(e.getMessage.contains("no ingestion"), e.getMessage)
    } finally cleanup(base)
  }

  test("batch ledger: commits log must be contiguous and cover the sources log") {
    val base = ckptWith()
    try {
      val stage = stageWith(base, "a.parquet", "b.parquet", "c.parquet")
      val src = base.resolve("ckpt/sources/0")
      java.nio.file.Files.writeString(src.resolve("0"),
        Seq("v1", entry(stage, "a.parquet", 0)).mkString("\n"))
      java.nio.file.Files.writeString(src.resolve("1"),
        Seq("v1", entry(stage, "b.parquet", 1)).mkString("\n"))
      java.nio.file.Files.writeString(src.resolve("2"),
        Seq("v1", entry(stage, "c.parquet", 2)).mkString("\n"))
      val commits = java.nio.file.Files.createDirectories(base.resolve("ckpt/commits"))
      // commits stop at 0 while sources record batch 2: >=2 trailing
      // batches uncommitted is corruption
      java.nio.file.Files.writeString(commits.resolve("0"), "v1\n{}")
      val e1 = intercept[IllegalStateException] {
        IngestAudit.audit(base.resolve("ckpt").toString, stage) }
      assert(e1.getMessage.contains("commits log stops"), e1.getMessage)
      // ONE trailing planned-but-uncommitted batch is legal (a batch is
      // durably planned before it commits; count-settled audits can land
      // in that window) — must NOT fire
      java.nio.file.Files.writeString(commits.resolve("1"), "v1\n{}")
      IngestAudit.audit(base.resolve("ckpt").toString, stage)
      // a commits hole is loud
      java.nio.file.Files.writeString(commits.resolve("3"), "v1\n{}")
      val e2 = intercept[IllegalStateException] {
        IngestAudit.audit(base.resolve("ckpt").toString, stage) }
      assert(e2.getMessage.contains("commits log not contiguous"), e2.getMessage)
      // complete commits pass; trailing no-ingest commits (processing-time
      // TWS) are legal — maxCommit > maxSources must NOT fire
      java.nio.file.Files.writeString(commits.resolve("2"), "v1\n{}")
      IngestAudit.audit(base.resolve("ckpt").toString, stage)
      java.nio.file.Files.writeString(commits.resolve("4"), "v1\n{}")
      IngestAudit.audit(base.resolve("ckpt").toString, stage)
    } finally cleanup(base)
  }

  test("batch ledger: entries outside the batch-file range are loud") {
    val base = ckptWith()
    try {
      val stage = stageWith(base, "a.parquet", "b.parquet")
      val src = base.resolve("ckpt/sources/0")
      // batch file 0 carries an entry claiming batch 5 — no file 5 exists
      java.nio.file.Files.writeString(src.resolve("0"),
        Seq("v1", entry(stage, "a.parquet", 0), entry(stage, "b.parquet", 5)).mkString("\n"))
      val e = intercept[IllegalStateException] {
        IngestAudit.audit(base.resolve("ckpt").toString, stage) }
      assert(e.getMessage.contains("beyond the latest batch file"), e.getMessage)
    } finally cleanup(base)
  }

  test("batch ledger: below-min entries are loud when no compact cleanup is evident") {
    val base = ckptWith()
    try {
      val stage = stageWith(base, "a.parquet", "b.parquet")
      val src = base.resolve("ckpt/sources/0")
      // the log still starts at batch 0, so NOTHING below min can be
      // legal — an entry claiming batch -1 is a corrupted batchId, not a
      // compact-carried survivor of cleanup
      java.nio.file.Files.writeString(src.resolve("0"),
        Seq("v1", entry(stage, "a.parquet", 0), entry(stage, "b.parquet", -1)).mkString("\n"))
      val e = intercept[IllegalStateException] {
        IngestAudit.audit(base.resolve("ckpt").toString, stage) }
      assert(e.getMessage.contains("before the oldest batch file"), e.getMessage)
    } finally cleanup(base)
  }

  test("batch ledger: below-min entries pass when the oldest retained file is a compact") {
    val base = ckptWith()
    try {
      val stage = stageWith(base, "a.parquet", "b.parquet", "c.parquet")
      val src = base.resolve("ckpt/sources/0")
      // post-cleanup shape: plain files 0..1 deleted, the retained
      // minimum IS the compact, still carrying batches 0 and 1 — their
      // below-min entries are cleanup survivors, not corruption
      java.nio.file.Files.writeString(src.resolve("2.compact"),
        Seq("v1", entry(stage, "a.parquet", 0), entry(stage, "b.parquet", 1),
          entry(stage, "c.parquet", 2)).mkString("\n"))
      IngestAudit.audit(base.resolve("ckpt").toString, stage)
    } finally cleanup(base)
  }

  test("row-total reconciliation: mismatch is loud, equality passes") {
    IngestAudit.reconcileRowTotal("/ckpt", 800L, 800L, "the state total")
    val e = intercept[IllegalStateException] {
      IngestAudit.reconcileRowTotal("/ckpt", 800L, 1050L, "the state total") }
    assert(e.getMessage.contains("row-total"), e.getMessage)
    assert(e.getMessage.contains("1050"), e.getMessage)
  }

  test("no sources dir at all means no entries (pre-first-batch checkpoint)") {
    val base = java.nio.file.Files.createTempDirectory("ingestaudit-bare")
    try {
      java.nio.file.Files.createDirectories(base.resolve("ckpt"))
      assert(IngestAudit.entries(base.resolve("ckpt").toString).isEmpty)
      // and an EMPTY sources/0 dir (created, nothing logged yet) is
      // likewise no-entries rather than loud
      java.nio.file.Files.createDirectories(base.resolve("ckpt/sources/0"))
      assert(IngestAudit.entries(base.resolve("ckpt").toString).isEmpty)
    } finally cleanup(base)
  }
}
