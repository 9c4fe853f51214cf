package graft.streaming

/** Engine-layer defense for the ONE silent failure mode the r17 fuzz
  * campaign left open (FUZZ_STATE_r17 `escape_adjudication`, pinned in
  * [[CheckpointCorruptionSpec]]): a bit flip inside a quoted file path of
  * the FileStreamSource seen-files log stays valid JSON, so a resume
  * silently RE-INGESTS the renamed-away file — duplicate rows under a
  * clean exit, even on checksummed local storage (the CRC sidecar is
  * bypassed on the metadata-log read path). Upstream carries no
  * record-level integrity on that log; the engine's replay harness,
  * however, knows EXACTLY which files it staged — so at settle time it
  * can audit the checkpoint's own source log against the staged manifest
  * and convert the silent class to LOUD at our layer.
  *
  * The audit reads `ckpt/sources/<i>/<batch>` (and `.compact`) files —
  * `v1` header + one JSON entry per line, each carrying `path` and
  * `batchId` — and fails unless:
  *   - every recorded path is in the staged manifest (a corrupted entry
  *     "renames" a staged file away: its flipped twin surfaces here);
  *   - no path is recorded in MORE than one batch (re-ingestion — the
  *     exact silent-duplicate signature);
  *   - every staged file is recorded at least once (omission).
  * Compact files legitimately repeat (path, batchId) pairs; those
  * dedupe. A line the parser cannot read is itself loud — corruption
  * that breaks the log's shape must never pass the audit.
  *
  * At 100 TB this is the cheap invariant a production resume wants
  * anyway: the source log is tiny next to the data, the audit is pure
  * driver-side metadata I/O, and it turns "trust the log" into "check
  * the log against the ingest ledger". Scale bound, stated honestly:
  * memory is O(distinct ingested files) and I/O re-reads each entry
  * ~2× (its batch file + the covering compact) — fine for any
  * harness-scale replay and for most production streams; a
  * multi-million-file stream would want the same check restructured
  * incrementally over the latest compact, which this deliberately
  * simple one-shot form does not attempt.
  *
  * The r18-declared residual — a corruption that REMOVES a whole entry
  * while leaving a well-formed shorter log (truncation landing exactly
  * on a line boundary, or a deleted line) — is now ATTEMPTED
  * deliberately by the campaign's targeted line mutators and defended
  * in two layers: [[auditBatchLedger]] makes the structural sub-classes
  * loud (missing batch file, batch file recording no ingestion for its
  * own batch, commits/sources disagreement), and
  * [[reconcileRowTotal]] closes the one sub-class the log's own
  * structure cannot witness (an erased entry beside a surviving
  * same-batch entry) at the harness layer, where staged and ingested
  * row totals are both known.
  */
object IngestAudit {

  private val PathRe = """"path":"((?:[^"\\]|\\.)*)"""".r
  private val BatchRe = """"batchId":\s*(-?\d+)""".r

  final case class Entry(path: String, batchId: Long)

  /** Every (path, batchId) recorded by the checkpoint's file-source
    * metadata logs, deduplicated (compact files repeat earlier entries).
    * SINGLE-SOURCE checkpoints only: with two file sources over
    * overlapping inputs, pooling their entries would either flag a
    * legitimate per-source ingestion as re-ingestion or hide a genuine
    * one — fail loud instead of mis-auditing (every harness replay is
    * single-source). */
  def entries(ckptDir: String): Seq[Entry] = {
    val srcRoot = new java.io.File(ckptDir, "sources")
    if (!srcRoot.isDirectory) return Seq.empty
    val srcDirs = Option(srcRoot.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
    require(srcDirs.length <= 1,
      s"ingest audit supports single-source checkpoints; found " +
        s"${srcDirs.length} source dirs under $srcRoot")
    val logFiles = for {
      src <- srcDirs.toSeq.sortBy(_.getName)
      f <- Option(src.listFiles()).getOrElse(Array.empty).toSeq.sortBy(_.getName)
      if f.isFile && !f.getName.startsWith(".") && !f.getName.endsWith(".crc") &&
        !f.getName.endsWith(".tmp")
    } yield f
    logFiles.flatMap { f =>
      val text = new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
      val lines = text.linesIterator.toSeq
      // strict shape: the version header ("v1") is legal ONLY at line 0 —
      // a later line matching the header filter would otherwise be
      // SKIPPED, so a corruption rewriting an entry's first byte toward
      // 'v' could erase the record of an ingestion without going loud
      if (lines.isEmpty || !lines.head.startsWith("v"))
        throw new IllegalStateException(
          s"ingest audit: source log ${f.getPath} lacks a version header " +
            s"(first line: ${lines.headOption.getOrElse("<empty>")})")
      lines.drop(1).filter(_.nonEmpty).map { line =>
        val p = PathRe.findFirstMatchIn(line).map(_.group(1)).getOrElse(
          throw new IllegalStateException(
            s"ingest audit: no path field in source log ${f.getPath}: $line"))
        val b = BatchRe.findFirstMatchIn(line).map(_.group(1).toLong).getOrElse(
          throw new IllegalStateException(
            s"ingest audit: no batchId field in source log ${f.getPath}: $line"))
        Entry(p, b)
      }
    }.distinct
  }

  /** JSON string unescape for the captured path: the log writer escapes
    * backslash/quote/control characters, and leaving the escapes in place
    * would make such a path never match its staged original. Unknown
    * escapes stay verbatim (they then fail the unknown-path check —
    * corruption must stay loud). */
  private def jsonUnescape(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => b += '"'; i += 2
          case '\\' => b += '\\'; i += 2
          case '/' => b += '/'; i += 2
          case 'n' => b += '\n'; i += 2
          case 't' => b += '\t'; i += 2
          case 'r' => b += '\r'; i += 2
          case 'b' => b += '\b'; i += 2
          case 'f' => b += '\f'; i += 2
          case 'u' if i + 6 <= s.length =>
            try { b += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6 }
            catch { case _: NumberFormatException => b += c; i += 1 }
          case _ => b += c; i += 1
        }
      } else { b += c; i += 1 }
    }
    b.toString
  }

  /** LOG-SIDE-ONLY normalization: JSON-unescape, then URI → plain path
    * (the log records `file:` URIs with %-encoding; `getPath` decodes
    * back to the literal filesystem path). The STAGED side is used
    * verbatim — it is already a plain local path, and URI-decoding it
    * too would corrupt legal names containing '%', '#', or '?'.
    * Unparseable strings stay verbatim (they then fail the unknown-path
    * check — corruption must stay loud). */
  private def normalizeLogPath(raw: String): String = {
    val p = jsonUnescape(raw)
    try {
      val u = new java.net.URI(p)
      if (u.getPath == null) p else u.getPath
    } catch { case _: Exception => p }
  }

  /** Batch-ledger reconciliation (the r18 verdict's #2 ask): the
    * line-boundary-truncation residual erases an ENTRY while leaving a
    * well-formed shorter log, so the entry checks alone cannot see it.
    * What the checkpoint still carries is STRUCTURE, and three rules make
    * most of the class loud:
    *   - source batch FILE names must be contiguous (a deleted middle
    *     batch file is a hole, not a shorter history);
    *   - every batch file `N`/`N.compact` must contribute >=1 entry with
    *     batchId == N (a file source plans a batch only when it has new
    *     files, so a well-formed batch file recording NO ingestion for
    *     its own batch is exactly the whole-entry-erasure signature);
    *   - the `commits/` log must be contiguous and cover the sources
    *     batches up to ONE trailing planned-but-uncommitted batch (a
    *     batch is durably planned before it commits, and count-settled
    *     audits can land in that window; equality is NOT required in the
    *     other direction either — processing-time TWS legitimately
    *     commits trailing batches that ingest no files).
    * The sub-class these rules cannot see — an erased entry in a batch
    * file that RETAINS another entry for the same batch — is closed by
    * [[reconcileRowTotal]] at the harness layer, where the staged row
    * total and the ingested/sink row total are both known. */
  /** Highest batch-file id in the checkpoint's sources log, if any —
    * what the source has durably PLANNED, independent of which progress
    * events a caller managed to observe (the replay harness uses it to
    * decide whether its progress history is complete before trusting a
    * row-total equality). */
  def maxSourcesBatchId(ckptDir: String): Option[Long] = {
    val srcRoot = new java.io.File(ckptDir, "sources")
    if (!srcRoot.isDirectory) return None
    val srcDirs = Option(srcRoot.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
    // same loud single-source guard as entries(): with several sources a
    // headOption over an unordered listing would silently report
    // whichever dir lists first, under-counting the planned tail
    require(srcDirs.length <= 1,
      s"ingest audit: expected a single source under $srcRoot, " +
        s"found ${srcDirs.map(_.getName).toSeq.sorted}")
    srcDirs.headOption.flatMap { srcDir =>
      val ids = Option(srcDir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && !f.getName.startsWith(".") &&
          !f.getName.endsWith(".crc") && !f.getName.endsWith(".tmp"))
        .flatMap(f =>
          scala.util.Try(f.getName.stripSuffix(".compact").toLong).toOption)
      if (ids.isEmpty) None else Some(ids.max)
    }
  }

  def auditBatchLedger(ckptDir: String,
      preparsed: Option[Seq[Entry]] = None): Unit = {
    def ids(dir: java.io.File, what: String): Seq[Long] = {
      val fs = Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && !f.getName.startsWith(".") &&
          !f.getName.endsWith(".crc") && !f.getName.endsWith(".tmp"))
      fs.toSeq.map { f =>
        val name = f.getName.stripSuffix(".compact")
        try name.toLong
        catch { case _: NumberFormatException =>
          throw new IllegalStateException(
            s"ingest audit: non-numeric $what log file ${f.getPath}")
        }
      }.sorted
    }
    val srcRoot = new java.io.File(ckptDir, "sources")
    if (!srcRoot.isDirectory) return
    val srcDirs = Option(srcRoot.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
    if (srcDirs.isEmpty) return
    val srcDir = srcDirs.head // single-source enforced by entries()
    val fileIds = ids(srcDir, "sources")
    if (fileIds.isEmpty) return
    val holes = (fileIds.min to fileIds.max).filterNot(fileIds.contains)
    if (holes.nonEmpty)
      throw new IllegalStateException(
        s"ingest audit FAILED for checkpoint $ckptDir: sources log batch " +
          s"files are not contiguous — missing batch file(s) ${holes.take(3)} " +
          s"in [${fileIds.min}, ${fileIds.max}]")
    // auditFiles hands its already-parsed entries through, so one audit
    // reads each log file once and both rule sets see one snapshot
    val byBatch = preparsed.getOrElse(entries(ckptDir)).groupBy(_.batchId)
    val uncovered = fileIds.filterNot(byBatch.contains)
    if (uncovered.nonEmpty)
      throw new IllegalStateException(
        s"ingest audit FAILED for checkpoint $ckptDir: sources batch " +
          s"file(s) ${uncovered.take(3)} record no ingestion for their own " +
          "batch (whole-entry erasure?)")
    // above-max entries are always stray. Below-min entries are legal
    // ONLY after FileStreamSourceLog cleanup has deleted batch files
    // older than a compact — the retained minimum is then that compact,
    // which still carries the deleted batches' entries; flagging them
    // would false-loud every healthy stream past the retention horizon.
    // But when no cleanup can have run (the log still starts at batch 0,
    // or the oldest retained file is a plain batch file), a below-min
    // entry is corruption and stays loud.
    val stray = byBatch.keys.filter(_ > fileIds.max)
    if (stray.nonEmpty)
      throw new IllegalStateException(
        s"ingest audit FAILED for checkpoint $ckptDir: entries recorded " +
          s"for batch(es) ${stray.toSeq.sorted.take(3)} beyond the latest " +
          s"batch file ${fileIds.max}")
    val cleanupEvident = fileIds.min > 0 &&
      new java.io.File(srcDir, s"${fileIds.min}.compact").isFile
    if (!cleanupEvident) {
      val strayLow = byBatch.keys.filter(_ < fileIds.min)
      if (strayLow.nonEmpty)
        throw new IllegalStateException(
          s"ingest audit FAILED for checkpoint $ckptDir: entries recorded " +
            s"for batch(es) ${strayLow.toSeq.sorted.take(3)} before the " +
            s"oldest batch file ${fileIds.min} with no compact cleanup " +
            "evident (corrupted batchId?)")
    }
    val commitsDir = new java.io.File(ckptDir, "commits")
    if (commitsDir.isDirectory) {
      val commitIds = ids(commitsDir, "commits")
      if (commitIds.nonEmpty) {
        val commitHoles = (commitIds.min to commitIds.max).filterNot(commitIds.contains)
        if (commitHoles.nonEmpty)
          throw new IllegalStateException(
            s"ingest audit FAILED for checkpoint $ckptDir: commits log not " +
              s"contiguous — missing ${commitHoles.take(3)}")
        // tolerate exactly ONE trailing in-flight batch: a batch is
        // durably PLANNED (sources entry written) before it is committed,
        // and a count-settled replay can audit inside that window — also
        // a legal crash state (resume re-runs the planned batch; the
        // seen-files log keeps the re-run idempotent). A commits log
        // lagging by >=2, or holed (above), is still corruption.
        if (commitIds.max < fileIds.max - 1)
          throw new IllegalStateException(
            s"ingest audit FAILED for checkpoint $ckptDir: sources log " +
              s"records batch ${fileIds.max} but the commits log stops at " +
              s"${commitIds.max} (more than one trailing batch uncommitted)")
      }
    }
  }

  /** Row-total reconciliation, the harness-layer close of the ledger's
    * declared residual (an erased entry in a batch file that retains
    * another entry for the same batch): at settle the rows INGESTED
    * (sink/state/progress accounting — the caller knows which) must
    * equal the rows STAGED. A silent re-ingestion inflates the ingested
    * side by the duplicated file's rows, so the one corruption class the
    * log's own structure cannot witness turns loud here. */
  def reconcileRowTotal(ckptDir: String, stagedRows: Long, ingestedRows: Long,
      what: String): Unit =
    if (stagedRows != ingestedRows)
      throw new IllegalStateException(
        s"ingest audit FAILED for checkpoint $ckptDir: row-total " +
          s"reconciliation — staged $stagedRows rows but $what accounts " +
          s"$ingestedRows (silent re-ingestion or row loss)")

  /** Fails loud unless the source logs record EXACTLY the given staged
    * files (plain local paths, compared verbatim), each in exactly one
    * batch. Also runs the batch-ledger reconciliation (AFTER the entry
    * checks: when both fire, the entry-level message names the exact
    * paths, which is the more actionable diagnosis). */
  def auditFiles(ckptDir: String, staged: Seq[String]): Unit = {
    val want = staged.toSet
    require(want.size == staged.size,
      s"ingest audit: staged manifest self-collides: $staged")
    val parsed = entries(ckptDir)
    val byPath = parsed.groupBy(e => normalizeLogPath(e.path))
      .view.mapValues(_.map(_.batchId).distinct).toMap
    val unknown = (byPath.keySet diff want).toSeq.sorted
    val missing = (want diff byPath.keySet).toSeq.sorted
    val reingested = byPath.filter(_._2.size > 1).toSeq.sortBy(_._1)
    if (unknown.nonEmpty || missing.nonEmpty || reingested.nonEmpty)
      throw new IllegalStateException(
        s"ingest audit FAILED for checkpoint $ckptDir:" +
          (if (unknown.nonEmpty)
            s" unknown ingested paths (corrupted seen-files entry?): ${unknown.take(3)};"
          else "") +
          (if (missing.nonEmpty)
            s" staged but never ingested: ${missing.take(3)};"
          else "") +
          (if (reingested.nonEmpty)
            s" ingested in MULTIPLE batches (silent duplicate rows): ${reingested.take(3)};"
          else ""))
    auditBatchLedger(ckptDir, Some(parsed))
  }

  /** Mirror of Spark's `InMemoryFileIndex.shouldFilterOut`, the listing
    * rule FileStreamSource sees files through: dot- and underscore-
    * prefixed names are hidden, EXCEPT underscore names containing '='
    * (partition-dir shapes) and the `_metadata`/`_common_metadata`
    * sidecars, which Spark's listing explicitly keeps. */
  private def visibleToFileSource(name: String): Boolean = {
    val excluded = (name.startsWith("_") && !name.contains("=")) ||
      name.startsWith(".") || name.endsWith("._COPYING_")
    val kept = name.startsWith("_metadata") || name.startsWith("_common_metadata")
    !excluded || kept
  }

  /** [[auditFiles]] with the manifest read from the harness-owned staging
    * directory itself: every file visible to FileStreamSource's listing
    * rule must have been ingested exactly once. */
  def audit(ckptDir: String, stageDir: java.nio.file.Path): Unit = {
    val staged = Option(stageDir.toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && visibleToFileSource(f.getName))
      .map(_.getAbsolutePath).toSeq
    auditFiles(ckptDir, staged)
  }
}
