package graft.tools

import org.apache.spark.sql.SparkSession

/** st16 ingest-gate soak: the streaming near-dup admission filter
  * replayed over a GENERATED document corpus at depth (default 500k docs
  * = 100× the sf0.1 table, ~2M band-owner state entries under RocksDB),
  * 8 doc_id-ranged chunks — per-batch latency, state rows, and RocksDB
  * SST size recorded, the SOAK_r09f/r10c instrumentation applied to the
  * documents-stream path. The corpus is `ScaleProbe.genDocs` (sf0.1
  * statistics: ~54-word docs over the shared vocabulary, an exact
  * duplicate every 625 docs), so the flagged count has a floor of the
  * planted dup groups plus whatever vocabulary collisions the 4-band LSH
  * admits — the soak asserts the floor, not an exact count.
  *
  * With a second arg of `ttl`, a SECOND leg replays the same corpus
  * through the TTL'd gate (st18's `nearDupFlagsTtl`, 1-hour TTL — far
  * above replay cadence, so flags must be IDENTICAL) to price the TTL
  * machinery at depth: processing-time mode, per-value expiration
  * bookkeeping plus RocksDB's TTL secondary index, and the
  * never-quiescing batch loop. The artifact then carries both legs'
  * per-batch walls and state footprints side by side.
  *
  * Usage: scripts/run.sh graft.tools.IngestSoak [outJson] [nDocs] [ttl]
  */
object IngestSoak {

  private def runLeg(spark: SparkSession, dir: String, n: Long,
      ttlMillis: Option[Long]): (Long, String) = {
    import scala.jdk.CollectionConverters._
    val heapPools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
    heapPools.foreach(_.resetPeakUsage())
    import graft.CpuStat.{ticks, pct}
    val c0 = ticks(); val t0 = System.nanoTime()
    val (flagged, progress) =
      graft.streaming.StreamReplay.soakNearDup(spark, dir, chunks = 8, ttlMillis)
    val secs = (System.nanoTime() - t0) / 1e9
    val (stealPct, sysPct) = pct(c0, ticks())
    val peakHeapMb = heapPools.map(_.getPeakUsage.getUsed).sum >> 20
    val batches = progress.filter(_.numInputRows > 0).map { p =>
      val so = Option(p.stateOperators).toSeq.flatten.headOption
      val custom = so.map(_.customMetrics.asScala.map { case (k, v) => k -> v.longValue }.toMap)
        .getOrElse(Map.empty)
      s"""{"batch":${p.batchId},"input_rows":${p.numInputRows},
         |"batch_ms":${p.batchDuration},
         |"state_rows":${so.map(_.numRowsTotal).getOrElse(0L)},
         |"state_mem_mb":${so.map(_.memoryUsedBytes).getOrElse(0L) >> 20},
         |"rocksdb_sst_mb":${custom.getOrElse("rocksdbSstFileSize", 0L) >> 20}}"""
        .stripMargin.replace("\n", "")
    }.mkString("[", ",", "]")
    // planted floor: one flagged copy per exact-dup group (the
    // generator copies doc id-1 onto every id ≡ 1 mod 625)
    val plantedDups = (1L until n by 625L).size.toLong
    require(flagged >= plantedDups,
      s"flagged $flagged below the planted-duplicate floor $plantedDups")
    val op = if (ttlMillis.isDefined) "st18_neardup_ingest_ttl" else "st16_neardup_ingest"
    (flagged,
      s"""{"docs":$n,"chunks":8,"op":"$op",
         |"state_store":"rocksdb","docs_flagged":$flagged,
         |"planted_dup_floor":$plantedDups,
         |"seconds":${f"$secs%.1f"},"run_steal_pct":$stealPct,"run_sys_pct":$sysPct,
         |"peak_heap_mb":$peakHeapMb,"batches":$batches}""".stripMargin.replace("\n", ""))
  }

  def main(args: Array[String]): Unit = {
    // strictly positional per the documented usage — [outJson] [nDocs]
    // [ttl] — so `IngestSoak ttl` is a malformed nDocs (rejected), not a
    // TTL run writing its artifact to a file literally named "ttl"
    val outJson = args.headOption.getOrElse("SOAK_r10f.json")
    val n = args.drop(1).headOption.map { a =>
      // toLongOption folds every malformed shape — non-digits, zero, and
      // >19-digit overflow alike — into the one usage error
      a.toLongOption.filter(_ > 0).getOrElse(sys.error(
        s"nDocs (2nd arg) must be a positive integer, got '$a'; " +
          "usage: IngestSoak [outJson] [nDocs] [ttl]"))
    }.getOrElse(500000L)
    val withTtl = args.drop(2).headOption match {
      case Some("ttl") => true
      case Some(other) => sys.error(
        s"3rd arg must be 'ttl' if present, got '$other'; " +
          "usage: IngestSoak [outJson] [nDocs] [ttl]")
      case None => false
    }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = graft.Scratch.tempDir("ingestsoak")
    try {
      ScaleProbe.genDocs(spark, n).write.parquet(s"$dir/documents.parquet")
      val (plainFlagged, plain) = runLeg(spark, dir.toString, n, None)
      println("plain leg done")
      val parts = Seq(s""""streaming_neardup_ingest":$plain""") ++
        (if (withTtl) {
          val (ttlFlagged, ttl) = runLeg(spark, dir.toString, n, Some(3600L * 1000))
          println("ttl leg done")
          // 1h TTL >> replay cadence: nothing may expire, so the TTL'd
          // gate must flag the IDENTICAL document set
          require(ttlFlagged == plainFlagged,
            s"ttl leg flagged $ttlFlagged != plain $plainFlagged at non-expiring TTL")
          Seq(s""""streaming_neardup_ingest_ttl":$ttl""")
        } else Seq.empty)
      val w = new java.io.PrintWriter(new java.io.File(outJson),
        java.nio.charset.StandardCharsets.UTF_8)
      try w.println(parts.mkString("{", ",", "}")) finally w.close()
      println(s"INGEST SOAK OK -> $outJson")
    } finally {
      try org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
      catch { case _: java.io.IOException => () }
      spark.stop()
    }
  }
}
