package graft.tools

import org.apache.spark.sql.SparkSession

/** st19 at depth: how long does the statestore read of the ingest
  * gate's settled RocksDB checkpoint take as the persisted state grows?
  * For each corpus size the gate is replayed over `ScaleProbe.genDocs`
  * (8 chunks, RocksDB), then [[graft.streaming.DocStreams.ownerState]]
  * reads the checkpoint back COLD (first scan: planning + RocksDB
  * snapshot load per partition) and WARM (second scan, same JVM) — the
  * operational question a 100 TB gate debugger actually asks, measured
  * against state size. The reader's row count is asserted equal to the
  * store's own last-batch `numRowsTotal`: the read must see exactly the
  * committed state.
  *
  * Usage: scripts/run.sh graft.tools.StateReaderSoak [outJson] [sizes]
  * (sizes comma-separated doc counts, default 62500,250000,500000)
  */
object StateReaderSoak {

  def main(args: Array[String]): Unit = {
    val outJson = args.headOption.getOrElse("SOAK_r14c.json")
    val sizes = args.drop(1).headOption
      .map(_.split(",").toSeq.map(_.trim.toLong))
      .getOrElse(Seq(62500L, 250000L, 500000L))
    require(sizes.forall(_ > 0), s"sizes must be positive, got $sizes")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val legs = sizes.map { n =>
      val dir = graft.Scratch.tempDir("statereadsoak")
      try {
        ScaleProbe.genDocs(spark, n).write.parquet(s"$dir/documents.parquet")
        val t0 = System.nanoTime()
        val (readerRows, coldS, warmS, progress) =
          graft.streaming.StreamReplay.soakStateRead(spark, dir.toString, chunks = 8)
        val replayS = (System.nanoTime() - t0) / 1e9 - coldS - warmS
        val lastState = progress.filter(_.numInputRows > 0).lastOption
          .flatMap(p => Option(p.stateOperators).toSeq.flatten.headOption)
        val storeRows = lastState.map(_.numRowsTotal).getOrElse(-1L)
        val sstMb = lastState.map { so =>
          import scala.jdk.CollectionConverters._
          so.customMetrics.asScala.get("rocksdbSstFileSize")
            .map(_.longValue >> 20).getOrElse(0L)
        }.getOrElse(0L)
        require(readerRows == storeRows,
          s"state reader saw $readerRows rows, store committed $storeRows")
        println(s"docs=$n state_rows=$readerRows cold=${f"$coldS%.2f"}s " +
          s"warm=${f"$warmS%.2f"}s sst=${sstMb}MB")
        f"""{"docs":$n,"state_rows":$readerRows,"rocksdb_sst_mb":$sstMb,
           |"replay_s":$replayS%.1f,"read_cold_s":$coldS%.2f,
           |"read_warm_s":$warmS%.2f,"reader_rows_match_store":true}"""
          .stripMargin.replace("\n", "")
      } finally {
        try org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
        catch { case _: java.io.IOException => () }
      }
    }
    val out =
      s"""{"op":"st19_state_reader_depth","state_store":"rocksdb",
         |"gate":"st16 nearDupFlags (band-owner ValueState)","chunks":8,
         |"legs":${legs.mkString("[", ",", "]")}}"""
        .stripMargin.replace("\n", "")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), out)
    println(out)
    spark.stop()
  }
}
