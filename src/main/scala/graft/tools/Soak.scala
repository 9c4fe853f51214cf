package graft.tools

import graft.sources.pbf._
import org.apache.spark.sql.SparkSession

/** Long-horizon write-path soak: transcode a ~40M-element synthetic corpus
  * (2000× the sf0.1 bench probe's element count per block wave, ~9× the
  * bench corpus) and pin the K4 rotation contract beyond sf scale —
  * byte-targeted file rotation, per-type counts, readback equality — while
  * recording peak heap and the output file-size distribution.
  *
  * Emits one JSON artifact (default `SOAK_r05.json`, first arg overrides)
  * committed per round: a second, longer-horizon throughput sample next to
  * the bench probe, and proof the rotation target holds on a corpus big
  * enough to rotate many times per task.
  *
  * Usage: scripts/run.sh graft.tools.Soak [outJson] [blocks]
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val outJson = args.headOption.getOrElse("SOAK_r06.json")
    val blocks = if (args.length > 1) args(1).toInt else 1800 // ~40.1M elements
    val fileTargetMb = 64
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = graft.Scratch.tempDir("soak").toString
    try {
      val pbf = s"$dir/big.osm.pbf"
      val n = PbfWriter.synthesize(pbf, blocks = blocks, nodesPerBlock = 20000,
        waysPerBlock = 2250, relationsPerBlock = 29)
      println(s"corpus: $n elements")
      import scala.jdk.CollectionConverters._
      // box-contention telemetry around each timed run (graft.CpuStat,
      // same convention as the bench probe): the recorded steal/sys pcts
      // make a low throughput number self-explaining
      import graft.CpuStat.{ticks => cpuTicks, pct => cpuPct}
      val heapPools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getType == java.lang.management.MemoryType.HEAP)
      // untimed warmup transcode of the full corpus: pays JIT compilation
      // AND first-touch heap page-zeroing (a fresh 48g-heap JVM spends
      // most of its first transcode in kernel page faults — measured as
      // ~67% system CPU on an otherwise idle box — which is JVM startup
      // cost, not engine throughput)
      // TWO warmups, like the bench probe: the r6 lazy-iterator decode
      // needs more C2 iterations — with one warmup the timed run was still
      // compiling (measured 6.7M while the LATER, harder rotation phase
      // hit 11.6M)
      (1 to 2).foreach { _ =>
        OsmPbf.transcode(spark, PbfConfig(input = pbf, output = s"$dir/warmout",
          fileTargetMb = Some(fileTargetMb)))
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$dir/warmout"))
      }
      heapPools.foreach(_.resetPeakUsage())
      val c0 = cpuTicks()
      val t = System.nanoTime()
      val counts = OsmPbf.transcode(spark, PbfConfig(input = pbf, output = s"$dir/out",
        fileTargetMb = Some(fileTargetMb)))
      val secs = (System.nanoTime() - t) / 1e9
      val (stealPct, sysPct) = cpuPct(c0, cpuTicks())
      val rate = (n / secs).round
      val peakHeapMb = heapPools.map(_.getPeakUsage.getUsed).sum >> 20
      println(f"soak: $rate elem/s over $secs%.1f s, counts=$counts, peak heap ${peakHeapMb}MB")
      val back = spark.read.parquet(s"$dir/out")
      val byType = back.groupBy("type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      println(s"readback: $byType")
      assert(byType.values.sum == n, "element count mismatch!")
      assert(byType == counts, "transcode counts != readback counts!")
      // file-size distribution per type dir: rotation at --file-target-mb
      // means every file but each task's last should sit near the target
      val sizes: Map[String, Seq[Long]] = byType.keys.map { t =>
        t -> new java.io.File(s"$dir/out/type=$t").listFiles()
          .filter(_.getName.endsWith(".parquet")).map(_.length()).toSeq.sorted
      }.toMap
      sizes.foreach { case (t, ss) =>
        println(f"type=$t: ${ss.size} files, ${ss.map(_ >> 20).mkString("[", ",", "]")} MB")
      }
      val nodeFiles = sizes.getOrElse("node", Nil)
      assert(nodeFiles.size > 1, "expected multiple node files (one per task at minimum)")
      // phase-1 output is fully consumed (readback + sizes) — drop it now
      // so the rotation phase doesn't double peak tmpfs usage
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$dir/out"))

      // ROTATION phase: at this corpus size each task's decoded slice
      // (~16MB, the 2-waves-per-core auto split) compresses to ~7MB of
      // parquet — under the 64MB realistic target, so phase 1 writes one
      // file per task exactly like a planet run with default buffers.
      // To pin the BYTE-FEEDBACK rotation contract (K4) at soak scale,
      // re-transcode with a 4MB target: every task must now rotate on the
      // writer's own getDataSize feedback, multiplying the file count.
      val c2 = cpuTicks()
      val t2 = System.nanoTime()
      OsmPbf.transcode(spark, PbfConfig(input = pbf, output = s"$dir/out2",
        fileTargetMb = Some(4)))
      val secs2 = (System.nanoTime() - t2) / 1e9
      val (stealPct2, sysPct2) = cpuPct(c2, cpuTicks())
      val rotNodeFiles = new java.io.File(s"$dir/out2/type=node").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.length()).toSeq.sorted
      println(f"rotation phase (4MB target): ${rotNodeFiles.size} node files " +
        f"(was ${nodeFiles.size}), ${(n / secs2).round} elem/s")
      assert(rotNodeFiles.size > nodeFiles.size,
        s"4MB target did not increase node file count (${rotNodeFiles.size} vs ${nodeFiles.size})")
      val back2 = spark.read.parquet(s"$dir/out2").count()
      assert(back2 == n, "rotation-phase element count mismatch!")
      // histogram in 16MB buckets for the JSON artifact
      def hist(ss: Seq[Long]): Map[Long, Int] =
        ss.groupBy(_ >> 24 << 4).view.mapValues(_.size).toMap // bucket start in MB
      def histJson(ss: Seq[Long]): String = hist(ss).toSeq.sorted
        .map { case (mb, c) => s""""${mb}-${mb + 16}MB":$c""" }.mkString("{", ",", "}")
      // DEDUP-AT-SCALE phase: the d02→d07 pipeline over synthesized
      // near-dup corpora at two scales — measured candidate-pair counts
      // vs the Σ b(b-1)/2 bucket prediction, shuffle bytes, curvature
      val dedupJson = DedupSoakPhase.runJson(spark, Seq(50000L, 200000L))
      val json =
        s"""{"elements":$n,"seconds":${f"$secs%.1f"},"elems_per_s":$rate,
           |"run_steal_pct":$stealPct,"run_sys_pct":$sysPct,
           |"peak_heap_mb":$peakHeapMb,"file_target_mb":$fileTargetMb,
           |"counts":{${counts.toSeq.sorted.map { case (k, v) => s""""$k":$v""" }.mkString(",")}},
           |"files_per_type":{${sizes.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":${v.size}""" }.mkString(",")}},
           |"node_file_size_hist_mb":${histJson(nodeFiles)},
           |"node_file_sizes_mb":${nodeFiles.map(_ >> 20).mkString("[", ",", "]")},
           |"rotation_phase":{"file_target_mb":4,"node_files":${rotNodeFiles.size},
           |"node_files_at_64mb_target":${nodeFiles.size},"elems_per_s":${(n / secs2).round},
           |"run_steal_pct":$stealPct2,"run_sys_pct":$sysPct2,
           |"node_file_sizes_kb":${rotNodeFiles.map(_ >> 10).mkString("[", ",", "]")}},
           |"dedup":$dedupJson}""".stripMargin.replace("\n", "")
      val w = new java.io.PrintWriter(new java.io.File(outJson),
        java.nio.charset.StandardCharsets.UTF_8)
      try w.println(json) finally w.close()
      println(s"SOAK OK -> $outJson")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }
}
