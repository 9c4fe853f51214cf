package graft.tools

import org.apache.spark.sql.SparkSession

/** Itemize the streaming-replay cost floor (judge ask r16#5): st18/st19/
  * st09/st10 dominate the bench sweep at ~30% of total and have been
  * adjudicated "protocol cost" since r13 without a breakdown. This probe
  * runs each entry SOLO (3 reps, keeping the best-total rep)
  * and reads [[graft.streaming.StreamReplay.lastFloor]] after each: wall
  * split into harness phases (staging, query start, processing,
  * settle-poll sleep/sink-count where the TTL protocol polls, state
  * extract) plus the engine's own per-batch duration sums from the
  * progress history (addBatch = execution, walCommit/commitOffsets =
  * checkpoint I/O, triggerExecution = the whole batch envelope).
  *
  * Interpretation key: poll_sleep_sec is pure idle (the harness waiting
  * on a 100 ms cadence for the sink to reach its expected size — the
  * ProcessingTime-TWS protocol that cannot use processAllAvailable);
  * batch_addBatch_sec is real query execution; batch_walCommit_sec +
  * batch_commitOffsets_sec is checkpoint-log I/O. If idle dominates, the
  * poll cadence is the lever; if addBatch dominates, the floor is real
  * work and the adjudication stands with its missing number filled in.
  *
  * Usage: scripts/run.sh graft.tools.ReplayFloorProbe [outJson] [sfDir]
  */
object ReplayFloorProbe {
  def main(args: Array[String]): Unit = {
    val outJson = args.headOption.getOrElse("SOAK_r17_replayfloor.json")
    val sfDir = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-replay-floor")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // optional third arg: comma-separated entry names (any replay-backed
    // entry) — the r19 optimization round probes beyond the original four
    val entries = args.lift(2).map(_.split(",").toSeq.map(_.trim)).getOrElse(Seq(
      "st18_neardup_ingest_ttl",   // TTL'd TWS gate: settle-poll protocol
      "st19_gate_state_reader",    // gate + statestore extract
      "st09_exactly_once_sink",    // foreachBatch idempotent parquet sink
      "st10_interval_join_outer")) // stream-stream outer join

    // warmup: one untimed pass of the cheapest entry compiles the replay
    // harness + streaming codegen paths
    try { graft.SparkEntry.queries("st10_interval_join_outer")(spark, sfDir).count() }
    catch { case e: Throwable => System.err.println(s"[floor] warmup failed: $e") }

    val out = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, Double]]
    entries.foreach { name =>
      val reps = (1 to 3).map { i =>
        val c0 = graft.CpuStat.ticks()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        val (steal, sys) = graft.CpuStat.pct(c0, graft.CpuStat.ticks())
        val floor = graft.streaming.StreamReplay.lastFloor.get()
        (wall, floor ++ Map("entry_wall_sec" -> wall,
          "cpu_steal_pct" -> steal, "cpu_sys_pct" -> sys))
      }
      val best = reps.minBy(_._1)
      println(f"$name: walls=${reps.map(r => f"${r._1}%.2f").mkString(",")} " +
        s"best floor=${best._2.toSeq.sortBy(_._1).map { case (k, v) => f"$k=$v%.2f" }.mkString(" ")}")
      out(name) = best._2
      out(s"${name}__rep_walls") = reps.zipWithIndex
        .map { case ((w, _), i) => s"rep${i + 1}" -> w }.toMap
    }

    def j(m: Map[String, Double]): String = m.toSeq.sortBy(_._1)
      .map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val json =
      s"""{"sf":"$sfDir","cpus":$cpus,""" +
      s""""note":"per-entry best-of-3 solo wall split into harness phases + engine per-batch duration sums (see ReplayFloorProbe scaladoc); poll_sleep_sec is pure idle, batch_addBatch_sec is execution, batch_walCommit+batch_commitOffsets is checkpoint-log I/O",""" +
      out.map { case (k, v) => s""""$k":${j(v)}""" }.mkString(",") + "}"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json)
    println(json)
    spark.stop()
  }
}
