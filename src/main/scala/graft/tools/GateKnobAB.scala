package graft.tools

import org.apache.spark.sql.SparkSession

/** Generic per-entry knob A/B over the `graft.replay.conf` session seam
  * (the St10PlanAB harness, parameterized — r20): run ONE replay-backed
  * entry under N conf legs, 3 solo reps per leg, best-wall rep kept
  * with the floor split and per-rep steal/sys CPU; row counts must be
  * identical across legs (a knob that changes the answer is not a
  * knob). Motivated by the fork-free-FS change: the r17 knob nulls
  * (RocksDB changelog checkpointing, 4 shuffle partitions) were
  * measured under commits dominated by per-file chmod forks — with
  * those gone the cost profile of checkpoint-file count vs size
  * changed, so the nulls must be re-earned, not re-cited.
  *
  * Usage: scripts/run.sh graft.tools.GateKnobAB <outJson> <entry> \
  *          <legName=confSpec;confSpec>... ("baseline" = empty spec)
  */
object GateKnobAB {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: GateKnobAB <outJson> <entry> <name=conf>...")
    val outJson = args(0)
    val entry = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val legs: Seq[(String, String)] = args.drop(2).toSeq.map { spec =>
      val i = spec.indexOf('=')
      require(i > 0, s"leg '$spec' is not name=conf")
      (spec.take(i), spec.drop(i + 1))
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-gate-knob-ab")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def runOnce(): (Double, Long, Map[String, Double], (Double, Double)) = {
      val c0 = graft.CpuStat.ticks()
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(entry)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      (wall, rows, graft.streaming.StreamReplay.lastFloor.get(),
        graft.CpuStat.pct(c0, graft.CpuStat.ticks()))
    }
    try runOnce() catch { case e: Throwable => System.err.println(s"[knobab] warmup failed: $e") }

    val results = legs.map { case (name, conf) =>
      if (conf.isEmpty || name == "baseline" && conf == "baseline") sys.props.remove("graft.replay.conf")
      else sys.props.put("graft.replay.conf", conf)
      try {
        val reps = (1 to 3).map(_ => runOnce())
        val best = reps.minBy(_._1)
        println(f"$name: walls=${reps.map(r => f"${r._1}%.2f").mkString(",")} rows=${best._2} " +
          f"addBatch=${best._3.getOrElse("batch_addBatch_sec", -1.0)}%.2f")
        (name, conf, reps, best)
      } finally sys.props.remove("graft.replay.conf")
    }
    val baseRows = results.head._4._2
    results.foreach { case (name, _, _, best) =>
      require(best._2 == baseRows,
        s"leg $name changed the ANSWER: ${best._2} rows vs baseline $baseRows") }

    def legJson(name: String, conf: String,
        reps: Seq[(Double, Long, Map[String, Double], (Double, Double))],
        best: (Double, Long, Map[String, Double], (Double, Double))): String = {
      val f = best._3
      s""""$name":{"conf":${graft.JsonEscape.q(conf)},"rows":${best._2}""" +
        s""","rep_walls_sec":${reps.map(r => f"${r._1}%.3f").mkString("[", ",", "]")}""" +
        s""","rep_cpu_steal_sys_pct":${reps.map(r => s"[${r._4._1},${r._4._2}]").mkString("[", ",", "]")}""" +
        f""","best_wall_sec":${best._1}%.3f""" +
        f""","queryPlanning_sec":${f.getOrElse("batch_queryPlanning_sec", -1.0)}%.3f""" +
        f""","addBatch_sec":${f.getOrElse("batch_addBatch_sec", -1.0)}%.3f""" +
        f""","triggerExecution_sec":${f.getOrElse("batch_triggerExecution_sec", -1.0)}%.3f""" +
        f""","batches":${f.getOrElse("batches", -1.0)}%.0f}"""
    }
    val json =
      s"""{"sf":"$sfDir","cpus":$cpus,"entry":"$entry",""" +
        s""""note":"per-entry knob A/B via graft.replay.conf; 3 solo reps per leg, best-wall rep reported; rows enforced identical across legs",""" +
        results.map { case (n, c, reps, best) => legJson(n, c, reps, best) }.mkString(",") + "}"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json)
    println(json)
    spark.stop()
  }
}
