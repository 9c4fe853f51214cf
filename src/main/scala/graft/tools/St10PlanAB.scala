package graft.tools

import org.apache.spark.sql.SparkSession

/** st10 per-batch replanning A/B (the r17 verdict's #5 ask): the replay
  * floor itemization measured 0.69s of st10's ~5.1s in `queryPlanning`
  * across its 6 micro-batches — the stream-stream outer join's
  * incremental plan is re-derived per batch. This probe measures whether
  * anything CHEAP moves that number, without touching entry code, via
  * the `graft.replay.conf` session seam:
  *
  *   - baseline — the shipped configuration;
  *   - constraint propagation OFF — the optimizer rule family that
  *     dominates re-analysis cost on join-heavy plans
  *     (`spark.sql.constraintPropagation.enabled=false`);
  *   - AQE off — removes adaptive-plan bookkeeping from each batch's
  *     planning pass (streaming execution itself never applies AQE, so
  *     any delta is pure planning overhead).
  *
  * Per leg: 3 solo reps, best-wall rep kept, with the floor split
  * (queryPlanning / addBatch / triggerExecution sums off the progress
  * history) and per-rep steal/sys CPU next to every number — plus the
  * result ROW COUNT, which must be identical across legs (a knob that
  * changes the answer is not a knob). A win or a null both land in the
  * artifact; the r17 round recorded two honest knob nulls the same way.
  *
  * Usage: scripts/run.sh graft.tools.St10PlanAB [outJson] [sfDir]
  */
object St10PlanAB {
  def main(args: Array[String]): Unit = {
    val outJson = args.headOption.getOrElse("SOAK_r18_st10ab.json")
    val sfDir = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-st10-plan-ab")
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
      val rows = graft.SparkEntry.queries("st10_interval_join_outer")(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = graft.CpuStat.pct(c0, graft.CpuStat.ticks())
      (wall, rows, graft.streaming.StreamReplay.lastFloor.get(), cpu)
    }

    // untimed warmup compiles the replay harness + streaming codegen
    try runOnce() catch { case e: Throwable => System.err.println(s"[st10ab] warmup failed: $e") }

    val legs = Seq(
      "baseline" -> "",
      "constraint_propagation_off" -> "spark.sql.constraintPropagation.enabled=false",
      "aqe_off" -> "spark.sql.adaptive.enabled=false")

    val results = legs.map { case (name, conf) =>
      if (conf.isEmpty) sys.props.remove("graft.replay.conf")
      else sys.props.put("graft.replay.conf", conf)
      try {
        val reps = (1 to 3).map(_ => runOnce())
        val best = reps.minBy(_._1)
        println(f"$name: walls=${reps.map(r => f"${r._1}%.2f").mkString(",")} rows=${best._2} " +
          f"planning=${best._3.getOrElse("batch_queryPlanning_sec", -1.0)}%.2f")
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
      s""""$name":{"conf":"$conf","rows":${best._2}""" +
        s""","rep_walls_sec":${reps.map(r => f"${r._1}%.3f").mkString("[", ",", "]")}""" +
        s""","rep_cpu_steal_sys_pct":${reps.map(r => s"[${r._4._1},${r._4._2}]").mkString("[", ",", "]")}""" +
        f""","best_wall_sec":${best._1}%.3f""" +
        f""","queryPlanning_sec":${f.getOrElse("batch_queryPlanning_sec", -1.0)}%.3f""" +
        f""","addBatch_sec":${f.getOrElse("batch_addBatch_sec", -1.0)}%.3f""" +
        f""","triggerExecution_sec":${f.getOrElse("batch_triggerExecution_sec", -1.0)}%.3f""" +
        f""","batches":${f.getOrElse("batches", -1.0)}%.0f}"""
    }
    val json =
      s"""{"sf":"$sfDir","cpus":$cpus,""" +
        s""""note":"st10 per-batch replanning A/B via the graft.replay.conf session seam; 3 solo reps per leg, best-wall rep reported; rows must match across legs (enforced)",""" +
        results.map { case (n, c, reps, best) => legJson(n, c, reps, best) }.mkString(",") + "}"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json)
    println(json)
    spark.stop()
  }
}
