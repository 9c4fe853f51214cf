package graft.tools

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement probe (guide §1): for each named
  * SparkEntry query, write the full `.explain("formatted")` plan to
  * `<outDir>/<name>.txt` and time the computation with the NOOP sink
  * (computes every column of every row, discards the result — §1.4) so
  * the number is the engine's work, not the sink's or count()-pruning's.
  *
  *   scripts/run.sh graft.tools.QueryProbe <outDir> [reps] [sfDir] <name>...
  *   (name "all" probes every entry)
  *
  * Session shape mirrors Bench (local[$SPARK_GRAFT_CPUS], shuffle
  * partitions = cores, AQE on) so plan and timing match what the bench
  * measures; each query is warmed once at sf0.001 first.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2 && args(2).startsWith("/")) args(2)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nameArgs = args.drop(if (args.length > 2 && args(2).startsWith("/")) 3 else 2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names: Seq[String] =
      if (nameArgs.sameElements(Array("all"))) graft.SparkEntry.queries.keys.toSeq.sorted
      else { nameArgs.foreach(n => require(graft.SparkEntry.queries.contains(n),
        s"unknown query $n")); nameArgs.toSeq }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // warm dir derived, not hardcoded (r19 advisor): honor the bench's
    // own env knob, fall back to the probed sfDir when the small-sf
    // default is absent — a silently-failed warm would charge codegen
    // compile cost to the first timed rep
    val warmDir = sys.env.get("SPARK_GRAFT_WARM_DIR")
      .orElse(Some("/root/testdata/sf0.001")
        .filter(d => new java.io.File(d).isDirectory))
      .getOrElse(sfDir)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(s"probe: $name")
      try fn(spark, warmDir)
        .write.format("noop").mode("overwrite").save() // warm
      catch { case e: Throwable =>
        System.err.println(s"[probe] warm $name failed: ${e.getMessage}") }
      val times = (1 to reps).map { _ =>
        val t = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[probe] $name failed: ${e.getMessage}"); -1.0 }
      }
      // plan AFTER timing: explain on a fresh frame, so AQE's initial plan
      // is what lands in the file (matches what a reader of the code sees)
      val plan = try fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      catch { case e: Throwable => s"explain failed: ${e.getMessage}" }
      val w = new java.io.PrintWriter(new java.io.File(s"$outDir/$name.txt"),
        java.nio.charset.StandardCharsets.UTF_8)
      try { w.println(s"== $name @ $sfDir (noop-sink seconds: " +
        times.map(t => f"$t%.3f").mkString(", ") + ") =="); w.println(plan) }
      finally w.close()
      println(f"$name%-36s best ${times.filter(_ >= 0).minOption.getOrElse(-1.0)}%7.3f  " +
        times.map(t => f"$t%.3f").mkString("[", ", ", "]"))
    }
    spark.stop()
  }
}
