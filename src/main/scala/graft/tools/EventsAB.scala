package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B harness for the events-table read-path cost (born from the round-7
  * a02 +198% / st05 +94% regressions, VERDICT r7 "What's wrong" #1; the
  * round-8 fix made [[graft.Tables.events]] read with an EXPLICIT
  * TimestampType schema and cache inferred schemas, which also made the
  * original tool's conf-toggle variants vacuous — every variant took the
  * same fixed plan, ADVICE r8). This version constructs each read plan
  * explicitly and runs them through the same a02 query body via the
  * [[graft.operators.EventJoins.a02From]] seam, so the variants are
  * genuinely different plans again:
  *
  *   A_cast     = the driver's NTZ file read by plain `spark.read.parquet`
  *                + `cast(ts as timestamp)` — the PRE-round-8-fix plan
  *                (a cast Project over every events row)
  *   A2_schema  = [[graft.Tables.events]]' production read: explicit
  *                schema declaring ts TimestampType, no cast in the plan
  *   B_utc      = the same rows re-staged as session-UTC TimestampType
  *                (logical type carries the zone; cast-free read), same
  *                single-file layout
  *
  * st05 (streaming) reads through [[graft.streaming.StreamReplay]], which
  * always uses the production Tables.events path — the cast plan cannot be
  * injected without invading the replay harness, so st05 runs A2 vs B only.
  *
  * Each variant runs solo, N reps, with /proc/stat system/steal% sampled
  * around every rep so a hostile hypervisor window is legible in the
  * output instead of laundered into the comparison.
  *
  * Usage: scripts/run.sh graft.tools.EventsAB [reps] [sfDir]
  */
object EventsAB {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // B: cast-free copy — Tables.events normalizes to TimestampType, so
    // writing it back yields timestamp[us] isAdjustedToUTC=true, which
    // reads back as TimestampType with no cast and no schema patch.
    // coalesce(1) matches the source's 1-row-group single-file layout so
    // ONLY the logical type differs between the A variants and B.
    val bDir = graft.Scratch.tempDir("graftab")
    val bEvents = bDir.resolve("staged")
    graft.Tables.events(spark, sfDir).coalesce(1)
      .write.parquet(bEvents.toString)
    val part = bEvents.toFile.listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
    Files.createDirectory(bDir.resolve("sf"))
    Files.move(part.toPath, bDir.resolve("sf").resolve("events.parquet"))
    val bSf = bDir.resolve("sf").toString
    println(s"A=$sfDir  B=$bSf (cast-free TimestampType)")
    println("A ts type (plain read): " +
      spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType)
    println("B ts type (plain read): " +
      spark.read.parquet(s"$bSf/events.parquet").schema("ts").dataType)

    import graft.operators.EventJoins.a02From
    // the genuinely-distinct a02 read plans (thunks — each run re-plans)
    def castRead(dir: String) = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    val a02Variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "A_cast" -> (() => a02From(castRead(sfDir))),
      "A2_schema" -> (() => a02From(graft.Tables.events(spark, sfDir))),
      "B_utc" -> (() => a02From(graft.Tables.events(spark, bSf))))

    def bench(q: String, label: String, run: () => Long): Unit = {
      val times = (1 to reps).map { _ =>
        // CpuStat (Util.scala) — the one shared /proc/stat reader: closes
        // its handle, lifts missing fields on old kernels, None off-Linux
        val c0 = graft.CpuStat.ticks(); val t = System.nanoTime()
        run()
        val sec = (System.nanoTime() - t) / 1e9
        val (stealPct, sysPct) = graft.CpuStat.pct(c0, graft.CpuStat.ticks())
        (sec, sysPct, stealPct)
      }
      val ts = times.map(_._1)
      println(f"$q%-28s $label%-10s best=${ts.min}%.3f  med=${ts.sorted.apply(reps / 2)}%.3f  " +
        f"all=[${ts.map(t => f"$t%.3f").mkString(",")}]  " +
        f"sys%%=[${times.map(t => f"${t._2}%.1f").mkString(",")}]  " +
        f"steal%%=[${times.map(t => f"${t._3}%.1f").mkString(",")}]")
    }

    try {
      // value-equality first: all three a02 plans must agree row-for-row
      val hashes = a02Variants.map { case (label, mk) =>
        label -> mk().collect().map(_.toString).mkString("|").hashCode
      }
      println(s"a02 value hashes: ${hashes.map { case (l, h) => s"$l=$h" }.mkString("  ")}  " +
        s"equal=${hashes.map(_._2).distinct.size == 1}")

      a02From(graft.Tables.events(spark, "/root/testdata/sf0.001")).count() // warm codegen/JIT
      for ((label, mk) <- a02Variants) bench("a02_range_join", label, () => mk().count())

      // st05 through the production replay harness: A2 (driver file) vs B
      val st05 = graft.SparkEntry.queries("st05_interval_join_stream")
      st05(spark, "/root/testdata/sf0.001").count() // warm
      for ((label, dir) <- Seq("A2_schema" -> sfDir, "B_utc" -> bSf))
        bench("st05_interval_join", label, () => st05(spark, dir).count())
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(bDir.toFile)
      spark.stop()
    }
  }
}
