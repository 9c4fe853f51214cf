package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B harness for the round-7 events-table regressions (a02 +198%,
  * st05 +94% — VERDICT r7 "What's wrong" #1). Both queries consume the
  * `events` table, whose parquet physical type changed in round 7 to
  * zoneless timestamp[us] (read as TimestampNTZType, NTZ→UTC cast added on
  * read). This tool adjudicates whether the cast path is the cost:
  *
  *   A = the driver's NTZ file as-is (cast on read, 1 row group)
  *   B = the same rows re-staged by Spark as session-UTC TimestampType
  *       (cast-free read), same single-file layout
  *
  * Each variant runs the same queries solo, N reps, with /proc/stat
  * system/steal% sampled around every rep so a hostile hypervisor window
  * is legible in the output instead of laundered into the comparison.
  *
  * Usage: scripts/run.sh graft.tools.EventsAB [reps] [sfDir]
  */
object EventsAB {
  private def cpuTicks(): (Long, Long, Long) = {
    val l = scala.io.Source.fromFile("/proc/stat").getLines().next()
    val f = l.trim.split("\\s+").drop(1).map(_.toLong)
    // user+nice+sys+idle+iowait+irq+softirq+steal
    (f(2) + f(5) + f(6), f(7), f.sum) // (system-ish, steal, total)
  }

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

    // B: cast-free copy — Tables.events already normalizes to TimestampType,
    // so writing it back yields timestamp[us] isAdjustedToUTC=true, which
    // reads back as TimestampType with NO cast (Tables.events falls through
    // to `case _ => raw`). coalesce(1) matches the source's 1-row-group
    // single-file layout so ONLY the logical type differs between A and B.
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
    println("B ts type: " + spark.read.parquet(s"$bSf/events.parquet").schema("ts").dataType)

    // A2: same NTZ file, but with timestamp-NTZ inference DISABLED — the
    // parquet reader surfaces the zoneless column directly as
    // TimestampType (pre-Spark-3.4 semantics: raw micros taken as UTC
    // micros, identical values to NTZ+cast under a UTC session) with no
    // cast Project in the plan at all.
    val queries = Seq("a02_range_join", "st05_interval_join_stream")
    try {
      // value-equality check first: A vs A2 must hash identically
      val fnEq = graft.SparkEntry.queries("a02_range_join")
      val hashA = fnEq(spark, sfDir).collect().map(_.toString).mkString("|").hashCode
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      val hashA2 = fnEq(spark, sfDir).collect().map(_.toString).mkString("|").hashCode
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
      println(s"a02 A-vs-A2 value hash: $hashA vs $hashA2  equal=${hashA == hashA2}")
      for (q <- queries) {
        val fn = graft.SparkEntry.queries(q)
        fn(spark, "/root/testdata/sf0.001").count() // warm codegen/JIT
        for ((label, dir) <- Seq("A_ntz" -> sfDir, "A2_nontz" -> sfDir, "B_utc" -> bSf)) {
          if (label == "A2_nontz")
            spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
          else
            spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
          val times = (1 to reps).map { _ =>
            val c0 = cpuTicks(); val t = System.nanoTime()
            fn(spark, dir).count()
            val sec = (System.nanoTime() - t) / 1e9; val c1 = cpuTicks()
            val dt = (c1._3 - c0._3).max(1)
            (sec, 100.0 * (c1._1 - c0._1) / dt, 100.0 * (c1._2 - c0._2) / dt)
          }
          val ts = times.map(_._1)
          println(f"$q%-28s $label  best=${ts.min}%.3f  med=${ts.sorted.apply(reps / 2)}%.3f  " +
            f"all=[${ts.map(t => f"$t%.3f").mkString(",")}]  " +
            f"sys%%=[${times.map(t => f"${t._2}%.1f").mkString(",")}]  " +
            f"steal%%=[${times.map(t => f"${t._3}%.1f").mkString(",")}]")
        }
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(bDir.toFile)
      spark.stop()
    }
  }
}
