package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Solo A/B for the q18 clean-window +15% flagged by the r15 verdict
  * (0.112 → 0.129 s driver-to-driver, the only >10% comparable mover,
  * coincident with the conditional-cents rewrite in 2302adc).
  *
  * A_old = the pre-r15 expression: `round(sum(when(disc > .05, price)
  *         .otherwise(0.0)), 2)` — double accumulation, hash-flaky
  * B_new = the shipped expression: `sum(when(disc > .05, floor(price *
  *         100 + 0.5)).otherwise(0L)) / 100.0` — exact integer cents
  *
  * Interleaved reps (A,B,A,B,...) so a drifting machine window biases
  * neither side; /proc/stat sys/steal sampled per rep so a hostile
  * window is legible rather than laundered into the comparison.
  *
  * Usage: scripts/run.sh graft.tools.Q18AB [reps] [sfDir]
  */
object Q18AB {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(7)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def body(dir: String, cents: Boolean) = {
      val agg =
        if (cents)
          (sum(when(col("l_discount") > 0.05,
            floor(col("l_extendedprice") * 100 + lit(0.5))).otherwise(0L))
            / lit(100.0)).as("discounted_value")
        else
          round(sum(when(col("l_discount") > 0.05, col("l_extendedprice"))
            .otherwise(0.0)), 2).as("discounted_value")
      graft.Tables.lineitem(spark, dir)
        .groupBy(col("l_linestatus"))
        .agg(
          round(sum(when(col("l_returnflag") === "R", col("l_quantity")).otherwise(0.0)), 2).as("qty_returned"),
          agg,
          count(lit(1)).as("n"))
        .orderBy(col("l_linestatus"))
    }

    // warm both codegen paths
    body("/root/testdata/sf0.001", cents = false).count()
    body("/root/testdata/sf0.001", cents = true).count()

    val samples = scala.collection.mutable.Map(
      "A_old_double" -> scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Double)],
      "B_new_cents" -> scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Double)])
    (1 to reps).foreach { _ =>
      for ((label, cents) <- Seq("A_old_double" -> false, "B_new_cents" -> true)) {
        // CpuStat (Util.scala) — the one shared /proc/stat reader: closes
        // its handle, lifts missing fields on old kernels, None off-Linux
        val c0 = graft.CpuStat.ticks(); val t = System.nanoTime()
        body(sfDir, cents).count()
        val sec = (System.nanoTime() - t) / 1e9
        val (stealPct, sysPct) = graft.CpuStat.pct(c0, graft.CpuStat.ticks())
        samples(label) += ((sec, sysPct, stealPct))
      }
    }
    for ((label, ts) <- samples.toSeq.sortBy(_._1)) {
      val secs = ts.map(_._1)
      println(f"$label%-14s best=${secs.min}%.3f med=${secs.sorted.apply(reps / 2)}%.3f " +
        f"all=[${secs.map(t => f"$t%.3f").mkString(",")}] " +
        f"sys%%=[${ts.map(t => f"${t._2}%.1f").mkString(",")}] " +
        f"steal%%=[${ts.map(t => f"${t._3}%.1f").mkString(",")}]")
    }
    spark.stop()
  }
}
