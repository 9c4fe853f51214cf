package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** st17's OTHER regime, measured (the SOAK_r10g artifact names its own
  * blind spot: that soak was changeset-dominated — 1.25M-event batches
  * against a 200k-row target). Here: SMALL changesets (1% of the user
  * space per apply) against LARGE targets, the regime where each plain
  * apply's cost is O(target) — and the q38b composition
  * (`EventStreams.applyChangesetBucketed`) run against the plain apply
  * at the largest target, so the artifact shows exactly WHAT the
  * bucketed layout removes (the per-apply target-side shuffle: expect
  * plain shuffle_mb ∝ target and bucketed shuffle_mb ∝ changeset) and
  * what it cannot (the O(target) parquet REWRITE — wall stays ∝ target
  * in both; removing that residual is table-format compaction's job,
  * not a shuffle plan's).
  *
  * Usage: scripts/run.sh graft.tools.CdcRegimeSoak [outJson] [applies]
  */
object CdcRegimeSoak {

  /** Deterministic synthetic changeset: n events spread over `users`
    * ids, value in [0, 10). */
  private def changeset(s: SparkSession, n: Long, users: Long, salt: Long): DataFrame =
    s.range(n).select(
      pmod(xxhash64(col("id"), lit(salt)), lit(users)).as("user_id"),
      (pmod(xxhash64(col("id"), lit(salt + 7)), lit(1000L)) / 100.0).as("value"))

  private def runJson(r: ScaleProbe.Run): String =
    f"""{"seconds":${r.secs}%.2f,"shuffle_mb":${r.shuffleMb},"peak_heap_mb":${r.peakHeapMb},
       |"steal_pct":${r.stealPct},"sys_pct":${r.sysPct}}""".stripMargin.replace("\n", "")

  private def leg(s: SparkSession, users: Long, applies: Int,
      bucketed: Boolean): String = {
    val target = graft.Scratch.tempDir("graft-cdcregime").toString
    val prefix = s"graft_cdcsoak_${users}_${if (bucketed) "b" else "p"}"
    def apply(chg: DataFrame, id: Long): Unit =
      if (bucketed)
        graft.streaming.EventStreams.applyChangesetBucketed(
          chg, id, target, prefix, buckets = 32)
      else graft.streaming.EventStreams.applyChangeset(chg, id, target)
    try {
      // v0: one event per user — the big target the regime is about
      val seed = ScaleProbe.measure(s) { apply(changeset(s, users, users, 1L), 0L); 0L }
      val runs = (1 to applies).map { i =>
        val chg = changeset(s, users / 100, users, 100L + i)
        ScaleProbe.measure(s) { apply(chg, i.toLong); 0L }
      }
      val n = s.read.parquet(
        graft.streaming.EventStreams.latestVersion(target).get).count()
      val mean = runs.map(_.secs).sum / runs.size
      val meanShuffle = runs.map(_.shuffleMb).sum / runs.size
      f"""{"target_rows":$n,"seed":${runJson(seed)},
         |"applies":${runs.map(runJson).mkString("[", ",", "]")},
         |"mean_apply_s":$mean%.2f,"mean_apply_shuffle_mb":$meanShuffle}"""
        .stripMargin.replace("\n", "")
    } finally {
      if (bucketed) (0 to applies).foreach(i =>
        s.sql(s"DROP TABLE IF EXISTS ${prefix}_v$i"))
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(target))
      catch { case _: java.io.IOException => () }
    }
  }

  def main(args: Array[String]): Unit = {
    val outJson = args.headOption.getOrElse("SOAK_r11b.json")
    val applies = args.drop(1).headOption.map(_.toInt).getOrElse(6)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val targets = Seq(1000000L, 3000000L, 10000000L, 30000000L)
    val plain = targets.map { t =>
      val j = leg(spark, t, applies, bucketed = false)
      println(s"plain $t done"); s""""$t":$j"""
    }.mkString("{", ",", "}")
    val bucketed = {
      val j = leg(spark, targets.last, applies, bucketed = true)
      println("bucketed done"); j
    }
    val out =
      s"""{"regime":"small_changeset_large_target","changeset_pct":1,
         |"applies_per_leg":$applies,
         |"plain":$plain,"bucketed_${targets.last}":$bucketed,
         |"method":"each leg seeds v0 with one event per user, then applies $applies changesets of 1% of the user space via the st17 snapshot protocol; plain = EventStreams.applyChangeset (per-apply full-outer merge shuffles the whole target), bucketed = applyChangesetBucketed (q38b composition: prior version read as a 32-bucket catalog scan, only the changeset shuffles, output written bucketed). Expect plain mean_apply_shuffle_mb to scale with target and bucketed to stay changeset-sized; per-apply WALL stays O(target) in both (the parquet rewrite) - that residual is table-format compaction territory, stated in EventStreams.applyChangesetBucketed's doc."}"""
        .stripMargin.replace("\n", "")
    val w = new java.io.PrintWriter(new java.io.File(outJson),
      java.nio.charset.StandardCharsets.UTF_8)
    try w.println(out) finally w.close()
    println(s"CDC REGIME SOAK OK -> $outJson")
    spark.stop()
  }
}
