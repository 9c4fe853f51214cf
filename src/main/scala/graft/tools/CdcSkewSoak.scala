package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The skewed-changeset regime for the bucketed CDC apply: changesets
  * whose users cluster into 2 of the 32 buckets (a hot tenant / narrow
  * backfill), applied to growing targets with
  *
  *  - the FULL bucketed apply (`applyChangesetBucketed`: shuffle already
  *    O(changeset), but every version re-reads + re-writes ALL buckets),
  *  - the PRUNED apply (`applyChangesetBucketedPruned`: reads + rewrites
  *    only the touched buckets, byte-copies the untouched files forward
  *    through the FileSystem seam).
  *
  * The artifact records per-apply wall + shuffle for both legs at each
  * target size, plus the byte ledger of one pruned version (new bytes
  * written vs bytes copied forward) — the claim under measure is that
  * the pruned apply's DECODE+ENCODE work is bounded by the touched
  * fraction, with the copy-forward's raw byte relay as the only
  * O(target) residual (server-side copy on a real object store).
  *
  * Usage: scripts/run.sh graft.tools.CdcSkewSoak [outJson] [applies]
  */
object CdcSkewSoak {

  private val Buckets = 32

  /** Seed changeset: one event per user over the whole id space. */
  private def seedChangeset(s: SparkSession, users: Long): DataFrame =
    s.range(users).select(col("id").as("user_id"),
      (pmod(xxhash64(col("id"), lit(7L)), lit(1000L)) / 100.0).as("value"))

  /** Skewed changeset: `n` events over users confined to buckets {0, 1}
    * of the 32 — `pmod(hash(user_id), 32) < 2`, the exact routing the
    * apply itself derives the touched set with. */
  private def skewedChangeset(s: SparkSession, users: Long, n: Long,
      salt: Long): DataFrame =
    s.range(users)
      .select(col("id").as("user_id"))
      .filter(pmod(hash(col("user_id")), lit(Buckets)) < 2)
      .limit(n.toInt)
      .select(col("user_id"),
        (pmod(xxhash64(col("user_id"), lit(salt)), lit(1000L)) / 100.0).as("value"))

  private def runJson(r: ScaleProbe.Run): String =
    f"""{"seconds":${r.secs}%.2f,"shuffle_mb":${r.shuffleMb},
       |"steal_pct":${r.stealPct},"sys_pct":${r.sysPct}}"""
      .stripMargin.replace("\n", "")

  private def leg(s: SparkSession, users: Long, applies: Int,
      pruned: Boolean): String = {
    val target = graft.Scratch.tempDir("graft-cdcskew").toString
    val prefix = s"graft_cdcskew_${users}_${if (pruned) "p" else "f"}"
    def apply(chg: DataFrame, id: Long): Unit =
      if (pruned) graft.streaming.EventStreams.applyChangesetBucketedPruned(
        chg, id, target, prefix, buckets = Buckets)
      else graft.streaming.EventStreams.applyChangesetBucketed(
        chg, id, target, prefix, buckets = Buckets)
    try {
      val seed = ScaleProbe.measure(s) { apply(seedChangeset(s, users), 0L); 0L }
      val runs = (1 to applies).map { i =>
        val chg = skewedChangeset(s, users, 20000L, 100L + i)
        ScaleProbe.measure(s) { apply(chg, i.toLong); 0L }
      }
      // byte ledger of the LAST version vs its prior: which bytes were
      // new parquet writes and which were carried file names
      val fs = new org.apache.hadoop.fs.Path(target)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      def files(v: Long) = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$target/v$v")).toSeq
        .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))
        .map(st => st.getPath.getName -> st.getLen).toMap
      val prev = files(applies - 1L); val last = files(applies.toLong)
      val carried = last.filter { case (n, len) => prev.get(n).contains(len) }
      val fresh = last -- carried.keySet
      val n = s.read.parquet(
        graft.streaming.EventStreams.latestVersion(target).get).count()
      val mean = runs.map(_.secs).sum / runs.size
      f"""{"target_rows":$n,"seed":${runJson(seed)},
         |"applies":${runs.map(runJson).mkString("[", ",", "]")},
         |"mean_apply_s":$mean%.2f,
         |"last_version_files":${last.size},
         |"carried_files":${carried.size},"carried_mb":${carried.values.sum / 1048576},
         |"fresh_files":${fresh.size},"fresh_mb":${fresh.values.sum / 1048576}}"""
        .stripMargin.replace("\n", "")
    } finally {
      (0 to applies).foreach(i =>
        s.sql(s"DROP TABLE IF EXISTS ${prefix}_v$i"))
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(target))
      catch { case _: java.io.IOException => () }
    }
  }

  def main(args: Array[String]): Unit = {
    val outJson = args.headOption.getOrElse("SOAK_r13c.json")
    val applies = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // 64M extends the r13 grid one target up: the full apply's
    // O(target) decode+encode keeps growing, the pruned apply's doesn't
    // — the crossover is the measurement
    val targets = Seq(1000000L, 4000000L, 16000000L, 64000000L)
    val out = targets.map { t =>
      val full = leg(spark, t, applies, pruned = false)
      println(s"full $t done")
      val pr = leg(spark, t, applies, pruned = true)
      println(s"pruned $t done")
      s""""$t":{"full":$full,"pruned":$pr}"""
    }.mkString(
      s"""{"op":"cdc_skewed_changeset","buckets":$Buckets,"applies":$applies,
         |"changeset_rows":20000,"touched_buckets":2,"targets":{"""
        .stripMargin.replace("\n", ""),
      ",", "}}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), out)
    println(out)
    spark.stop()
  }
}
