package graft.tools

import graft.operators.{CurationQueries, DedupQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end curation-pipeline depth soak (the r17 verdict's #6 ask):
  * c16 (dedup → quality gate → stratified sample, FUSED) and c17
  * (near-dup decontaminated split) compose stages whose exponents were
  * measured INDIVIDUALLY in earlier soaks — but the fused pipelines had
  * never run at 10×/30× as a unit, and composition effects (skew after
  * filtering, broadcast thresholds crossed mid-pipeline, exchange reuse
  * breaking) are exactly what per-stage soaks miss.
  *
  * Protocol per scale (1×/10×/30× of a 20k-doc base): synthesize the
  * near-dup corpus (DedupSoakPhase.corpus — documents-table schema, every
  * 4 consecutive ids a near-dup family, 7 sources) into a scratch dir as
  * `documents.parquet`, then run the UNCHANGED gate-entry code against
  * that dir. Measured per scale, each with wall + shuffle MB + steal/sys
  * CPU + listener_drained (ScaleProbe.measure):
  *
  *   - `c16_keepers` — the content-hash dedup + token gate prefix alone
  *     (stage-level witness: its shuffle is the md5 exchange);
  *   - `c16_fused` — the full c16 entry (adds the per-source sample
  *     window — second exchange);
  *   - `d02_pairs` — the minhash banding pair stream c17 consumes;
  *   - `c17_fused` — the full c17 entry (pairs + two split joins +
  *     eviction + bucket agg).
  *
  * The artifact records wall/shuffle growth ratios and log-log exponents
  * between the 1× and 30× points for the two FUSED pipelines — the
  * composition numbers the per-stage soaks couldn't supply. Stage
  * prefixes share no cache with the fused runs (each is its own job), so
  * prefix walls are cumulative re-execution, reported as such.
  *
  * Usage: scripts/run.sh graft.tools.CurationSoak [outJson] [n1 n2 n3]
  */
object CurationSoak {

  def main(args: Array[String]): Unit = {
    val outJson = args.headOption.getOrElse("SOAK_r18_curation.json")
    val scales = if (args.length > 1) args.drop(1).toSeq.map(_.toLong)
                 else Seq(20000L, 200000L, 600000L)
    // the exponents divide by log(last/first): one scale (or equal
    // endpoints) would put NaN into the JSON artifact — fail loud instead
    require(scales.size >= 2 && scales.last != scales.head,
      s"need >=2 distinct scales for log-log exponents, got $scales")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-curation-soak")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class Scale(docs: Long, keepers: Long, c16Rows: Long,
                           pairs: Long, c17Rows: Long, c17Quarantined: Long,
                           mKeep: ScaleProbe.Run, mC16: ScaleProbe.Run,
                           mPairs: ScaleProbe.Run, mC17: ScaleProbe.Run)

    def runScale(n: Long): Scale = {
      val base = graft.Scratch.tempDir("curationsoak")
      try {
        val dir = base.toString
        DedupSoakPhase.corpus(spark, n)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        // stage prefix: c16's OWN dedup+gate head (the shared c16Keepers
        // def — the soak can never measure a drifted copy of the entry)
        var keepers = 0L
        val mKeep = ScaleProbe.measure(spark) {
          keepers = CurationQueries.c16Keepers(
            graft.Tables.documents(spark, dir)).count()
          keepers
        }
        var c16Rows = 0L
        val mC16 = ScaleProbe.measure(spark) {
          c16Rows = CurationQueries.c16_curation_e2e(spark, dir).count(); c16Rows
        }
        var pairs = 0L
        val mPairs = ScaleProbe.measure(spark) {
          // the same banded pair stream c17 consumes (d02's pipeline)
          pairs = DedupQueries.pairsFromBands(DedupQueries.lshBands(
            DedupQueries.shingles(graft.Tables.documents(spark, dir)))).count()
          pairs
        }
        var c17Rows = 0L; var quarantined = 0L
        val mC17 = ScaleProbe.measure(spark) {
          val rows = CurationQueries.c17_decontaminated_split(spark, dir).collect()
          c17Rows = rows.length.toLong
          quarantined = rows.find(_.getString(0) == "quarantined")
            .map(_.getLong(1)).getOrElse(0L)
          c17Rows
        }
        println(f"docs=$n keepers=$keepers c16=${mC16.secs}%.1fs " +
          f"pairs=$pairs c17=${mC17.secs}%.1fs quarantined=$quarantined")
        Scale(n, keepers, c16Rows, pairs, c17Rows, quarantined,
          mKeep, mC16, mPairs, mC17)
      } finally {
        try org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
        catch { case _: Throwable => () }
        graft.Scratch.untrack(base.toString)
      }
    }

    val rs = scales.map(runScale)

    def expo(w1: Double, wN: Double): Double =
      math.log(math.max(wN, 1e-3) / math.max(w1, 1e-3)) /
        math.log(rs.last.docs.toDouble / rs.head.docs)
    def runJ(r: ScaleProbe.Run): String = ScaleProbe.runJson(r)
    val items = rs.map { r =>
      s"""{"docs":${r.docs},"keepers":${r.keepers},"c16_rows":${r.c16Rows},""" +
        s""""d02_pairs":${r.pairs},"c17_rows":${r.c17Rows},""" +
        s""""c17_quarantined":${r.c17Quarantined},""" +
        s""""c16_keepers_stage":${runJ(r.mKeep)},"c16_fused":${runJ(r.mC16)},""" +
        s""""d02_pairs_stage":${runJ(r.mPairs)},"c17_fused":${runJ(r.mC17)}}"""
    }.mkString("[", ",", "]")
    val growth = rs.last.docs.toDouble / rs.head.docs
    val json =
      s"""{"scales":$items,"docs_growth":$growth,""" +
        f""""c16_fused_wall_exponent":${expo(rs.head.mC16.secs, rs.last.mC16.secs)}%.2f,""" +
        f""""c17_fused_wall_exponent":${expo(rs.head.mC17.secs, rs.last.mC17.secs)}%.2f,""" +
        f""""c16_shuffle_growth":${rs.last.mC16.shuffleMb.toDouble / math.max(rs.head.mC16.shuffleMb, 1)}%.1f,""" +
        f""""c17_shuffle_growth":${rs.last.mC17.shuffleMb.toDouble / math.max(rs.head.mC17.shuffleMb, 1)}%.1f,""" +
        s""""note":"fused gate-entry code run verbatim against scaled synthetic corpora; exponents are log-log wall slopes between the 1x and 30x points; stage rows (keepers, d02 pairs) witness where the volume goes; quarantined counts prove the decontamination leg stays live at depth"}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json)
    println(json)
    spark.stop()
  }
}
