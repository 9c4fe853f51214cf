package graft.sources.pbf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's differential validation suite
  * (osm-pbf-parquet/test/validate.py:57-217) as a reusable Spark API: run
  * any two datasets with the unified OSM schema (e.g. our parquet output
  * vs an independently-converted ground truth) through the V1-V5 checks.
  *
  * All checks are distributed — no driver-side collection of element rows;
  * each returns a DataFrame of violations (empty = pass), so a 100 TB
  * validation is just another job.
  */
object OsmValidate {

  /** V1: duplicate (id, type) keys (validate.py:57-64). */
  def duplicates(df: DataFrame): DataFrame =
    df.groupBy(col("id"), col("type")).count().filter(col("count") > 1)

  /** (partition, attempt) parsed from one part-file name — THE one
    * interpreter of the writer's `part-<task>-a<attempt>-` shape (the
    * proof tools parse pointer-commit manifests through this too, so a
    * name-shape change breaks exactly one anchored regex, loudly). */
  def attemptTagOf(fileName: String): Option[(Long, Long)] =
    "^part-(\\d+)-a(\\d+)-".r.findFirstMatchIn(fileName)
      .map(m => (m.group(1).toLong, m.group(2).toLong))

  /** Attempt-tag audit of a committed transcode output: greps part-file
    * names via [[attemptTagOf]] (the retry pin and the retry soak both
    * assert through THIS) and returns the distinct attempt ids seen per
    * partition. Fails loudly when no tagged files parse — a silent zero
    * would make every downstream "one attempt per partition" check
    * vacuously true after a name-shape drift. */
  def attemptTags(out: java.io.File): Map[Long, Set[Long]] = {
    val tags = out.listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).map(_.getName).filter(_.endsWith(".parquet"))
      .flatMap(attemptTagOf)
    require(tags.nonEmpty,
      s"no attempt-tagged part files found under $out — writer name shape changed?")
    tags.groupBy(_._1).map { case (p, ts) => p -> ts.map(_._2).toSet }
  }

  /** [[attemptTags]] over a pointer-commit manifest's relative paths
    * (`type=t/part-...`): one attempt per partition is the commit
    * invariant the proofs assert. Loud on an unparsable name. */
  def attemptTagsOfManifest(relPaths: Seq[String]): Map[Long, Set[Long]] = {
    val tags = relPaths.map(_.split('/').last).map { name =>
      attemptTagOf(name).getOrElse(sys.error(
        s"manifest entry has no attempt tag: $name — writer name shape changed?"))
    }
    require(tags.nonEmpty, "empty manifest has no attempt tags to check")
    tags.groupBy(_._1).map { case (p, ts) => p -> ts.map(_._2).toSet }
  }

  /** V3: rows present in exactly one side (validate.py:75-91). */
  def missing(expected: DataFrame, actual: DataFrame): DataFrame = {
    val e = expected.select(col("id"), col("type"))
    val a = actual.select(col("id"), col("type"))
    e.join(a, Seq("id", "type"), "left_anti").withColumn("side", lit("missing"))
      .union(a.join(e, Seq("id", "type"), "left_anti").withColumn("side", lit("extra")))
  }

  /** V4: scalar column mismatches on the join of both sides
    * (validate.py:93-128). Coordinates compare within `coordTolerance`
    * degrees (the reference uses pandas eq on float64; PBF granularity
    * makes 1e-9 the natural tolerance). */
  def scalarMismatches(expected: DataFrame, actual: DataFrame,
                       coordTolerance: Double = 1e-9): DataFrame = {
    val e = prefixed(expected, "e_")
    val a = prefixed(actual, "a_")
    val j = e.join(a, col("e_id") === col("a_id") && col("e_type") === col("a_type"))
    def neq(c: String): Column = !(col(s"e_$c") <=> col(s"a_$c"))
    def coordNeq(c: String): Column =
      (col(s"e_$c").isNull =!= col(s"a_$c").isNull) ||
        (abs(col(s"e_$c") - col(s"a_$c")) > coordTolerance)
    j.filter(neq("version") || neq("timestamp") || coordNeq("lat") || coordNeq("lon"))
      .select(col("e_id").as("id"), col("e_type").as("type"))
  }

  /** V5: deep tags / nds / members mismatches (validate.py:131-217).
    * Tags compare as sorted entry arrays — Spark MapType equality is not
    * order-stable; nds/members compare as the ordered lists they are. */
  def deepMismatches(expected: DataFrame, actual: DataFrame): DataFrame = {
    val e = prefixed(expected, "e_")
    val a = prefixed(actual, "a_")
    val j = e.join(a, col("e_id") === col("a_id") && col("e_type") === col("a_type"))
    def sortedTags(p: String): Column = sort_array(map_entries(col(s"${p}tags")))
    j.filter(
      !(sortedTags("e_") <=> sortedTags("a_")) ||
        !(col("e_nds") <=> col("a_nds")) ||
        !(col("e_members") <=> col("a_members")))
      .select(col("e_id").as("id"), col("e_type").as("type"))
  }

  /** Full V1-V5 report: one row per check with its violation count.
    * (V2's outer-join one-to-one completeness is exactly V1 + V3.) */
  def report(expected: DataFrame, actual: DataFrame): DataFrame = {
    val s = expected.sparkSession
    import s.implicits._
    Seq(
      ("v1_duplicates", duplicates(actual).count()),
      ("v3_missing_or_extra", missing(expected, actual).count()),
      ("v4_scalar_mismatch", scalarMismatches(expected, actual).count()),
      ("v5_deep_mismatch", deepMismatches(expected, actual).count())
    ).toDF("check", "violations")
  }

  private def prefixed(df: DataFrame, p: String): DataFrame =
    df.select(df.columns.map(c => col(c).as(s"$p$c")).toSeq: _*)
}
