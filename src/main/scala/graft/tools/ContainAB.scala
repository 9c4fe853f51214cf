package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Single-JVM A/B for the containment/jaccard front stages: the r09c→
  * r09e probes measured a real ~10× slowdown in the d14/d15 family with
  * the join-free rewrite, in CLEANER CPU windows than the fast baseline
  * — so it's code, not environment. This tool stages the probe's 10×
  * corpus once and times each candidate stage shape in the same JVM:
  *
  *   shNew   — current shingles() (carries n via retained-array Generate)
  *   shOld   — historical shape (explode only, no n)
  *   invNew  — packed postings from shNew (filter-before-sort)
  *   invOld  — historical postings (sort-in-agg over plain doc_ids)
  *   pairNew — full current pipeline to pair counts
  *   pairOld — historical pipeline (docN join, no packing)
  */
object ContainAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // tracked: tempDir prefers RAM-backed /dev/shm, and an untracked dir
    // would pin the 50k-doc corpus there for the life of the host —
    // squeezing the very memory repeated A/B runs are measuring
    val dir = graft.Scratch.tempDir("containab")
    graft.Scratch.track(dir.toString)
    ScaleProbe.genDocs(spark, 50000L).coalesce(1)
      .write.parquet(s"$dir/documents.parquet")

    def time(label: String)(df: => DataFrame): Unit = {
      // two reps, min — first rep also warms codegen for the shape
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$label%-8s ${secs}%.2fs")
    }

    val docs = graft.Tables.documents(spark, dir.toString)
    def tokOld = docs
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 3)
    def shOld = tokOld.select(col("doc_id"),
      explode(array_distinct(transform(
        sequence(lit(1), size(col("tk")) - 2),
        i => concat_ws(" ",
          element_at(col("tk"), i), element_at(col("tk"), i + 1),
          element_at(col("tk"), i + 2))))).as("s"))
    def shNew = graft.operators.DedupQueries.shingles(docs)

    time("shOld")(shOld)
    time("shNew")(shNew)

    def invOld = shOld.groupBy(col("s"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) >= 2)
    def invNew = graft.operators.DedupQueries.devInvertedPostings(shNew, None)
    time("invOld")(invOld)
    time("invNew")(invNew)

    // NOTE: this arm is the HINT-PINNED post-fix variant of the historical
    // pipeline, not the historical plan itself — the true pre-fix code was
    // unhinted and let AQE broadcast the join sides (which is exactly the
    // 8 GiB-cliff shape SOAK_r09c caught). The shuffle_hash hints pin the
    // build side the way the engine-wide fix did, so this A/B measures
    // "fixed join-layer pipeline" vs "join-free packed postings".
    def pairOld = {
      val docN = shOld.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val pairs = invOld.select(explode(expr(
        "flatten(transform(ds, (x, i) -> transform(slice(ds, i + 2, size(ds) - i - 1), y -> named_struct('a', x, 'b', y))))")).as("p"))
        .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      val inter = pairs.groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
      val na = docN.select(col("doc_id").as("doc_a"), col("n").as("na"))
      val nb = docN.select(col("doc_id").as("doc_b"), col("n").as("nb"))
      inter.join(na.hint("shuffle_hash"), "doc_a").join(nb.hint("shuffle_hash"), "doc_b")
    }
    def pairNew = graft.operators.DedupQueries.devPairCounts(
      graft.operators.DedupQueries.devInvertedPostings(shNew, None))
    time("pairOld")(pairOld)
    time("pairNew")(pairNew)
    spark.stop()
  }
}
