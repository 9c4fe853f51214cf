package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 depth soaks for the two last never-soaked gated plans
  * (VERDICT r15 "Next round" #5): g01's triangle census and d07's
  * pointer-jumping dedup clusters, each at 1×/10×/30× with a SKEWED
  * distribution — one viral near-dup group, the shape that broke the
  * minhash pair space in r14.
  *
  *   - `g01` triangle census: synthetic edge lists (the census's own
  *     input seam — [[graft.operators.SimilarityQueries.triangleCensus]]
  *     is documented linear-in-edges independent of the kNN edge build,
  *     which has its own soaks). Two shapes per scale: a uniform random
  *     graph, and the same graph plus a planted viral COMMUNITY — a
  *     circulant k=10 subgraph, exactly the shape a viral near-dup group
  *     takes after the kNN edge build caps per-vertex degree (a raw
  *     clique cannot reach the census: kNN emits ≤ k neighbors per
  *     vertex). The circulant has a CLOSED-FORM census — every vertex
  *     closes C(10,2)=45 triangles — so the skew point is asserted
  *     exactly at every scale before its timing is trusted:
  *     census(uniform ∪ community) − census(uniform) = 45·m.
  *
  *   - `d07` clusters, two sublegs:
  *     (a) `cc` — pointer jumping itself over direct pair lists with the
  *     three adversarial component shapes at once: many small groups
  *     (volume), one LONG CHAIN (diameter n/10 — the O(log d) claim),
  *     one viral STAR (hub degree n/100). Component count and the chain's
  *     min-label are asserted before timing.
  *     (b) `minhash_viral` — the REAL d07 pipeline (shingles → bands →
  *     pairs → CC) over a generated corpus with a planted viral
  *     exact-dup group of n/50 docs (all four band buckets flooded once
  *     the group passes the 256 cap). Uncapped vs capped
  *     (DefaultBandBucketCap) walls recorded; the capped run is asserted
  *     to cluster every non-viral doc identically to the uncapped run
  *     (the cap's recall loss is EXACTLY the flooded group, nothing
  *     else) before its timing is trusted.
  *
  * Usage: scripts/run.sh graft.tools.DepthSoak16 [outJson] [legs…]
  * (legs ⊆ {g01, d07}; default both)
  */
object DepthSoak16 {

  // ScaleProbe owns the Run → JSON shape (adds peak_heap_mb vs the shape
  // SOAK_r16.json was first written with — additive, artifact-compatible)
  private def runJson(r: ScaleProbe.Run): String = ScaleProbe.runJson(r)

  private def expo(points: Seq[(Long, Double)]): String =
    if (points.size < 2) """"wall_exponent":"n/a""""
    else {
      val ratio = points.last._1.toDouble / points.head._1
      f""""wall_exponent":${math.log(points.last._2 / points.head._2) /
        math.log(ratio)}%.2f"""
    }

  // --- leg 1: g01 triangle census ---

  /** ~4n random edges over vertex ids [0, n): xxhash-derived endpoints,
    * self-loops dropped (the census de-dups and canonicalizes). */
  private def uniformEdges(s: SparkSession, n: Long): DataFrame =
    s.range(4 * n).select(
      pmod(xxhash64(col("id"), lit(1L)), lit(n)).as("src"),
      pmod(xxhash64(col("id"), lit(2L)), lit(n)).as("dst"))
      .filter(col("src") =!= col("dst"))

  /** The viral community: m vertices on a disjoint id range [n, n+m),
    * each connected to its 10 successors mod m (circulant C(m; 1..10)).
    * Closed-form triangles = 45·m for m > 21. */
  private def viralCommunity(s: SparkSession, n: Long, m: Long): DataFrame =
    s.range(m).select(col("id"), explode(sequence(lit(1L), lit(10L))).as("d"))
      .select((col("id") + lit(n)).as("src"),
        (pmod(col("id") + col("d"), lit(m)) + lit(n)).as("dst"))

  /** Returns (pointJson, skewWallSecs) — the leg's exponent series keeps
    * the measured value instead of regex-parsing it back out of the JSON
    * it was serialized into. */
  private def g01Point(s: SparkSession, n: Long): (String, Double) = {
    import graft.operators.SimilarityQueries.triangleCensus
    val m = math.max(100L, n / 100)
    val uni = uniformEdges(s, n).localCheckpoint()
    val skew = uni.unionByName(viralCommunity(s, n, m)).localCheckpoint()
    def censusRow(e: DataFrame): (Long, Long, Long, Long) = {
      val r = triangleCensus(e).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    val uniRun = ScaleProbe.measure(s) { censusRow(uni)._4 }
    val skewRun = ScaleProbe.measure(s) { censusRow(skew)._4 }
    // the closed form gates the numbers before the timing is trusted
    require(skewRun.rows - uniRun.rows == 45L * m,
      s"planted community must close exactly 45m triangles: " +
        s"${skewRun.rows} - ${uniRun.rows} != ${45L * m}")
    println(f"g01 n=$n m=$m: uniform ${uniRun.secs}%.2fs (tri=${uniRun.rows}) " +
      f"skew ${skewRun.secs}%.2fs (tri=${skewRun.rows})")
    (s"""{"vertices":$n,"viral_m":$m,"uniform":${runJson(uniRun)},
        |"skew":${runJson(skewRun)}}""".stripMargin.replace("\n", ""),
      skewRun.secs)
  }

  private def g01Leg(s: SparkSession, sizes: Seq[Long]): String = {
    g01Point(s, 20000L) // warm codegen
    val points = sizes.map(n => n -> g01Point(s, n))
    val skewSecs = points.map { case (n, (_, secs)) => (n, secs) }
    s"""{${points.map { case (n, (j, _)) => s""""x$n":$j""" }.mkString(",")},
       |${expo(skewSecs)}}""".stripMargin.replace("\n", "")
  }

  // --- leg 2a: d07 pointer jumping over direct pair lists ---

  private def ccPoint(s: SparkSession, n: Long): (String, Double) = {
    import graft.operators.DedupQueries.connectedComponents
    val groups = s.range(n / 5 * 4) // 4/5 of ids in groups of 4: 3 path pairs each
      .filter(pmod(col("id"), lit(4L)) =!= 3L)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    val chainBase = n; val chainLen = n / 10
    val chain = s.range(chainLen - 1).select(
      (col("id") + chainBase).as("doc_a"), (col("id") + chainBase + 1).as("doc_b"))
    val starBase = 2 * n; val starM = n / 100
    val star = s.range(starM).select(
      lit(starBase).as("doc_a"), (col("id") + starBase + 1).as("doc_b"))
    val pairs = groups.unionByName(chain).unionByName(star).localCheckpoint()
    val expected = n / 5 + 1 + 1 // small groups + chain + star
    val run = ScaleProbe.measure(s) {
      val labels = connectedComponents(pairs).localCheckpoint()
      val comps = labels.agg(countDistinct(col("cluster_id"))).head().getLong(0)
      require(comps == expected, s"components $comps != $expected")
      // the chain collapsed to its min id — the O(log diameter) fixpoint
      val chainLbl = labels.filter(col("doc_id") === chainBase + chainLen - 1)
        .head().getLong(1)
      require(chainLbl == chainBase, s"chain label $chainLbl != $chainBase")
      comps
    }
    println(f"d07-cc n=$n (chain ${chainLen}, star $starM): ${run.secs}%.2fs")
    (s"""{"ids":$n,"chain_len":$chainLen,"star_m":$starM,"run":${runJson(run)}}""",
      run.secs)
  }

  private def ccLeg(s: SparkSession, sizes: Seq[Long]): String = {
    ccPoint(s, 20000L) // warm
    val points = sizes.map(n => n -> ccPoint(s, n))
    val secs = points.map { case (n, (_, sec)) => (n, sec) }
    s"""{${points.map { case (n, (j, _)) => s""""x$n":$j""" }.mkString(",")},${expo(secs)}}"""
  }

  // --- leg 2b: the real d07 pipeline with a planted viral group ---

  /** genDocs plus a viral group: the first m doc ids all share ONE text
    * (an exact-dup family — identical signatures, identical band
    * buckets). */
  private def viralDocs(s: SparkSession, n: Long, m: Long): DataFrame = {
    val base = ScaleProbe.genDocs(s, n)
    base.withColumn("text",
      when(col("doc_id") < m, // the whole group shares doc 0's text
        concat_ws(" ", transform(sequence(lit(1), lit(54)),
          j => concat(lit("viral"), pmod(xxhash64(j.cast("long"), lit(99L)), lit(40L))))))
        .otherwise(col("text")))
  }

  private def minhashViralPoint(s: SparkSession, n: Long): (String, Double) = {
    import graft.operators.DedupQueries
    val m = math.max(100L, n / 50)
    val docs = viralDocs(s, n, m).localCheckpoint()
    def clusters(cap: Option[Int]): DataFrame =
      DedupQueries.connectedComponents(
        DedupQueries.pairsFromBands(
          DedupQueries.lshBands(DedupQueries.shingles(docs)), cap))
    // each arm collects its labels INSIDE its one measured run — the label
    // comparison must not re-execute the most expensive leg from scratch
    var uncappedArr: Array[(Long, Long)] = null
    val uncapped = ScaleProbe.measure(s) {
      uncappedArr = clusters(None).collect().map(r => (r.getLong(0), r.getLong(1)))
      uncappedArr.length.toLong
    }
    var cappedLabels: Array[(Long, Long)] = null
    val capped = ScaleProbe.measure(s) {
      cappedLabels = clusters(Some(DedupQueries.DefaultBandBucketCap))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      cappedLabels.length.toLong
    }
    // the cap's recall loss is EXACTLY the flooded viral group: every
    // non-viral doc clusters identically in both runs
    val uncappedLabels = uncappedArr.toMap
    val flooded = m > DedupQueries.DefaultBandBucketCap
    val cappedMap = cappedLabels.toMap
    uncappedLabels.foreach { case (doc, lbl) =>
      if (doc >= m)
        require(cappedMap.get(doc).contains(lbl),
          s"non-viral doc $doc must cluster identically under the cap")
      else if (flooded)
        require(!cappedMap.contains(doc),
          s"flooded viral doc $doc must contribute no pairs under the cap")
    }
    println(f"d07-viral n=$n m=$m flooded=$flooded: " +
      f"uncapped ${uncapped.secs}%.2fs (${uncapped.rows} clustered docs) " +
      f"capped ${capped.secs}%.2fs (${capped.rows})")
    (s"""{"docs":$n,"viral_m":$m,"flooded":$flooded,
        |"uncapped":${runJson(uncapped)},"capped":${runJson(capped)}}"""
      .stripMargin.replace("\n", ""), capped.secs)
  }

  private def minhashViralLeg(s: SparkSession, sizes: Seq[Long]): String = {
    minhashViralPoint(s, 2000L) // warm
    val points = sizes.map(n => n -> minhashViralPoint(s, n))
    val cappedSecs = points.map { case (n, (_, secs)) => (n, secs) }
    s"""{${points.map { case (n, (j, _)) => s""""x$n":$j""" }.mkString(",")},
       |${expo(cappedSecs)}}""".stripMargin.replace("\n", "")
  }

  def main(args: Array[String]): Unit = {
    val outJson = args.headOption.getOrElse("SOAK_r16.json")
    val legs = { val l = args.drop(1).toSet; if (l.isEmpty) Set("g01", "d07") else l }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val parts = Seq(
      "g01_triangle_census" -> "g01" ->
        (() => g01Leg(spark, Seq(100000L, 1000000L, 3000000L))),
      "d07_cc_pointer_jump" -> "d07" ->
        (() => ccLeg(spark, Seq(100000L, 1000000L, 3000000L))),
      "d07_minhash_viral" -> "d07" ->
        (() => minhashViralLeg(spark, Seq(5000L, 50000L, 150000L)))
    ).collect { case ((name, leg), mk) if legs.contains(leg) =>
      val j = mk(); println(s"$name done"); s""""$name":$j"""
    }
    val out = parts.mkString(
      """{"method":"one measured run per point after a warm pass at small scale; wall_exponent = log(t_hi/t_lo)/log(scale_hi/scale_lo) over the skew/capped series; every timed leg's RESULT is asserted first (g01: planted circulant closes exactly 45m triangles; d07-cc: component count + chain min-label; d07-viral: capped clustering identical to uncapped outside the flooded group)",""",
      ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), out)
    println(out.take(4000))
    spark.stop()
  }
}
