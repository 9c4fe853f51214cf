package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the kNN graph (see [[SimilarityQueries.knnJoin]]
  * for the edge derivation and [[SimilarityQueries.g01_knn_triangles]] for
  * the triangle census). PageRank here is the corpus-importance signal a
  * curation pipeline uses to weight documents by how central they sit in
  * the similarity graph.
  */
object GraphQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Rank mass is carried as INTEGER micro-units of 1e-12 so every
    * cross-engine and cross-partitioning sum is exact (same move as e02's
    * quantized centroid sums): per-edge contribution is integral floor
    * division `rq div odeg`, in-mass is an exact long sum, and the only
    * double ops per iteration are two floor-quantized scalar multiplies —
    * deterministic regardless of row order, so DuckDB's unrolled-CTE twin
    * lands on the identical integers after any number of iterations
    * (double last-ulp noise would otherwise COMPOUND per iteration).
    */
  val RankScale = 1000000000000L

  /** Alpha-only PageRank: rank' = (1-d)/N + d * Σ_in contrib. Dangling
    * vertices (no out-edges — e.g. singleton-bucket vectors in the kNN
    * graph) keep receiving the teleport term but their mass is NOT
    * redistributed, so total mass may shrink below 1 — the standard
    * alpha-only formulation, declared rather than hidden.
    *
    * Scale shape: each iteration is one src-keyed join (edges × ranks)
    * and one dst-keyed partial+final agg — both key-uniform; the vertex
    * count rides along as a broadcast 1-row aggregate; `localCheckpoint`
    * truncates lineage per iteration exactly like d07's label
    * propagation. Iteration count is fixed (caller-sized), so plan depth
    * is bounded; no driver-side collection anywhere.
    */
  def pagerank(verts: DataFrame, edges: DataFrame,
      iters: Int = 8, damping: Double = 0.85,
      redistributeDangling: Boolean = false): DataFrame = {
    // The dangling variant references edges a THIRD time in a SEPARATE
    // eager checkpoint job (the anti-join), which re-executes the full
    // upstream edge build (for g02b the kNN join) — stage edges once
    // there (measured g02b 2.85 -> 2.54s solo). The alpha-only variant's
    // two references both live inside the single ed-staging job, where
    // AQE exchange reuse already dedups the build — an unconditional
    // stage measured SLOWER there (g02 1.98 -> 2.4s: pure extra
    // materialization), so it is conditional.
    val e0 = if (redistributeDangling) graft.Checkpoints.stage(edges) else edges
    val odeg = e0.groupBy(col("src")).agg(count(lit(1)).as("odeg"))
    val ed = graft.Checkpoints.stage(e0.join(odeg, Seq("src")))
    val nv = verts.agg(count(lit(1)).as("n_v"))
    val base = graft.Checkpoints.stage(verts.crossJoin(broadcast(nv)))
    // dangling = vertices with no out-edge; their rank mass is what the
    // full formulation spreads uniformly each iteration
    val dang =
      if (redistributeDangling)
        Some(graft.Checkpoints.stage(verts.join(
          e0.select(col("src").as("vx")).distinct(), Seq("vx"), "left_anti")))
      else None
    if (redistributeDangling) // ed/dang staged: e0 is ballast now
      graft.CacheOps.unpersistLocalCheckpoint(e0)
    var ranks = base.select(col("vx"), col("n_v"),
      expr(s"$RankScale div n_v").as("rq"))
    // superseded iterates are unpersisted as soon as their successor is
    // materialized: localCheckpoint is eager, so after iterate k lands,
    // iterate k-1's blocks are pure block-manager/GC ballast — measured
    // (SOAK_r13) as a 2.9–11.3 s fresh-JVM wall spread on identical
    // code before this, driven by what the accumulated blocks do to the
    // scheduler and collector, not by the plans
    var prevCk: Option[DataFrame] = None
    for (_ <- 1 to iters) {
      val inMass = ed.join(ranks.select(col("vx"), col("rq")), col("src") === col("vx"))
        .select(col("dst"), expr("rq div odeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("m"))
      // full variant: the dangling mass is one exact-integer 1-row
      // aggregate, broadcast into the update — each vertex receives
      // `dmass div n_v` extra in-mass (integral floor share, the same
      // exact-arithmetic discipline as every other term)
      val withMass = dang match {
        case Some(dg) =>
          val dm = dg.join(ranks.select(col("vx"), col("rq")), Seq("vx"))
            .agg(coalesce(sum(col("rq")), lit(0L)).as("dmass"))
          base.join(inMass, col("vx") === col("dst"), "left")
            .crossJoin(broadcast(dm))
            .withColumn("mm",
              coalesce(col("m"), lit(0L)) + expr("dmass div n_v"))
        case None =>
          base.join(inMass, col("vx") === col("dst"), "left")
            .withColumn("mm", coalesce(col("m"), lit(0L)))
      }
      ranks = graft.Checkpoints.stage(withMass
        .select(col("vx"), col("n_v"),
          (floor(lit(1.0 - damping) * lit(RankScale.toDouble) / col("n_v")).cast("long") +
            floor(lit(damping) * col("mm")).cast("long")).as("rq")))
      prevCk.foreach(graft.CacheOps.unpersistLocalCheckpoint)
      prevCk = Some(ranks)
    }
    val out = ranks.select(col("vx"), col("rq"))
    if (iters >= 1) {
      // the final iterate's checkpoint truncated every input's lineage —
      // the loop-invariant checkpoints are ballast from here on
      graft.CacheOps.unpersistLocalCheckpoint(ed)
      graft.CacheOps.unpersistLocalCheckpoint(base)
      dang.foreach(graft.CacheOps.unpersistLocalCheckpoint)
    }
    out
  }


  /** g02: PageRank over the s06 kNN graph — 8 quantized iterations,
    * top-20 most-central vectors. The LIMIT is a global TakeOrdered (no
    * unpartitioned window), deterministic on (rank desc, id).
    */
  val g02_pagerank: Q = (s, dir) => {
    val edges = SimilarityQueries.knnJoin(s, dir)
      .select(col("qid").as("src"), col("neighbor").as("dst"))
    val verts = graft.Tables.embeddings(s, dir).select(col("vec_id").as("vx"))
    pagerank(verts, edges)
      .orderBy(col("rq").desc, col("vx"))
      .limit(20)
      .select(col("vx"), col("rq").as("rank_q"))
  }

  /** g02b: the FULL PageRank formulation — g02's alpha-only iterate plus
    * per-iteration dangling-mass redistribution (the r9 verdict's cheap
    * completeness win): the mass parked on out-degree-0 vertices is
    * summed exactly (one 1-row integer aggregate, broadcast) and spread
    * uniformly as `dmass div n_v` extra in-mass per vertex. Total rank
    * mass is now conserved up to floor losses (`PageRankSpec` pins the
    * bound); g02 stays frozen as the declared alpha-only form.
    */
  val g02b_pagerank_full: Q = (s, dir) => {
    val edges = SimilarityQueries.knnJoin(s, dir)
      .select(col("qid").as("src"), col("neighbor").as("dst"))
    val verts = graft.Tables.embeddings(s, dir).select(col("vec_id").as("vx"))
    pagerank(verts, edges, redistributeDangling = true)
      .orderBy(col("rq").desc, col("vx"))
      .limit(20)
      .select(col("vx"), col("rq").as("rank_q"))
  }

  val all: Map[String, Q] = Map(
    "g02_pagerank" -> g02_pagerank,
    "g02b_pagerank_full" -> g02b_pagerank_full,
  )
}
