package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._

/** Z-order (Morton) spatial clustering for the transcoded OSM tables.
  *
  * The reference engine emits parquet in PBF block order
  * (osm-pbf-parquet/src/sink.rs writes elements as decoded), which for
  * planet extracts is roughly spatial for nodes but interleaves regions at
  * block granularity — a bbox query must still open most row groups. At
  * 100 TB the dominant cost of `WHERE lat BETWEEN .. AND lon BETWEEN ..`
  * is how many row groups the parquet min/max statistics let the scan
  * SKIP, and that is a pure function of layout. Clustering by an
  * interleaved-bit Morton key makes every file and row group cover a
  * compact lat×lon rectangle, so both coordinates' min/max tighten at
  * once and bbox scans prune to the covered tiles.
  *
  * The key derivation is one native codegen'd expression
  * ([[MortonKey]] — no UDF, no interpreted fallback) and is replicated
  * verbatim in the DuckDB oracle SQL (p03), so the bit math itself is
  * hash-checked against an independent engine.
  */
object ZOrder {

  /** Quantization width per axis. 26 bits ≈ 2.7e-6 degrees (~0.3 m of
    * latitude) — finer than OSM's 1e-7-degree coordinate grid matters for
    * clustering, and 2×26 = 52 interleaved bits stay well inside a long. */
  val DefaultBits = 26

  /** Morton key of a WGS84 (lat, lon): lon cell in the even bits, lat
    * cell in the odd bits. Total order over keys = depth-first order over
    * the quadtree, which is what makes range-partitioning by key produce
    * compact rectangles.
    *
    * NULL coordinates PROPAGATE (the SQL rule — a null key, not cell 0's
    * (-90, -180) corner tile). Backed by the native [[MortonKey]]
    * expression: one codegen'd static call per row instead of the ~300-
    * node Column cascade this wrapped through r14 (whose round-14
    * CaseWhen null guard disabled subexpression elimination across the
    * whole cascade — the measured p04 regression; see MortonKey's
    * scaladoc).
    *
    * Constructs the expression DIRECTLY (no FunctionRegistry round-trip):
    * the r15 shape registered `graft_morton_key` into the caller's session
    * as a side effect of building a Column — an unconditional overwrite
    * that silently replaced any same-named user function (the exact
    * session leak bloomPrunedJoin isolates a child session to avoid). SQL
    * callers still get the name via [[MortonKey.register]] /
    * GraftExtensions; Column callers no longer touch the registry. */
  def mortonKey(lat: Column, lon: Column, bits: Int = DefaultBits): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    GraftBridge.column(MortonKey(
      GraftBridge.expression(lat), GraftBridge.expression(lon),
      Literal(bits)))
  }

  /** Scalar twin of [[quantize]] (same arithmetic, driver-side) — used to
    * turn a bbox into cell bounds for [[bboxRanges]]. */
  def quantizeScalar(c: Double, lo: Double, hi: Double, bits: Int): Long = {
    val cells = 1L << bits
    math.min(cells - 1, math.max(0L,
      math.floor((c - lo) / (hi - lo) * cells.toDouble).toLong))
  }

  /** Decompose a bbox into at most `maxRanges` contiguous Morton-key
    * intervals whose union COVERS every cell in the box (a superset when
    * coarsened — always safe for pruning, never drops a matching row).
    *
    * This is the query-side half of the clustering: data laid out by
    * [[zorderWrite]] is SORTED by key, so `key BETWEEN lo AND hi`
    * predicates prune near-perfectly from the key column's own min/max
    * statistics — no lat/lon stats needed, which is what makes the
    * pattern work when files are bucketed or partitioned by key range
    * alone. Quadtree descent (the classic LITMAX/BIGMIN decomposition,
    * expressed recursively): a node fully inside the box emits its whole
    * contiguous z-interval, a disjoint node is skipped, a straddling node
    * recurses into its four children; when the interval budget runs out,
    * straddling nodes emit coarsely (over-approximate, still correct).
    * Adjacent intervals are merged before returning.
    */
  def bboxRanges(latMin: Double, latMax: Double, lonMin: Double, lonMax: Double,
      bits: Int = DefaultBits, maxRanges: Int = 64): Seq[(Long, Long)] = {
    val acc = cover(latMin, latMax, lonMin, lonMax, bits, 4 * maxRanges)
      .map { case (d, z0) => (z0, z0 + (1L << (2 * (bits - d))) - 1) }
    // merge adjacent/overlapping (ONE merge rule — unionRanges'), then
    // coarsen smallest gaps to budget
    val merged = unionRanges(acc).toBuffer
    while (merged.length > maxRanges) {
      var bestI = 0; var bestGap = Long.MaxValue
      var i = 0
      while (i < merged.length - 1) {
        val gap = merged(i + 1)._1 - merged(i)._2
        if (gap < bestGap) { bestGap = gap; bestI = i }
        i += 1
      }
      merged(bestI) = (merged(bestI)._1, merged(bestI + 1)._2)
      merged.remove(bestI + 1)
    }
    merged.toSeq
  }

  /** The quadtree descent shared by [[bboxRanges]] and [[bboxCells]]:
    * emits the DISJOINT quadtree nodes covering the box as (depth, z0)
    * pairs — a node at depth d spans the contiguous aligned z-interval
    * [z0, z0 + 4^(bits-d) - 1]. A node fully inside the box emits whole,
    * a disjoint node is skipped, a straddling node recurses into its four
    * children; past `budget` emitted nodes, straddlers emit coarsely
    * (over-approximate — always a SUPERSET of the box's cells, never
    * drops one). */
  private def cover(latMin: Double, latMax: Double, lonMin: Double,
      lonMax: Double, bits: Int, budget: Int): Seq[(Int, Long)] = {
    require(latMin <= latMax && lonMin <= lonMax, "inverted bbox")
    val x0 = quantizeScalar(lonMin, -180.0, 180.0, bits)
    val x1 = quantizeScalar(lonMax, -180.0, 180.0, bits)
    val y0 = quantizeScalar(latMin, -90.0, 90.0, bits)
    val y1 = quantizeScalar(latMax, -90.0, 90.0, bits)
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    // node at depth d with low-corner cells (cx, cy) spans side 2^(bits-d)
    def go(cx: Long, cy: Long, d: Int, z0: Long): Unit = {
      val side = 1L << (bits - d)
      val (xh, yh) = (cx + side - 1, cy + side - 1)
      if (xh < x0 || cx > x1 || yh < y0 || cy > y1) return // disjoint
      val span = 1L << (2 * (bits - d))
      val contained = cx >= x0 && xh <= x1 && cy >= y0 && yh <= y1
      if (contained || d == bits || acc.length >= budget) {
        acc += ((d, z0))
      } else {
        val q = span >> 2; val h = side >> 1
        go(cx, cy, d + 1, z0)                 // y-low,  x-low
        go(cx + h, cy, d + 1, z0 + q)         // y-low,  x-high
        go(cx, cy + h, d + 1, z0 + 2 * q)     // y-high, x-low
        go(cx + h, cy + h, d + 1, z0 + 3 * q) // y-high, x-high
      }
    }
    go(0L, 0L, 0, 0L)
    acc.toSeq
  }

  /** Decompose a bbox into DISJOINT quadtree cells as (depth, prefix)
    * pairs, where `prefix` = a point's Morton key right-shifted by
    * 2·(bits − depth). Because every emitted node is z-ALIGNED (unlike
    * the merged intervals of [[bboxRanges]]), cell membership is a pure
    * EQUALITY on (depth, prefix) — the join-side half of the clustering:
    * a many-boxes × many-points containment join becomes explode(points ×
    * distinct depths, a log-bounded few) → hash equi-join on (depth,
    * prefix) against the broadcast cell table → exact lat/lon post-filter
    * — no per-box OR-chain, no nested-loop join, no all-pairs. Disjoint
    * cells per box ⇒ each (point, box) pair matches at most once, so no
    * dedup pass is needed. The cover is a superset of the box (corner
    * quantization + budget coarsening); the post-filter restores
    * exactness. */
  def bboxCells(latMin: Double, latMax: Double, lonMin: Double, lonMax: Double,
      bits: Int = DefaultBits, maxCells: Int = 256): Seq[(Int, Long)] =
    cover(latMin, latMax, lonMin, lonMax, bits, maxCells)
      .map { case (d, z0) => (d, z0 >> (2 * (bits - d))) }

  /** Pushdown-friendly predicate over a STORED Morton-key column for a
    * bbox: a disjunction of BETWEENs — each range prunes off the key
    * column's min/max statistics on z-sorted data. For a DERIVED key
    * (the cascade inline over lat/lon) use
    * [[ZRangeContains.zInRanges]] instead: pushdown substitution would
    * inline the cascade into every BETWEEN (round 6's janino blow-up). */
  def zRangePredicate(zkey: Column, ranges: Seq[(Long, Long)]): Column =
    ranges.map { case (lo, hi) => zkey.between(lo, hi) }
      .reduceOption(_ || _).getOrElse(lit(false))

  /** Union of several boxes' range covers: sorted, overlaps/adjacency
    * merged — the sorted-disjoint form [[ZRangeContains]]'s binary
    * search requires. */
  def unionRanges(rs: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val sorted = rs.sortBy(_._1)
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    sorted.foreach { r =>
      if (merged.nonEmpty && r._1 <= merged.last._2 + 1)
        merged(merged.length - 1) = (merged.last._1, math.max(merged.last._2, r._2))
      else merged += r
    }
    merged.toSeq
  }

  /** Quantized cell count of a bbox (2×26-bit default keeps the product
    * ≤ 2^52, inside a Long) — the box's AREA in bits-resolution cells.
    *
    * The DENOMINATOR of the live selectivity gate (PbfQueries p04:
    * `Σ(hi-lo+1) over the union z-ranges < envelopeCells / 2`): the
    * numerator counts exactly the keys the membership test passes, so
    * the ratio tracks realized selectivity by construction under a
    * uniform spread. (The round-8 gate used Σ box AREAS over this
    * envelope instead — replaced in round 9 after the spec pinned the
    * range-cell ratio against measured kept fractions; a box-area
    * numerator under-counts what the z-cover actually admits.) */
  def envelopeCells(latMin: Double, latMax: Double, lonMin: Double,
      lonMax: Double, bits: Int = DefaultBits): Long = {
    val x0 = quantizeScalar(lonMin, -180.0, 180.0, bits)
    val x1 = quantizeScalar(lonMax, -180.0, 180.0, bits)
    val y0 = quantizeScalar(latMin, -90.0, 90.0, bits)
    val y1 = quantizeScalar(latMax, -90.0, 90.0, bits)
    (x1 - x0 + 1) * (y1 - y0 + 1)
  }

  /** Write `df` (must carry `lat`/`lon` doubles) clustered by Morton key:
    * range-partition on the key so each output FILE covers a compact
    * z-range, then sort within partitions so each ROW GROUP inside a file
    * covers a tighter one. The shuffle is a one-time layout cost paid at
    * write; every later bbox scan pays row-group-pruned reads instead.
    * `repartitionByRange` samples the key distribution, so skew (city
    * centers) lands more files on dense tiles instead of overflowing one. */
  def zorderWrite(df: DataFrame, out: String, partitions: Int,
      bits: Int = DefaultBits, keepKey: Boolean = false): Unit = {
    val keyed = df.withColumn("_zkey",
      mortonKey(col("lat"), col("lon"), bits))
      .repartitionByRange(partitions, col("_zkey"))
      .sortWithinPartitions("_zkey")
    // keepKey stores `_zkey` so later scans can use [[zRangePredicate]]
    // BETWEENs that prune off the key column's own footer stats (tighter
    // than the lat/lon envelope for multi-box covers)
    (if (keepKey) keyed else keyed.drop("_zkey"))
      .write.mode("overwrite").parquet(out)
  }
}
