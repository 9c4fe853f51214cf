package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
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
  * Everything here is built-in `Column` ops (shifts, masks, arithmetic) —
  * whole-stage codegen'd, no UDF — and the key derivation is replicated
  * verbatim in the DuckDB oracle SQL (p03), so the bit math itself is
  * hash-checked against an independent engine.
  */
object ZOrder {

  /** Quantization width per axis. 26 bits ≈ 2.7e-6 degrees (~0.3 m of
    * latitude) — finer than OSM's 1e-7-degree coordinate grid matters for
    * clustering, and 2×26 = 52 interleaved bits stay well inside a long. */
  val DefaultBits = 26

  /** Map a coordinate in [lo, hi] to a `bits`-wide integer cell index.
    * Written EXACTLY as the oracle SQL computes it — same operations,
    * same association order — so both engines produce bit-identical
    * doubles and therefore identical cells: floor((c - lo) / (hi - lo) *
    * 2^bits), clamped to [0, 2^bits - 1] (the hi endpoint lands exactly
    * on 2^bits and must clamp down). */
  def quantize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val cells = 1L << bits
    least(lit(cells - 1), greatest(lit(0L),
      floor((c - lit(lo)) / lit(hi - lo) * lit(cells.toDouble))))
  }

  /** Spread the low 32 bits of `c` so bit i lands at bit 2i (the classic
    * mask-and-shift doubling cascade). */
  private def spread(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFFFFFL))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x3333333333333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Morton key of a WGS84 (lat, lon): lon cell in the even bits, lat
    * cell in the odd bits. Total order over keys = depth-first order over
    * the quadtree, which is what makes range-partitioning by key produce
    * compact rectangles. */
  def mortonKey(lat: Column, lon: Column, bits: Int = DefaultBits): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val y = spread(quantize(lat, -90.0, 90.0, bits))
    val x = spread(quantize(lon, -180.0, 180.0, bits))
    shiftleft(y, 1).bitwiseOR(x)
  }

  /** Write `df` (must carry `lat`/`lon` doubles) clustered by Morton key:
    * range-partition on the key so each output FILE covers a compact
    * z-range, then sort within partitions so each ROW GROUP inside a file
    * covers a tighter one. The shuffle is a one-time layout cost paid at
    * write; every later bbox scan pays row-group-pruned reads instead.
    * `repartitionByRange` samples the key distribution, so skew (city
    * centers) lands more files on dense tiles instead of overflowing one. */
  def zorderWrite(df: DataFrame, out: String, partitions: Int,
      bits: Int = DefaultBits): Unit =
    df.withColumn("_zkey", mortonKey(col("lat"), col("lon"), bits))
      .repartitionByRange(partitions, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
      .write.mode("overwrite").parquet(out)
}
