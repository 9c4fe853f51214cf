package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Every query receives an `sfDir` (e.g. /root/testdata/sf0.01) and reads
  * one parquet file per table. Reads are plain `spark.read.parquet` so that
  * Catalyst's column pruning and predicate pushdown reach the scan — at
  * 100 TB the scan is the dominant cost and `PushedFilters`/`ReadSchema`
  * must carry the query's predicates/projection.
  */
object Tables {
  def region(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/region.parquet")
  def nation(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/nation.parquet")
  def customer(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/customer.parquet")
  def supplier(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/supplier.parquet")
  def part(s: SparkSession, dir: String): DataFrame      = s.read.parquet(s"$dir/part.parquet")
  def orders(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/orders.parquet")
  def lineitem(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/lineitem.parquet")
  def documents(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/documents.parquet")
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/embeddings.parquet")

  /** `events.ts` is parquet timestamp[ns], which Spark's parquet reader
    * rejects outright (PARQUET_TYPE_ILLEGAL) unless
    * `spark.sql.legacy.parquet.nanosAsLong=true`, in which case the column
    * arrives as LongType nanoseconds. We set the flag defensively (it is a
    * runtime-settable SQLConf) and convert to TimestampType microseconds,
    * truncating toward negative infinity — the same direction DuckDB
    * truncates when comparing at lower precision.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    // conf mutation is surprising in a library, so it is (a) idempotent —
    // checked first — and (b) required: without it the ns-precision read
    // below throws PARQUET_TYPE_ILLEGAL. Session builders in this repo
    // (Verify/Bench/specs) also set it up front.
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer div — a double division would lose sub-µs precision at
        // epoch-ns magnitudes (~1.7e18 > 2^53)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
}
