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

  /** `events.ts` normalization — the generator's parquet physical type has
    * varied across rounds, and every variant must surface as the SAME
    * session-UTC TimestampType the oracles compare against:
    *
    *  - timestamp[ns] (rounds ≤6): Spark's reader rejects it outright
    *    (PARQUET_TYPE_ILLEGAL) unless
    *    `spark.sql.legacy.parquet.nanosAsLong=true`, in which case the
    *    column arrives as LongType nanoseconds → convert to µs, truncating
    *    toward negative infinity (the direction DuckDB truncates when
    *    comparing at lower precision).
    *  - timestamp[us] WITHOUT a zone (round 7+): Spark 4's default
    *    `spark.sql.parquet.inferTimestampNTZ.enabled=true` reads it as
    *    TimestampNTZType, whose rows surface as java.time.LocalDateTime —
    *    breaking every `getTimestamp`/`java.sql.Timestamp` consumer and
    *    the streaming Event encoder. Cast to TimestampType: with the
    *    session zone pinned to UTC the wall-clock values are identical to
    *    DuckDB's naive read, so oracle hashes are unchanged.
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
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
}
