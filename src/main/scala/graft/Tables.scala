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
  /** Process-level inferred-schema cache, keyed by path. Schema inference
    * is driver-side work Spark repeats on EVERY `spark.read.parquet` —
    * measured ~80-120ms per construction on this box (file listing +
    * footer job), which a 100-query sweep pays hundreds of times over on
    * identical immutable inputs. First read of a path infers and caches;
    * later reads construct with the explicit schema, skipping inference
    * entirely. The cached schema is exactly what inference would return —
    * plans are unchanged. Staleness contract: testdata files are immutable
    * within a process lifetime (they are regenerated only between driver
    * rounds, i.e. between JVMs).
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  private def cached(s: SparkSession, path: String): DataFrame = {
    val sch = schemaCache.computeIfAbsent(path, p => s.read.parquet(p).schema)
    s.read.schema(sch).parquet(path)
  }

  def region(s: SparkSession, dir: String): DataFrame    = cached(s, s"$dir/region.parquet")
  def nation(s: SparkSession, dir: String): DataFrame    = cached(s, s"$dir/nation.parquet")
  def customer(s: SparkSession, dir: String): DataFrame  = cached(s, s"$dir/customer.parquet")
  def supplier(s: SparkSession, dir: String): DataFrame  = cached(s, s"$dir/supplier.parquet")
  def part(s: SparkSession, dir: String): DataFrame      = cached(s, s"$dir/part.parquet")
  def orders(s: SparkSession, dir: String): DataFrame    = cached(s, s"$dir/orders.parquet")
  def lineitem(s: SparkSession, dir: String): DataFrame  = cached(s, s"$dir/lineitem.parquet")
  def documents(s: SparkSession, dir: String): DataFrame = cached(s, s"$dir/documents.parquet")
  def embeddings(s: SparkSession, dir: String): DataFrame = cached(s, s"$dir/embeddings.parquet")

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
    *    `spark.sql.parquet.inferTimestampNTZ.enabled=true` infers it as
    *    TimestampNTZType, whose rows surface as java.time.LocalDateTime —
    *    breaking every `getTimestamp`/`java.sql.Timestamp` consumer and
    *    the streaming Event encoder. Fix: re-read with an EXPLICIT schema
    *    declaring ts TimestampType — the scan then surfaces the raw micros
    *    as session-timestamp directly (pre-Spark-3.4 semantics; identical
    *    wall-clock values to DuckDB's naive read under a UTC session).
    *    An explicit schema beats a `cast(ts as timestamp)` Project on the
    *    NTZ read: the cast path measured ~25-30% slower on the
    *    events-table queries (round-8 A/B, EventsAB: a02 med 0.46s cast
    *    vs 0.36s native/explicit-schema) and was the real component of
    *    the round-7 a02/st05 solo regressions.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    // conf mutation is surprising in a library, so it is (a) idempotent —
    // checked first — and (b) required: without it the ns-precision read
    // below throws PARQUET_TYPE_ILLEGAL. Session builders in this repo
    // (Verify/Bench/specs) also set it up front.
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // every normalization below (ns→µs, NTZ-as-UTC) is only value-correct
    // when the session zone is UTC; a non-UTC session would silently shift
    // every ts and break oracle hashes, so defend here (all entry-point
    // mains in this repo pin it already — this is for library sessions)
    if (s.conf.get("spark.sql.session.timeZone") != "UTC")
      s.conf.set("spark.sql.session.timeZone", "UTC")
    val path = s"$dir/events.parquet"
    val inferred = schemaCache.computeIfAbsent(path, p => s.read.parquet(p).schema)
    inferred("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer div — a double division would lose sub-µs precision at
        // epoch-ns magnitudes (~1.7e18 > 2^53)
        s.read.schema(inferred).parquet(path)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        val patched = org.apache.spark.sql.types.StructType(inferred.map {
          case f if f.name == "ts" =>
            f.copy(dataType = org.apache.spark.sql.types.TimestampType)
          case f => f
        })
        s.read.schema(patched).parquet(path)
      case _ => s.read.schema(inferred).parquet(path)
    }
  }
}
