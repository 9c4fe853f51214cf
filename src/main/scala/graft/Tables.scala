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
    *
    * CONF-SENSITIVITY: the key is the path only, but what inference
    * returns depends on the session confs it ran under —
    * `spark.sql.parquet.inferTimestampNTZ.enabled` (NTZ vs session
    * timestamps) and `spark.sql.legacy.parquet.nanosAsLong` (ns columns
    * as Long vs hard error). A second in-process session with different
    * values for those confs, or a tool that toggles them between reads
    * of the same path, sees the FIRST session's schema. That is the
    * contract this repo's single-session mains satisfy by construction;
    * anything that deliberately varies those confs per-read (e.g.
    * tools/EventsAB's cast-path A/B) must call [[clearSchemaCache]]
    * around each variant or bypass [[Tables]] entirely.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** Test/tool hook: drop every cached inferred schema so the next read
    * of each path re-infers under the CURRENT session confs. See the
    * conf-sensitivity note on [[schemaCache]]. */
  private[graft] def clearSchemaCache(): Unit = schemaCache.clear()

  /** private[graft]: the replay stagers re-read the same immutable table
    * paths every invocation and would otherwise re-infer per read.
    * The cache key carries the root's (mtime, length) so the immutability
    * assumption is ENFORCED, not just documented (r19 advisor): a path
    * rewritten in-process (new part files → the dir's mtime changes)
    * re-infers instead of silently reading with the stale schema. One
    * stat() per read — noise next to the ~80-120ms inference it skips.
    * (A nested rewrite that leaves the root dir's own mtime unchanged is
    * out of contract — none of this repo's writers produce one.) */
  private[graft] def cached(s: SparkSession, path: String): DataFrame = {
    val f = new java.io.File(path)
    val key = s"$path@${f.lastModified}:${f.length}"
    val sch = schemaCache.computeIfAbsent(key, _ => s.read.parquet(path).schema)
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
    // PRECONDITIONS, not silent repairs. Through round 8 this accessor
    // force-set both confs itself; a library read that mutates session
    // state flips the semantics of every other timestamp query in the
    // embedding session as a hidden side effect, so it now fails fast
    // with the fix in the message instead. Every entry point in this
    // repo (Verify, Bench, Main, Plans, the tools/ mains, every spec
    // builder) pins both confs up front.
    //
    // UTC is load-bearing for VALUES: the ns→µs and NTZ-as-UTC
    // normalizations below surface the file's zoneless instants as
    // session-zone timestamps — under any other zone every ts shifts
    // and the oracle hashes break.
    require(s.conf.get("spark.sql.session.timeZone") == "UTC",
      "Tables.events requires spark.sql.session.timeZone=UTC — its ns→µs and " +
        "NTZ-as-UTC normalizations are value-correct only under a UTC session " +
        "zone. Set .config(\"spark.sql.session.timeZone\", \"UTC\") on the " +
        "SparkSession builder (as graft.Verify, graft.Bench and graft.Main do).")
    val path = s"$dir/events.parquet"
    // nanosAsLong is required only by ns-precision files (generator
    // rounds <=6): without it Spark's footer read itself throws
    // PARQUET_TYPE_ILLEGAL (ILLEGAL_PARQUET_TYPE) during inference. A
    // µs-precision file infers fine without the conf, so rather than
    // demand it unconditionally, translate Spark's error into the
    // actionable contract when it does bite.
    val inferred =
      try schemaCache.computeIfAbsent(path, p => s.read.parquet(p).schema)
      catch {
        case e: Throwable if {
          val m = String.valueOf(e.getMessage)
          m.contains("ILLEGAL_PARQUET_TYPE") || m.contains("INT64 (TIMESTAMP(NANOS")
        } =>
          throw new IllegalStateException(
            s"$path holds nanosecond-precision timestamps, which Spark only reads " +
              "with spark.sql.legacy.parquet.nanosAsLong=true. Set it on the " +
              "SparkSession builder (as graft.Verify, graft.Bench and graft.Main " +
              "do); Tables.events then converts the Long nanos to session-UTC " +
              "microsecond timestamps.", e)
      }
    inferred("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer FLOOR division — a double division would lose sub-µs
        // precision at epoch-ns magnitudes (~1.7e18 > 2^53), and a bare
        // `div` truncates toward ZERO, off by 1 µs from DuckDB's floor on
        // every pre-epoch non-multiple-of-1000 value. Subtracting the
        // non-negative pmod first makes the exact `div` a true floor.
        s.read.schema(inferred).parquet(path)
          .withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
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
