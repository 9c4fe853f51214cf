package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning, wired from Spark's own Catalyst
  * pieces (`BloomFilterAggregate` → `BloomFilterMightContain`, the exact
  * pair `InjectRuntimeFilter` composes when it fires on its own).
  *
  * Why manual wiring exists as a first-class operator: Catalyst's
  * automatic injection is gated on size thresholds
  * (`spark.sql.optimizer.runtime.bloomFilter.*`) and on the creation side
  * carrying a selective filter it can SEE — a pipeline that joins a 100 TB
  * fact table against a dimension that is too big to broadcast as rows
  * (so no DynamicPruning, no broadcast hash join) but whose KEY SET
  * sketches into a few MB wants the filter unconditionally. Building the
  * sketch with a distributed partial+final aggregate and embedding it as a
  * binary literal in the probe keeps both sides codegen'd: the probe is
  * one xxhash64 + bit-test per row inside the scan's WholeStageCodegen
  * span, ahead of the shuffle — rows that cannot join are dropped before
  * they are ever hashed, serialized, or spilled by the exchange.
  *
  * False positives only ever ADD rows to the exchange; the exact join
  * behind the probe removes them, so results are bit-identical to the
  * unpruned plan regardless of fpp.
  */
object BloomFunctions {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
      (children: Seq[Expression]) =>
        new BloomFilterAggregate(children(0), children(1), children(2))),
    (FunctionIdentifier("graft_bloom_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_bloom_might_contain"),
      (children: Seq[Expression]) => BloomFilterMightContain(children(0), children(1))))

  /** Per-session registration (sessions created without the extensions
    * config) — unconditional overwrite; see [[Registration]]. */
  def register(spark: SparkSession): Unit =
    Registration.register(spark, functions)

  /** Distributed bloom build over `key` (any type) of `dim`: one
    * partial+final aggregate, and the only thing the driver ever holds is
    * the serialized sketch (~1.2 bytes per key at 1% fpp) — never the
    * rows. Returns null when `dim` is empty.
    *
    * Keys are `xxhash64`'d on BOTH sides (here and in [[mightContain]]) —
    * the same normalization `InjectRuntimeFilter` applies, because
    * Catalyst's `BloomFilterMightContain` only accepts BIGINT values. The
    * shared deterministic hash preserves the no-false-negative guarantee
    * for every key type; hash collisions only add false positives, which
    * the exact join behind the probe removes anyway. */
  def build(dim: DataFrame, key: Column, estItems: Long, numBits: Long): Array[Byte] = {
    register(dim.sparkSession)
    val conf = dim.sparkSession.conf
    // Catalyst's BloomFilterAggregate CLAMPS via Math.min against these
    // confs instead of failing — a 100M-key build against the 4M-item
    // default would silently size hashes for 4M and collapse the fpp the
    // pruning depends on. Fail loudly and name the knob instead.
    val maxItems = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val maxBits = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    val e = math.max(estItems, 1L)
    require(e <= maxItems,
      s"bloom build sized for $e keys exceeds " +
        s"spark.sql.optimizer.runtime.bloomFilter.maxNumItems=$maxItems — " +
        "raise the conf; Catalyst would otherwise silently clamp and " +
        "degrade the false-positive rate")
    val b = math.max(numBits, 64L)
    require(b <= maxBits,
      s"bloom numBits=$b exceeds " +
        s"spark.sql.optimizer.runtime.bloomFilter.maxNumBits=$maxBits — " +
        "raise the conf; Catalyst would otherwise silently truncate the sketch")
    dim.select(call_function("graft_bloom_agg", xxhash64(key), lit(e), lit(b)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
  }

  /** Probe column: true iff `key` MIGHT be in the sketch. The sketch rides
    * into every task as a binary literal (KBs–MBs — the broadcast-sized
    * object the build side's ROWS are not), and the probe stays inside
    * whole-stage codegen. A null `bloom` (empty build side) yields
    * `false`: an empty key set can join nothing. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    if (bloom == null) lit(false)
    else call_function("graft_bloom_might_contain", lit(bloom), xxhash64(key))
}
