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

  /** Idempotent per-session registration for sessions created without the
    * extensions config. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (ident, info, builder) =>
      if (!registry.functionExists(ident))
        registry.registerFunction(ident, info, builder)
    }
  }

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
    val e = math.max(estItems, 1L)
    // ~9.6 bits/key = 1% fpp; cap inside Catalyst's maxNumBits default so
    // the aggregate never trips the conf guard at test scale
    val b = math.min(math.max(numBits, 64L), 67108864L)
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
