package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.9 "UDF/UDAF" row) via
  * `Aggregator[IN, BUF, OUT]` — Spark's preferred custom-aggregate
  * extension point: the buffer is encoder-serialized, the aggregate runs
  * partial (map-side) + final like any built-in, and `udaf(...)` lifts it
  * into untyped DataFrame use.
  */
object Aggregators {

  /** Weighted average: Σ(v·w)/Σw. SQL-expressible (its DuckDB oracle twin
    * is `sum(v*w)/sum(w)`), which is what makes it hash-checkable — the
    * point here is demonstrating the extension mechanism, with partial
    * aggregation semantics identical to built-ins.
    */
  case class WeightedAvgBuf(var sum: Double, var weight: Double)

  object WeightedAvg extends Aggregator[(Double, Double), WeightedAvgBuf, java.lang.Double] {
    override def zero: WeightedAvgBuf = WeightedAvgBuf(0.0, 0.0)
    override def reduce(b: WeightedAvgBuf, in: (Double, Double)): WeightedAvgBuf = {
      b.sum += in._1 * in._2; b.weight += in._2; b
    }
    override def merge(a: WeightedAvgBuf, b: WeightedAvgBuf): WeightedAvgBuf = {
      a.sum += b.sum; a.weight += b.weight; a
    }
    // NULL, not NaN, for a zero total weight — the SQL twin
    // sum(v*w)/sum(w) this aggregator is hash-checked against yields
    // NULL there (Spark non-ANSI division by zero), and NaN would split
    // the engines the first time a zero-weight group appears
    override def finish(b: WeightedAvgBuf): java.lang.Double =
      if (b.weight == 0.0) null else java.lang.Double.valueOf(b.sum / b.weight)
    override def bufferEncoder: Encoder[WeightedAvgBuf] = Encoders.product[WeightedAvgBuf]
    override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  /** The INTEGER-STATE twin for money: Σ(cents·w)/Σw with BIGINT
    * accumulation. [[WeightedAvg]]'s Double state is exact only while
    * Σ(v·w) < 2^53 — with cents·qty up to ~5·10⁸ per lineitem row that
    * bound dies at ~1.8·10⁷ rows per group, far under the 100 TB bar, and
    * past it the partial sums round and the result depends on partition
    * merge order (the retired round(sum(double),2) hazard, reappearing
    * through the UDAF seam). Long state is exact to ~1.8·10¹⁰ rows per
    * group (Σ < 2⁶³) and the terminal division of two exact integers is
    * order-free by construction. q24 uses this one; WeightedAvg stays as
    * the generic-mechanism demonstration.
    */
  case class WeightedAvgCentsBuf(var sum: Long, var weight: Long)

  object WeightedAvgCents
      extends Aggregator[(Long, Long), WeightedAvgCentsBuf, java.lang.Double] {
    override def zero: WeightedAvgCentsBuf = WeightedAvgCentsBuf(0L, 0L)
    override def reduce(b: WeightedAvgCentsBuf, in: (Long, Long)): WeightedAvgCentsBuf = {
      b.sum += in._1 * in._2; b.weight += in._2; b
    }
    override def merge(a: WeightedAvgCentsBuf, b: WeightedAvgCentsBuf): WeightedAvgCentsBuf = {
      a.sum += b.sum; a.weight += b.weight; a
    }
    // NULL on zero weight — same SQL-twin rule as WeightedAvg
    override def finish(b: WeightedAvgCentsBuf): java.lang.Double =
      if (b.weight == 0L) null else java.lang.Double.valueOf(b.sum.toDouble / b.weight)
    override def bufferEncoder: Encoder[WeightedAvgCentsBuf] =
      Encoders.product[WeightedAvgCentsBuf]
    override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }
}
