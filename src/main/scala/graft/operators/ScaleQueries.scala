package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-path variants of exact operators — the forms you run when the
  * exact version's shuffle/state no longer fits the cluster. Rows-only
  * checks (no DuckDB oracle): sketches are implementation-defined.
  */
object ScaleQueries {

  type Q = (SparkSession, String) => DataFrame

  /** x01: HLL approximate distinct — the 100 TB replacement for q15's
    * exact expand+two-phase count-distinct. One narrow partial+final agg,
    * fixed-size sketch state per group, no expand.
    */
  val x01_approx_distinct: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_suppkey"), 0.02).as("n_supp_approx"),
        approx_count_distinct(col("l_partkey"), 0.02).as("n_part_approx"))
      .orderBy(col("l_returnflag"))
  }

  /** x02: approximate quantiles — fixed-memory percentile sketch
    * (Greenwald-Khanna) vs an exact global sort.
    */
  val x02_approx_quantiles: Q = (s, dir) => {
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("p50"),
        percentile_approx(col("o_totalprice"), lit(0.99), lit(1000)).as("p99"))
      .orderBy(col("o_orderpriority"))
  }

  /** x03: approximate heavy hitters over the token stream (DataSketches
    * frequent-items via `approx_top_k`) — the 100 TB replacement for the
    * exact explode→groupBy→count→order route to "top vocabulary terms":
    * fixed-size sketch state per partition merged once at the driver-side
    * final agg, so the full vocabulary never shuffles. Guarantees (spec-
    * bounded in `SketchAccuracySpec`): every token with true frequency
    * above the sketch error bound n/maxItemsTracked is PRESENT, and each
    * estimate is within that bound of the true count.
    */
  val x03_heavy_hitters: Q = (s, dir) => {
    Tables.documents(s, dir)
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .agg(expr("approx_top_k(tok, 20, 8192)").as("tk"))
      .select(explode(col("tk")).as("hh"))
      .select(col("hh.item").as("token"), col("hh.count").as("est_count"))
      .orderBy(col("est_count").desc, col("token"))
  }

  val all: Map[String, Q] = Map(
    "x01_approx_distinct" -> x01_approx_distinct,
    "x02_approx_quantiles" -> x02_approx_quantiles,
    "x03_heavy_hitters" -> x03_heavy_hitters,
  )
}
