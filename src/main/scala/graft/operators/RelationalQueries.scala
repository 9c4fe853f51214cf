package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational operator surface (SURVEY.md §2.4–§2.9).
  *
  * Each query maps a reference capability (or a §2.9 parity category) onto
  * Catalyst built-ins, and each has a DuckDB oracle twin in
  * [[graft.SparkEntry.oracleSql]]. Determinism rules: explicit ORDER BY on a
  * unique key, aggregates rounded where FP accumulation order could differ,
  * no raw nanosecond timestamps in output.
  *
  * Scale notes are inline per query — the plan each produces must survive
  * a 1000-executor / 100 TB deployment, not just local[32]/sf0.01.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q01: TPC-H Q1-style scan + hash aggregation (reference A1/A2
    * par_map_reduce analog — osmpbf/src/reader.rs:119-142).
    * Partial+final agg: map-side combine keeps the shuffle tiny (4 groups);
    * the scan reads exactly the 7 needed columns (column pruning).
    */
  val q01_agg: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        // money accumulates as exact integer cents (1e4 units for the
        // 4-decimal discount product) with ONE terminal division — the
        // r15 retirement of the round(sum(double),2) cross-engine hazard
        // class; integral l_quantity sums are exact in double and stay
        (sum(floor(col("l_extendedprice") * 100 + lit(0.5))) / lit(100.0)).as("sum_base_price"),
        (sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000 + lit(0.5)))
          / lit(10000.0)).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        (sum(floor(col("l_discount") * 100 + lit(0.5))) / count(lit(1)) / lit(100.0)).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** q02: filter + projection — predicate pushdown to the parquet scan
    * (reference F2 tag-predicate analog, indexed.rs:286-297). Both filters
    * appear in PushedFilters; ReadSchema is exactly 4 columns. At 100 TB
    * this is the difference between reading 4 columns' row groups that pass
    * min/max pruning vs. the whole table.
    */
  val q02_filter_pushdown: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") > lit(45.0) &&
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-03-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** q03: broadcast-hash join chain — small dims (customer, nation) are
    * broadcast so the big fact (orders) never shuffles. At 100 TB orders,
    * nation/customer-dim stay broadcastable (dims grow slower than facts);
    * the explicit broadcast() hint pins the strategy.
    */
  val q03_join_broadcast: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(floor(col("o_totalprice") * 100 + lit(0.5))) / lit(100.0)).as("total_revenue"))
      .orderBy(col("n_name"))
  }

  /** q04: big×big shuffle join (sort-merge at scale). Both sides shuffle on
    * the join key; AQE picks SMJ/shuffled-hash at runtime. The post-join
    * aggregation is partial+final so only 5 groups cross the second
    * exchange.
    */
  val q04_join_shuffle: Q = (s, dir) => {
    val l = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_late_lines"),
        (sum(floor(col("l_extendedprice") * 100 + lit(0.5))) / lit(100.0)).as("late_value"))
      .orderBy(col("o_orderpriority"))
  }

  /** q05: semi-join — the reference's one real query: filter ways by
    * predicate, fetch dependent nodes (F3, indexed.rs:264-330). Here:
    * filter orders by predicate, semi-join lineitem on the key set.
    * The filtered side is aggregated per key; broadcast of the filtered
    * key set replaces the reference's BTreeSet + zone-map pruning
    * (Parquet min/max row-group stats give the same skip-scan for free).
    */
  val q05_semi_join: Q = (s, dir) => {
    val l = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
      .filter(col("o_orderstatus") === lit("F") && col("o_totalprice") > lit(200000.0))
    l.join(o, l("l_orderkey") === o("o_orderkey"), "left_semi")
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"), round(sum(col("l_quantity")), 2).as("qty"))
      .orderBy(col("l_orderkey"))
  }

  /** q06: anti-join (V3 missing-rows check, validate.py:75-91) —
    * customers that never placed a high-value order. */
  val q06_anti_join: Q = (s, dir) => {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_totalprice") > lit(400000.0))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** q07: full-outer completeness join (V2, validate.py:66-73) reduced to
    * its three cardinalities: matched / left-only / right-only. Single-row
    * output keeps the oracle compare trivial while still exercising the
    * full-outer executor.
    */
  val q07_full_outer: Q = (s, dir) => {
    val o = Tables.orders(s, dir).select(col("o_orderkey")).distinct()
    val l = Tables.lineitem(s, dir).select(col("l_orderkey")).distinct()
    o.join(l, o("o_orderkey") === l("l_orderkey"), "full_outer")
      .agg(
        sum(when(col("o_orderkey").isNotNull && col("l_orderkey").isNotNull, 1).otherwise(0)).as("matched"),
        sum(when(col("l_orderkey").isNull, 1).otherwise(0)).as("orders_only"),
        sum(when(col("o_orderkey").isNull, 1).otherwise(0)).as("lineitem_only"))
  }

  /** q08: duplicate-key audit (V1, validate.py:57-64) — keys with more than
    * one row. On lineitem the (natural) multi-line orders show up; the same
    * plan on (id,type) is the reference's dup check.
    */
  val q08_dup_check: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .orderBy(col("l_orderkey"))
  }

  /** q09: window top-k per group — rank with deterministic tie-break.
    * Shuffles once on the partition key; at scale the per-customer groups
    * are tiny so no skew concern.
    */
  val q09_window_topk: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("rk"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"))
      .orderBy(col("o_custkey"), col("rk"))
  }

  /** q09b: the IDENTICAL canonical filter-over-window query as q09 —
    * same oracle — executed UNDER [[graft.plans.TopKWindowRewrite]], so
    * the gate runs the optimizer rule end-to-end, not just its spec: the
    * executed plan must carry the TopKPerKeyPartial/Final heap stages in
    * place of the rank filter (`TopKWindowRewriteSpec` pins that on this
    * entry's own plan). Runs on a CHILD session (`newSession`: shared
    * SparkContext, private SessionState) so registering the rule + the
    * planner strategy and disabling Spark's sort-based
    * WindowGroupLimit never leaks into the sibling gate queries that
    * Verify dumps concurrently on the parent session — q09 stays the
    * measured plain-window twin. Regime note: o_custkey cardinality
    * (~1.5k/sf0.01, ~15k/sf0.1) sits squarely in the heap operator's
    * measured win region (TopKBench: faster below ~100k keys).
    */
  val q09b_window_topk_rewritten: Q = (s0, dir) => {
    val s = s0.newSession()
    s.experimental.extraOptimizations = Seq(graft.plans.TopKWindowRewrite)
    s.experimental.extraStrategies = Seq(graft.plans.TopKPerKeyStrategy)
    // let the heap operator stand alone in the plan (Spark would
    // otherwise insert its sort-based pre-prune below the same window)
    s.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "-1")
    q09_window_topk(s, dir)
  }

  /** q10: window running/lag/moving frames over events per user. Ordering
    * key is the unique event_id (never the ns timestamp — ns truncation
    * would make tie order oracle-divergent).
    */
  val q10_window_running: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(s, dir)
      // unbounded running sum on exact cents (the wave-5 hazard class —
      // retired round 15); the 1-row lag and 3-row moving average below
      // stay double: bounded frames in a deterministic ORDER BY order are
      // not an accumulation-order hazard
      .withColumn("running_value", sum(floor(col("value") * 100 + lit(0.5))).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) / lit(100.0))
      .withColumn("prev_value", round(lag(col("value"), 1).over(w), 2))
      .withColumn("mov_avg3", round(avg(col("value")).over(
        w.rowsBetween(-2, Window.currentRow)), 4))
      .select(col("user_id"), col("event_id"), col("running_value"),
        col("prev_value"), col("mov_avg3"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** q11: rollup over the region→nation hierarchy. The output carries
    * NO grouping_id: the grouping columns (r_name, n_name) are
    * non-nullable in this schema, so subtotal NULLs are unambiguous; a
    * nullable grouping column would need grouping_id() on BOTH the
    * engine and oracle sides to keep subtotal rows distinguishable. */
  val q11_rollup: Q = (s, dir) => {
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), (sum(floor(col("c_acctbal") * 100 + lit(0.5))) / lit(100.0)).as("bal"))
      .select(col("r_name"), col("n_name"), col("n_cust"), col("bal"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** q30: arbitrary GROUPING SETS — the grouping combinations rollup/cube
    * can't express (here: by-status, by-priority, and grand total, but NOT
    * the cross product). Catalyst plans it as one Expand + single
    * aggregate, the same shape as q11/q12. Uses the Dataset
    * `groupingSets` API rather than SQL-over-a-temp-view: registering a
    * view inside a query function would mutate the caller's session
    * catalog. */
  val q30_grouping_sets: Q = (s, dir) => {
    Tables.orders(s, dir)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("o_totalprice") * 100 + lit(0.5))) / lit(100.0)).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  }

  /** q12: cube over two low-cardinality dims. */
  val q12_cube: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** q13: top-k — orderBy+limit plans TakeOrderedAndProject: per-partition
    * heaps, only k rows reach the driver-side merge. No full sort at scale.
    */
  val q13_topk: Q = (s, dir) => {
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
  }

  /** q14: set operations — INTERSECT / EXCEPT / UNION composed on customer
    * key sets. Catalyst rewrites intersect/except to joins over distinct
    * inputs.
    */
  val q14_setops: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val withOrders = o.select(col("o_custkey").as("k")).distinct()
    val building = c.filter(col("c_mktsegment") === lit("BUILDING"))
      .select(col("c_custkey").as("k"))
    val rich = c.filter(col("c_acctbal") > lit(9000.0)).select(col("c_custkey").as("k"))
    withOrders.intersect(building)
      .union(rich.except(withOrders))
      .distinct()
      .orderBy(col("k"))
  }

  /** q15: distinct aggregation — exact count-distinct triggers Catalyst's
    * expand+two-phase rewrite; at 100 TB approx_count_distinct (HLL) is the
    * scale path, exercised in the rows-only x-queries.
    */
  val q15_distinct_agg: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  /** q16: string scalar functions — all codegen'd built-ins. */
  val q16_string_fns: Q = (s, dir) => {
    Tables.part(s, dir)
      .filter(col("p_type").like("%AND%") || col("p_type").isin("ECONOMY", "PROMO"))
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 12).as("name12"),
        length(col("p_name")).as("name_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("bt"))
      .orderBy(col("p_partkey"))
  }

  /** q17: date/time scalar functions + group by calendar month. */
  val q17_date_fns: Q = (s, dir) => {
    Tables.orders(s, dir)
      .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(floor(col("o_totalprice") * 100 + lit(0.5))) / lit(100.0)).as("revenue"))
      .orderBy(col("yr"), col("mo"))
  }

  /** q18: conditional aggregation (CASE WHEN inside agg). */
  val q18_case_when: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .groupBy(col("l_linestatus"))
      .agg(
        round(sum(when(col("l_returnflag") === "R", col("l_quantity")).otherwise(0.0)), 2).as("qty_returned"),
        (sum(when(col("l_discount") > 0.05,
          floor(col("l_extendedprice") * 100 + lit(0.5))).otherwise(0L))
          / lit(100.0)).as("discounted_value"),
        count(lit(1)).as("n"))
      .orderBy(col("l_linestatus"))
  }

  /** q19: JSON extraction from events.props (reference tags-map analog —
    * semi-structured payload addressed by path). get_json_object is a
    * codegen'd built-in; no UDF.
    */
  val q19_json: Q = (s, dir) => {
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  /** q20: scalar subquery — orders above the global average price. The
    * single-row aggregate is cross-joined (broadcast) into the filter.
    */
  val q20_scalar_subquery: Q = (s, dir) => {
    // "price > avg(price)" decided by EXACT integer cross-multiplication
    // (cents * n > sum_cents): a double average is accumulation-order-
    // dependent, and a price within an ulp of it could flip membership
    // between engines — the same latent class as round(sum(double),2)
    val o = Tables.orders(s, dir)
      .withColumn("cents", floor(col("o_totalprice") * 100 + lit(0.5)))
    val avgPrice = o.agg(sum(col("cents")).as("sc"), count(lit(1)).as("no"))
    o.join(broadcast(avgPrice))
      .filter(col("cents") * col("no") > col("sc"))
      .agg(count(lit(1)).as("n_above"),
        (sum(col("cents")) / lit(100.0)).as("value_above"))
  }

  /** q21: HAVING — group filter after aggregation. */
  val q21_having: Q = (s, dir) => {
    Tables.part(s, dir)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"), (sum(floor(col("p_retailprice") * 100 + lit(0.5))) / count(lit(1)) / lit(100.0)).as("avg_price"))
      .filter(col("n_parts") > 5)
      .orderBy(col("p_brand"))
  }

  /** q22: grouped product-mix join: part dim broadcast into lineitem fact,
    * two-level group by. */
  val q22_join_agg_dim: Q = (s, dir) => {
    val l = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir)
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(round(sum(col("l_quantity")), 2).as("qty"),
        (sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000 + lit(0.5)))
          / lit(10000.0)).as("revenue"))
      .orderBy(col("p_brand"))
  }

  /** Shared body of q23/q31: event-time window aggregation (tumbling =
    * slide == length). Output is the window start as an epoch second to
    * stay timestamp-precision-agnostic vs the oracle. */
  private def windowAgg(s: SparkSession, dir: String,
                        len: String, slide: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), len, slide).as("w"), col("event_type"))
      // exact integer cents (floor(v*100+.5) per event, BIGINT sum, one
      // terminal division) — the round(sum(double),2) it replaces hashed
      // a double accumulation both engines merely happened to order-agree
      // on (the wave-5 latent class, retired round 15)
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("value") * 100 + lit(0.5))) / lit(100.0)).as("total_value"))
      .select(unix_timestamp(col("w.start")).as("bucket_start"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy(col("bucket_start"), col("event_type"))

  /** q23: batch event-time tumbling window (1 hour) — the batch twin of the
    * Structured Streaming path (graft.streaming); window() works identically
    * in both. */
  val q23_window_tumbling: Q = (s, dir) => windowAgg(s, dir, "1 hour", "1 hour")

  /** q31: SLIDING windows in batch (1-hour length, 15-minute slide) —
    * each event expands into length/slide = 4 overlapping buckets before
    * one ordinary partial+final aggregate; the batch twin of the
    * streaming `slidingCounts`. Oracle expands the same 4 starts with
    * integer epoch arithmetic.
    */
  val q31_window_sliding: Q = (s, dir) => windowAgg(s, dir, "1 hour", "15 minutes")

  /** q24: typed-Aggregator UDAF ([[graft.functions.Aggregators.WeightedAvg]])
    * lifted into DataFrame use via udaf(). Quantity-weighted mean price per
    * return flag; partial+final aggregation like any built-in (the buffer
    * encoder-serializes across the shuffle). Oracle twin: sum(v*w)/sum(w).
    */
  val q24_udaf_weighted_avg: Q = (s, dir) => {
    // the BIGINT-state twin: Double state is exact only to ~1.8e7 rows
    // per flag (sum(cents*qty) < 2^53) — under the 100 TB bar this file
    // holds every other money path to. Long state is exact to ~1.8e10
    // rows per group and the terminal division is order-free.
    val wavg = udaf(graft.functions.Aggregators.WeightedAvgCents)
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(round(wavg(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"),
          col("l_quantity").cast("long")) / lit(100.0), 4).as("w_avg_price"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  /** q25: SQL frontend + correlated subqueries — Catalyst decorrelates
    * the EXISTS and the correlated scalar subquery into joins (no
    * per-row re-execution, unlike a naive nested-loop interpreter). The
    * same text runs verbatim in DuckDB as its own oracle.
    */
  val q25_sql_correlated: Q = (s0, dir) => {
    // child session: the generic view names (customer/orders) must not
    // clobber same-named temp views an embedding caller owns — the q30
    // rule, applied to every view-registering SQL entry
    val s = s0.newSession()
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    // the acctbal-vs-average threshold decides by EXACT integer
    // cross-multiplication (centsA*100*n > sum_cents) — the q20 rule: a
    // double average is accumulation-order-dependent across engines and a
    // boundary value could flip row membership
    s.sql(
      """SELECT c_custkey, c_name
        |FROM customer c
        |WHERE EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
        |  AND CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) * 100
        |        * (SELECT count(*) FROM orders)
        |      > (SELECT CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |         FROM orders)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** q26: pivot — wide conditional aggregation; Catalyst rewrites it to a
    * single pass with one aggregate per (group, pivot-value) cell. Missing
    * cells coalesce to 0 to match COUNT semantics in the oracle.
    */
  val q26_pivot: Q = (s, dir) => {
    Tables.orders(s, dir)
      .groupBy(year(col("o_orderdate")).as("yr"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("yr"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy(col("yr"))
  }

  /** q27: skew-mitigated salted join, HOT KEYS ONLY — semantically
    * identical to the plain join (which is exactly what the oracle runs).
    * AQE's skew-join split is the first-line tool; this is the explicit
    * fallback pattern for when it isn't enough (e.g. the skew survives
    * into an aggregation, or stats mislead AQE).
    *
    * Canonical shape: a cheap first pass detects keys above a frequency
    * threshold; ONLY rows with those keys take the salted path (big side
    * salts from its own unique columns, the matching slice of the other
    * side explodes ×SALT); everything else joins plainly. Replication is
    * therefore bounded by SALT × |hot slice|, not SALT × |table| — the
    * property that keeps the rewrite linear at 100× scale. The hot-key set
    * is a broadcast DataFrame, never a driver collect.
    */
  val q27_salted_join: Q = (s, dir) => {
    val SALT = 8
    val HOT = 6 // lines-per-key threshold; production: reducer-capacity based
    val l = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    // localCheckpoint: hotKeys feeds THREE probes (semi+anti on
    // lineitem, semi on orders — the cold orders side joins the full
    // table); without the cut each probe re-plans the full lineitem
    // frequency aggregate (exchange reuse does not fire across the
    // broadcast builds — observed as plan_ids 729/737 in the r3 audit).
    // The key set is dimension-sized, so the materialization is free.
    val hotKeys = l.groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= HOT).select(col("l_orderkey").as("hot_key"))
      .localCheckpoint()
    val lHot = l.join(broadcast(hotKeys), col("l_orderkey") === col("hot_key"), "left_semi")
      .withColumn("salt", pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(SALT)))
    val lCold = l.join(broadcast(hotKeys), col("l_orderkey") === col("hot_key"), "left_anti")
    val oHot = o.join(broadcast(hotKeys), col("o_orderkey") === col("hot_key"), "left_semi")
      .withColumn("salt", explode(array((0 until SALT).map(lit(_)): _*)))
    val hot = lHot.join(oHot,
        lHot("l_orderkey") === oHot("o_orderkey") && lHot("salt") === oHot("salt"))
      .select(col("o_orderstatus"), col("l_extendedprice"))
    val cold = lCold.join(o, lCold("l_orderkey") === o("o_orderkey"))
      .select(col("o_orderstatus"), col("l_extendedprice"))
    hot.unionByName(cold)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_lines"),
        (sum(floor(col("l_extendedprice") * 100 + lit(0.5))) / lit(100.0)).as("value"))
      .orderBy(col("o_orderstatus"))
  }

  /** q28: data-quality expectation report — the validation gate a pipeline
    * runs before promoting a dataset (null rates, domain ranges,
    * referential integrity). ALL of a table's expectations evaluate in ONE
    * scan (one partial+final aggregate computing every violation counter),
    * then unpivot into one row per check — at 100 TB adding a tenth
    * lineitem expectation costs an extra counter, not an extra scan. The
    * FK check folds the q06 anti-join shape into the same orders pass via
    * a broadcast of the (dimension-sized) customer key set. Output: one
    * row per expectation with violation and checked-row counts, so a gate
    * alerts on `violations > threshold · n_checked`.
    */
  val q28_quality_checks: Q = (s, dir) => {
    def unpivot(agg: DataFrame, checks: (String, String)*): DataFrame =
      agg.select(explode(array(checks.map { case (name, vcol) =>
        struct(lit(name).as("check"), col(vcol).as("violations"),
          col("n").as("n_checked")) }: _*)).as("r"))
        .select(col("r.check"), col("r.violations"), col("r.n_checked"))
    val lChecks = unpivot(
      Tables.lineitem(s, dir).agg(
        sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L).otherwise(0L)).as("v_qty"),
        sum(when(col("l_discount") < 0.0 || col("l_discount") > 0.1, 1L).otherwise(0L)).as("v_disc"),
        count(lit(1)).as("n")),
      "lineitem_quantity_1_to_50" -> "v_qty",
      "lineitem_discount_0_to_0.1" -> "v_disc")
    val custKeys = Tables.customer(s, dir).select(col("c_custkey"))
    val oChecks = unpivot(
      Tables.orders(s, dir)
        .join(broadcast(custKeys), col("o_custkey") === col("c_custkey"), "left")
        .agg(
          sum(when(col("o_totalprice").isNull, 1L).otherwise(0L)).as("v_null"),
          sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).as("v_fk"),
          count(lit(1)).as("n")),
      "orders_totalprice_not_null" -> "v_null",
      "orders_custkey_fk" -> "v_fk")
    lChecks.unionByName(oChecks).orderBy(col("check"))
  }

  /** q29: top-2 lineitems per supplier through the CUSTOM OPERATOR
    * [[graft.plans.TopKPerKey]] (logical node + planner strategy +
    * bounded-heap physical exec with a map-side partial stage) — the
    * same answer q09's window formulation gives, but the shuffle carries
    * ≤ k rows per key per input partition instead of the whole table.
    * Oracle = the window+rank SQL, so the hash check proves the custom
    * operator's semantics equal the declarative formulation. */
  val q29_topk_custom_operator: Q = (s, dir) => {
    val l = Tables.lineitem(s, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    graft.plans.TopKPerKey.perKey(l, Seq("l_suppkey"),
        Seq("l_extendedprice" -> false, "l_orderkey" -> true, "l_linenumber" -> true), 2)
      .orderBy(col("l_suppkey"), col("l_extendedprice").desc,
        col("l_orderkey"), col("l_linenumber"))
  }

  /** q36: bloom-filter-pruned shuffle join — the RUNTIME-FILTER pattern
    * ([[graft.functions.BloomFunctions]]) as an explicit operator. The
    * build side (urgent orders) aggregates its join keys into a bloom
    * sketch (distributed partial+final, driver holds only the serialized
    * bits); the probe rides the fact scan as a codegen'd binary-literal
    * `might_contain` BEFORE the exchange, so at 100 TB the shuffle carries
    * ~the matching rows (+fpp) instead of the whole fact table. The join
    * is hinted SHUFFLE_HASH — the regime this operator exists for is a
    * build side too large to broadcast as rows (no BHJ, no DPP) whose key
    * sketch still fits in a task; bloom false positives are removed by the
    * exact join behind the probe, so the result is bit-identical to the
    * unpruned plan at any fpp. Oracle: the plain join+filter SQL.
    */
  val q36_bloom_pruned_join: Q = (s, dir) => bloomPrunedJoin(s, dir)

  /** q36 body with CALLER-SIZED sketch: `estKeys`/`numBits` default to the
    * gate-regime static bound — at 100 TB the caller passes its catalog
    * row-count estimate here (the parameter IS the API for that, not a
    * comment). The sketch only needs any OVERestimate of distinct keys:
    * too many bits cost memory, never correctness; undersizing only raises
    * fpp — the exact join behind the probe removes false positives, so the
    * result is bit-identical at any sizing (spec-pinned at 512 bits).
    * Default 4M bits / 400k keys ≈ 10 bits/key ≈ 1% fpp; one fewer job
    * than counting the build side. */
  def bloomPrunedJoin(s0: SparkSession, dir: String,
      estKeys: Long = 400000L, numBits: Long = 4194304L): DataFrame = {
    // child session: register() is an unconditional OVERWRITE on the
    // FUNCTION registry (Registration's policy) — on the caller's session
    // it would overwrite a same-named entry and leak graft's functions
    // into the caller's registry (every other session mutation in this
    // file is already isolated)
    val s = s0.newSession()
    graft.functions.BloomFunctions.register(s)
    val urgent = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderstatus"))
      // two consumers (bloom build + join) — dimension-sized, same cut
      // rationale as q27's hotKeys
      .localCheckpoint()
    val bloom = graft.functions.BloomFunctions.build(
      urgent, col("o_orderkey"), estKeys, numBits)
    val l = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_extendedprice"))
      .filter(graft.functions.BloomFunctions.mightContain(bloom, col("l_orderkey")))
    l.join(urgent.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_lines"),
        (sum(floor(col("l_extendedprice") * 100 + lit(0.5))) / lit(100.0)).as("value"))
      .orderBy(col("o_orderstatus"))
  }

  /** q32: MULTISET set ops — EXCEPT ALL / INTERSECT ALL (q14 covers the
    * DISTINCT variants; the ALL forms preserve multiplicity, which is what
    * "orders placed more often under status F than O per customer" needs).
    * Catalyst plans both as a single aggregate computing per-row
    * multiplicities then replicating — one shuffle each, no join. Output
    * is the grouped multiset (key, multiplicity) so the result is
    * deterministic at any scale.
    */
  val q32_setops_all: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    val a = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    val b = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    val ea = a.exceptAll(b).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
    val ia = a.intersectAll(b).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
    ea.unionByName(ia)
      .select(col("op"), col("o_custkey"), col("n"))
      .orderBy(col("op"), col("o_custkey"))
  }

  /** q33: LATERAL correlated table subquery — top-2 customers by account
    * balance per nation, written as `FROM nation, LATERAL (...)`. Catalyst
    * decorrelates the per-nation ORDER BY ... LIMIT into a window+filter
    * over ONE customer scan (DomainJoin rewrite) — not a per-nation
    * re-execution. Same text runs verbatim in DuckDB as the oracle.
    */
  /** q33/q34 SQL texts run VERBATIM in both engines: this constant is the
    * single source referenced by the engine query AND RelationalOracles,
    * so the verbatim-parity claim is structural, not maintained by hand. */
  val q33Sql: String =
    """SELECT n.n_name, c.c_name, c.c_acctbal
      |FROM nation n,
      |LATERAL (
      |  SELECT c_name, c_acctbal FROM customer
      |  WHERE c_nationkey = n.n_nationkey
      |  ORDER BY c_acctbal DESC, c_name LIMIT 2) c
      |ORDER BY n.n_name, c.c_acctbal DESC, c.c_name""".stripMargin

  val q33_lateral_join: Q = (s0, dir) => {
    val s = s0.newSession() // see q25's view-isolation note
    Tables.nation(s, dir).createOrReplaceTempView("nation")
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    s.sql(q33Sql)
  }

  /** q34: RECURSIVE CTE (Spark 4's WITH RECURSIVE) — calendar
    * densification, the canonical gap-filling report: generate every day
    * of a window, left-join the daily order counts so zero-order days
    * appear explicitly. The recursion materializes only the 31-row date
    * spine (each iteration is one tiny union step, bounded by the
    * recursion-level limit); the corpus contributes through an ordinary
    * partial+final date aggregate — the spine join is broadcast-sized at
    * any corpus scale. Same text runs verbatim in DuckDB as the oracle.
    */
  /** Shared verbatim-in-both-engines text — see [[q33Sql]]. */
  val q34Sql: String =
    """WITH RECURSIVE days(d) AS (
      |  SELECT CAST('1995-01-01' AS DATE) AS d
      |  UNION ALL
      |  SELECT CAST(d + INTERVAL 1 DAY AS DATE) FROM days
      |  WHERE d < CAST('1995-01-31' AS DATE))
      |SELECT CAST(days.d AS STRING) AS day, coalesce(o.n, CAST(0 AS BIGINT)) AS n_orders
      |FROM days LEFT JOIN (
      |  SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n
      |  FROM orders GROUP BY 1) o
      |ON days.d = o.d
      |ORDER BY day""".stripMargin

  val q34_recursive_cte: Q = (s0, dir) => {
    val s = s0.newSession() // see q25's view-isolation note
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    s.sql(q34Sql)
  }

  /** q35: UNPIVOT/melt — wide metric columns → long (metric, value) rows,
    * the inverse of q26's pivot and the standard shape for feeding metric
    * stores. Aggregate FIRST (3 sums per flag — partial+final, tiny), then
    * `Dataset.unpivot` the 3 measure columns of the already-aggregated
    * rows: the melt multiplies group-count rows, never corpus rows.
    */
  val q35_unpivot: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        (sum(floor(col("l_extendedprice") * 100 + lit(0.5))) / lit(100.0)).as("sum_price"),
        (sum(floor(col("l_discount") * 100 + lit(0.5))) / lit(100.0)).as("sum_disc"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        "measure", "value")
      .orderBy(col("l_returnflag"), col("measure"))
  }

  /** One-time bucketed layouts per (session, sfDir) — see [[q37_bucketed_colocated]].
    * Key includes the session identity because catalog entries die with
    * the session; values are (orders table, lineitem table, scratch dir).
    *
    * SCRATCH CONTRACT (the oracle-twin discipline from r6): the layout is
    * session-scoped scratch, not a managed dataset — a JVM shutdown hook
    * deletes every scratch dir this process created, and a library
    * consumer embedding graft in a long-lived JVM can reclaim earlier
    * with [[dropBucketed]] (drops the session's `graft_bkt_*` catalog
    * entries + deletes their files; the next call rebuilds). */
  private val bucketedReady =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String, String)]()

  /** Shared memo contract for the one-time scratch layouts (bucketed /
    * hive-partitioned / variant / ANALYZE'd): one build per (session,
    * sfDir) keyed by session identity, a fresh tracked scratch dir per
    * build (JVM-exit cleanup via [[graft.Scratch]]), and a
    * per-(session, dir) suffix for catalog-table names. The contract
    * lives HERE once — each `ensure*` is just its build body. */
  private def memoLayout[T](
      cache: java.util.concurrent.ConcurrentHashMap[String, T],
      s: SparkSession, dir: String, prefix: String)(
      build: (String, String) => T): T =
    cache.computeIfAbsent(s"${System.identityHashCode(s)}:$dir", _ => {
      // md5 of the dir, not String.hashCode: two dirs colliding on a
      // 31-bit hash would get the SAME catalog-table suffix, and the
      // second build's mode-overwrite saveAsTable would silently replace
      // the first dir's live tables under every query reading them
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val sfx = md.take(6).map(b => f"$b%02x").mkString +
        "_" + java.lang.Integer.toHexString(System.identityHashCode(s))
      val scratch = java.nio.file.Files.createTempDirectory(prefix).toString
      graft.Scratch.track(scratch)
      build(scratch, sfx)
    })

  /** Drop this session's bucketed-layout catalog entries and delete
    * their scratch now instead of at JVM exit. */
  def dropBucketed(s: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    val prefix = s"${System.identityHashCode(s)}:"
    bucketedReady.keySet.asScala.filter(_.startsWith(prefix)).toSeq.foreach { k =>
      Option(bucketedReady.remove(k)).foreach { case (ordT, liT, d) =>
        s.sql(s"DROP TABLE IF EXISTS $ordT")
        s.sql(s"DROP TABLE IF EXISTS $liT")
        graft.Scratch.untrack(d)
        try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
        catch { case _: Throwable => () }
      }
    }
  }

  /** Write `orders` and `lineitem` bucketed AND sorted by the join key
    * (8 buckets here; thousands at 100 TB). The `repartition(n, key)`
    * before `bucketBy(n, key)` is deliberate: repartition's
    * HashPartitioning uses the same murmur3 `pmod` as the bucket-id
    * expression, so every write task holds exactly ONE bucket's rows and
    * emits exactly one file per bucket — the precondition for the
    * read side to elide both the Exchange and the Sort under the join.
    * Built once per session+dir and reused by every subsequent call:
    * the one-time layout cost is the whole point of bucketing — it's
    * paid at ingest, not per query.
    */
  def ensureBucketed(s: SparkSession, dir: String, buckets: Int = 8): (String, String) = {
    // buckets is part of the memo identity: a hit on a different count
    // would silently hand back the wrong layout as if it were the
    // requested one
    val (ordT, liT, _) = memoLayout(bucketedReady, s, s"$dir#b$buckets", "graft-bkt") { (scratch, sfx) =>
      val (ordT, liT) = (s"graft_bkt_orders_$sfx", s"graft_bkt_lineitem_$sfx")
      Tables.orders(s, dir)
        .repartition(buckets, col("o_orderkey"))
        .write.bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$scratch/orders").mode("overwrite").saveAsTable(ordT)
      Tables.lineitem(s, dir)
        .repartition(buckets, col("l_orderkey"))
        .write.bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$scratch/lineitem").mode("overwrite").saveAsTable(liT)
      (ordT, liT, scratch)
    }
    (ordT, liT)
  }

  /** q37: bucketed CO-LOCATED join — the recurring big×big join with the
    * shuffle paid ONCE at layout time instead of on every query. Both
    * fact tables are written `bucketBy(8, key).sortBy(key)`; the read
    * side then satisfies the sort-merge join's distribution straight off
    * the scans, so the join subtree contains NO Exchange, and the
    * per-order aggregate that follows reuses the same partitioning — the
    * entire orders⋈lineitem→per-order-agg pipeline is one shuffle-free
    * stage (`BucketingSpec` pins exactly that on the executed plan). The
    * SMJ keeps two LOCAL sorts: Spark 3+ never reports bucket sort order
    * from the scan (the legacy `bucketedTableScan.outputOrdering` conf),
    * but re-sorting already-bucket-sorted files is linear within the
    * partition — the scale cost that matters, the Exchange, is gone.
    * At 100 TB this is THE technique for a fact join run hourly: bucket
    * pairs join locally on whatever executor holds them, and only the
    * final 7-row histogram moves. The `merge` hint keeps the plan on the
    * SMJ path (broadcast would also avoid the exchange at sf0.01 but
    * demonstrates nothing at scale, where neither side broadcasts).
    */
  val q37_bucketed_colocated: Q = (s, dir) =>
    bucketedPerOrder(s, dir)
      .groupBy(col("n_items"))
      .agg(count(lit(1)).as("n_orders"), sum(col("qty")).as("sum_qty"))
      .orderBy(col("n_items"))

  /** The shuffle-free fragment of q37: bucketed scan ⋈ bucketed scan →
    * per-order agg, all in one stage. Exposed so `BucketingSpec` can pin
    * "zero Exchange, zero Sort" on exactly the plan the gate query runs.
    */
  def bucketedPerOrder(s: SparkSession, dir: String): DataFrame = {
    val (ordT, liT) = ensureBucketed(s, dir)
    s.table(ordT).hint("merge")
      .join(s.table(liT), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("qty"))
  }

  /** One-time hive-partitioned lineitem layout per (session, sfDir):
    * partitioned by ship month (`l_shipmonth=yyyy-MM/`). Same scratch
    * contract as [[ensureBucketed]] (tracked, deleted at JVM exit). */
  private val partitionedReady =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def ensurePartitioned(s: SparkSession, dir: String): String =
    memoLayout(partitionedReady, s, dir, "graft-part") { (scratch, _) =>
      Tables.lineitem(s, dir)
        .withColumn("l_shipmonth", date_format(col("l_shipdate"), "yyyy-MM"))
        .write.partitionBy("l_shipmonth").mode("overwrite")
        .parquet(s"$scratch/lineitem")
      s"$scratch/lineitem"
    }

  /** q40: DYNAMIC PARTITION PRUNING — the other half of the layout story
    * next to q37's bucketing: the fact table lives hive-partitioned by
    * ship month, and a join against a SMALL FILTERED dim of months makes
    * Spark prune fact partitions AT RUNTIME from the dim's broadcast
    * result (`PartitionFilters: [... dynamicpruning#...]` on the scan —
    * `PartitionPruningSpec` pins it on this entry's own plan). The dim
    * predicate (`o_orderkey % 9973 = 7`) is deliberately opaque to
    * static pruning: no constant-folding can reduce it to a month list,
    * so the pruning HAS to be dynamic. At 100 TB this is THE mechanism
    * that turns "join fact to a dim slice" from a full scan into reading
    * only the matching date partitions — free with a declarative plan,
    * impossible to bolt on afterwards.
    */
  val q40_partition_pruned_join: Q = (s, dir) => {
    val fact = s.read.parquet(ensurePartitioned(s, dir))
    val dim = Tables.orders(s, dir)
      .filter(col("o_orderkey") % 9973 === 7)
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("m")).distinct()
    fact.join(broadcast(dim), col("l_shipmonth") === col("m"))
      .groupBy(col("l_shipmonth"))
      .agg(count(lit(1)).as("n_rows"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("l_shipmonth"))
  }

  /** q41: AQE SKEW-JOIN — the runtime answer to the problem q27 solves
    * by hand: a probe side where ~30% of rows collapse onto 7 hot keys
    * joins an (effectively) unique build side, and Adaptive Query
    * Execution SPLITS the oversized shuffle partitions at runtime
    * (`OptimizeSkewedJoin`: hot partitions are divided into sub-reads,
    * the build side duplicated per split — the executed SMJ shows
    * `skew=true`, `PartitionPruningSpec`'s sibling `SkewJoinSpec` pins
    * it). Together the pair documents the deployment rule: salt when the
    * skew is KNOWN and the salted layout can be reused (q27); let AQE
    * re-plan when it isn't (this). Runs on a child session because the
    * detection thresholds must come down to demonstration scale — never
    * mutate the shared gate session (the q09b discipline).
    */
  val q41_aqe_skew_join: Q = (s0, dir) => {
    val s = s0.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // keep the SMJ
    // 32 shuffle partitions regardless of the parent: skew detection
    // compares a partition against the MEDIAN — with few partitions the
    // uniform share is already large and nothing looks skewed
    s.conf.set("spark.sql.shuffle.partitions", "32")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    // a third of the probe rows collapse onto ONE existing order key.
    // Two demonstration-scale realities tools/SkewProbe measured the
    // hard way (both are free at production scale): the probe side
    // needs MULTIPLE MAPPERS (a skewed reduce partition splits by
    // mapper-chunk ranges — a single-file single-row-group scan leaves
    // one unsplittable chunk), and the shuffled payload needs BYTE
    // weight (skew detection is byte-based; a constant hot key over
    // low-entropy columns compresses the skew away — l_extendedprice
    // carries real entropy).
    val hot = col("l_orderkey") % 3 === 0
    val li = Tables.lineitem(s, dir)
      .repartition(16)
      .select(when(hot, lit(7L)).otherwise(col("l_orderkey")).as("k"),
        col("l_quantity"), col("l_extendedprice"))
    val ord = Tables.orders(s, dir)
      .select(col("o_orderkey").as("k"), col("o_orderstatus"))
    li.join(ord.hint("merge"), Seq("k"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"), round(sum(col("l_quantity")), 2).as("sum_qty"),
        (sum(floor(col("l_extendedprice") * 100 + lit(0.5))) / lit(100.0)).as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** q42: PARQUET AGGREGATE PUSHDOWN — the scan itself answers the
    * aggregate from parquet FOOTER STATISTICS (row-group row counts and
    * column min/max), never materializing a single data page: the DSv2
    * parquet reader with `spark.sql.parquet.aggregatePushdown` pushes
    * COUNT(*)/MIN/MAX — and, over q40's hive-partitioned layout, the
    * GROUP BY on the partition column too — into the scan
    * (`PushedAggregation` + `PushedGroupBy` on the scan node,
    * `AggPushdownSpec` pins both on this entry's own plan and pins
    * result equality against the default non-pushdown reader). At 100 TB
    * this is the difference between "read every page of the fact table
    * to report per-partition counts and value ranges" and a
    * footer-metadata-only pass — the audit/profiling queries a curation
    * pipeline runs daily become nearly free. Runs on a child session
    * because the DSv2 reader switch (`useV1SourceList=""`) must not leak
    * into Verify's concurrent sibling queries (the q09b/q41 discipline);
    * the layout is built via the PARENT session so the per-(session,dir)
    * scratch cache is shared with q40 instead of rewriting the layout on
    * every call.
    *
    * Pushdown eligibility is structural, not lucky: no filter (a data
    * filter would force page reads), MIN/MAX on primitive columns with
    * parquet stats, grouping only by the partition column. The oracle
    * recomputes the same aggregate from the RAW rows — so the gate
    * checks stats-path ≡ data-path, the property that matters.
    */
  val q42_agg_pushdown: Q = (s0, dir) => {
    val layout = ensurePartitioned(s0, dir)
    val s = s0.newSession()
    s.conf.set("spark.sql.sources.useV1SourceList", "") // parquet via DSv2
    s.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    aggPushdownShape(s, layout)
  }

  /** q42's aggregate over an explicit layout path — shared with the
    * spec so the pinned plan is exactly the gate entry's. */
  def aggPushdownShape(s: SparkSession, layout: String): DataFrame =
    s.read.parquet(layout)
      .groupBy(col("l_shipmonth"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_quantity")).as("min_qty"), max(col("l_quantity")).as("max_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))
      .orderBy(col("l_shipmonth"))

  /** One-time VARIANT layout per (session, sfDir): events' JSON `props`
    * string parsed to a stored parquet VARIANT column next to
    * `event_type` (same tracked-scratch contract as [[ensurePartitioned]]
    * / [[ensureBucketed]]). */
  private val variantReady =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def ensureVariant(s: SparkSession, dir: String): String =
    memoLayout(variantReady, s, dir, "graft-var") { (scratch, _) =>
      Tables.events(s, dir).select(col("event_type"), col("props"))
        .select(col("event_type"), parse_json(col("props")).as("v"))
        .write.mode("overwrite").parquet(s"$scratch/events_v")
      s"$scratch/events_v"
    }

  /** q43: VARIANT SHREDDING — semi-structured data stored as Spark 4's
    * VARIANT type and field extraction pushed INTO the parquet scan:
    * `props` parses once at write time (`parse_json` → a binary
    * variant column), and the DSv2 reader pushes `variant_get(v, '$.k')`
    * down as `PushedVariantExtractions` so the scan materializes the
    * extracted BIGINT directly — no JSON text parse per row per query,
    * which is the difference between q19's `get_json_object` (re-parse
    * the string on EVERY query) and a semi-structured COLUMN a 100 TB
    * events store can afford to query daily. `VariantSpec` pins the
    * pushdown on this entry's own plan and result equality against the
    * string-path twin. Child session for the DSv2 switch (the q42
    * discipline); layout built via the parent session so the scratch
    * cache is shared across calls.
    */
  val q43_variant_shred: Q = (s0, dir) => {
    val layout = ensureVariant(s0, dir)
    val s = s0.newSession()
    s.conf.set("spark.sql.sources.useV1SourceList", "") // parquet via DSv2
    variantShape(s, layout)
  }

  /** q43's aggregate over an explicit variant layout — shared with the
    * spec so the pinned plan is exactly the gate entry's. */
  def variantShape(s: SparkSession, layout: String): DataFrame =
    s.read.parquet(layout)
      .select(col("event_type"),
        expr("variant_get(v, '$.k', 'bigint')").as("k"))
      .groupBy(col("event_type"), (col("k") % 10).as("bucket"))
      .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("sum_k"))
      .orderBy(col("event_type"), col("bucket"))

  /** One-time ANALYZE'd catalog tables per (session, sfDir): lineitem /
    * orders / customer saved as catalog tables (tracked scratch, the
    * [[ensureBucketed]] contract) with table AND join-key column
    * statistics computed — the input the cost-based optimizer plans
    * from. */
  private val statsReady =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String, String)]()

  def ensureStats(s: SparkSession, dir: String): (String, String, String) =
    memoLayout(statsReady, s, dir, "graft-cbo") { (scratch, sfx) =>
      val (liT, ordT, custT) = (s"graft_cbo_lineitem_$sfx",
        s"graft_cbo_orders_$sfx", s"graft_cbo_customer_$sfx")
      Tables.lineitem(s, dir).write
        .option("path", s"$scratch/lineitem").mode("overwrite").saveAsTable(liT)
      Tables.orders(s, dir).write
        .option("path", s"$scratch/orders").mode("overwrite").saveAsTable(ordT)
      Tables.customer(s, dir).write
        .option("path", s"$scratch/customer").mode("overwrite").saveAsTable(custT)
      s.sql(s"ANALYZE TABLE $liT COMPUTE STATISTICS FOR COLUMNS l_orderkey")
      s.sql(s"ANALYZE TABLE $ordT COMPUTE STATISTICS FOR COLUMNS o_orderkey, o_custkey")
      s.sql(s"ANALYZE TABLE $custT COMPUTE STATISTICS FOR COLUMNS c_custkey")
      (liT, ordT, custT)
    }

  /** q44: COST-BASED JOIN REORDER — the optimizer tier none of the other
    * entries exercises: ANALYZE'd row + column statistics feed Catalyst's
    * CBO (`spark.sql.cbo.enabled` + `joinReorder.enabled`), and a
    * three-table join written in a deliberately BAD syntactic order
    * (fact × dim adjacent with no direct key; their predicates only
    * arrive via the third table) is re-associated from ESTIMATED
    * CARDINALITIES: the statistics say orders⋈customer is the small
    * intermediate, so CBO joins the dimensions first and the fact table
    * last — the no-stats planner keeps the syntactic (fact-first) shape.
    * `CboSpec` pins the reorder (innermost join flips to the
    * customer-key join exactly when CBO+stats are on) and result
    * equality both ways; the oracle never sees the catalog tables at
    * all. At 100 TB join order IS the query plan's cost: a mis-ordered
    * chain materializes a fact-sized intermediate per step, and
    * statistics are how the engine avoids it without hand-tuning every
    * query. Child session for the CBO confs (the q41/q42 discipline);
    * tables + stats built once per (session, dir) via the parent.
    */
  val q44_cbo_reorder: Q = (s0, dir) => {
    val (liT, ordT, custT) = ensureStats(s0, dir)
    val s = s0.newSession()
    s.conf.set("spark.sql.cbo.enabled", "true")
    s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    cboShape(s, liT, ordT, custT)
  }

  /** q44's query over explicit catalog tables — shared with the spec so
    * the pinned plans are exactly the gate entry's. The `ON true`
    * adjacency is the point: l and c have no direct join key, so the
    * syntactic tree starts from the worst association and the planner
    * must find the right one. */
  def cboShape(s: SparkSession, liT: String, ordT: String, custT: String): DataFrame =
    s.sql(
      s"""SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n
         |FROM $liT l JOIN $custT c ON true
         |JOIN $ordT o ON l.l_orderkey = o.o_orderkey
         |             AND o.o_custkey = c.c_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin)

  /** q38: MERGE (CDC changeset application) — the upsert primitive every
    * incremental pipeline needs and Spark has no built-in DML for on
    * plain parquet. A deterministic changeset derived from the target
    * (deletes: key%13, updates: key%7 at +5% price with delete taking
    * precedence, inserts: key%11 re-keyed past max_key) is applied with
    * MERGE semantics in ONE full-outer shuffle join on the key:
    * WHEN MATCHED AND op='D' → drop, MATCHED AND op='U' → update,
    * NOT MATCHED BY TARGET → insert, NOT MATCHED BY SOURCE → keep.
    *
    * Scale shape: both sides shuffle once on the merge key — and because
    * the target is bucketable on that key (q37's layout), a real
    * incremental pipeline runs this exact plan with ZERO target-side
    * exchange, changeset-side only. The max_key re-key scalar is the
    * 1-row-aggregate broadcast pattern; no driver-side state.
    */
  val q38_merge_upsert: Q = (s, dir) => {
    val ord = Tables.orders(s, dir)
    mergeUpsertFrom(ord, ord)
  }

  /** q38b: the SAME merge apply against q37's BUCKETED layout — the
    * "zero-target-exchange incremental apply" claim, executed: the
    * target scan reports `HashPartitioning(o_orderkey, 8)` straight off
    * the bucketed files, so the full-outer merge join needs NO Exchange
    * above the target side — only the (changeset-sized) source shuffles
    * to match. `BucketingSpec` pins exactly that on the executed plan;
    * the gate pins hash-identity with q38 (same rows, same oracle). At
    * 100 TB this is the difference between re-shuffling the full fact
    * table per changeset application and moving only the changeset.
    */
  val q38b_merge_bucketed: Q = (s, dir) => {
    val (ordT, _) = ensureBucketed(s, dir)
    // the changeset arrives from OUTSIDE the layout in a real pipeline —
    // derive it from the plain table (identical rows) so the bucketed
    // scan exists only on the target side of the merge join
    mergeUpsertFrom(s.table(ordT).hint("merge"), Tables.orders(s, dir))
  }

  /** q38's body over an explicit (target, changeset-source) pair. */
  private def mergeUpsertFrom(ord: DataFrame, chgSrc: DataFrame): DataFrame = {
    val mk = chgSrc.agg(max(col("o_orderkey")).as("max_key"))
    val del = chgSrc.filter(col("o_orderkey") % 13 === 0)
      .select(col("o_orderkey").as("k"), lit("D").as("op"),
        lit(null).cast("double").as("new_price"), lit(null).cast("long").as("new_cust"))
    val upd = chgSrc.filter(col("o_orderkey") % 7 === 0 && col("o_orderkey") % 13 =!= 0)
      .select(col("o_orderkey").as("k"), lit("U").as("op"),
        (col("o_totalprice") * 1.05).as("new_price"), lit(null).cast("long").as("new_cust"))
    // re-key STRICTLY ABOVE the target's key space: order keys are dense
    // from 0, so `+ max_key` alone collides for source key 0 (k =
    // max_key, an existing never-deleted row) — the full-outer "insert"
    // then MATCHES the target, silently dropping its kept row and
    // violating NOT-MATCHED-BY-TARGET semantics (and diverging from the
    // collision-free post-merge state q39's oracle recomputes)
    val ins = chgSrc.filter(col("o_orderkey") % 11 === 0).crossJoin(broadcast(mk))
      .select((col("o_orderkey") + col("max_key") + 1).as("k"), lit("I").as("op"),
        col("o_totalprice").as("new_price"), col("o_custkey").as("new_cust"))
    val chg = del.unionByName(upd).unionByName(ins)
    ord.join(chg, col("o_orderkey") === col("k"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(
        coalesce(col("o_orderkey"), col("k")).as("key"),
        coalesce(col("new_cust"), col("o_custkey")).as("custkey"),
        when(col("op").isNull, "kept").when(col("op") === "U", "updated")
          .otherwise("inserted").as("action"),
        (floor(coalesce(col("new_price"), col("o_totalprice")) * 100 + 0.5) / 100)
          .as("totalprice"))
      .orderBy(col("key"))
  }

  /** q39: INCREMENTAL VIEW MAINTENANCE — maintain a per-status aggregate
    * under q38's changeset by combining the base aggregate with a
    * delta aggregate (delete → (−1, −cents), update → (0, Δcents),
    * insert → (+1, +cents)) instead of recomputing, the core trick that
    * turns an O(history) nightly rebuild into an O(changeset) refresh.
    * The ORACLE deliberately uses the other algorithm — full recompute
    * over the post-merge state — so the gate checks maintain ≡ recompute,
    * not just expression parity. Money is quantized to integer cents
    * before summation (e02's move), so base+delta equals recompute
    * EXACTLY, independent of engine, partitioning, and summation order —
    * a double sum would differ in late ulps between the two algorithms.
    * Groups maintained down to zero rows are dropped (active-group
    * semantics, matching what a recompute can see).
    *
    * Plan: two status-keyed partial+final aggs (base over the table,
    * delta over the changeset — the latter is changeset-sized, the point
    * of IVM) and one tiny full-outer merge on the handful of group keys.
    */
  val q39_incremental_agg: Q = (s, dir) => incrementalAggFrom(Tables.orders(s, dir))

  /** q39b: the IVM refresh reading its base and changeset from q37's
    * bucketed layout — the plan every scheduled refresh would run once
    * the fact table lives bucketed: the base aggregate is a partial agg
    * directly over the bucketed scan (the only Exchanges in the plan
    * carry post-partial-agg group rows — a handful of statuses — never
    * raw fact rows), and the delta side stays changeset-sized by IVM
    * construction. Same maintained-vs-recomputed oracle as q39.
    */
  val q39b_incremental_bucketed: Q = (s, dir) => {
    val (ordT, _) = ensureBucketed(s, dir)
    incrementalAggFrom(s.table(ordT))
  }

  private def incrementalAggFrom(ord: DataFrame): DataFrame = {
    val cents = (c: Column) => floor(c * 100 + 0.5).cast("long")
    val base = ord.groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("c0"))
    val del = ord.filter(col("o_orderkey") % 13 === 0)
      .select(col("o_orderstatus").as("status"), lit(-1L).as("dn"),
        (cents(col("o_totalprice")) * lit(-1L)).as("dc"))
    val upd = ord.filter(col("o_orderkey") % 7 === 0 && col("o_orderkey") % 13 =!= 0)
      .select(col("o_orderstatus").as("status"), lit(0L).as("dn"),
        (cents(col("o_totalprice") * 1.05) - cents(col("o_totalprice"))).as("dc"))
    val ins = ord.filter(col("o_orderkey") % 11 === 0)
      .select(col("o_orderstatus").as("status"), lit(1L).as("dn"),
        cents(col("o_totalprice")).as("dc"))
    val delta = del.unionByName(upd).unionByName(ins)
      .groupBy(col("status")).agg(sum(col("dn")).as("dn"), sum(col("dc")).as("dc"))
    base.join(delta, Seq("status"), "full_outer")
      .select(col("status"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_orders"),
        (coalesce(col("c0"), lit(0L)) + coalesce(col("dc"), lit(0L))).as("sum_cents"))
      .filter(col("n_orders") > 0)
      .orderBy(col("status"))
  }

  /** q45: INCREMENTAL VIEW MAINTENANCE FOR A JOIN VIEW — q39 maintains
    * an aggregate under a single-table changeset; real pipelines maintain
    * JOIN views under changesets on BOTH sides. The view is
    * `orders ⋈ customer` aggregated per market segment; deltas ΔA (new
    * orders) and ΔB (new customers) are deterministic hash slices of each
    * input. The refresh runs the textbook delta-join decomposition
    *   V_new = V_old ∪ (ΔA ⋈ B_new) ∪ (A_old ⋈ ΔB)
    * (with B_new = B_old ∪ ΔB, the three terms are disjoint and cover
    * (A∪ΔA) ⋈ (B∪ΔB) exactly), each term aggregated to segment partials
    * and merged — never a recompute of the big⋈big join. The ORACLE is
    * the full recompute over the post-delta inputs, so the gate checks
    * maintain ≡ recompute across the join algebra, not expression parity.
    * Money quantizes to integer cents before summation (the q39 rule), so
    * the equality is exact whatever the partitioning or add order.
    *
    * Plan shape at 100 TB: V_old is the MATERIALIZED prior state (here
    * computed once, standing in for the stored aggregate); both delta
    * joins broadcast their changeset side — ΔA⋈B_new streams the dim
    * once against a broadcast changeset, A_old⋈ΔB streams the fact once
    * against a broadcast customer-delta — so the refresh never shuffles
    * either base table, the property that makes nightly O(history)
    * rebuilds into O(changeset) refreshes when the view keys join-side
    * rows (q39's single-table form can't express this).
    */
  val q45_ivm_join: Q = (s, dir) => {
    val cents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
    val ord = Tables.orders(s, dir)
      .select(col("o_custkey"), cents.as("cents"),
        pmod(hash(col("o_orderkey")), lit(8)).as("slice_o"))
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        pmod(hash(col("c_custkey")), lit(8)).as("slice_c"))
    val aOld = ord.filter(col("slice_o") =!= 0).drop("slice_o")
    val dA = ord.filter(col("slice_o") === 0).drop("slice_o")
    val bOld = cust.filter(col("slice_c") =!= 0).drop("slice_c")
    val dB = cust.filter(col("slice_c") === 0).drop("slice_c")
    val bNew = bOld.unionByName(dB)
    def segAgg(o: DataFrame, c: DataFrame): DataFrame =
      o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("c"))
    val vOld = segAgg(aOld, bOld) // the materialized prior view state
    val inc1 = segAgg(broadcast(dA), bNew) // ΔA ⋈ B_new, ΔA broadcast
    val inc2 = segAgg(aOld, broadcast(dB)) // A_old ⋈ ΔB, ΔB broadcast
    vOld.unionByName(inc1).unionByName(inc2)
      .groupBy(col("c_mktsegment"))
      .agg(sum(col("n")).as("n_orders"), sum(col("c")).as("sum_cents"))
      .orderBy(col("c_mktsegment"))
  }

  /** q46: EXACT CORRELATION COMPONENTS in pure integer arithmetic — the
    * cross-engine-exact form of corr/covar that a 100 TB profiling pass
    * can gate on. Doubles summed in different partition orders differ in
    * late ulps between engines (and between runs), so instead of corr()
    * the query emits the INTEGER moment identities per group:
    *   cov_num  = n·Σxy − Σx·Σy,  varx_num = n·Σx² − (Σx)²,
    *   vary_num = n·Σy² − (Σy)²
    * over x = quantity (integral), y = discount in integer percent.
    * corr = cov_num / √(varx_num·vary_num) is one deterministic FP step
    * the CONSUMER takes; everything the engines exchange is BIGINT, so
    * the gate equality is exact. One partial+final hash aggregate, six
    * map-side-combined sums, shuffle = a few group rows. Magnitude audit:
    * x ≤ 50, y ≤ 10 ⇒ n·Σx² < n²·2500 — BIGINT-safe past 10⁷ rows per
    * group; beyond that promote the sums to DECIMAL(38,0) (same plan,
    * Spark's decimal aggregate), stated here rather than silently assumed.
    */
  val q46_exact_corr: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"),
        col("l_quantity").cast("long").as("x"),
        floor(col("l_discount") * 100 + 0.5).cast("long").as("y"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("l_returnflag"), col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("cov_num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("varx_num"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("vary_num"))
      .orderBy(col("l_returnflag"))
  }

  val all: Map[String, Q] = Map(
    "q45_ivm_join" -> q45_ivm_join,
    "q46_exact_corr" -> q46_exact_corr,
    "q39_incremental_agg" -> q39_incremental_agg,
    "q39b_incremental_bucketed" -> q39b_incremental_bucketed,
    "q38_merge_upsert" -> q38_merge_upsert,
    "q38b_merge_bucketed" -> q38b_merge_bucketed,
    "q40_partition_pruned_join" -> q40_partition_pruned_join,
    "q41_aqe_skew_join" -> q41_aqe_skew_join,
    "q42_agg_pushdown" -> q42_agg_pushdown,
    "q43_variant_shred" -> q43_variant_shred,
    "q44_cbo_reorder" -> q44_cbo_reorder,
    "q37_bucketed_colocated" -> q37_bucketed_colocated,
    "q35_unpivot" -> q35_unpivot,
    "q34_recursive_cte" -> q34_recursive_cte,
    "q32_setops_all" -> q32_setops_all,
    "q33_lateral_join" -> q33_lateral_join,
    "q29_topk_custom_operator" -> q29_topk_custom_operator,
    "q36_bloom_pruned_join" -> q36_bloom_pruned_join,
    "q28_quality_checks" -> q28_quality_checks,
    "q27_salted_join" -> q27_salted_join,
    "q24_udaf_weighted_avg" -> q24_udaf_weighted_avg,
    "q25_sql_correlated" -> q25_sql_correlated,
    "q26_pivot" -> q26_pivot,
    "q01_agg" -> q01_agg,
    "q02_filter_pushdown" -> q02_filter_pushdown,
    "q03_join_broadcast" -> q03_join_broadcast,
    "q04_join_shuffle" -> q04_join_shuffle,
    "q05_semi_join" -> q05_semi_join,
    "q06_anti_join" -> q06_anti_join,
    "q07_full_outer" -> q07_full_outer,
    "q08_dup_check" -> q08_dup_check,
    "q09_window_topk" -> q09_window_topk,
    "q09b_window_topk_rewritten" -> q09b_window_topk_rewritten,
    "q10_window_running" -> q10_window_running,
    "q11_rollup" -> q11_rollup,
    "q30_grouping_sets" -> q30_grouping_sets,
    "q12_cube" -> q12_cube,
    "q13_topk" -> q13_topk,
    "q14_setops" -> q14_setops,
    "q15_distinct_agg" -> q15_distinct_agg,
    "q16_string_fns" -> q16_string_fns,
    "q17_date_fns" -> q17_date_fns,
    "q18_case_when" -> q18_case_when,
    "q19_json" -> q19_json,
    "q20_scalar_subquery" -> q20_scalar_subquery,
    "q21_having" -> q21_having,
    "q22_join_agg_dim" -> q22_join_agg_dim,
    "q23_window_tumbling" -> q23_window_tumbling,
    "q31_window_sliding" -> q31_window_sliding,
  )
}
