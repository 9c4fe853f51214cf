package graft.operators

/** DuckDB oracle twins of [[RelationalQueries]]. Column aliases match the
  * Spark side exactly (driver hash-compares after sorting columns by name).
  */
object RelationalOracles {
  // q39: deliberately the OTHER algorithm — full recompute over the
  // post-merge state. The engine maintains base+delta; integer-cents
  // quantization before summation makes the two EXACTLY equal.
  // q39b (bucketed-layout variant) reads identical data → same oracle.
  private val q39Sql =
    """WITH merged AS (
        |  SELECT o_orderstatus AS status,
        |    CASE WHEN o_orderkey % 7 = 0 AND o_orderkey % 13 != 0
        |         THEN o_totalprice * 1.05 ELSE o_totalprice END AS price
        |  FROM orders WHERE o_orderkey % 13 != 0
        |  UNION ALL
        |  SELECT o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 11 = 0)
        |SELECT status,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(price * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM merged GROUP BY status ORDER BY status""".stripMargin

  // q38: MERGE semantics spelled out as the same full-outer + CASE the
  // engine plans; delete precedence over update is in the changeset
  // derivation (k%13 excluded from updates) on both sides.
  // q38b (bucketed-layout variant) reads identical data → same oracle.
  private val q38Sql =
    """WITH mk AS (SELECT max(o_orderkey) AS max_key FROM orders),
        |del AS (
        |  SELECT o_orderkey AS k, 'D' AS op,
        |    CAST(NULL AS DOUBLE) AS new_price, CAST(NULL AS BIGINT) AS new_cust
        |  FROM orders WHERE o_orderkey % 13 = 0),
        |upd AS (
        |  SELECT o_orderkey AS k, 'U' AS op,
        |    o_totalprice * 1.05 AS new_price, CAST(NULL AS BIGINT) AS new_cust
        |  FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 13 != 0),
        |ins AS (
        |  -- + 1: strictly above the target key space (keys dense from 0,
        |  -- so + max_key alone collides for source key 0)
        |  SELECT o_orderkey + max_key + 1 AS k, 'I' AS op,
        |    o_totalprice AS new_price, o_custkey AS new_cust
        |  FROM orders CROSS JOIN mk WHERE o_orderkey % 11 = 0),
        |chg AS (
        |  SELECT * FROM del UNION ALL SELECT * FROM upd UNION ALL SELECT * FROM ins)
        |SELECT coalesce(o.o_orderkey, c.k) AS key,
        |  coalesce(c.new_cust, o.o_custkey) AS custkey,
        |  CASE WHEN c.op IS NULL THEN 'kept'
        |       WHEN c.op = 'U' THEN 'updated'
        |       ELSE 'inserted' END AS action,
        |  floor(coalesce(c.new_price, o.o_totalprice) * 100 + 0.5) / 100 AS totalprice
        |FROM orders o FULL JOIN chg c ON o.o_orderkey = c.k
        |WHERE c.op IS NULL OR c.op != 'D'
        |ORDER BY key""".stripMargin

  val all: Map[String, String] = Map(
    // q45: the delta-join decomposition changes the REFRESH ALGORITHM,
    // never the view — the oracle is the full recompute over the
    // post-delta inputs (= the whole tables; the engine's hash slices
    // partition them, so the union the engine maintains covers exactly
    // this join). Integer cents make maintain ≡ recompute exact.
    "q45_ivm_join" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |    AS BIGINT) AS sum_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q46: the moment identities are pure integer arithmetic — identical
    // in any engine at any partitioning, which is the point of the query
    "q46_exact_corr" ->
      """WITH t AS (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
        |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS y
        |  FROM lineitem),
        |m AS (
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy,
        |    CAST(sum(x*y) AS BIGINT) AS sxy
        |  FROM t GROUP BY 1)
        |SELECT l_returnflag, n,
        |  n*sxy - sx*sy AS cov_num,
        |  n*sxx - sx*sx AS varx_num,
        |  n*syy - sy*sy AS vary_num
        |FROM m ORDER BY l_returnflag""".stripMargin,
    // q40: partitioning changes the LAYOUT, never the result — the
    // oracle is the plain join over the raw parquet; strftime('%Y-%m')
    // ≡ date_format('yyyy-MM') (both zero-padded, session-UTC)
    "q40_partition_pruned_join" ->
      """WITH m AS (
        |  SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS m
        |  FROM orders WHERE o_orderkey % 9973 = 7)
        |SELECT strftime(l_shipdate, '%Y-%m') AS l_shipmonth,
        |  count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN m ON strftime(l_shipdate, '%Y-%m') = m.m
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q42: aggregate pushdown changes WHERE the numbers come from
    // (parquet footer stats vs data pages), never what they are — the
    // oracle recomputes from the raw rows, so the gate checks
    // stats-path ≡ data-path
    "q42_agg_pushdown" ->
      """SELECT strftime(l_shipdate, '%Y-%m') AS l_shipmonth,
        |  count(*) AS n_rows,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |  min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // q43: the variant layout changes HOW the field is materialized
    // (write-once binary shred + scan-pushed extraction vs per-query
    // JSON text parse), never its value — oracle re-parses the original
    // JSON strings
    "q43_variant_shred" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, k % 10 AS bucket,
        |  count(*) AS n_rows, CAST(sum(k) AS BIGINT) AS sum_k
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q44: statistics change the JOIN ORDER, never the result — the
    // oracle writes the join in the natural order over the raw parquet
    "q44_cbo_reorder" ->
      """SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q41: AQE's runtime re-plan changes the SCHEDULE, never the result —
    // oracle = the plain skew-mapped join + aggregate
    "q41_aqe_skew_join" ->
      """WITH li AS (
        |  SELECT CASE WHEN l_orderkey % 3 = 0 THEN 7
        |              ELSE l_orderkey END AS k, l_quantity, l_extendedprice
        |  FROM lineitem)
        |SELECT o_orderstatus, count(*) AS n_rows,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS sum_price
        |FROM li JOIN orders ON li.k = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q39_incremental_agg" -> q39Sql,
    "q39b_incremental_bucketed" -> q39Sql,
    "q38_merge_upsert" -> q38Sql,
    "q38b_merge_bucketed" -> q38Sql,

    // q37: bucketing changes the LAYOUT, never the result — the oracle is
    // the plain join over the raw parquet. sum(l_quantity) is exact
    // (integral doubles), so no rounding is needed.
    "q37_bucketed_colocated" ->
      """SELECT n_items, count(*) AS n_orders, sum(qty) AS sum_qty FROM (
        |  SELECT o_orderkey, count(*) AS n_items, sum(l_quantity) AS qty
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY o_orderkey) t
        |GROUP BY n_items ORDER BY n_items""".stripMargin,

    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS sum_base_price,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0 AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  CAST(sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT) / count(*) / 100.0 AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem
        |WHERE l_quantity > 45.0
        |  AND l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-03-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_join_broadcast" ->
      """SELECT n_name, count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS total_revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "q04_join_shuffle" ->
      """SELECT o_orderpriority, count(*) AS n_late_lines,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS late_value
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q05_semi_join" ->
      """SELECT l_orderkey, count(*) AS n_lines, round(sum(l_quantity), 2) AS qty
        |FROM lineitem
        |WHERE l_orderkey IN (
        |  SELECT o_orderkey FROM orders
        |  WHERE o_orderstatus = 'F' AND o_totalprice > 200000.0)
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin,

    "q06_anti_join" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE c_custkey NOT IN (
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q07_full_outer" ->
      """SELECT
        |  CAST(sum(CASE WHEN o.o_orderkey IS NOT NULL AND l.l_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS matched,
        |  CAST(sum(CASE WHEN l.l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orders_only,
        |  CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS lineitem_only
        |FROM (SELECT DISTINCT o_orderkey FROM orders) o
        |FULL OUTER JOIN (SELECT DISTINCT l_orderkey FROM lineitem) l
        |  ON o.o_orderkey = l.l_orderkey""".stripMargin,

    "q08_dup_check" ->
      """SELECT l_orderkey, count(*) AS n
        |FROM lineitem
        |GROUP BY l_orderkey
        |HAVING count(*) > 1
        |ORDER BY l_orderkey""".stripMargin,

    "q09_window_topk" ->
      """SELECT o_custkey, rk, o_orderkey, round(o_totalprice, 2) AS price
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders)
        |WHERE rk <= 3
        |ORDER BY o_custkey, rk""".stripMargin,
    // q09b: the optimizer-rule rewrite must be invisible in the result —
    // same oracle as the plain-window q09, word for word
    "q09b_window_topk_rewritten" ->
      """SELECT o_custkey, rk, o_orderkey, round(o_totalprice, 2) AS price
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders)
        |WHERE rk <= 3
        |ORDER BY o_custkey, rk""".stripMargin,

    "q10_window_running" ->
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS BIGINT) / 100.0 AS running_value,
        |  round(lag(value, 1) OVER w2, 2) AS prev_value,
        |  round(avg(value) OVER w3, 4) AS mov_avg3
        |FROM events
        |WINDOW
        |  w AS (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  w2 AS (PARTITION BY user_id ORDER BY event_id),
        |  w3 AS (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "q11_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_cust, CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q12_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q13_topk" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q35_unpivot" ->
      """WITH agg AS (
        |  SELECT l_returnflag,
        |    round(sum(l_quantity), 2) AS sum_qty,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS sum_price,
        |    CAST(sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS sum_disc
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, measure, value
        |FROM agg
        |UNPIVOT (value FOR measure IN (sum_qty, sum_price, sum_disc))
        |ORDER BY l_returnflag, measure""".stripMargin,
    // q33/q34: the ORACLE IS the engine text (verbatim-parity by
    // construction — one constant, two engines)
    "q34_recursive_cte" -> RelationalQueries.q34Sql,
    "q32_setops_all" ->
      """WITH a AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |     b AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
        |     ea AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b),
        |     ia AS (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
        |SELECT 'except_all' AS op, o_custkey, count(*) AS n
        |FROM ea GROUP BY o_custkey
        |UNION ALL
        |SELECT 'intersect_all' AS op, o_custkey, count(*) AS n
        |FROM ia GROUP BY o_custkey
        |ORDER BY op, o_custkey""".stripMargin,
    "q33_lateral_join" -> RelationalQueries.q33Sql,
    "q14_setops" ->
      """SELECT k FROM (
        |  SELECT k FROM (
        |    SELECT DISTINCT o_custkey AS k FROM orders
        |    INTERSECT
        |    SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING')
        |  UNION
        |  SELECT k FROM (
        |    SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000.0
        |    EXCEPT
        |    SELECT DISTINCT o_custkey AS k FROM orders))
        |ORDER BY k""".stripMargin,

    "q15_distinct_agg" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_partkey) AS n_part,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q16_string_fns" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_u,
        |  substring(p_name, 1, 12) AS name12,
        |  length(p_name) AS name_len,
        |  concat_ws('|', p_brand, p_type) AS bt
        |FROM part
        |WHERE p_type LIKE '%AND%' OR p_type IN ('ECONOMY', 'PROMO')
        |ORDER BY p_partkey""".stripMargin,

    "q17_date_fns" ->
      """SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        |  count(*) AS n_orders, CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS revenue
        |FROM orders
        |GROUP BY 1, 2
        |ORDER BY yr, mo""".stripMargin,

    "q18_case_when" ->
      """SELECT l_linestatus,
        |  round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0.0 END), 2) AS qty_returned,
        |  CAST(sum(CASE WHEN l_discount > 0.05 THEN CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) / 100.0 AS discounted_value,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,

    "q19_json" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q20_scalar_subquery" ->
      """SELECT count(*) AS n_above,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS value_above
        |FROM orders
        |WHERE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |        * (SELECT count(*) FROM orders)
        |    > (SELECT CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |       FROM orders)""".stripMargin,

    "q21_having" ->
      """SELECT p_brand, count(*) AS n_parts, CAST(sum(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / count(*) / 100.0 AS avg_price
        |FROM part
        |GROUP BY p_brand
        |HAVING count(*) > 5
        |ORDER BY p_brand""".stripMargin,

    "q22_join_agg_dim" ->
      """SELECT p_brand, round(sum(l_quantity), 2) AS qty,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,

    "q23_window_tumbling" ->
      """SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket_start,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY bucket_start, event_type""".stripMargin,

    "q31_window_sliding" ->
      """WITH e AS (
        |  SELECT event_type, value,
        |    CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) - 900 * j AS bucket_start
        |  FROM events CROSS JOIN (SELECT unnest(range(0, 4)) AS j))
        |SELECT bucket_start, event_type, count(*) AS n,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
        |FROM e GROUP BY 1, 2
        |ORDER BY bucket_start, event_type""".stripMargin,

    "q29_topk_custom_operator" ->
      """WITH r AS (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem)
        |SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice
        |FROM r WHERE rn <= 2
        |ORDER BY l_suppkey, l_extendedprice DESC, l_orderkey, l_linenumber""".stripMargin,

    "q28_quality_checks" ->
      """SELECT 'lineitem_quantity_1_to_50' AS check,
        |  CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS violations,
        |  count(*) AS n_checked
        |FROM lineitem
        |UNION ALL
        |SELECT 'lineitem_discount_0_to_0.1',
        |  CAST(sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT),
        |  count(*)
        |FROM lineitem
        |UNION ALL
        |SELECT 'orders_totalprice_not_null',
        |  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(*)
        |FROM orders
        |UNION ALL
        |SELECT 'orders_custkey_fk',
        |  (SELECT count(*) FROM orders o
        |   WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
        |  count(*)
        |FROM orders
        |ORDER BY "check"""".stripMargin,

    "q30_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS n, CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q27_salted_join" ->
      """SELECT o_orderstatus, count(*) AS n_lines,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS value
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q36_bloom_pruned_join" ->
      """SELECT o_orderstatus, count(*) AS n_lines,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS value
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q25_sql_correlated" ->
      """SELECT c_custkey, c_name
        |FROM customer c
        |WHERE EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
        |  AND CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) * 100
        |        * (SELECT count(*) FROM orders)
        |      > (SELECT CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |         FROM orders)
        |ORDER BY c_custkey""".stripMargin,

    "q26_pivot" ->
      """SELECT year(o_orderdate) AS yr,
        |  CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_f,
        |  CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_o,
        |  CAST(count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS n_p
        |FROM orders
        |GROUP BY 1
        |ORDER BY yr""".stripMargin,

    "q24_udaf_weighted_avg" ->
      """SELECT l_returnflag,
        |  round(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |                 * CAST(l_quantity AS BIGINT)) AS DOUBLE)
        |        / CAST(CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0, 4) AS w_avg_price,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
  )
}
