package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins, composed from
  * primitives Catalyst CAN optimize (preference (a) of the brief: compose
  * before custom plans). Both have exact DuckDB oracle twins — the as-of
  * join against DuckDB's native ASOF JOIN.
  */
object EventJoins {
  type Q = (SparkSession, String) => DataFrame

  /** a01: AS-OF JOIN — for each purchase, the latest error event of the
    * same user at-or-before the purchase time.
    *
    * NOT implemented as a join at all: union the two sides tagged, one
    * sort-shuffle by (user, ts, side), and a running `last(..., ignoreNulls)`
    * window carries the most recent right-side id forward. One exchange,
    * linear scan — at 100 TB this beats any join-shaped plan (a naive
    * inequality join is a BNL cartesian per user; even a binned range join
    * does 2× build reads). Ordering puts side=0 (error) before side=1
    * (purchase) on ts ties, matching ASOF's `p.ts >= e.ts` inclusivity.
    */
  val a01_asof_join: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("p_id"),
        lit(1).as("side"), lit(null).cast("long").as("e_in"))
    val e = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), lit(null).cast("long").as("p_id"),
        lit(0).as("side"), col("event_id").as("e_in"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p.unionByName(e)
      .withColumn("asof_error_id", last(col("e_in"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("p_id"), col("user_id"), col("asof_error_id"))
      .orderBy(col("p_id"))
  }

  /** a02: RANGE (interval) JOIN — (signup, purchase) pairs of the same
    * user with the purchase inside [signup, signup + 24h).
    *
    * The scale shape: equi-join on (user, time-bucket) with the probe side
    * exploded to its two candidate buckets, exact predicate applied after.
    * Join fan-out is bounded by real bucket co-occupancy instead of the
    * per-user cartesian a raw inequality join plans (BroadcastNestedLoop).
    */
  val a02_range_join: Q = (s, dir) => {
    val W = 86400000000L // 24h in micros
    val ev = Tables.events(s, dir)
    val su = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("s_id"), unix_micros(col("ts")).as("s_us"))
      .withColumn("bkt", floor(col("s_us") / W))
    val pu = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), unix_micros(col("ts")).as("p_us"))
      .withColumn("bkt", explode(array(floor(col("p_us") / W) - 1, floor(col("p_us") / W))))
    su.join(pu, Seq("user_id", "bkt"))
      .filter(col("s_us") <= col("p_us") && col("p_us") < col("s_us") + W)
      .select(col("s_id"), col("p_id"), col("user_id"))
      .orderBy(col("s_id"), col("p_id"))
  }

  val all: Map[String, Q] = Map(
    "a01_asof_join" -> a01_asof_join,
    "a02_range_join" -> a02_range_join,
  )

  val oracles: Map[String, String] = Map(
    "a01_asof_join" ->
      """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |     e AS (SELECT * FROM events WHERE event_type = 'error')
        |SELECT p.event_id AS p_id, p.user_id AS user_id,
        |       e.event_id AS asof_error_id
        |FROM p ASOF LEFT JOIN e
        |  ON p.user_id = e.user_id AND p.ts >= e.ts
        |ORDER BY p_id""".stripMargin,
    "a02_range_join" ->
      """WITH s AS (SELECT * FROM events WHERE event_type = 'signup'),
        |     p AS (SELECT * FROM events WHERE event_type = 'purchase')
        |SELECT s.event_id AS s_id, p.event_id AS p_id, s.user_id AS user_id
        |FROM s JOIN p
        |  ON s.user_id = p.user_id
        | AND p.ts >= s.ts AND p.ts < s.ts + INTERVAL 24 HOURS
        |ORDER BY s_id, p_id""".stripMargin,
  )
}
