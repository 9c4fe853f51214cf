package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the `private[sql]` Dataset constructor — the
  * standard pattern third-party operator libraries use to turn a custom
  * `LogicalPlan` into a user-facing DataFrame (there is no public
  * equivalent). Only [[graft.plans.TopKPerKey]] calls this.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
