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

  /** Column ⇄ Expression for custom expressions built OUTSIDE the
    * FunctionRegistry (the `private[sql]` ExpressionUtils pair). Lets
    * [[graft.functions.ZOrder.mortonKey]] construct its native expression
    * directly instead of mutating the caller's session registry as a
    * Column-building side effect. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
