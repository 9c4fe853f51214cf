package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** ONE registration policy for every graft_* function object
  * (VectorFunctions / BloomFunctions / ZRangeContains): register
  * UNCONDITIONALLY, overwriting any same-named entry. The graft_ prefix
  * is this library's namespace — a pre-existing foreign function under
  * one of these names would otherwise be silently ADOPTED by a
  * check-then-skip guard, and a foreign `graft_z_in_ranges` returning
  * false for in-range keys would make a pre-filter DROP matching rows
  * (silent wrong results; pre-filter drops are only safe when the
  * predicate is a superset). Overwrite is deterministic and loud in
  * intent; sessions wanting full isolation use `newSession()` (the q36
  * pattern) or the GraftExtensions plugin. */
object Registration {
  def register(spark: SparkSession,
      functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)]): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (ident, info, builder) =>
      registry.registerFunction(ident, info, builder)
    }
  }
}
