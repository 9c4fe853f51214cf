package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Spark plugin entry point: enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  *
  * Injects the engine's native Catalyst expressions (graft_dot, the
  * graft_bloom_* pair, graft_z_in_ranges, graft_morton_key) into every
  * session's
  * FunctionRegistry, making them available to DataFrame `expr(...)` and
  * plain SQL alike; the [[graft.plans.TopKPerKeyStrategy]] planner
  * strategy so [[graft.plans.TopKPerKeyNode]] plans without the per-call
  * `experimental.extraStrategies` registration (`TopKPerKey.perKey`
  * still self-registers for sessions built without the extension); and
  * the [[graft.plans.TopKWindowRewrite]] optimizer rule, which swaps the
  * window-top-k filter pattern for the bounded-heap operator
  * (conf-gated: `spark.graft.topkRewrite.enabled`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    (graft.functions.VectorFunctions.functions ++
      graft.functions.BloomFunctions.functions ++
      graft.functions.ZRangeContains.functions ++
      graft.functions.MortonKey.functions).foreach { f =>
      extensions.injectFunction(f)
    }
    extensions.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    extensions.injectOptimizerRule(_ => graft.plans.TopKWindowRewrite)
  }
}
