package org.apache.spark

/** `private[spark]` seam for the measurement tools: Spark's listener bus
  * is ASYNCHRONOUS, so when an action returns, the final stages'
  * `SparkListenerStageCompleted` events can still be queued — a tool that
  * detaches its metrics listener immediately undercounts shuffle bytes
  * nondeterministically (the exact metric the soaks cite as evidence,
  * e.g. "zero-Exchange SMJ — shuffle_mb is the witness"). Draining the
  * bus before detaching makes the read exact. Same package-access pattern
  * as [[org.apache.spark.sql.GraftBridge]].
  */
object GraftListenerBus {
  /** Blocks until every queued listener event has been delivered (or the
    * timeout lapses — a bounded wait, never a hang). */
  def drain(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
