package org.apache.spark

/** Minimal `private[spark]` access bridge for the bench harness: the
  * listener bus delivers events asynchronously on its own thread, so
  * per-query job/stage counters read right after a blocking action can
  * undercount (posting ≠ processing). `LiveListenerBus.waitUntilEmpty()`
  * is the deterministic drain Spark's own tests use; it is package-private,
  * so the one call lives here. Nothing else from the internal surface
  * leaks.
  */
object GraftSchedulerBridge {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
