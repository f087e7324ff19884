package org.apache.spark

/** Bridge to `LiveListenerBus.waitUntilEmpty()` (`private[spark]`, so
  * this one-liner lives in the spark package — the same pattern
  * Spark's own test harnesses use): the bench snapshots per-query
  * shuffle byte counters from a listener, and listener delivery is
  * async, so without quiescence between queries one query's final
  * stages would bill their bytes to the next. */
object GraftListenerFlush {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
