package org.apache.spark

/** Bridge into the core-private listener bus (the core-side sibling of
  * sql.GraftSqlBridge): `SparkContext.listenerBus` is `private[spark]`,
  * but profiling tools that read metrics a `SparkListener` accumulated
  * must drain the ASYNC event bus first or the last stages of a job can
  * be missing / attributed to the next run.
  */
object GraftSparkBridge {
  /** Block until every posted listener event has been dispatched. */
  def drainListenerBus(sc: SparkContext, timeoutMillis: Long = 10000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
