package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Bridge into `private[spark]` core internals (same pattern as
  * `org.apache.spark.sql.graftshim.Shim` for the SQL side): the bench
  * harness needs to drain the async listener bus so per-stage metrics
  * attributed to a query are complete before the next query starts.
  */
object ListenerShim {
  /** Block until every queued listener event has been delivered. */
  def drain(sc: SparkContext, timeoutMillis: Long = 10000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
