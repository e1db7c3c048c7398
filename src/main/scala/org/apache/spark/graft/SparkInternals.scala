package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `private[spark]` escape hatch for the bench harness (the
  * sql.graft.Bridge pattern): task-metric deltas attribute to the query
  * that just ran only if the async listener bus has drained before the
  * snapshot is read. */
object SparkInternals {
  def flushListenerBus(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case scala.util.control.NonFatal(_) => }
}
