// Lives inside org.apache.spark because LiveListenerBus is private[spark]:
// draining the bus is the only way to read listener-accumulated task
// metrics synchronously after a job completes (events are delivered async).
package org.apache.spark.graft

import org.apache.spark.SparkContext

object BusAccess {
  /** Block until every queued listener event has been delivered (or the
    * timeout passes — callers treat the metric as best-effort and never
    * fail a run on a slow bus). */
  def waitUntilListenerBusEmpty(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: Exception => () }
}
