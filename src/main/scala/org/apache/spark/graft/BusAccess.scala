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

/** Accumulates executor CPU nanoseconds across all task ends — the
  * shared second measurement axis for Bench and ScaleProbe (wall time on
  * the bench host swings ±20% with ambient load; CPU only counts cycles
  * the tasks burned). Read via [[BusAccess.waitUntilListenerBusEmpty]]
  * first: task-end events are delivered asynchronously. */
class CpuTimeAccumulator extends org.apache.spark.scheduler.SparkListener {
  val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
  override def onTaskEnd(
      taskEnd: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) cpuNs.addAndGet(m.executorCpuTime)
  }
}
