package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Deterministic listener-bus drain for telemetry snapshots.
  *
  * `SparkContext.listenerBus` is `private[spark]`, so the one
  * mechanism Spark's own test suites use to make async listener
  * delivery deterministic — `LiveListenerBus.waitUntilEmpty` — needs
  * this package-located bridge. Used by [[graft.Bench]] before
  * snapshotting `Dataset.observe` metrics: a fixed sleep on a loaded
  * host can miss a late delivery and silently under-report clamp
  * drops, which is exactly the silent truncation the telemetry exists
  * to expose.
  */
object ListenerDrain {

  /** Block until every queued listener event is delivered, or
    * `timeoutMillis` elapses. Returns true when the bus drained, false
    * on timeout — callers decide how loud to be.
    */
  def drain(sc: SparkContext, timeoutMillis: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMillis); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
