package org.apache.spark.sql.graftshim

import org.apache.spark.SparkContext

/** Bounded flush of the async listener bus. TaskEnd events are
  * delivered on the bus's own thread, so telemetry read from a
  * SparkListener "right after" an action races the delivery — spill
  * bytes / max-task-duration counters can miss the tail of the job
  * just measured and bleed it into the next one. `listenerBus` is
  * `private[spark]`; this shim re-exports its test-grade barrier
  * (no internals modified).
  */
object ListenerBusShim {

  /** Wait until every queued listener event is delivered; returns
    * false (instead of throwing) if the bus is still busy after
    * `timeoutMs` — callers treat that as "counters may under-report".
    */
  def flush(sc: SparkContext, timeoutMs: Long = 10000L): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
