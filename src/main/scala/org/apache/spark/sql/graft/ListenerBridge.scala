package org.apache.spark.sql.graft

import org.apache.spark.SparkContext

/** Bridge into the `private[spark]` listener bus: deterministic event
  * drain for metric collection (a fixed sleep can miss the slowest task's
  * end event on a loaded machine — the exact sample a straggler stage
  * exists to record). */
object ListenerBridge {
  /** Block until every queued listener event is delivered (or timeout). */
  def drain(sc: SparkContext, timeoutMillis: Long = 10000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
