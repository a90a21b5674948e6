package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is private[spark]; measurement harnesses
  * (graft.ScanFloor's per-query job counts) need a deterministic "all
  * queued listener events delivered" barrier instead of wall-clock sleeps,
  * which over- or under-count jobs when the async bus is slow (r15 ADVICE).
  * Same shim pattern as [[org.apache.spark.sql.graftbridge.ColumnBridge]].
  */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
