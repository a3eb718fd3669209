package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; this shim exposes its
  * drain barrier so diagnostic mains ([[graft.tools.FloorProbe]]) can
  * quiesce the async listener bus between counter reset and read —
  * SparkListener events are delivered asynchronously, so counts otherwise
  * bleed between passes/queries (ADVICE r6). */
object ListenerShim {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
