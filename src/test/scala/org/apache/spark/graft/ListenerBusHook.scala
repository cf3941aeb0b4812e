package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge into Spark's private[spark] listener bus: listener
  * events post asynchronously, so a spec that counts jobs (DedupSpec's
  * job budget) or collects job properties (HttpServingSpec's pool-name
  * soak) must drain the bus before asserting. A fixed Thread.sleep was
  * the previous workaround — fine until a loaded box out-waits it; this
  * blocks exactly until the queue is empty (the same hook Spark's own
  * test utilities use). */
object ListenerBusHook {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
