/* Lives in Spark's package on purpose: LiveListenerBus.waitUntilEmpty is
 * private[spark], but spill-metric assertions need a deterministic flush of
 * TaskEnd events before reading a tally (task metrics arrive on the bus
 * asynchronously after an action returns). Minimal bridge, test-support
 * only — same rationale as GraftColumnBridge. */
package org.apache.spark

object GraftListenerBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
