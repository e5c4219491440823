package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Narrow bridge to `private[spark]` surface.
  *
  * `QueryInstrumentation` reads task metrics through a
  * `SparkListener`; the listener bus is asynchronous, so metrics for a
  * just-finished action are only complete after the bus drains.
  * `SparkContext.listenerBus.waitUntilEmpty()` is the canonical way to
  * wait (Spark's own test utilities use it) but it is `private[spark]`
  * — hence this one-method accessor in the org.apache.spark namespace.
  * Nothing else in graft reaches into Spark internals.
  */
object SparkInternals {
  def waitListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
