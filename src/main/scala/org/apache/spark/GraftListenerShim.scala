package org.apache.spark

/** `LiveListenerBus.waitUntilEmpty` is `private[spark]`; graft's
  * `Diagnostics.tracktime` needs it to drain the asynchronous listener
  * queues (both task metrics and `QueryExecutionListener` events ride
  * them) before reading collected metrics — without the drain, timings
  * observed right after an action race the bus. This one-method shim is
  * the standard pattern for reaching package-private test/diagnostic
  * hooks; nothing else in graft lives outside the `graft` package.
  */
object GraftListenerShim {
  @throws[java.util.concurrent.TimeoutException]
  def waitUntilListenerBusEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
