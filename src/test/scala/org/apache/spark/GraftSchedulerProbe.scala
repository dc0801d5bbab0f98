package org.apache.spark

/** Test-only window into the `private[spark]` listener bus, so specs can
  * drain in-flight scheduler events before reading a job counter (job
  * events post asynchronously; without a drain a jobs-per-round assertion
  * races the bus). Lives in package org.apache.spark purely for access. */
object GraftSchedulerProbe {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
