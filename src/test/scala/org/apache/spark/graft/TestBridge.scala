package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge into `private[spark]` surface: deterministic listener
  * draining. `SparkContext.listenerBus.waitUntilEmpty` is the supported way
  * to make listener-based assertions race-free (Spark's own test suites use
  * it); it is package-private, hence this 1-method shim, mirroring the
  * pattern of `org.apache.spark.sql.graft.bridge`.
  */
object TestBridge {
  def waitForListenerBus(sc: SparkContext, timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
