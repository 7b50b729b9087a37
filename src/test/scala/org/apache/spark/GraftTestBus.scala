package org.apache.spark

/** Test-only access to the (`private[spark]`) listener bus, so specs
  * that count jobs through a `SparkListener` can drain deterministically
  * instead of sleeping (a loaded box can deliver events late and flip a
  * sleep-based count either way). */
object GraftTestBus {
  def drain(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
