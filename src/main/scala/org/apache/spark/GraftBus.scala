package org.apache.spark

/** Main-scope access to the (`private[spark]`) listener bus for the
  * bench harness: per-query job/shuffle attribution (Bench.scala)
  * snapshots listener counters around each timed run, and must drain
  * the bus deterministically before reading them — a loaded box
  * delivers events late, and a sleep-based snapshot would smear one
  * query's jobs into the next query's ledger. */
object GraftBus {
  def drain(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
