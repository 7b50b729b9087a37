package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A4 — budget early-exit: consume objects in order until the running
  * byte total reaches the cap, as a cumulative window instead of a
  * driver loop.
  *
  * The reference stops enqueueing when a per-PROCESS running total hits
  * the configured budget (AzureTaskProducer/inventory_sqs.py:152-155,
  * config.ini:44-49) — the budget is inherently per consumer shard, not
  * global. [[perShard]] mirrors that: each shard's window sorts only its
  * own rows, so the plan scales out with the shard count. [[global]] is
  * the single-total form — inherently one partition (Spark warns
  * `WindowExec: No Partition Defined`), kept only for small control
  * streams where one sequential consume order is the actual semantics.
  */
object BudgetCap {

  /** Per-shard running-total cap. `orderCols` must be a total order
    * within a shard (ties would let engines disagree on which row
    * crosses the cap).
    *
    * ROWS frame, not the default RANGE: RANGE lumps duplicate order
    * keys into one peer group, charging the budget all-or-nothing for
    * the group. */
  def perShard(df: DataFrame, shard: Column, size: Column, cap: Long,
               orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(shard).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("running_size", sum(size).over(w))
      .filter(col("running_size") <= cap)
  }

  /** Global single-total cap — use [[perShard]] at scale. */
  def global(df: DataFrame, size: Column, cap: Long,
             orderCols: Seq[Column]): DataFrame = {
    val w = Window.orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("running_size", sum(size).over(w))
      .filter(col("running_size") <= cap)
  }
}
