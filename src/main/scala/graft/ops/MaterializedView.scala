package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance from CDC before/after
  * images ([[graft.sinks.VersionedStore.changelog]] with
  * `images = true`) — the classic delta-propagation algebra (Gupta &
  * Mumick, "Maintenance of Materialized Views", 1995) for the
  * sum/count family: a view refresh costs O(change volume), never a
  * rescan of the store.
  *
  * Group-change safety: the view's GROUP columns are value columns of
  * the store, so an update may MOVE a row between groups. Every CDC
  * row therefore contributes as (up to) two signed deltas — the old
  * image retracts from the OLD group (`delete`/`update`), the new
  * image inserts into the NEW group (`insert`/`update`); an update
  * within one group nets out in the same aggregate. Deleting a
  * group's last row drops the group (n_rows reaches 0); a negative
  * n_rows can only mean the changelog was not applied to the view
  * epoch it was cut from, and fails fast.
  *
  * At 100 TB this is the read side the MVCC store exists for: the
  * store absorbs keyed upserts bucket-locally, the dashboard/report
  * view follows by joining a change-volume-sized delta table — the
  * Delta CDF + MERGE pattern with the epoch pair as the exactness
  * contract (view@e1 + changelog(e1,e2) == view@e2, BY ALGEBRA, and
  * MaterializedViewSpec pins it byte-for-byte). */
object MaterializedView {

  /** Full build: (groupCols..., sum_v, n_rows) over a snapshot. */
  def sumView(snapshot: DataFrame, groupCols: Seq[String],
              value: Column): DataFrame =
    snapshot.groupBy(groupCols.map(col): _*)
      .agg(sum(value.cast("long")).as("sum_v"),
        count(lit(1)).as("n_rows"))

  /** Incremental refresh: apply a CDC image table cut over
    * (viewEpoch, toEpoch] to a view built at viewEpoch. `valueCol`
    * names the aggregated column; its old image is `<valueCol>_old`,
    * and each group column `g`'s old image is `g_old` (CDC images
    * carry every non-key column in both versions). */
  def refreshSum(view: DataFrame, cdcImages: DataFrame,
                 groupCols: Seq[String], valueCol: String): DataFrame = {
    val retract = cdcImages
      .filter(col("change").isin("delete", "update"))
      .select(groupCols.map(g => col(s"${g}_old").as(g)) ++ Seq(
        (-col(s"${valueCol}_old").cast("long")).as("dv"),
        lit(-1L).as("dn")): _*)
    val insert = cdcImages
      .filter(col("change").isin("insert", "update"))
      .select(groupCols.map(col) ++ Seq(
        col(valueCol).cast("long").as("dv"), lit(1L).as("dn")): _*)
    val deltas = retract.unionByName(insert)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("dv")).as("dv"), sum(col("dn")).as("dn"))
    view.join(deltas, groupCols, "full_outer")
      .select(groupCols.map(col) ++ Seq(
        (coalesce(col("sum_v"), lit(0L)) + coalesce(col("dv"), lit(0L)))
          .as("sum_v"),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n_rows")): _*)
      // assert_true lives INSIDE the kept filter so the optimizer can
      // never dead-code it: a negative count means the changelog was
      // not cut from this view's epoch — corrupt, fail fast
      .filter(assert_true(col("n_rows") >= 0,
          concat(lit("refreshSum: negative group count — changelog not "
            + "cut from this view's epoch: "),
            concat_ws(",", groupCols.map(c => col(c).cast("string")): _*)))
        .isNull && col("n_rows") > 0)
  }
}
