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

  /** Null-safe (`<=>`) equality on the group columns of two aliased
    * frames: group columns are VALUE columns of the store, so null is
    * a legal group and must join to itself. */
  private def nullSafeOn(l: String, r: String, cols: Seq[String]): Column =
    cols.map(g => col(s"$l.$g") <=> col(s"$r.$g")).reduce(_ && _)

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
    // NULL is a legal group value (groupBy treats it as its own group),
    // so the view<->delta join must be null-safe — a null-rejecting
    // equi-join would duplicate the null group instead of merging it
    view.alias("v").join(deltas.alias("d"),
        nullSafeOn("v", "d", groupCols), "full_outer")
      .select(groupCols.map(g => coalesce(col(s"v.$g"), col(s"d.$g")).as(g)) ++ Seq(
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

  /** Full build for the non-distributive extremes family:
    * (groupCols..., min_v, max_v, n_rows) over a snapshot.
    * `valueType` is the extreme columns' type — "long" (default) or
    * any comparable SQL type ("double", "timestamp", …): unlike the
    * sum family (kept integer-exact by contract), min/max and the
    * affected-group recompute are EXACT under any ordering, so
    * floating values lose nothing here. */
  def minMaxView(snapshot: DataFrame, groupCols: Seq[String],
                 value: Column, valueType: String = "long"): DataFrame =
    snapshot.groupBy(groupCols.map(col): _*)
      .agg(min(value.cast(valueType)).as("min_v"),
        max(value.cast(valueType)).as("max_v"),
        count(lit(1)).as("n_rows"))

  /** Incremental min/max refresh — Gupta-Mumick's NON-distributive
    * case. Inserts always fold monotonically (`least`/`greatest`), but
    * a RETRACTION (a delete, or an update's old image) can break an
    * extreme it reaches: once the group's only max-holder leaves, the
    * new max is not derivable from (old max, delta). The split:
    *
    *  - groups whose retracted values all sit strictly INSIDE
    *    (min_v, max_v) — or whose inserts re-establish dominance
    *    (an inserted value ≤ old min is the new min no matter what was
    *    retracted) — delta-propagate exactly like [[refreshSum]];
    *  - only the remaining AFFECTED groups recompute, via a semi-join
    *    of `snapshotAtTo` (the store read AS OF the changelog's
    *    to-epoch) against the affected-group list — recompute cost is
    *    those groups' rows, never a store rescan, and on a typical
    *    CDC batch the affected set is a small fraction of the touched
    *    groups (MaterializedViewSpec asserts the scope).
    *
    * A group whose rows all leave is recomputed to zero rows and drops
    * out; a retraction against a group the view never held means the
    * changelog was not cut from this view's epoch and fails fast. */
  def refreshMinMax(view: DataFrame, cdcImages: DataFrame,
                    groupCols: Seq[String], valueCol: String,
                    snapshotAtTo: DataFrame,
                    valueType: String = "long"): DataFrame = {
    val gc = groupCols.map(col)
    val retract = cdcImages.filter(col("change").isin("delete", "update"))
      .select(groupCols.map(g => col(s"${g}_old").as(g)) :+
        col(s"${valueCol}_old").cast(valueType).as("rv"): _*)
    val insert = cdcImages.filter(col("change").isin("insert", "update"))
      .select(gc :+ col(valueCol).cast(valueType).as("iv"): _*)
    val rAgg = retract.groupBy(gc: _*)
      .agg(min(col("rv")).as("r_min"), max(col("rv")).as("r_max"),
        count(lit(1)).as("rn"))
    val iAgg = insert.groupBy(gc: _*)
      .agg(min(col("iv")).as("i_min"), max(col("iv")).as("i_max"),
        count(lit(1)).as("inn"))
    // all three group joins below are null-safe: null is a legal group
    val deltas = rAgg.alias("r").join(iAgg.alias("i"),
        nullSafeOn("r", "i", groupCols), "full_outer")
      .select(groupCols.map(g => coalesce(col(s"r.$g"), col(s"i.$g")).as(g)) ++
        Seq(col("r_min"), col("r_max"), col("rn"),
          col("i_min"), col("i_max"), col("inn")): _*)
    val joined = view.alias("v").join(deltas.alias("d"),
        nullSafeOn("v", "d", groupCols), "full_outer")
      .select(groupCols.map(g => coalesce(col(s"v.$g"), col(s"d.$g")).as(g)) ++
        Seq(col("min_v"), col("max_v"), col("n_rows"),
          col("r_min"), col("r_max"), col("rn"),
          col("i_min"), col("i_max"), col("inn")): _*)
    // a retraction at/past the current extreme breaks it — unless an
    // insert dominates that side (≤ old min / ≥ old max), which pins
    // the new extreme regardless of what left
    val minBroken = col("r_min").isNotNull && col("min_v").isNotNull &&
      col("r_min") <= col("min_v") &&
      !(col("i_min").isNotNull && col("i_min") <= col("min_v"))
    val maxBroken = col("r_max").isNotNull && col("max_v").isNotNull &&
      col("r_max") >= col("max_v") &&
      !(col("i_max").isNotNull && col("i_max") >= col("max_v"))
    val affected = minBroken || maxBroken
    val propagated = joined.filter(!affected)
      .select(gc ++ Seq(
        least(col("min_v"), col("i_min")).as("min_v"),
        greatest(col("max_v"), col("i_max")).as("max_v"),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("inn"), lit(0L)) -
          coalesce(col("rn"), lit(0L))).as("n_rows")): _*)
      .filter(assert_true(col("n_rows") >= 0 && col("min_v").isNotNull,
          concat(lit("refreshMinMax: inconsistent group delta — changelog "
            + "not cut from this view's epoch: "),
            concat_ws(",", groupCols.map(c => col(c).cast("string")): _*)))
        .isNull && col("n_rows") > 0)
    val recomputed = minMaxView(
      snapshotAtTo.alias("s")
        .join(broadcast(joined.filter(affected).select(gc: _*).alias("a")),
          nullSafeOn("s", "a", groupCols), "left_semi"),
      groupCols, col(valueCol), valueType)
    propagated.unionByName(recomputed)
  }
}
