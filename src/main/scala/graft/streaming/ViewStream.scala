package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.MaterializedView
import graft.sinks.VersionedStore

/** A materialized view that FOLLOWS a versioned store's commit log —
  * the productized q210 loop: each new source epoch applies exactly
  * ONE delta propagation ([[MaterializedView.refreshSum]] for the
  * distributive family, [[MaterializedView.refreshMinMax]] for the
  * extremes) and the view itself persists as a versioned store, so
  * the view has its own time travel, CDC and retention, and its
  * commit log records the LINEAGE: view epoch ↔ source epoch pairs
  * (each view commit is tagged `src<E>` with the source epoch it
  * folded in).
  *
  * Exactly-once on the maintainer side is the same fence every other
  * maintainer uses: the source-epoch tag in the view store's commit
  * log. A crash mid-propagation replays the source epoch; the replay
  * finds `src<E>` committed and skips. A source epoch whose CDC does
  * not move the view commits nothing — replaying it is an empty,
  * idempotent no-op. So the tags alone make [[catchUp]] CORRECT with
  * no auxiliary state; the `_viewwm` NO-OP WATERMARK on top makes it
  * CHEAP: after each poll the highest source epoch EXAMINED is
  * recorded (atomic replace-write), so a later poll starts past the
  * no-op epochs instead of re-reading their changelogs — each poll is
  * O(new source epochs), however many no-op epochs history holds. A
  * crash between the last fold and the watermark write only re-reads
  * some no-op changelogs once (the tags still dedupe real folds).
  *
  * Per source epoch the view write is O(changed groups), not O(view):
  * the refresh output is restricted to the groups the CDC touched
  * (old OR new image side — a group-moving update touches both), and
  * groups whose rows all left become store DELETES through one mixed
  * [[VersionedStore.applyOps]] epoch (delete-row nulls are typed from
  * the view's own schema, so any value type survives the round trip).
  * At 100 TB this is the dashboard posture end to end: the store
  * absorbs keyed CDC bucket-locally, the view follows at one
  * change-volume-sized propagation per commit, and both sides keep
  * full history. [[ViewStream.catchUpAll]] drives N views off ONE
  * changelog read per source epoch.
  *
  * Group columns must be NON-NULL to persist (they become the view
  * store's keys; the in-memory refresh algebra tolerates null groups,
  * a keyed store does not). `kind` is `"sum"` or `"minmax"`;
  * `valueType` is the aggregate columns' SQL type — the sum family is
  * integer-exact by contract (`"long"` only), while min/max accepts
  * any comparable type (`"double"` extremes are exact: retraction
  * either propagates monotonically or recomputes the group). */
final case class ViewStream(groupCols: Seq[String], valueCol: String,
                            kind: String = "sum", nBuckets: Int = 8,
                            valueType: String = "long") {
  require(kind == "sum" || kind == "minmax", s"unknown view kind: $kind")
  require(kind != "sum" || valueType == "long",
    "the sum family is integer-exact by contract: valueType must be long " +
      "(floating retractions drift; use kind=minmax for doubles)")

  private def fullView(snapshot: DataFrame): DataFrame =
    if (kind == "sum") MaterializedView.sumView(snapshot, groupCols, col(valueCol))
    else MaterializedView.minMaxView(snapshot, groupCols, col(valueCol),
      valueType)

  private def refreshed(view: DataFrame, cdc: DataFrame,
                        snapshotAtTo: => DataFrame): DataFrame =
    if (kind == "sum") MaterializedView.refreshSum(view, cdc, groupCols, valueCol)
    else MaterializedView.refreshMinMax(view, cdc, groupCols, valueCol,
      snapshotAtTo, valueType)

  /** The newest source epoch this view is CURRENT WITH: the larger of
    * the biggest `src<E>` commit tag (a fold that moved the view) and
    * the `_viewwm` no-op watermark (epochs examined but not moving).
    * 0 = nothing seen. */
  def lastApplied(viewRoot: String): Long = {
    val tagged = VersionedStore.commits(viewRoot).iterator
      .map(_.kind).flatMap { k =>
        val i = k.indexOf('@')
        if (i < 0) None
        else {
          val tag = k.substring(i + 1)
          if (tag.startsWith("src")) tag.drop(3).toLongOption else None
        }
      }.maxOption.getOrElse(0L)
    val wm = VersionedStore.readAuxMarker(viewRoot, "_viewwm")
      .flatMap(_.trim.toLongOption).getOrElse(0L)
    math.max(tagged, wm)
  }

  /** Fold source epoch `e` into the view — one delta propagation, one
    * tagged view commit (or none when the CDC does not move the
    * view). Replays are no-ops. `cdcPre` lets a registry
    * ([[ViewStream.catchUpAll]]) share one changelog read across
    * views; when absent the epoch's changelog is read here. */
  def applyEpoch(spark: SparkSession, srcRoot: String, viewRoot: String,
                 e: Long, cdcPre: Option[DataFrame] = None): Unit = {
    val tag = s"src$e"
    if (VersionedStore.taggedEpoch(viewRoot, tag).isDefined) return
    val gc: Seq[Column] = groupCols.map(col)
    if (VersionedStore.currentEpoch(viewRoot) == 0L) {
      // bootstrap: full build over the FIRST followed snapshot
      val v0 = fullView(VersionedStore.readAsOf(spark, srcRoot, e))
      if (!v0.isEmpty)
        VersionedStore.upsert(v0, groupCols, viewRoot, nBuckets, tag = tag)
      return
    }
    val cdc = cdcPre.getOrElse(VersionedStore.changelog(spark, srcRoot,
      e - 1L, e, images = true).localCheckpoint())
    // groups the CDC touches on EITHER image side (a group-moving
    // update retracts from one group and inserts into another); the
    // old side of pure inserts is all-null and is not a group
    val touched = cdc.select(gc: _*)
      .unionByName(cdc.select(groupCols.map(g => col(s"${g}_old").as(g)): _*))
      .na.drop("all", groupCols).distinct().localCheckpoint()
    if (touched.isEmpty) return
    val view = VersionedStore.read(spark, viewRoot)
    val next = refreshed(view, cdc,
      VersionedStore.readAsOf(spark, srcRoot, e))
    // O(changed groups) commit: refreshed rows for touched groups are
    // upserts; touched groups absent from the refresh emptied out and
    // delete. One mixed applyOps epoch — never a full view rewrite.
    // Delete-row nulls take each value column's type from the refresh
    // output itself, so non-long view kinds commit schema-clean.
    val valueCols = next.columns.filterNot(groupCols.contains).toSeq
    val upserts = next.join(touched, groupCols, "left_semi")
      .withColumn("_vop", lit("upsert"))
    val deletes = touched.join(next, groupCols, "left_anti")
      .select(gc ++ valueCols.map(c =>
        lit(null).cast(next.schema(c).dataType).as(c)): _*)
      .withColumn("_vop", lit("delete"))
    VersionedStore.applyOps(upserts.unionByName(deletes), groupCols,
      viewRoot, "_vop", nBuckets, tag = tag)
  }

  /** Poll the source commit log and fold every epoch the view has not
    * seen — the follower's drive loop (call it from a scheduler, a
    * stream's foreachBatch, or a test). O(new source epochs) per poll
    * (the `_viewwm` watermark skips re-examining no-op epochs).
    * Returns the source epoch the view is now current with. */
  def catchUp(spark: SparkSession, srcRoot: String, viewRoot: String): Long = {
    val srcCur = VersionedStore.currentEpoch(srcRoot)
    val from = math.max(lastApplied(viewRoot), 0L) + 1L
    (from to srcCur).foreach(e => applyEpoch(spark, srcRoot, viewRoot, e))
    if (srcCur >= from)
      VersionedStore.writeAuxMarker(viewRoot, "_viewwm", srcCur.toString)
    srcCur
  }
}

object ViewStream {

  /** Follower REGISTRY: drive N views over one source with ONE
    * changelog read per source epoch (each view's delta propagation
    * consumes the same localCheckpoint'ed CDC frame — the source's
    * chain files are opened once per epoch however many views follow;
    * ViewStreamSpec pins the source-open count flat in the view
    * count). Views may lag each other (a freshly registered view
    * bootstraps on its first epoch); per epoch only the views still
    * behind it fold. Returns the source epoch all views are now
    * current with. */
  def catchUpAll(spark: SparkSession, srcRoot: String,
                 views: Seq[(ViewStream, String)]): Long = {
    val srcCur = VersionedStore.currentEpoch(srcRoot)
    if (views.isEmpty) return srcCur
    val from = views.map { case (v, root) => v.lastApplied(root) }.min + 1L
    (from to srcCur).foreach { e =>
      val pending = views.filter { case (v, root) => v.lastApplied(root) < e }
      if (pending.nonEmpty) {
        // bootstrapping views read a full snapshot, not CDC — only
        // spend the changelog read if some pending view needs it
        val needCdc = pending.exists { case (_, root) =>
          VersionedStore.currentEpoch(root) != 0L }
        val cdc =
          if (!needCdc) None
          else Some(VersionedStore.changelog(spark, srcRoot, e - 1L, e,
            images = true).localCheckpoint())
        pending.foreach { case (v, root) =>
          v.applyEpoch(spark, srcRoot, root, e, cdc) }
      }
    }
    views.foreach { case (_, root) =>
      VersionedStore.writeAuxMarker(root, "_viewwm", srcCur.toString) }
    srcCur
  }
}
