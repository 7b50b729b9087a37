package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Fns

/** A5–A10/J6 — the TaskMonitor/UICenter aggregation family.
  *
  * Reference: s3_monitor_statistic.py streams monitor rows in time order
  * and maintains three concurrent buckets (1/5/60 min), flushing each on
  * the first out-of-bucket row (:177-207, :250-298). That algorithm
  * miscounts out-of-order rows (SURVEY.md T5); the engine computes the
  * same stat-table contract `(TimeUnit, StartTime, SuccessObjectSize,
  * SuccessObjectNum, FailedObjectSize, FailedObjectNum)` with grouped
  * tumbling windows, which is order-insensitive and strictly more correct.
  *
  * Scale: one shuffle for the 1-minute aggregation; the 5/60-minute
  * granularities re-aggregate the (tiny) 1-minute rollup, not the raw
  * log — at 100 TB the raw data is touched exactly once.
  */
object TimeBucketStats {

  /** Aggregate per `unitSec` bucket × success flag.
    * @param epochSec event-time in epoch seconds (fractional ok)
    * @param success  1 = success, 0 = failed (ReplicationStatus semantics,
    *                 docs/Schema.txt:55-59)
    * @param size     object size in bytes */
  def bucketize(log: DataFrame, epochSec: Column, success: Column, size: Column,
                unitSec: Int): DataFrame =
    log.groupBy(Fns.bucketFloor(epochSec, unitSec).as("start_time"))
      .agg(
        sum(when(success === 1, size).otherwise(0L)).cast("bigint").as("success_size"),
        sum(when(success === 1, 1L).otherwise(0L)).as("success_num"),
        sum(when(success === 0, size).otherwise(0L)).cast("bigint").as("failed_size"),
        sum(when(success === 0, 1L).otherwise(0L)).as("failed_num"))
      .withColumn("time_unit", lit(unitSec / 60))

  /** Full stat table: 1-minute aggregation of the raw log, then 5/60-minute
    * rollups computed FROM the 1-minute rows (A5's three granularities with
    * a single scan of the input).
    *
    * @param persistOneMin cache the 1-minute rollup (tiny — one row per
    *        minute). The union references it three times, and without a
    *        persist each branch re-derives the raw-log aggregation; jobs
    *        that also re-evaluate the table (e.g. a scalar lookup + a
    *        join) should pass true. Left off by default so the library
    *        doesn't own cache lifetimes. */
  def statTable(log: DataFrame, epochSec: Column, success: Column, size: Column,
                persistOneMin: Boolean = false): DataFrame = {
    val oneMin0 = bucketize(log, epochSec, success, size, 60)
      .select("time_unit", "start_time", "success_size", "success_num", "failed_size", "failed_num")
    val oneMin = if (persistOneMin)
      oneMin0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else oneMin0
    def rollup(unitSec: Int): DataFrame =
      oneMin.groupBy(Fns.bucketFloor(col("start_time"), unitSec).as("start_time"))
        .agg(
          sum("success_size").cast("bigint").as("success_size"),
          sum("success_num").cast("bigint").as("success_num"),
          sum("failed_size").cast("bigint").as("failed_size"),
          sum("failed_num").cast("bigint").as("failed_num"))
        .withColumn("time_unit", lit(unitSec / 60))
        .select("time_unit", "start_time", "success_size", "success_num", "failed_size", "failed_num")
    oneMin.unionByName(rollup(300)).unionByName(rollup(3600))
  }

  /** A6 — watermark lookups: min/max event time per status. */
  def watermarks(log: DataFrame, epochSec: Column, success: Column): DataFrame =
    log.groupBy(success.cast("int").as("status"))
      .agg(
        min(epochSec.cast("bigint")).as("min_ts"),
        max(epochSec.cast("bigint")).as("max_ts"),
        count(lit(1)).as("n"))

  /** A7 — incremental resume: only aggregate rows at/after the
    * high-watermark (minute-floored). Batch analogue of the streaming
    * checkpoint; partition pruning applies when the log is date-partitioned. */
  def incrementalFrom(log: DataFrame, epochSec: Column, hwmEpochSec: Long): DataFrame =
    log.filter(epochSec >= (hwmEpochSec / 60) * 60)

  /** A8/A9 — total-progress rollup + derived throughput. */
  def progress(stat: DataFrame): DataFrame =
    stat.filter(col("time_unit") === 1)
      .agg(
        sum("success_size").cast("bigint").as("total_success_size"),
        sum("success_num").cast("bigint").as("total_success_num"),
        sum("failed_size").cast("bigint").as("total_failed_size"),
        sum("failed_num").cast("bigint").as("total_failed_num"),
        ((max("start_time") - min("start_time")) / 60 + 1).cast("bigint").as("elapsed_minutes"))
      .withColumn("bytes_per_minute",
        floor(col("total_success_size") / col("elapsed_minutes")).cast("bigint"))

  /** Session windows per key (T8 beyond tumbling): events closer than
    * `gapSec` merge into one session [first_ts, last_ts + gap). Uses
    * Spark's native `session_window` aggregation — a merging hash
    * aggregate shuffled by the session key, NOT a per-key sort window,
    * so it partial-aggregates map-side and scales with key cardinality
    * (the same operator Structured Streaming uses for streaming
    * sessionization with a watermark). Timestamps in/out are epoch
    * seconds. */
  def sessionize(log: DataFrame, key: Column, epochSec: Column,
                 gapSec: Int): DataFrame =
    sessionAgg(
      log.select(key.as("skey"),
        timestamp_seconds(epochSec.cast("bigint")).as("ts")),
      gapSec)

  /** Streaming form of [[sessionize]]: same merging aggregate over an
    * unbounded source, with a `lateSec` watermark bounding state —
    * sessions finalize (append mode) once the watermark passes their
    * close. This is the operator pair's whole point: the batch and
    * streaming plans share the session semantics verified by the q72
    * oracle. */
  def sessionizeStream(log: DataFrame, key: Column, epochSec: Column,
                       gapSec: Int, lateSec: Int): DataFrame =
    sessionAgg(
      log.select(key.as("skey"),
          timestamp_seconds(epochSec.cast("bigint")).as("ts"))
        .withWatermark("ts", s"$lateSec seconds"),
      gapSec)

  private def sessionAgg(prepared: DataFrame, gapSec: Int): DataFrame =
    prepared
      .groupBy(session_window(col("ts"), s"$gapSec seconds"), col("skey"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("skey"),
        col("session_window.start").cast("long").as("session_start"),
        col("session_window.end").cast("long").as("session_end"),
        col("n_events"))

  /** Recency-decayed per-key aggregates (the "recent activity"
    * weighting every freshness-sensitive rollup wants): each event's
    * weight halves for every `halfLifeSec` of age relative to the
    * table's newest event, in EXACT integer ppm — weight_ppm =
    * 1000000 >> halvings, halvings capped at `maxHalvings` (events
    * older than ~20 half-lives round to weight 0 anyway). An
    * exponential-decay float would hang the result on pow()'s last
    * ulp; the halving ladder is bit-replayable on any engine with a
    * shift operator. One map-side-combined aggregation; the reference
    * timestamp is a 1-row broadcast. */
  def decayedSums(events: DataFrame, key: Column, sec: Column, value: Column,
                  halfLifeSec: Long, maxHalvings: Int = 19): DataFrame = {
    require(halfLifeSec > 0, "halfLifeSec must be positive")
    val base = events.select(key.as("k"), sec.as("s"),
      value.cast("bigint").as("v"))
    val ref = base.agg(max(col("s")).as("ref"))
    base.crossJoin(broadcast(ref))
      .withColumn("halvings",
        least(expr(s"(ref - s) div $halfLifeSec"), lit(maxHalvings.toLong)))
      .withColumn("w_ppm", expr("1000000 div shiftleft(1, cast(halvings as int))"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("v")).as("raw_sum"),
        sum(col("v") * col("w_ppm")).as("decayed_sum_ppm"))
  }

  /** J6/A10 — zero-filled minute spine: `n` one-minute slots starting at
    * `startEpochSec`, left-joined against the 1-minute stat rows. */
  def minuteSpine(stat: DataFrame, startEpochSec: Long, n: Int): DataFrame = {
    val spark = stat.sparkSession
    val spine = spark.range(n.toLong)
      .select((lit(startEpochSec) + col("id") * 60).cast("bigint").as("start_time"))
    spine.join(stat.filter(col("time_unit") === 1), Seq("start_time"), "left")
      .select(
        col("start_time"),
        coalesce(col("success_num"), lit(0L)).as("success_num"),
        coalesce(col("failed_num"), lit(0L)).as("failed_num"),
        coalesce(col("success_size"), lit(0L)).as("success_size"),
        coalesce(col("failed_size"), lit(0L)).as("failed_size"))
  }
}
