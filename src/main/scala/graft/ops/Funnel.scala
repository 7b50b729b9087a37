package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event log: how far does each key
  * progress through a stage sequence (view → click → purchase), where
  * stage i+1 only counts if it happens AT OR AFTER the key's earliest
  * qualifying stage i (the product-analytics conversion funnel, and
  * the same shape as the reference monitor's "sent → copied →
  * verified" object lifecycle).
  *
  * Shape: one shuffle of the filtered event log on the key, then a
  * chain of per-key window minima — stage i's timestamp is
  * `min(ts) FILTER (type = stage_i AND ts >= t_{i-1})` over the key
  * partition, computed left to right in one narrow pass per stage.
  * No joins, no per-key sorts beyond the window's own, and the state
  * per key is one timestamp per stage. */
object Funnel {

  /** Per-key stage timestamps and depth. Output: key, `t_0..t_{n-1}`
    * (epoch of the earliest qualifying hit per stage, null once the
    * funnel breaks) and `depth` = number of stages completed. */
  def stages(events: DataFrame, key: String, ts: Column, stageCol: Column,
             stageNames: Seq[String]): DataFrame = {
    require(stageNames.nonEmpty, "need at least one stage")
    val w = Window.partitionBy(col(key))
    val base = events.select(col(key), ts.as("_ts"), stageCol.as("_stage"))
    val withTs = stageNames.zipWithIndex.foldLeft(base) { case (df, (name, i)) =>
      val gate = if (i == 0) lit(true) else col(s"t_${i - 1}").isNotNull
      val qualifying = if (i == 0) col("_stage") === name
        else col("_stage") === name && col("_ts") >= col(s"t_${i - 1}")
      // two steps per stage: the windowed min must see the PREVIOUS
      // stage's column, so each fold iteration materializes one select
      df.withColumn(s"t_$i",
        when(gate, min(when(qualifying, col("_ts"))).over(w)))
    }
    val aggs = stageNames.indices.map(i => min(col(s"t_$i")).as(s"t_$i"))
    withTs
      .groupBy(col(key))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("depth",
        stageNames.indices.map(i =>
          when(col(s"t_$i").isNotNull, 1L).otherwise(0L)).reduce(_ + _))
  }

  /** Streaming form of [[stages]]: a `mapGroupsWithState` state
    * machine per key whose state is ONE timestamp per stage (bounded,
    * checkpointed, restart-safe — the same ledger contract as
    * [[graft.streaming.StatefulDedup]]). Each micro-batch's events
    * sort by event time inside the group iterator, so in-batch
    * disorder is exact; events arriving in a LATER batch with an
    * EARLIER time than an already-processed gate are the one
    * approximation (a stage-i event rejected before its true gate
    * arrived is not revisited) — the bounded-state trade every
    * streaming funnel makes; feed batches in event-time order (or
    * pre-buffer by watermark) for exact parity with [[stages]], which
    * the spec proves batch-split-for-batch-split.
    *
    * Output (update mode): one row per key per batch with new events —
    * the current `t_0..t_{n-1}` (null = not reached) and depth. */
  def stagesStream(events: org.apache.spark.sql.DataFrame, key: String,
                   ts: Column, stageCol: Column,
                   stageNames: Seq[String]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val n = stageNames.length
    val idx = stageNames.zipWithIndex.toMap
    val spark = events.sparkSession
    import spark.implicits._
    // the key travels as STRING (total for any type — a cast("long")
    // would null out non-numeric ids and collapse every key into one
    // shared state); the output casts it back to the input's type
    val keyType = events.schema(key).dataType
    val typed = events
      .select(col(key).cast("string"), ts.cast("long"), stageCol.cast("string"))
      .as[(String, Long, String)]
    val updated = typed.groupByKey(_._1)
      .mapGroupsWithState[Seq[Long], (String, Seq[Long])](
        GroupStateTimeout.NoTimeout) {
        (k: String, rows: Iterator[(String, Long, String)],
         state: org.apache.spark.sql.streaming.GroupState[Seq[Long]]) =>
          val t = state.getOption.getOrElse(Seq.fill(n)(Long.MaxValue)).toArray
          // event-time order within the batch; stage index breaks ties
          // so "view then click at the same second" advances the funnel
          rows.toSeq
            .sortBy { case (_, et, s) => (et, idx.getOrElse(s, n)) }
            .foreach { case (_, et, s) =>
              idx.get(s).foreach { i =>
                val gateOk = i == 0 || t(i - 1) != Long.MaxValue
                val gate = if (i == 0) Long.MinValue else t(i - 1)
                if (gateOk && et >= gate && et < t(i)) t(i) = et
              }
            }
          state.update(t.toSeq)
          (k, t.toSeq)
      }
    updated.toDF("k", "ts_list")
      .select(col("k").cast(keyType).as(key) +:
        stageNames.indices.map(i =>
          when(element_at(col("ts_list"), i + 1) =!= Long.MaxValue,
            element_at(col("ts_list"), i + 1)).as(s"t_$i")) :+
        stageNames.indices.map(i =>
          when(element_at(col("ts_list"), i + 1) =!= Long.MaxValue, 1L)
            .otherwise(0L)).reduce(_ + _).as("depth"): _*)
  }

  /** Funnel summary: how many keys complete at least each stage.
    * One row per stage, `n_keys` monotonically non-increasing. */
  def summary(events: DataFrame, key: String, ts: Column, stageCol: Column,
              stageNames: Seq[String]): DataFrame = {
    val st = stages(events, key, ts, stageCol, stageNames)
    val perDepth = st.groupBy(col("depth")).agg(count(lit(1)).as("n_at_depth"))
    val spark = events.sparkSession
    import spark.implicits._
    val stageDf = stageNames.zipWithIndex
      .map { case (n, i) => (i.toLong + 1, n) }.toDF("stage_no", "stage")
    // n_keys reaching stage i = Σ n_at_depth over depth >= i
    stageDf.join(perDepth, col("depth") >= col("stage_no"), "left")
      .groupBy(col("stage_no"), col("stage"))
      .agg(coalesce(sum(col("n_at_depth")), lit(0L)).as("n_keys"))
  }
}
