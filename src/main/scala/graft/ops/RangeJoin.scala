package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join: pair left and right rows sharing a key whose
  * times lie within ±`band` of each other (nearby-event correlation —
  * the reference's monitor reads "events near this failure window" the
  * same way, TaskMonitor/s3_monitor_statistic.py:56-80).
  *
  * Spark plans `l.key = r.key AND abs(l.t - r.t) <= band` as an
  * equi-join on the key with the band as a post-filter — fine until a
  * key holds millions of rows, at which point the per-key pair
  * explosion is quadratic. The bucketed formulation bounds it:
  *
  *   1. bucket = floor(t / band); any pair within `band` differs by
  *      at most 1 bucket (pigeonhole);
  *   2. explode the RIGHT side to its bucket and both neighbors
  *      (3 rows — constant, known blow-up, chosen on the smaller side);
  *   3. equi-join on (key, bucket) — left rows join only the ~3
  *      buckets that can possibly match, not the whole key;
  *   4. re-check the exact |l.t - r.t| <= band predicate (the bucket
  *      join is a superset: neighbors can be up to 2·band apart).
  *
  * Each true pair meets exactly once (the left row's bucket is unique
  * and the right row lands in it exactly once), so no dedup pass is
  * needed. Shuffle key is (key, bucket) — finer than the raw key, so
  * a hot key spreads over its time range instead of one partition.
  */
object RangeJoin {

  /** @param left   rows to probe; carries `key`, `time`, extra columns
    * @param right  rows to find within the band (exploded ×3)
    * @param key    equi-join key column name (both sides)
    * @param time   epoch-seconds (long) column name (both sides)
    * @param band   half-width of the match window, same unit as `time`
    * @return one row per in-band (left, right) pair: all left columns
    *         plus the right columns prefixed `r_`
    */
  def withinBand(left: DataFrame, right: DataFrame, key: String,
                 time: String, band: Long): DataFrame = {
    require(band > 0, s"band must be positive, got $band")
    val lb = left.withColumn("_bucket", floor(col(time) / band))
    val rb = right
      .select(right.columns.toIndexedSeq.map(c => col(c).as(s"r_$c")): _*)
      .withColumn("_bucket",
        explode(array(Seq(-1, 0, 1).map(d =>
          floor(col(s"r_$time") / band) + d): _*)))
    lb.join(rb,
        lb("_bucket") === rb("_bucket") && lb(key) === rb(s"r_$key") &&
          abs(lb(time) - rb(s"r_$time")) <= band)
      .drop("_bucket").drop(s"r_$key")
  }

  /** Aggregated form: per left row, count and an aggregate over the
    * in-band right rows — left rows with NO match kept at zero (the
    * common "how many X happened near this Y" shape). `agg` sees the
    * `r_`-prefixed right columns. */
  def nearbyStats(left: DataFrame, right: DataFrame, key: String,
                  time: String, band: Long, leftId: String,
                  aggs: Seq[Column]): DataFrame = {
    val pairs = withinBand(left, right, key, time, band)
      .groupBy(col(leftId))
      .agg(count(lit(1)).as("n_nearby"), aggs: _*)
    left.join(pairs, Seq(leftId), "left")
      .withColumn("n_nearby", coalesce(col("n_nearby"), lit(0L)))
  }
}
