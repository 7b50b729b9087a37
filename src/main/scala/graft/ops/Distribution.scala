package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable value-distribution profiles: log₂-bucket histograms with
  * quantile serving — the distribution analogue of the engine's HLL
  * cardinality ledger ([[Cardinality]]).
  *
  * Why not `approx_percentile` alone: its sketch lives inside one
  * query — it cannot be PERSISTED as a table, summed incrementally
  * when a landing batch arrives, or served without re-scanning the
  * corpus. A log₂ histogram is a plain (group, bucket, n) table:
  * merging is `sum(n)` (associative, commutative, deterministic under
  * any merge order — the strongest mergeability class), an incremental
  * refresh adds the batch's histogram rows, and any quantile is a
  * cumulative-sum probe over ≤64 rows per group. The price is
  * resolution: a quantile estimate is the crossed bucket's lower bound
  * 2^b, within 2× of the true value (within-factor-2 relative error —
  * DistributionSpec pins it). For the pipeline's use — length/size
  * drift gates, shard-balance reports — factor-2 banding at zero
  * re-scan cost is the right trade at 100 TB.
  *
  * Integer-exact contract: the bucket of v>0 is `length(bin(v)) - 1`
  * (= floor(log2(v)) computed on the BIT REPRESENTATION, never
  * floating-point log — boundary values like 1024 can round either way
  * in FP log2); v ≤ 0 buckets to -1; estimates are `1 << b` computed
  * in BIGINT. Every step replays bit-for-bit in the DuckDB oracle.
  */
object Distribution {

  /** Integer-exact log₂ bucket: -1 for v ≤ 0, else floor(log2(v)) via
    * the binary-string length (no floating-point boundary risk). */
  def log2Bucket(v: Column): Column =
    when(v <= 0, lit(-1L))
      .otherwise((length(bin(v.cast("long"))) - 1).cast("long"))

  /** Per-group log₂ histogram: (groupCols..., bucket, n). One
    * map-side-combined aggregation; ≤65 rows per group however large
    * the corpus. Null values are excluded (no bucket). */
  def logHistogram(df: DataFrame, groupCols: Seq[String],
                   value: Column): DataFrame =
    df.filter(value.isNotNull)
      .groupBy(groupCols.map(col) :+ log2Bucket(value).as("bucket"): _*)
      .agg(count(lit(1)).as("n"))

  /** Merge histogram tables (union of [[logHistogram]] outputs /
    * ledger rows): plain re-sum per (group, bucket) — the incremental
    * refresh primitive. */
  def mergeHistograms(hists: Seq[DataFrame],
                      groupCols: Seq[String]): DataFrame =
    hists.reduce(_.unionByName(_))
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(sum(col("n")).as("n"))

  /** Quantile estimates served from a histogram table: for each
    * requested ppm-quantile q, the LOWER BOUND 2^b of the first bucket
    * whose cumulative count reaches rank = ceil(q·total/1e6)
    * (integer arithmetic throughout). Output: (groupCols..., q_ppm,
    * qbucket, est). The windows run over ≤65 rows per group. */
  def quantilesFromHistogram(hist: DataFrame, groupCols: Seq[String],
                             qPpm: Seq[Long]): DataFrame = {
    val gCols = groupCols.map(col)
    val wCum = Window.partitionBy(gCols: _*).orderBy(col("bucket"))
    val wAll = Window.partitionBy(gCols: _*)
    hist
      .withColumn("cum", sum(col("n")).over(wCum))
      .withColumn("total", sum(col("n")).over(wAll))
      .withColumn("q_ppm", explode(array(qPpm.map(lit): _*)))
      .withColumn("rank",
        expr("(total * q_ppm + 999999) div 1000000"))
      .filter(col("cum") >= col("rank"))
      .groupBy(gCols :+ col("q_ppm"): _*)
      .agg(min(col("bucket")).as("qbucket"))
      .withColumn("est", when(col("qbucket") < 0, lit(0L))
        .otherwise(expr("shiftleft(CAST(1 AS BIGINT), CAST(qbucket AS INT))")))
  }

  /** One-call profile: histogram + quantiles over raw rows. */
  def quantiles(df: DataFrame, groupCols: Seq[String], value: Column,
                qPpm: Seq[Long]): DataFrame =
    quantilesFromHistogram(logHistogram(df, groupCols, value),
      groupCols, qPpm)
}
