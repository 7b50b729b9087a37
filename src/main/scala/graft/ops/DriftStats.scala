package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-drift gates over COUNT TABLES — the token/length analogue of
  * the embedding drift gates ([[Similarity.driftReport]], q124/q134):
  * given a persisted ledger summary and a landing batch's summary of
  * the same shape, report the per-group L1 distance between their
  * normalized distributions and a shifted/stable verdict. Composes
  * with every ledger family that stores counts: the log₂ histogram
  * ledger ([[Distribution.logHistogram]] — length drift), the MG
  * frequency sketch ([[FreqItems.sketch]] — vocabulary drift), the
  * gram histogram, the HLL profile's count columns.
  *
  * Integer-exact contract: per-side shares are `n·1e6 div total`
  * (floor ppm), the distance is Σ|share_a − share_b| over the key
  * union (missing key = share 0), and the verdict threshold compares
  * ppm integers — no FP normalization anywhere, so the DuckDB oracle
  * replays the gate bit-for-bit. The floor loses < 1 ppm per key —
  * negligible against any drift threshold worth alerting on.
  *
  * Scale shape: both inputs are summary tables (buckets / sketch
  * entries / vocab rows — metadata-sized, never the corpus), the join
  * is keyed on (group, key), and the output is one row per group. The
  * gate itself never scans the corpus; that is the point of running it
  * over ledgers.
  */
object DriftStats {

  /** Per-group L1 drift (ppm) between two (groupCols..., `keyCol`,
    * n) count tables. Output: (groupCols..., l1_ppm, n_a, n_b,
    * verdict) where n_a/n_b are the sides' total counts and verdict is
    * 'shifted' when l1_ppm > thresholdPpm. Groups present on only one
    * side drift maximally (every share compares against 0). */
  def l1Drift(a: DataFrame, b: DataFrame, groupCols: Seq[String],
              keyCol: String, thresholdPpm: Long): DataFrame = {
    require(thresholdPpm >= 0, "thresholdPpm must be >= 0")
    def shares(df: DataFrame, side: String): DataFrame = {
      val w = Window.partitionBy(groupCols.map(col): _*)
      df.select(groupCols.map(col) :+ col(keyCol) :+
          col("n").cast("bigint").as("cnt"): _*)
        .withColumn("tot", sum(col("cnt")).over(w))
        // overflow guard: cnt ≤ tot, and cnt·1e6 wraps Long past
        // ~9.2e12 — fail FAST on a group total beyond 2^43 (~8.8e12)
        // instead of gating on a wrapped share (pre-aggregate such
        // ledgers into coarser keys, or scale counts down upstream)
        .select(groupCols.map(col) :+ col(keyCol) :+
          expr("CASE WHEN tot > CAST(8796093022208 AS BIGINT) THEN " +
            "raise_error(CONCAT('l1Drift: group total ', CAST(tot AS " +
            "STRING), ' overflows the ppm-share arithmetic')) " +
            "ELSE cnt * 1000000 div tot END").as(s"sh_$side") :+
          col("tot").as(s"tot_$side"): _*)
    }
    val joined = shares(a, "a")
      .join(shares(b, "b"), groupCols :+ keyCol, "full_outer")
    joined
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(abs(coalesce(col("sh_a"), lit(0L))
          - coalesce(col("sh_b"), lit(0L)))).as("l1_ppm"),
        max(coalesce(col("tot_a"), lit(0L))).as("n_a"),
        max(coalesce(col("tot_b"), lit(0L))).as("n_b"))
      .withColumn("verdict",
        when(col("l1_ppm") > thresholdPpm, lit("shifted"))
          .otherwise(lit("stable")))
  }
}
