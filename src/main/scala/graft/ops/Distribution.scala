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
    // mirrors exactQuantiles: q > 1e6 would push rank past total and
    // silently DROP the (group, q) row; q <= 0 would serve the minimum
    require(qPpm.nonEmpty && qPpm.forall(q => q >= 1 && q <= 1000000),
      "quantiles are ppm in [1, 1000000]")
    val gCols = groupCols.map(col)
    val wCum = Window.partitionBy(gCols: _*).orderBy(col("bucket"))
    val wAll = Window.partitionBy(gCols: _*)
    hist
      .withColumn("cum", sum(col("n")).over(wCum))
      .withColumn("total", sum(col("n")).over(wAll))
      .withColumn("q_ppm", explode(array(qPpm.map(lit): _*)))
      // overflow guard: total·q_ppm wraps Long past ~9.2e12 rows in a
      // group — fail fast instead of probing a wrapped rank
      .withColumn("rank",
        expr("CASE WHEN total > CAST(8796093022208 AS BIGINT) THEN " +
          "raise_error(CONCAT('quantilesFromHistogram: group total ', " +
          "CAST(total AS STRING), ' overflows the rank arithmetic')) " +
          "ELSE (total * q_ppm + 999999) div 1000000 END"))
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

  /** EXACT distributed quantile selection — the complement to the
    * factor-2 histogram serving when a pipeline gate needs the true
    * value (median length cutoffs, exact p99 shard budgets): iterative
    * 64-ary range narrowing (the classic distributed selection
    * algorithm — a multi-way binary search on the VALUE domain, not a
    * global sort). Each pass runs ONE job for every (group, quantile)
    * still open: the driver's state table (group, q, lo, hi) —
    * model-sized, |groups|·|qs| rows — broadcast-joins onto the rows,
    * each row buckets into one of `fanout` equal-width bins of its
    * group's remaining range, and the ≤ fanout·|states| bin counts
    * come back to the driver to narrow every range at once. Ranges
    * shrink fanout× per pass, so 64-bit longs converge in ≤ ⌈64/6⌉=11
    * passes — each pass a scan + a model-sized shuffle, NEVER a global
    * sort of the corpus. Result: the rank-⌈q·n/1e6⌉ smallest value
    * per group (1-based, duplicates counted), integer-exact.
    *
    * Contract: `value` must be long-typed with a group range narrower
    * than 2^63 (asserted) — the bin arithmetic stays in Long. */
  /** Robust per-group outlier profile via the median/MAD rule
    * (Hampel identifier — Davies & Gather, JASA 1993): med = the
    * group's exact lower median, mad = the exact lower median of
    * |v − med|, threshold = med + mult·mad; returns one row per group
    * (groupCols..., med, mad, threshold, n, n_outliers, max_v). Unlike
    * mean/stddev flagging, a burst cannot drag the baseline up to hide
    * itself — both estimators have a 50% breakdown point.
    *
    * Built by composing [[exactQuantiles]] (q = 500000 ppm is the
    * lower median under its ceil-rank contract) twice: once on values,
    * once on the broadcast-joined absolute deviations — three passes
    * over the (already aggregated) input, driver state model-sized,
    * never a global sort. Integer-exact end to end, so a DuckDB
    * oracle replays it by window-ranked median selection. */
  def madOutliers(df: DataFrame, groupCols: Seq[String], value: Column,
                  mult: Long = 3L): DataFrame = {
    require(mult >= 1, s"mult must be >= 1: $mult")
    val g = groupCols.map(col)
    val base = df.select(g :+ value.cast("long").as("v"): _*)
    val med = exactQuantiles(base, groupCols, col("v"), Seq(500000L))
      .select(g :+ col("v").as("med"): _*)
    val dev = base.join(broadcast(med), groupCols)
      .withColumn("d", abs(col("v") - col("med")))
    val mad = exactQuantiles(dev, groupCols, col("d"), Seq(500000L))
      .select(g :+ col("v").as("mad"): _*)
    base.join(broadcast(med), groupCols).join(broadcast(mad), groupCols)
      .withColumn("threshold", col("med") + lit(mult) * col("mad"))
      .groupBy(g: _*)
      .agg(max(col("med")).as("med"), max(col("mad")).as("mad"),
        max(col("threshold")).as("threshold"),
        count(lit(1)).as("n"),
        sum(when(col("v") > col("threshold"), 1L).otherwise(0L))
          .as("n_outliers"),
        max(col("v")).as("max_v"))
  }

  def exactQuantiles(df: DataFrame, groupCols: Seq[String], value: Column,
                     qPpm: Seq[Long], fanout: Int = 64,
                     maxPasses: Int = 16): DataFrame = {
    require(fanout >= 2, "fanout must be >= 2")
    require(qPpm.nonEmpty && qPpm.forall(q => q >= 1 && q <= 1000000),
      "quantiles are ppm in [1, 1000000]")
    val spark = df.sparkSession
    import spark.implicits._

    val gCols = groupCols.map(col)
    val base = df.filter(value.isNotNull)
      .select(gCols :+ value.cast("long").as("v"): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // driver-state join key: \u0001-separated, null-sentineled - no
    // concatenation ambiguity between ("a","bc") and ("ab","c"), no
    // null collision with a real string
    val gKey =
      if (groupCols.isEmpty) lit("")
      else concat_ws("\u0001", gCols.map(c =>
        coalesce(c.cast("string"), lit("\u0000null"))): _*)

    // pass 0: per-group count + min/max seeds every (group, q) state
    val seeds = base
      .groupBy(gCols: _*)
      .agg(count(lit(1)).as("n"), min(col("v")).as("lo"), max(col("v")).as("hi"))
      .withColumn("gk", gKey)
      .collect()

    // state: gk -> (groupRow, q -> (lo, hi, rank-within-range))
    final case class St(var lo: Long, var hi: Long, var r: Long)
    val groupsOf = scala.collection.mutable.LinkedHashMap.empty[String,
      (org.apache.spark.sql.Row, scala.collection.mutable.LinkedHashMap[Long, St])]
    seeds.foreach { row =>
      val n = row.getAs[Long]("n")
      val lo = row.getAs[Long]("lo")
      val hi = row.getAs[Long]("hi")
      require(BigInt(hi) - BigInt(lo) < (BigInt(1) << 62),
        s"exactQuantiles: group range [$lo, $hi] too wide for Long bins")
      require(n <= (1L << 43),
        s"exactQuantiles: group row count $n overflows the ppm rank " +
          "arithmetic — pre-partition the group")
      val qs = scala.collection.mutable.LinkedHashMap(qPpm.map { q =>
        q -> St(lo, hi, (n * q + 999999L) / 1000000L)
      }: _*)
      groupsOf(row.getAs[String]("gk")) = (row, qs)
    }

    var passes = 0
    def open: Seq[(String, Long, St)] = groupsOf.iterator.flatMap {
      case (gk, (_, qs)) => qs.iterator.collect {
        case (q, st) if st.lo < st.hi => (gk, q, st)
      }
    }.toSeq

    try {
    while (open.nonEmpty) {
      passes += 1
      require(passes <= maxPasses,
        s"exactQuantiles failed to converge in $maxPasses passes")
      val states = open.map { case (gk, q, st) =>
        val width = ((BigInt(st.hi) - st.lo + fanout) / fanout).toLong.max(1L)
        (gk, q, st.lo, st.hi, width)
      }
      val stDf = states.toDF("gk", "q_ppm", "lo", "hi", "w")
      // one job narrows EVERY open (group, quantile) range
      val bins = base
        .withColumn("gk", gKey)
        .join(broadcast(stDf), "gk")
        .filter(col("v") >= col("lo") && col("v") <= col("hi"))
        .groupBy(col("gk"), col("q_ppm"),
          expr("(v - lo) div w").as("bin")) // integer div — never FP
        .agg(count(lit(1)).as("n"))
        .collect()
        .groupBy(r => (r.getAs[String]("gk"), r.getAs[Long]("q_ppm")))
      states.foreach { case (gk, q, lo, hi, w) =>
        val st = groupsOf(gk)._2(q)
        val byBin = bins((gk, q))
          .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("n"))
          .sortBy(_._1)
        var cum = 0L
        val it = byBin.iterator
        var found = false
        while (!found && it.hasNext) {
          val (b, n) = it.next()
          if (cum + n >= st.r) {
            st.r -= cum
            st.lo = lo + b * w
            st.hi = math.min(hi, lo + (b + 1) * w - 1)
            found = true
          } else cum += n
        }
        assert(found, s"exactQuantiles: rank ${st.r} exceeds range count")
      }
    }
    } finally base.unpersist() // no orphaned cache, also on a failed pass

    val rows = groupsOf.values.flatMap { case (row, qs) =>
      qs.map { case (q, st) =>
        org.apache.spark.sql.Row.fromSeq(
          groupCols.indices.map(row.get) ++ Seq(q, st.lo))
      }
    }.toSeq
    val schema = org.apache.spark.sql.types.StructType(
      groupCols.indices.map(i =>
        org.apache.spark.sql.types.StructField(groupCols(i),
          seeds.headOption.map(_.schema(i).dataType)
            .getOrElse(org.apache.spark.sql.types.StringType)))
      ++ Seq(
        org.apache.spark.sql.types.StructField("q_ppm",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }
}
