package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** In-engine training for linear probes — the missing half of the
  * [[Curation.hashedFeatures]]/[[Curation.linearScore]] pair
  * (reference analogue: the scoring side only, e.g. the static
  * result-classification weights in `TaskMonitor/s3_monitor_prepare.py`;
  * training always happened OUTSIDE engines like the reference's —
  * here it is a first-class distributed operator).
  *
  * The model is a linear probe over sparse INTEGER features — hashed
  * token presence ([[presenceFeatures]]), quantized embedding
  * coordinates ([[embeddingFeatures]]), or any (id, bucket, x) table —
  * trained by full-batch gradient descent on squared error (the LMS
  * rule) against SYMMETRIC ±1e6 µ-unit targets, classifying at 0.
  * Everything is integer:
  *
  *  - features x and weights w are BIGINT; a document's score is the
  *    order-free integer sum Σ x·w;
  *  - the update is `w_b -= grad_b / (lrDenom · n)` with JVM Long
  *    division (truncation toward zero — the operator DuckDB's `//`
  *    also applies), so a SQL oracle replays every step bit-for-bit
  *    and the result is independent of partitioning, because every
  *    distributed quantity is an order-free integer SUM.
  *
  * Scale shape (the part that matters at 100 TB): each step is two
  * map-side-combined aggregations over the persisted feature table —
  * a per-document score sum and a per-bucket gradient sum. The shuffle
  * carries at most |buckets| rows per partition for the gradient and
  * one row per document for the scores; the only driver state is the
  * bucket-count-sized weight vector (the same model-sized-state
  * position [[Similarity]]'s kmeansFit holds). Nothing all-pairs,
  * nothing row-iterative — `steps` sequential job pairs total.
  *
  * Stability: full-batch GD on 0.5·||Xw−y||²/n diverges when the step
  * exceeds 2/λmax(XᵀX/n), and λmax(XᵀX/n) ≤ trace(XᵀX/n) =
  * avg‖x‖² ≤ max‖x‖² — so the trainer measures max‖x‖² (one
  * aggregation) and REQUIRES `lrDenom ≥ max Σ x²`, which keeps the
  * descent contractive on any corpus with a factor-2 margin. An
  * overflow guard fails fast long before a Long could wrap
  * (LinearTrainerSpec exercises both guards).
  */
object LinearTrainer {

  private val M = 1000000L // µ-unit scale

  /** Weight-map size up to which the scoring pass inlines the model as
    * a `typedLit` map literal (plan-embedded, codegen'd `element_at`)
    * instead of a broadcast join — large enough for every probe-sized
    * model, small enough that plan serialization stays trivial. */
  private[graft] val MaxLiteralWeights = 1 << 16

  final case class StepMetric(step: Long, nCorrect: Long, sumAbsWU: Long)

  final case class TrainResult(weights: Map[Long, Long],
                               metrics: Seq[StepMetric], nDocs: Long)

  /** Hashed token-PRESENCE features: one (id, bucket, x=1) row per
    * distinct bucket a document's tokens hash into. Same md5-derived
    * bucket hash as [[Curation.hashedFeatures]] (portable to the SQL
    * oracle), binarized — bounded row norm ‖x‖² = distinct buckets per
    * document. One distinct (= one map-side-combined shuffle),
    * dimensionality fixed at `dim` regardless of vocabulary. */
  def presenceFeatures(df: DataFrame, id: String, text: Column,
                       dim: Int): DataFrame = {
    require(dim >= 1, "presenceFeatures needs dim >= 1")
    df.select(col(id), explode(split(text, "\\s+")).as("_tok"))
      .filter(col("_tok") =!= "")
      .select(col(id), (ApproxDedup.hash32(col("_tok")) % dim).as("bucket"))
      .distinct()
      .withColumn("x", lit(1L))
  }

  /** Quantized embedding-coordinate features: (id, bucket=1-based
    * coordinate, x=trunc(v·scale)) — the exact-arithmetic bridge from
    * float vectors to the integer trainer. float→double widening and
    * the double multiply are the same IEEE ops on every engine, and
    * both DuckDB's `trunc` and a JVM double→long cast truncate toward
    * zero, so the quantization replays bit-for-bit. Zero-valued
    * coordinates drop (they contribute nothing to scores or
    * gradients). Narrow map, no shuffle. */
  def embeddingFeatures(df: DataFrame, id: String, vec: Column,
                        scale: Long = 1000L): DataFrame = {
    require(scale >= 1, "embeddingFeatures needs scale >= 1")
    df.select(col(id), posexplode(vec.cast("array<double>")).as(Seq("_p", "_v")))
      .select(col(id), (col("_p") + 1).cast("long").as("bucket"),
        (col("_v") * scale).cast("long").as("x"))
      .filter(col("x") =!= 0L)
  }

  /** Symmetric µ-unit target column: +1e6 when `positive`, else −1e6
    * (the zero-threshold classification contract [[lmsTrain]] and
    * [[serve]] share). */
  def labelU(positive: Column): Column =
    when(positive, lit(M)).otherwise(lit(-M)).cast("long")

  /** Train the probe.
    *
    * @param feats   (id, bucket, x) sparse integer features
    * @param labels  (id, y_u) µ-unit targets — one row per document
    *                ([[labelU]]); documents with no feature rows score 0
    * @param steps   gradient steps (1..16 — each is two Spark jobs)
    * @param lrDenom step size 1/(lrDenom·n); must be ≥ max‖x‖²
    *                (measured — the 2/λmax stability bound)
    * @param initWeights starting model (default: the zero model) — the
    *                mini-batch/warm-start hook the streaming trainer
    *                folds batches through
    * @return final µ-unit weights (one entry per bucket OBSERVED in
    *         feats or carried by initWeights) plus `steps`+1
    *         metric rows: row t reports the weights BEFORE step t
    *         (step 1 = the initial model, step steps+1 = the final
    *         model) as (step, nCorrect at the ≥0 threshold, Σ|w| µ).
    */
  def lmsTrain(feats: DataFrame, labels: DataFrame, id: String,
               steps: Int, lrDenom: Long,
               initWeights: Map[Long, Long] = Map.empty): TrainResult = {
    require(steps >= 1 && steps <= 16,
      s"lmsTrain: steps must be in 1..16, got $steps (each step is a full corpus pass)")
    val spark = feats.sparkSession
    import spark.implicits._

    val lvl = StorageLevel.MEMORY_AND_DISK
    val f = feats.select(col(id).as("_id"), col("bucket").cast("long").as("_b"),
        col("x").cast("long").as("_x"))
      .persist(lvl)
    val y = labels.select(col(id).as("_id"), col("y_u").cast("long").as("_y"))
      .persist(lvl)
    val n = y.count()
    require(n > 0, "lmsTrain: empty label table")
    // one-pass data-dependent guards: the stability bound needs the max
    // row norm, the overflow bound the max coordinate magnitude
    val bounds = f.groupBy(col("_id"))
      .agg(sum(col("_x") * col("_x")).as("rn"), max(abs(col("_x"))).as("mx"))
      .agg(max(col("rn")).cast("long"), max(col("mx")).cast("long")).collect()(0)
    val maxRowNorm2 = bounds.getLong(0)
    val maxAbsX = math.max(bounds.getLong(1), 1L)
    require(lrDenom >= maxRowNorm2,
      s"lmsTrain: lrDenom=$lrDenom < max row norm² $maxRowNorm2 — the LMS step " +
        "would exceed the 2/λmax stability bound")

    var w = initWeights
    val metrics = Seq.newBuilder[StepMetric]
    var step = 1
    while (step <= steps + 1) {
      // per-document µ-unit score under the current weights; documents
      // with no features (or only zero-weight buckets) score 0. The
      // model is driver-resident by contract, so the weight lookup
      // rides the scoring aggregation as a MAP LITERAL instead of a
      // per-step broadcast join — one fewer exchange and one fewer
      // broadcast-build job per step (round-16, guide §2.4); a model
      // past the literal bound keeps the broadcast-join path.
      val sums =
        if (w.sizeIs <= MaxLiteralWeights) {
          val wExpr =
            if (w.isEmpty) lit(0L)
            else coalesce(element_at(typedLit(w), col("_b")), lit(0L))
          f.groupBy(col("_id"))
            .agg(sum(col("_x") * wExpr).cast("long").as("_s"))
        } else
          f.join(broadcast(w.toSeq.toDF("_b", "_w")), Seq("_b"), "left")
            .groupBy(col("_id"))
            .agg(sum(col("_x") * coalesce(col("_w"), lit(0L)))
              .cast("long").as("_s"))
      val scored = y.join(sums, Seq("_id"), "left")
        .select(col("_id"), col("_y"),
          coalesce(col("_s"), lit(0L)).as("_s"))
        .withColumn("_e", col("_s") - col("_y"))
        .persist(lvl)
      // ONE action per step (round-16, guide §1.2): the step metrics
      // and the per-bucket gradient union into a single collect over
      // the persisted scored frame — metric rows carry null _b/_g,
      // gradient rows null _nc/_me. The old shape paid two sequential
      // actions per step; the overflow guard below still aborts before
      // any gradient value is USED, so a wrapped sum never escapes.
      val metricRow = scored.agg(
          sum(when((col("_s") >= 0L) === (col("_y") >= 0L), 1L)
            .otherwise(0L)).cast("long").as("_nc"),
          max(abs(col("_e"))).cast("long").as("_me"))
        .select(lit(null).cast("long").as("_b"),
          lit(null).cast("long").as("_g"), col("_nc"), col("_me"))
      val rows =
        (if (step <= steps)
          // per-bucket gradient of 0.5·Σ(s−y)² — one map-side-combined agg
          f.join(scored.select(col("_id"), col("_e")), Seq("_id"))
            .groupBy(col("_b"))
            .agg(sum(col("_x") * col("_e")).cast("long").as("_g"))
            .select(col("_b"), col("_g"),
              lit(null).cast("long").as("_nc"),
              lit(null).cast("long").as("_me"))
            .unionByName(metricRow)
        else metricRow).collect()
      val m = rows.find(!_.isNullAt(2)).get
      val maxAbsErr = m.getLong(3)
      // a per-bucket gradient sums ≤ n terms of |x·e|; fail fast while
      // the sum still fits with an order of magnitude to spare
      require(maxAbsErr <= Long.MaxValue / math.max(n, 1L) / maxAbsX / 8L,
        s"lmsTrain: step $step error magnitude $maxAbsErr risks gradient overflow " +
          s"at n=$n, max|x|=$maxAbsX — lower steps or raise lrDenom")
      metrics += StepMetric(step.toLong, m.getLong(2),
        w.valuesIterator.map(math.abs).sum)
      if (step <= steps) {
        // the step divisor itself can wrap: lrDenom ≥ max row norm²
        // (2^20 in the shipped config) times a multi-trillion n flips
        // the product negative and the update silently changes SIGN —
        // fail fast like the gradient guard above
        require(lrDenom <= Long.MaxValue / math.max(n, 1L),
          s"lmsTrain: lrDenom=$lrDenom * n=$n overflows the Long step divisor" +
            " — shrink the batch or lower lrDenom")
        val div = lrDenom * n // JVM truncated division == DuckDB `//`
        // merge, don't replace: warm-start buckets absent from this
        // feature table keep their weight (mini-batch fold contract)
        w = w ++ rows.iterator.filter(_.isNullAt(2)).map { r =>
          val b = r.getLong(0)
          b -> (w.getOrElse(b, 0L) - r.getLong(1) / div)
        }
      }
      scored.unpersist()
      step += 1
    }
    f.unpersist(); y.unpersist()
    TrainResult(w, metrics.result(), n)
  }

  /** The metrics table as a DataFrame: (step, n_correct, sum_abs_w_u). */
  def metricsDf(spark: SparkSession, result: TrainResult): DataFrame = {
    import spark.implicits._
    result.metrics.map(s => (s.step, s.nCorrect, s.sumAbsWU))
      .toDF("step", "n_correct", "sum_abs_w_u")
  }

  /** Serve the trained probe over a prepared feature table: (id,
    * score_u, pred) for EVERY id in `ids` (featureless ids score 0;
    * pred = 1 iff score ≥ 0). One broadcast join against the
    * model-sized weight table + one per-document sum — the exact
    * [[Curation.linearScore]] shape: codegen-friendly, one row per
    * document on the shuffle. */
  def serve(ids: DataFrame, feats: DataFrame, id: String,
            weights: Map[Long, Long]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    val wDf = weights.toSeq.toDF("_b", "_w")
    val sums = feats
      .select(col(id), col("bucket").cast("long").as("_b"),
        col("x").cast("long").as("_x"))
      .join(broadcast(wDf), Seq("_b"), "left")
      .groupBy(col(id))
      .agg(sum(col("_x") * coalesce(col("_w"), lit(0L))).cast("long").as("_s"))
    ids.select(col(id)).join(sums, Seq(id), "left")
      .select(col(id), coalesce(col("_s"), lit(0L)).as("score_u"))
      .withColumn("pred",
        when(col("score_u") >= 0L, 1L).otherwise(0L).cast("long"))
  }

  /** Decision-threshold calibration in ONE pass: accuracy of
    * `score_u ≥ thr` against the ±µ-unit targets for every candidate
    * threshold. The serving-threshold sweep every deployed quality
    * filter needs (precision/recall trade is monotone in thr for a
    * fixed scorer) — explode is a narrow ×|thresholds| map and the
    * aggregate returns |thresholds| rows, so corpus cost is one scan
    * regardless of how many thresholds are probed.
    *
    * @param scored (id, score_u, y_u) — [[serve]] output joined back
    *               to its labels
    * @return (thr_u, n_correct) per threshold */
  def calibrate(scored: DataFrame, id: String,
                thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty, "calibrate: need at least one threshold")
    scored
      .select(col(id), col("score_u").cast("long").as("_s"),
        col("y_u").cast("long").as("_y"),
        explode(array(thresholds.map(lit(_)): _*)).as("thr_u"))
      .groupBy(col("thr_u"))
      .agg(sum(when((col("_s") >= col("thr_u")) === (col("_y") >= 0L), 1L)
        .otherwise(0L)).cast("bigint").as("n_correct"))
  }
}
