package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.sinks.Sinks

/** Streaming maintainer for a TRAINED linear-probe weight ledger — the
  * online half of [[graft.ops.LinearTrainer]]: each landing batch of
  * labeled examples applies ONE integer-exact mini-batch LMS step to
  * the persisted weights, so the quality probe keeps learning as data
  * lands without ever revisiting history.
  *
  * Exactly-once is harder here than for the count ledgers
  * ([[LmStream]]): a gradient step is neither idempotent nor
  * commutative — it READS the model it updates, so replaying a crashed
  * batch against half-updated weights would compute a DIFFERENT
  * gradient and diverge from the one-shot trajectory. Three composed
  * properties restore convergence:
  *
  *  1. **Previous-value weight rows.** Every row carries
  *     (w, w_prev, last_epoch); a step writes w_new, keeps the
  *     pre-step value in w_prev, and stamps the epoch. The EFFECTIVE
  *     weight a batch trains against is `w_prev` when
  *     `last_epoch ≥ epoch` (a crashed attempt of THIS epoch already
  *     bumped the row) else `w` — so a replay recomputes the gradient
  *     against exactly the pre-step model, bit-for-bit.
  *  2. **Epoch-guarded updates.** A row with `last_epoch ≥ epoch`
  *     keeps its (w, w_prev) — and because rule 1 makes the recomputed
  *     update deterministic, rows the crashed attempt DID bump already
  *     hold precisely the value the replay would write.
  *  3. **Epoch-filtered novelty** (the [[LmStream]] rule): the
  *     landed-ids ledger drops queue redeliveries in LATER epochs
  *     while ids landed by a crashed attempt of the current epoch
  *     still count as novel — so the batch (and its size n, which
  *     scales the step) is identical on every replay.
  *
  * Either store may crash mid-upsert in any order; the replay
  * converges byte-for-byte (TrainStreamSpec drives the matrix and
  * pins the stream against the driver-side mini-batch fold).
  *
  * Scale shape (round-15): per batch, one stability-guard aggregation
  * and two map-side-combined aggregations over the BATCH's features
  * (scores, gradient), one scan of the model-sized weight ledger, and
  * a BOUNDED landed-ids probe — the docs ledger is TWO TIERS, a
  * bucketed store probed by the batch ids' buckets with the ids pushed
  * as a bloom-served In filter ([[Sinks.probePartitioned]]) plus at
  * most [[FoldEvery]] recent append-only epoch dirs, so per-batch
  * novelty I/O opens f(batch buckets + FoldEvery) files whatever the
  * corpus (the round-14 verdict's asymptote flag; LedgerProbeSpec pins
  * opens flat under a 10× ledger). Every [[FoldEvery]] epochs the
  * aged epoch dirs FOLD into the bucketed tier — an LSM level-0→1
  * merge: write cost amortizes to O(ledger/FoldEvery) per batch of
  * distributed (not serving-path) work, the cadence knob trading
  * write amplification against probe fan-in. The model never collects
  * to the driver; the step is one declarative plan. Writes are the
  * hash-partitioned staged upsert ([[Sinks.upsertPartitioned]]).
  *
  * @param id        example id column name
  * @param featurize batch → (id, bucket, x) sparse integer features
  *                  (e.g. [[graft.ops.LinearTrainer.embeddingFeatures]])
  * @param label     µ-unit target expression over the batch (±1e6 —
  *                  [[graft.ops.LinearTrainer.labelU]])
  * @param lrDenom   step size 1/(lrDenom·n_batch); each batch measures
  *                  max‖x‖² and requires lrDenom ≥ it (2/λmax bound)
  * @param docBuckets landed-ids bucketed-tier geometry at creation
  *                  (existing stores keep their marker's count)
  */
final case class TrainStream(id: String, featurize: DataFrame => DataFrame,
                             label: Column, lrDenom: Long,
                             docBuckets: Int = 8) {

  private def wDir(root: String) = s"$root/tr_weights"
  private def docsDir(root: String) = s"$root/tr_docs"

  private val WSchema = StructType.fromDDL(
    "b BIGINT, w BIGINT, w_prev BIGINT, last_epoch BIGINT")

  /** Read a ledger store that may legitimately be empty (no bootstrap:
    * training starts from the zero model). */
  private def readLedger(spark: SparkSession, dir: String,
                         emptySchema: StructType): DataFrame = {
    Sinks.recoverPartitioned(dir)
    if (Sinks.listBuckets(dir).isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], emptySchema)
    else Sinks.readPartitioned(spark, dir)
  }

  /** The landed-ids ledger is APPEND-ONLY by construction — only novel
    * ids ever land — so it skips the staged keyed merge entirely: each
    * epoch writes ONE `eNNNNNNNNN` directory (mode overwrite, so a
    * replayed or crashed attempt just rewrites its own dir; duplicate
    * ids across attempts would be harmless to the novelty anti-join
    * anyway). One write job instead of a localCheckpoint + bucket
    * probe + staged merge per batch. */
  private def appendDocs(ids: DataFrame, epoch: Long, root: String): Unit =
    ids.write.mode("overwrite").parquet(f"${docsDir(root)}/e$epoch%09d")

  /** Epoch-dir fold cadence AND the recent-tier cap: once this many
    * completed `e\d{9}` dirs predate the current epoch they fold into
    * the bucketed tier, so the per-batch novelty probe unions at most
    * this many epoch dirs on top of the batch's buckets. */
  private val FoldEvery = 16

  /** The completed (`_SUCCESS`-marked) epoch directories below
    * `uptoExclusive` — a crashed attempt's partial dir is invisible
    * until its replay overwrites it. */
  private def completedEpochDirs(spark: SparkSession, root: String,
                                 uptoExclusive: Long)
      : Seq[org.apache.hadoop.fs.Path] = {
    val p = new org.apache.hadoop.fs.Path(docsDir(root))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    val ERe = "^e(\\d{9})$".r
    fs.listStatus(p).toSeq.flatMap { st =>
      st.getPath.getName match {
        case ERe(e) if st.isDirectory && e.toLong < uptoExclusive &&
            fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")) =>
          Some(st.getPath)
        case _ => None
      }
    }.sortBy(_.getName)
  }

  /** The landed-before-`epoch` ids that can possibly collide with the
    * batch — the BOUNDED two-tier read: the bucketed tier opens only
    * the batch ids' buckets (ids pushed, blooms skip pages; a ledger
    * written by the PRE-round-13 all-bucketed layout serves from this
    * tier unchanged — its markers are the same store's), and the
    * recent tier is ≤ [[FoldEvery]] epoch dirs by the fold invariant.
    * An id can appear in BOTH tiers after a crashed fold (upsert
    * landed, deletes didn't) — harmless: the semi/anti joins above it
    * are duplicate-insensitive, and the next fold re-merges it
    * idempotently (same key, same row). */
  private def readDocsFor(spark: SparkSession, root: String,
                          batchIds: DataFrame, epoch: Long,
                          emptySchema: StructType): DataFrame = {
    val bucketTier = Sinks.probePartitioned(spark, docsDir(root), batchIds,
      emptySchema)
    val recent = completedEpochDirs(spark, root, uptoExclusive = Long.MaxValue)
    val recentTier =
      if (recent.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], emptySchema)
      else spark.read.schema(emptySchema)
        .parquet(recent.map(_.toString): _*)
    bucketTier.unionByName(recentTier)
  }

  /** LSM level-0→1 fold: once [[FoldEvery]] completed epoch dirs
    * predate `epoch`, merge their rows into the bucketed tier and
    * delete them. Runs AFTER the epoch's own stores landed; the
    * current epoch's dir is never folded, so a checkpoint replay of
    * this epoch still sees its own crashed-attempt ids as novel (the
    * exactly-once rule 3) and rewrites its dir cleanly. Crash safety:
    * upsert-then-delete — a crash between the two leaves ids in both
    * tiers, which the probe contract tolerates (duplicate-insensitive
    * joins) and the next fold clears. */
  private def foldDocs(spark: SparkSession, root: String, epoch: Long,
                       emptySchema: StructType): Unit = {
    val aged = completedEpochDirs(spark, root, uptoExclusive = epoch)
    if (aged.size < FoldEvery) return
    val rows = spark.read.schema(emptySchema)
      .parquet(aged.map(_.toString): _*)
    Sinks.upsertPartitioned(rows, Seq(id), docsDir(root),
      nBuckets = docBuckets)
    val fs = new org.apache.hadoop.fs.Path(docsDir(root))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    aged.foreach(d => fs.delete(d, true))
  }

  /** Apply one mini-batch step at `epoch`. Public so the crash-matrix
    * spec can drive replays and redeliveries without a stream.
    *
    * Per-batch job shape (round-13, TrainJobCountSpec pins it): the
    * novelty anti-join's count doubles as the empty-batch check; the
    * stability bound (max row norm²) RIDES the scoring aggregation
    * instead of its own scan (one persisted per-id pass yields score
    * and norm together, the fused-probe pattern applyOps uses); and
    * the model-sized frames (effective weights, per-id errors, current
    * ledger) join with explicit broadcast hints so no shuffle stage —
    * and no AQE stage-job — materializes for them. */
  def processBatch(batch: DataFrame, epoch: Long, root: String): Unit = {
    val spark = batch.sparkSession
    // AQE off for the step, restored after: every frame in this plan
    // is model- or micro-batch-sized with its joins ALREADY broadcast
    // by hint, so runtime re-planning cannot improve a stage — but it
    // materializes each query stage as its own scheduler job, tripling
    // the per-batch job count a high-frequency trainer pays
    // (TrainJobCountSpec pins the count; Spark itself disables AQE
    // inside streaming plans — foreachBatch bodies are where it
    // sneaks back). The toggle is session-global, so it runs under
    // the process-wide [[SessionConfGate]]: two maintainers sharing a
    // session must not interleave set/restore. Micro-batch shuffle
    // sizing rides along — with AQE off, the session's corpus-scale
    // partition count would run each batch-sized aggregation as
    // mostly-empty tasks.
    SessionConfGate.withMicroBatchConf(spark) {
      processBatchInner(batch, epoch, root)
    }
  }

  private def processBatchInner(batch: DataFrame, epoch: Long,
                                root: String): Unit = {
    val spark = batch.sparkSession
    val docsSchema = StructType(Seq(batch.schema(id),
      StructField("epoch", LongType)))
    // novelty, shuffle-free at any ledger size (the LmStream
    // decomposition): the corpus-growing docs ledger streams MAP-SIDE
    // through a semi-join against the broadcast batch ids, and the
    // batch anti-joins the batch-sized hit set — no Exchange, no
    // distinct (semi/anti are duplicate-insensitive). Round-15: the
    // scan is BOUNDED too — two-tier probe, f(batch buckets +
    // FoldEvery) opens whatever the ledger size
    val landedBefore = readDocsFor(spark, root, batch.select(col(id)),
        epoch, docsSchema)
      .filter(col("epoch") < epoch).select(col(id))
    val landedHit = landedBefore
      .join(broadcast(batch.select(col(id))), Seq(id), "left_semi")
    val novel = batch.join(broadcast(landedHit), Seq(id), "left_anti")
      .localCheckpoint() // feeds n, feats, labels across the store swap
    val n = novel.count() // 0 covers the empty-batch case too
    if (n == 0) return
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val feats = featurize(novel)
      .select(col(id), col("bucket").cast("long").as("_b"),
        col("x").cast("long").as("_x"))
      .persist(lvl)
    var sums: DataFrame = null
    try {
    val cur = readLedger(spark, wDir(root), WSchema)
    // rule 1: the model this batch trains against (model-sized —
    // broadcast, never shuffled)
    val eff = cur.select(col("b").as("_b"),
      when(col("last_epoch") >= epoch, col("w_prev")).otherwise(col("w"))
        .as("_we"))
    // ONE per-id pass: score AND row norm² (the stability bound) —
    // the left join preserves every feature row exactly once (the
    // ledger is unique per bucket), so the fused norm equals the
    // dedicated scan it replaces
    sums = feats.join(broadcast(eff), Seq("_b"), "left")
      .groupBy(col(id))
      .agg(sum(col("_x") * coalesce(col("_we"), lit(0L))).cast("long").as("_s"),
        sum(col("_x") * col("_x")).cast("long").as("_rn"))
      .persist(lvl)
    val maxRowNorm2 = sums
      .agg(coalesce(max(col("_rn")), lit(0L)).cast("long"))
      .collect()(0).getLong(0)
    require(lrDenom >= maxRowNorm2,
      s"TrainStream: lrDenom=$lrDenom < max row norm² $maxRowNorm2 at epoch " +
        s"$epoch — the LMS step would exceed the 2/λmax stability bound")

    val errs = novel.select(col(id), label.cast("long").as("_y"))
      .join(sums, Seq(id), "left")
      .select(col(id), (coalesce(col("_s"), lit(0L)) - col("_y")).as("_e"))
    val grad = feats.join(broadcast(errs), Seq(id))
      .groupBy(col("_b"))
      .agg(sum(col("_x") * col("_e")).cast("long").as("_g"))
    // rules 1+2 applied per touched row; untouched rows never rewrite
    require(lrDenom <= Long.MaxValue / math.max(n, 1L),
      s"TrainStream: lrDenom=$lrDenom * n=$n overflows the Long step divisor" +
        " at epoch " + epoch + " — shrink the batch or lower lrDenom")
    val div = lrDenom * n
    val merged = grad.join(broadcast(cur), grad("_b") === cur("b"), "left")
      .select(col("_b").as("b"),
        col("_g"),
        coalesce(col("last_epoch"), lit(-1L)).as("_le"),
        col("w").as("_w_cur"), col("w_prev").as("_wp_cur"),
        when(col("last_epoch") >= epoch, col("w_prev"))
          .otherwise(coalesce(col("w"), lit(0L))).as("_eff"))
      .select(col("b"),
        when(col("_le") >= epoch, col("_w_cur"))
          .otherwise(col("_eff") - expr(s"_g div ${div}L")).as("w"),
        when(col("_le") >= epoch, col("_wp_cur"))
          .otherwise(col("_eff")).as("w_prev"),
        greatest(col("_le"), lit(epoch)).as("last_epoch"))
    // upsertPartitioned's own internal checkpoint is merged's ONE
    // materialization (it lands before the staging write swaps the
    // store this plan reads — exactly the ordering the sink exists
    // to provide); a second checkpoint here would double it. ONE
    // bucket: the weight ledger is model-sized by contract (≤ feature
    // buckets rows), and every batch touches most of it — a multi-
    // bucket layout would just multiply the per-epoch swap renames
    // (round-14; existing stores keep their marker's own count).
    // the weights merge is fully materialized by the sink's internal
    // checkpoint ORDER (it reads the weights store), and the docs
    // append reads only the checkpointed novel frame — independent
    // sinks, landed concurrently (the crash matrix already covers
    // either store failing first)
    SessionConfGate.inParallel(
      () => Sinks.upsertPartitioned(merged, Seq("b"), wDir(root),
        nBuckets = 1),
      () => appendDocs(novel.select(col(id)).withColumn("epoch", lit(epoch)),
        epoch, root))
    // level-0→1 fold AFTER the epoch landed: keeps the recent tier
    // ≤ FoldEvery dirs; runs on 1-in-FoldEvery batches
    foldDocs(spark, root, epoch, docsSchema)
    // unpersist in finally (round-15): an ABORTED batch — the
    // stability-bound require, a simulated crash in the replay matrix
    // — used to leak the persisted feats/sums forever (the cache
    // lifecycle spec caught the leak poisoning later suites)
    } finally {
      if (sums != null) sums.unpersist()
      feats.unpersist()
    }
  }

  /** The live model: (b, w_u) — feed it to
    * [[graft.ops.LinearTrainer.serve]] via `collect → Map` for driver
    * serving, or join it directly for in-plan scoring. */
  def weights(spark: SparkSession, root: String): DataFrame =
    readLedger(spark, wDir(root), WSchema)
      .select(col("b"), col("w").as("w_u"))

  /** Start the landing-queue consumer (one micro-batch per landing
    * file; checkpoint `ckpt_train` so this maintainer shares a root
    * with the others). */
  def start(spark: SparkSession, landingDir: String, schema: StructType,
            root: String): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", s"$root/ckpt_train")
      .foreachBatch { (b: DataFrame, e: Long) => processBatch(b, e, root) }
      .start()
}
