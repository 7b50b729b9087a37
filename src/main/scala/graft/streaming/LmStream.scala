package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.ops.CorpusSignals
import graft.sinks.Sinks

/** Streaming maintainer for the n-gram LM raw-count ledger — the
  * fourth member of the streaming-summary family ([[StreamDistinct]] =
  * cardinality, [[FreqStream]] = frequency, [[HistStream]] =
  * distribution, this = language-model counts): landing documents fold
  * their (context, word) gram counts into a persisted vocabulary-sized
  * store, so the LM cross-entropy quality gate
  * ([[CorpusSignals.lmCrossEntropy]]) serves from live state without
  * ever re-tokenizing history.
  *
  * Counts are NOT keyed-idempotent — replaying a batch would double
  * them — so exactly-once needs more than the keyed-upsert rule the
  * other maintainers lean on. Two composed properties deliver it:
  *
  *  1. **Epoch-guarded count rows.** Every count row carries the
  *     `last_epoch` that last folded into it; a batch (micro-batch id
  *     = the epoch, stable across checkpoint replays) only adds its
  *     delta to rows with `last_epoch < epoch`. A crashed attempt's
  *     partially-updated rows are recognized and skipped on replay —
  *     per-row idempotency without a cross-store transaction.
  *  2. **Epoch-filtered novelty.** The landed-ids ledger stores each
  *     document's landing epoch, and a batch treats as novel every id
  *     absent from {ids with epoch < current}: ids the CRASHED attempt
  *     landed (epoch == current) still count as novel on replay — the
  *     same delta recomputes, and rule 1 makes re-applying it a no-op
  *     — while queue REDELIVERY in a later epoch sees epoch < current
  *     and contributes nothing. Only novel ids' rows are written, so
  *     a redelivered id never has its landing epoch bumped (which
  *     would re-open rule 2).
  *
  * Either store may crash mid-upsert in any order and the replay
  * converges byte-for-byte (LmStreamSpec drives the crash matrix and
  * kill/resume against the one-shot corpus counts).
  *
  * Scale shape (round-15): per batch, O(batch grams) map-side-combined
  * counting, a BUCKET-PRUNED probe of each ledger
  * ([[Sinks.probePartitioned]] — only the buckets the batch's keys
  * hash into open, with the batch ids pushed as a bloom-served In
  * filter on the docs ledger), and one landed-ids anti-join. Per-batch
  * ledger I/O is f(batch), never f(corpus) — the full-ledger map-side
  * scan this replaces was the one per-batch cost that grew with the
  * corpus (round-14 verdict; LedgerProbeSpec pins opens flat under a
  * 10× ledger). Writes are the hash-partitioned upsert
  * ([[Sinks.upsertPartitioned]] — one staged job, touched buckets
  * only); history text is never re-tokenized.
  *
  * `nBuckets` sets ledger geometry AT CREATION (existing stores keep
  * their marker): more buckets = finer probe pruning per batch but
  * more swap renames per upsert — size it so a bucket is a few row
  * groups at the target corpus.
  */
final case class LmStream(id: String, text: Column, n: Int,
                          nBuckets: Int = 8) {

  private def countsDir(root: String) = s"$root/lm_counts"
  private def docsDir(root: String) = s"$root/lm_docs"

  /** One-time ledger bootstrap from the already-ingested corpus
    * (epoch −1: strictly before every stream batch). */
  def bootstrap(oldDocs: DataFrame, root: String): Unit =
    // independent stores; see processBatch for the concurrency note
    SessionConfGate.inParallel(
      () => Sinks.upsertPartitioned(
        CorpusSignals.lmRawCounts(oldDocs, text, n)
          .withColumn("last_epoch", lit(-1L)),
        Seq("context", "word"), countsDir(root), nBuckets = nBuckets),
      () => Sinks.upsertPartitioned(
        oldDocs.select(col(id)).distinct().withColumn("epoch", lit(-1L)),
        Seq(id), docsDir(root), nBuckets = nBuckets))

  /** Read a ledger store that may legitimately be EMPTY — a bootstrap
    * over a corpus with no n-gram (every doc shorter than n tokens, or
    * no old corpus at all) writes the store markers but no bucket, and
    * the stream must start from an empty ledger, not crash
    * (readPartitioned's no-buckets require is for stores that are
    * contractually bootstrapped non-empty). */
  private def readLedger(spark: SparkSession, dir: String,
                         emptySchema: org.apache.spark.sql.types.StructType)
      : DataFrame = {
    Sinks.recoverPartitioned(dir)
    if (Sinks.listBuckets(dir).isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], emptySchema)
    else Sinks.readPartitioned(spark, dir)
  }

  /** Land one batch at `epoch`. Public so the crash-matrix spec can
    * drive replays and redeliveries without a stream.
    *
    * Job shape (round-13, same rationale as [[TrainStream]]): AQE off
    * for the step — every frame is ledger-sized or micro-batch-sized,
    * so runtime re-planning only adds a stage-job per materialization;
    * the two ledger upserts take the caller-materialized fast path
    * (the frames are already checkpointed for the isEmpty gates); and
    * an empty batch is caught by the merged/docs gates, not an
    * upfront job of its own. */
  def processBatch(batch: DataFrame, epoch: Long, root: String): Unit = {
    val spark = batch.sparkSession
    // session-global toggles — serialized across maintainers by the
    // process-wide gate; micro-batch shuffle sizing rides along (the
    // only remaining shuffle in the step is the batch-gram count)
    SessionConfGate.withMicroBatchConf(spark) {
      processBatchInner(batch, epoch, root)
    }
  }

  private def processBatchInner(batch: DataFrame, epoch: Long,
                                root: String): Unit = {
    val spark = batch.sparkSession
    // empty-ledger schemas derive from the BATCH (the id's type is the
    // caller's, not assumed)
    val docsSchema = org.apache.spark.sql.types.StructType(Seq(
      batch.schema(id),
      org.apache.spark.sql.types.StructField("epoch",
        org.apache.spark.sql.types.LongType)))
    // NOVELTY, shuffle-free at any ledger size (round-14): the docs
    // ledger grows with the corpus, so the plain batch-vs-ledger
    // anti-join would hash-shuffle the LEDGER every micro-batch.
    // Decomposed: the ledger streams MAP-SIDE through a semi-join
    // against the broadcast batch ids (batch-sized by contract), and
    // the batch anti-joins the batch-sized intersection — both sides
    // of every join are broadcast, zero Exchange. No distinct() on
    // either build side: semi/anti joins are duplicate-insensitive,
    // and the distinct would itself be a shuffle.
    // Round-15: the map-side scan is BOUNDED too — the probe reads
    // only the buckets the batch ids hash into (opens f(batch), never
    // f(ledger)), with the batch keys pushed as an In filter so the
    // ledger's key blooms skip non-matching pages. The semi-join's
    // result is unchanged: a ledger row can only match a batch id if
    // it lives in a batch id's bucket.
    val landedBefore = Sinks.probePartitioned(spark, docsDir(root),
        batch.select(col(id)), docsSchema)
      .filter(col("epoch") < epoch).select(col(id))
    val landedHit = landedBefore
      .join(broadcast(batch.select(col(id))), Seq(id), "left_semi")
    val novel = batch.join(broadcast(landedHit), Seq(id), "left_anti")
    // one materialization of the batch grams (the count aggregation is
    // the step's only shuffle — inherently so); both joins below reuse
    // it as a broadcast build side
    val rawB = CorpusSignals.lmRawCounts(novel, text, n)
      .withColumnRenamed("cnt_gram", "_cnt_b").localCheckpoint()
    // bounded probe again (round-15): only the buckets the batch's
    // grams hash into are read — the composite (context, word) key
    // prunes by bucket (no In push), so per-batch count-ledger I/O is
    // f(batch grams' buckets), never f(vocabulary)
    val cur = Sinks.probePartitioned(spark, countsDir(root),
        rawB.select("context", "word"), CountsSchema)
      .withColumnRenamed("cnt_gram", "_cnt_cur")
    // touched rows only, same decomposition as the novelty join: the
    // vocabulary-sized ledger streams map-side against the broadcast
    // batch grams; the batch-sized hit set broadcasts back into the
    // left join. Rule 1 decides add vs keep per row.
    val touched = cur.join(broadcast(rawB.select("context", "word")),
      Seq("context", "word"), "left_semi")
    val merged = rawB.join(broadcast(touched), Seq("context", "word"), "left")
      .select(col("context"), col("word"),
        when(coalesce(col("last_epoch"), lit(-1L)) >= epoch, col("_cnt_cur"))
          .otherwise(coalesce(col("_cnt_cur"), lit(0L)) + col("_cnt_b"))
          .as("cnt_gram"),
        greatest(coalesce(col("last_epoch"), lit(-1L)), lit(epoch))
          .as("last_epoch"))
      .localCheckpoint() // reads the store the upsert below swaps
    val docsDelta = novel.select(col(id)).distinct()
      .withColumn("epoch", lit(epoch)).localCheckpoint()
    // the two ledgers are INDEPENDENT stores and both inputs are now
    // materialized (nothing below reads a store the other swaps) —
    // land them concurrently: the per-upsert fixed cost (staged write
    // job, promote renames) overlaps instead of summing, which is the
    // dominant share of a micro-batch's wall time (round-14 profile).
    // Crash-safety is unchanged — the replay matrix already covers
    // either store failing first, in any order.
    SessionConfGate.inParallel(
      () => if (!merged.isEmpty)
        Sinks.upsertPartitioned(merged, Seq("context", "word"),
          countsDir(root), nBuckets = nBuckets, preMaterialized = true),
      () => if (!docsDelta.isEmpty)
        Sinks.upsertPartitioned(docsDelta, Seq(id), docsDir(root),
          nBuckets = nBuckets, preMaterialized = true))
  }

  /** The live raw-count ledger (context, word, cnt_gram) — feed it to
    * [[CorpusSignals.lmCountsFromRaw]] for probabilities or to
    * [[CorpusSignals.lmCrossEntropy]] for the quality gate. */
  private val CountsSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "context STRING, word STRING, cnt_gram BIGINT, last_epoch BIGINT")

  def counts(spark: SparkSession, root: String): DataFrame =
    readLedger(spark, countsDir(root), CountsSchema)
      .select(col("context"), col("word"), col("cnt_gram"))

  /** Start the landing-queue consumer: one micro-batch per landing
    * file, checkpointed (`ckpt_lm` — stream-specific, so this
    * maintainer shares a root with the others; the combined behavior
    * is MaintainerMatrixSpec's contract family). */
  def start(spark: SparkSession, landingDir: String, schema: StructType,
            root: String): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", s"$root/ckpt_lm")
      .foreachBatch { (b: DataFrame, e: Long) => processBatch(b, e, root) }
      .start()
}
