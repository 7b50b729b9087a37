package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.sinks.VersionedStore

/** Streaming ingest into the MVCC [[VersionedStore]]: every
  * micro-batch commits as one store EPOCH, so the stream's whole
  * history stays queryable — time-travel to any batch boundary, CDC
  * between any two, retention GC behind the consumers — while
  * downstream views follow incrementally
  * ([[graft.ops.MaterializedView]] over the epoch changelog).
  *
  * Exactly-once WITHOUT a checkpoint↔store transaction: the
  * micro-batch id rides in the commit record (`upsert@batch<N>`,
  * [[VersionedStore.taggedEpoch]]). Structured Streaming replays the
  * last batch after a crash that beat the checkpoint write; the replay
  * finds its tag already committed and SKIPS — the store's atomic
  * commit marker is the idempotency ledger, the same fence the
  * reference's sent-message dedup draws with a conditional put
  * (inventory_lib.py:146-162). A crash BEFORE the commit marker left
  * only invisible staging/generation files, which the retried upsert
  * overwrites and the next vacuum sweeps — either way the committed
  * history is byte-identical to the uninterrupted run
  * (EpochStreamSpec's kill/resume contract). Retention caveat:
  * vacuum's commit-log truncation keeps tags only for epochs still
  * serving a bucket, so retention must stay behind the stream's
  * checkpoint lag (a replay can only ever be the LAST batch — any
  * sane retention is far behind it).
  *
  * Per-batch cost is the store's upsert contract: one distributed
  * merge over (batch ∪ touched buckets) — O(batch), never O(store).
  *
  * With `opCol` set the stream consumes a CDC FEED (Debezium-shaped:
  * each row stamped `upsert` or `delete`): the whole mixed batch
  * commits as ONE `apply` epoch ([[VersionedStore.applyOps]]) — never
  * a half-visible upsert/delete epoch pair. With `evolve` the source's
  * additive schema drift (a producer shipping a new column) commits as
  * a schema-evolution epoch instead of failing the stream; retypes and
  * dropped columns still fail fast. */
final case class EpochStream(keyCols: Seq[String], nBuckets: Int = 8,
                             opCol: Option[String] = None,
                             evolve: Boolean = false,
                             delta: Boolean = false,
                             compactEvery: Int = 0,
                             vacuumGraceMillis: Long = 3600000L) {
  require(compactEvery == 0 || delta,
    "compactEvery is a merge-on-read policy; set delta = true")

  /** Land one micro-batch as one epoch; replays are no-ops. Public so
    * the kill/resume spec can drive batches without a stream. With
    * `delta = true` batches commit MERGE-ON-READ
    * ([[VersionedStore.deltaApply]]/[[VersionedStore.deltaUpsert]]):
    * each micro-batch writes ≈ its own bytes as per-bucket delta
    * generations instead of rewriting touched buckets — the posture
    * for a high-frequency CDC stream, compacted out-of-band. */
  def processBatch(batch: DataFrame, batchId: Long, root: String): Unit = {
    val tag = s"batch$batchId"
    if (VersionedStore.taggedEpoch(root, tag).isDefined) return
    if (batch.isEmpty) return
    (opCol, delta) match {
      case (Some(c), false) =>
        VersionedStore.applyOps(batch, keyCols, root, c, nBuckets, tag = tag,
          evolve = evolve)
      case (None, false) =>
        VersionedStore.upsert(batch, keyCols, root, nBuckets, tag = tag,
          evolve = evolve)
      case (Some(c), true) =>
        VersionedStore.deltaApply(batch, keyCols, root, c, nBuckets,
          tag = tag, evolve = evolve)
      case (None, true) =>
        VersionedStore.deltaUpsert(batch, keyCols, root, nBuckets, tag = tag,
          evolve = evolve)
    }
    // inline compaction policy (Hudi's max-delta-commits): bound every
    // bucket's chain so read cost stays flat under an endless CDC
    // stream. Crash-safe without a tag: compaction is a content no-op,
    // so a replayed batch that re-triggers it just finds short chains
    // and commits nothing.
    if (delta && compactEvery > 0)
      VersionedStore.compactIfNeeded(batch.sparkSession, root, compactEvery)
  }

  /** Start the landing-queue consumer: one micro-batch per landing
    * file (batch boundaries = file boundaries — the deterministic
    * batching every stream spec pins), checkpointed for restart. The
    * checkpoint lives under the store root (`ckpt_epochs` — invisible
    * to the store's commit/bucket listings, which match only
    * `_commit-*` / `bNNNNN`). */
  def start(spark: SparkSession, landingDir: String, schema: StructType,
            root: String): StreamingQuery = {
    // a store with a streaming maintainer has FOLLOWERS by design
    // (views polling the changelog, chain reads racing inline
    // compaction) — set the store-level vacuum grace floor once, so a
    // routine `vacuum(root, e)` can never delete a generation from
    // under an in-flight follower poll (the production posture; a
    // deployment that truly wants loud-zero-grace passes 0 here)
    if (vacuumGraceMillis > 0L &&
        VersionedStore.readAuxMarker(root, "_vacuum_grace").isEmpty)
      VersionedStore.setVacuumGrace(root, vacuumGraceMillis)
    StreamSessions.microBatch(spark).readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", s"$root/ckpt_epochs")
      .foreachBatch { (b: DataFrame, id: Long) => processBatch(b, id, root) }
      .start()
  }
}

object EpochStream {
  /** Drive phases through a REAL checkpointed stream — each phase
    * lands as one file → one micro-batch → one committed epoch (in
    * phase order: `processAllAvailable` between appends pins the
    * batching). The store at `storeRoot` then holds the whole
    * history. */
  def replay(spark: SparkSession, phases: Seq[DataFrame],
             keyCols: Seq[String], workDir: String, storeRoot: String,
             nBuckets: Int = 8, opCol: Option[String] = None,
             delta: Boolean = false): Unit = {
    require(phases.nonEmpty, "replay needs at least one phase")
    val inDir = s"$workDir/in"
    // coalesce(1): one FILE per phase, so one micro-batch per phase —
    // without it a multi-partition phase lands as several files and
    // maxFilesPerTrigger=1 splits it into several epochs
    phases.head.coalesce(1).write.parquet(inDir)
    val q = EpochStream(keyCols, nBuckets, opCol, delta = delta)
      .start(spark, inDir, phases.head.schema, storeRoot)
    try {
      q.processAllAvailable()
      phases.tail.foreach { p =>
        p.coalesce(1).write.mode("append").parquet(inDir)
        q.processAllAvailable()
      }
    } finally q.stop()
  }
}
