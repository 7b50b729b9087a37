package graft

import org.apache.spark.sql.functions._

import graft.sinks.VersionedStore
import graft.streaming.EpochStream

/** The streaming epoch maintainer's exactly-once contract: one landing
  * file = one committed epoch, a kill/resume across a checkpoint
  * continues the SAME history (no re-commit, no gap), and a replayed
  * micro-batch whose tag is already in the commit log is a no-op —
  * the crash window where the store commit beat the checkpoint. */
class EpochStreamSpec extends SparkSpec {
  import spark.implicits._

  private def phase(ks: Range, tag: Long) =
    ks.map(k => (k.toLong, k * 10L + tag)).toDF("k", "v")

  test("kill/resume across the checkpoint is byte-identical to one-shot") {
    val work = tmpDir("epochs_kr")
    val store = s"$work/store"
    val inDir = s"$work/in"
    val es = EpochStream(Seq("k"), nBuckets = 4)

    // stream 1: two landing files -> epochs 1, 2 -> KILL
    phase(1 to 40, 1).coalesce(1).write.parquet(inDir)
    val q1 = es.start(spark, inDir, phase(1 to 1, 1).schema, store)
    try {
      q1.processAllAvailable()
      phase(20 to 60, 2).coalesce(1).write.mode("append").parquet(inDir)
      q1.processAllAvailable()
    } finally q1.stop()
    assert(VersionedStore.currentEpoch(store) == 2L)

    // stream 2 on the SAME checkpoint: resumes, sees only file 3
    phase(50 to 70, 3).coalesce(1).write.mode("append").parquet(inDir)
    val q2 = es.start(spark, inDir, phase(1 to 1, 1).schema, store)
    try q2.processAllAvailable() finally q2.stop()
    assert(VersionedStore.currentEpoch(store) == 3L,
      "resume must continue the SAME history, not re-commit batches")

    // one-shot reference: the same three upserts, no stream
    val ref = s"$work/ref"
    VersionedStore.upsert(phase(1 to 40, 1), Seq("k"), ref, nBuckets = 4)
    VersionedStore.upsert(phase(20 to 60, 2), Seq("k"), ref, nBuckets = 4)
    VersionedStore.upsert(phase(50 to 70, 3), Seq("k"), ref, nBuckets = 4)
    for (e <- 1L to 3L)
      assert(
        VersionedStore.readAsOf(spark, store, e).as[(Long, Long)]
          .collect().toSeq.sorted ==
        VersionedStore.readAsOf(spark, ref, e).as[(Long, Long)]
          .collect().toSeq.sorted,
        s"epoch $e differs from the uninterrupted history")
  }

  test("a replayed micro-batch is a no-op (commit log is the idempotency fence)") {
    val work = tmpDir("epochs_replay")
    val store = s"$work/store"
    val es = EpochStream(Seq("k"), nBuckets = 4)
    es.processBatch(phase(1 to 10, 1), batchId = 0L, store)
    es.processBatch(phase(5 to 15, 2), batchId = 1L, store)
    val before = VersionedStore.read(spark, store).as[(Long, Long)]
      .collect().toSeq.sorted
    // the crash window: store committed batch 1, checkpoint didn't —
    // the restarted stream re-delivers batch 1
    es.processBatch(phase(5 to 15, 2), batchId = 1L, store)
    assert(VersionedStore.currentEpoch(store) == 2L,
      "a replayed batch must not commit a new epoch")
    assert(VersionedStore.read(spark, store).as[(Long, Long)]
      .collect().toSeq.sorted == before)
    // CDC across the stream's history stays exact
    assert(VersionedStore.changelog(spark, store, 1, 2)
      .filter(col("change") === "insert").count() == 5) // 11..15
  }
}
