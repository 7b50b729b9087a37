package graft

import org.apache.spark.sql.functions._

/** Throwaway probe main (test scope) — rewritten per verify wave.
  * Wave: round-14 surfaces end to end — observation-collected
  * generation stats (COW and delta), default-read-path data skipping,
  * the link commit fence under real upserts, vacuum grace floor,
  * geometry-preserving byte-copy fork, and the reshaped streaming
  * maintainers (LmStream/TrainStream) against driver-side folds. */
object VerifyProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    import spark.implicits._
    import graft.sinks.VersionedStore

    val work = java.nio.file.Files.createTempDirectory("probe_r14").toString

    // --- COW + delta stats from the write job; default-path skipping
    val root = s"$work/store"
    VersionedStore.upsert((1L to 100L).map(k => (k, k, 1L))
      .toDF("k", "v", "u"), Seq("k"), root, nBuckets = 8)
    VersionedStore.deltaUpsert(Seq((7L, 700L, 2L)).toDF("k", "v", "u"),
      Seq("k"), root)
    val df = VersionedStore.read(spark, root)
      .filter(col("u") === 2L)
    assert(df.as[(Long, Long, Long)].collect().toSeq == Seq((7L, 700L, 2L)))
    // delta'd chain prunes on its own stats now
    val none = VersionedStore.readPruned(spark, root, "u", 50L, 90L)
    assert(none.count() == 0L && none.inputFiles.isEmpty,
      "delta stats must prune the impossible range")
    // default-path plan-time skip
    val scanFiles = VersionedStore.read(spark, root)
      .filter(col("u") >= 2L && col("u") <= 3L)
      .queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles
      }.sum
    assert(scanFiles <= 3L, s"default-path skip: $scanFiles files")

    // --- vacuum grace floor + infra min-age
    VersionedStore.setVacuumGrace(root, 3600000L)
    val r = VersionedStore.vacuum(root, 2L)
    assert(r.deletedGens == 0L, s"grace floor must shield: $r")

    // --- geometry-preserving byte-copy fork
    val snap = s"$work/snap"; val fork = s"$work/fork"
    VersionedStore.compact(spark, root)
    VersionedStore.exportSnapshot(spark, root, 3L, snap)
    VersionedStore.importSnapshot(spark, snap, fork, nBuckets = 8)
    assert(VersionedStore.read(spark, fork).count() == 100L)
    assert(VersionedStore.taggedEpoch(fork, "import").contains(1L))

    // --- LmStream reshaped batch == driver-side fold
    val docs = Seq(
      (1L, "a b c a b c d"), (2L, "x y z x y"), (3L, "a b c q r s"),
      (4L, "m n o p q r"), (5L, "a b c a b c")).toDF("doc_id", "text")
    val lmRoot = s"$work/lm"
    val stream = graft.streaming.LmStream("doc_id", col("text"), 2)
    stream.bootstrap(docs.filter(col("doc_id") <= 2L), lmRoot)
    stream.processBatch(docs.filter(col("doc_id").isin(3L, 4L)), 0L, lmRoot)
    stream.processBatch(docs.filter(col("doc_id") === 5L), 1L, lmRoot)
    // redelivery in a later epoch must not double-count
    stream.processBatch(docs.filter(col("doc_id") === 3L), 2L, lmRoot)
    val got = stream.counts(spark, lmRoot)
      .orderBy("context", "word").as[(String, String, Long)].collect().toSeq
    val want = graft.ops.CorpusSignals.lmRawCounts(docs, col("text"), 2)
      .orderBy("context", "word").as[(String, String, Long)].collect().toSeq
    assert(got == want, s"streamed counts must equal one-shot: " +
      s"${got.diff(want)} / ${want.diff(got)}")

    println("PROBE OK: round-14 surfaces verified")
    spark.stop()
  }
}
