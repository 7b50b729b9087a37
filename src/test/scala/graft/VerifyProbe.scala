package graft

import org.apache.spark.sql.functions._

/** Throwaway probe main (test scope) — rewritten per verify wave.
  * Wave: shuffle-free MOR chain resolution (broadcast merge), the
  * duplicate-upsert and ts=0 fences, plus the carried MOR surfaces
  * (timestamps, compaction, view follower, delta restore). */
object VerifyProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    import spark.implicits._
    import graft.sinks.VersionedStore

    // --- merge-on-read end to end: delta commits, chain reads,
    // timestamp travel, compaction as a content no-op
    val root = java.nio.file.Files.createTempDirectory("probe_mor")
      .toString + "/store"
    VersionedStore.deltaUpsert((1L to 30L).map(k => (k, k * 10))
      .toDF("k", "v"), Seq("k"), root, nBuckets = 4, tsMillis = 1000L)
    VersionedStore.deltaApply(Seq((2L, 99L, "upsert"), (3L, 0L, "delete"),
        (999L, 0L, "delete")).toDF("k", "v", "op"),
      Seq("k"), root, "op", tsMillis = 2000L)
    val cur = VersionedStore.read(spark, root).as[(Long, Long)]
      .collect().toMap
    assert(cur.size == 29 && cur(2L) == 99L && !cur.contains(3L),
      s"MOR resolution: ${cur.size} rows")
    assert(VersionedStore.readAsOfTimestamp(spark, root, 1500L)
      .count() == 30L, "timestamp travel to the first delta epoch")

    // --- round-13 fences: duplicate upserts per key in one delta
    // batch fail fast; ts=0 is reserved for legacy commits
    val dup = try {
      VersionedStore.deltaUpsert(Seq((7L, 1L), (7L, 2L)).toDF("k", "v"),
        Seq("k"), root); false
    } catch { case e: IllegalArgumentException =>
      e.getMessage.contains("MORE THAN ONE upsert") }
    assert(dup, "duplicate-upsert fence must trip")
    val ts0 = try {
      VersionedStore.deltaUpsert(Seq((8L, 1L)).toDF("k", "v"), Seq("k"),
        root, tsMillis = 0L); false
    } catch { case e: IllegalArgumentException =>
      e.getMessage.contains("reserved") }
    assert(ts0, "ts=0 sentinel fence must trip")

    val ce = VersionedStore.compact(spark, root, tsMillis = 3000L)
    assert(ce == 3L && VersionedStore.read(spark, root).as[(Long, Long)]
      .collect().toMap == cur, "compaction must be a content no-op")
    val h = VersionedStore.history(spark, root)
      .select("epoch", "n_rows").as[(Long, Long)].collect().toMap
    assert(h == Map(1L -> 30L, 2L -> 29L, 3L -> 29L), s"MOR history: $h")

    // --- chain-read shuffle locality: a 2-row delta against a 50k-row
    // base must not hash-shuffle the base
    val big = java.nio.file.Files.createTempDirectory("probe_mor_big")
      .toString + "/store"
    VersionedStore.upsert(spark.range(1L, 50001L).select(col("id").as("k"),
      concat(lit("payload-"), col("id")).as("v")), Seq("k"), big,
      nBuckets = 4)
    VersionedStore.deltaApply(Seq((5L, "u", "upsert"), (6L, "", "delete"))
      .toDF("k", "v", "op"), Seq("k"), big, "op")
    val shuffled = new java.util.concurrent.atomic.AtomicLong(0L)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shuffled.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    val nBig = VersionedStore.read(spark, big).count()
    org.apache.spark.GraftTestBus.drain(spark.sparkContext)
    spark.sparkContext.removeSparkListener(l)
    assert(nBig == 49999L, s"resolved rows: $nBig")
    assert(shuffled.get() < 100_000L,
      s"chain read must stream the base shuffle-free, moved ${shuffled.get()} B")

    // --- data skipping: freshness scan opens only the delta'd chain
    val pruned = VersionedStore.readPruned(spark, big, "v", "u", "v")
    assert(pruned.count() == 1L, "pruned range [u,v] holds only key 5")
    val prunedBuckets = pruned.inputFiles
      .flatMap(_.split("/").find(_.matches("^b\\d{5}$"))).toSet
    assert(prunedBuckets.size <= 2,
      s"stats must prune untouched buckets: $prunedBuckets")

    // --- ViewStream follower over the MOR store
    val viewRoot = root + "_view"
    val f = graft.streaming.ViewStream(Seq("g"), "v", "sum")
    val src2 = root + "_src2"
    VersionedStore.upsert(Seq((1L, "a", 1L), (2L, "b", 2L))
      .toDF("k", "g", "v"), Seq("k"), src2)
    VersionedStore.delete(Seq(2L).toDF("k"), src2)
    f.catchUp(spark, src2, viewRoot)
    val view = VersionedStore.read(spark, viewRoot)
      .as[(String, Long, Long)].collect().toSeq
    assert(view == Seq(("a", 1L, 1L)), s"follower view: $view")

    // --- delta-mode restore + inline compaction policy
    val r3 = java.nio.file.Files.createTempDirectory("probe_mor2")
      .toString + "/store"
    val es = graft.streaming.EpochStream(Seq("k"), nBuckets = 2,
      delta = true, compactEvery = 2)
    (0 until 5).foreach { i =>
      es.processBatch(Seq((i.toLong % 3, i.toLong)).toDF("k", "v"),
        i.toLong, r3)
    }
    assert(VersionedStore.read(spark, r3).as[(Long, Long)].collect()
      .toMap == Map(0L -> 3L, 1L -> 4L, 2L -> 2L), "policy stream content")
    assert(VersionedStore.commits(r3).exists(_.kind == "compact"),
      "the policy must have fired at least one compaction")
    val before = VersionedStore.currentEpoch(r3)
    VersionedStore.restore(spark, r3, 2L, delta = true)
    assert(VersionedStore.commits(r3).last.kind == "dapply",
      "delta-mode restore must commit merge-on-read")
    assert(VersionedStore.read(spark, r3).collect().toSeq.sorted(
        Ordering.by((r: org.apache.spark.sql.Row) => r.getLong(0))) ==
      VersionedStore.readAsOf(spark, r3, 2L).collect().toSeq.sorted(
        Ordering.by((r: org.apache.spark.sql.Row) => r.getLong(0))),
      "restore target parity")
    assert(VersionedStore.currentEpoch(r3) == before + 1)

    println("PROBE OK: " + java.lang.Long.toString(100L + 23L))
    spark.stop()
  }
}
