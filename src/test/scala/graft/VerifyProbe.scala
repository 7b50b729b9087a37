package graft

import org.apache.spark.sql.functions._

/** Throwaway probe main (test scope) — rewritten per verify wave.
  * Wave: merge-on-read store + compaction + timestamps, ViewStream
  * follower, alternate connector backends, manifest lineage. */
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
    val ce = VersionedStore.compact(spark, root, tsMillis = 3000L)
    assert(ce == 3L && VersionedStore.read(spark, root).as[(Long, Long)]
      .collect().toMap == cur, "compaction must be a content no-op")
    val h = VersionedStore.history(spark, root)
      .select("epoch", "n_rows").as[(Long, Long)].collect().toMap
    assert(h == Map(1L -> 30L, 2L -> 29L, 3L -> 29L), s"MOR history: $h")

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

    // --- alternate backends honor the same contracts
    val ks = graft.connectors.VersionedKeyedStore(root + "_ks")
    assert(ks.read(spark).isEmpty)
    ks.upsert(Seq((1L, "x")).toDF("k", "v"), Seq("k"))
    ks.upsert(Seq((1L, "y")).toDF("k", "v"), Seq("k"))
    assert(ks.read(spark).get.as[(Long, String)].collect().toSeq ==
      Seq((1L, "y")))

    // --- manifest lineage columns resolve (fixture-backed)
    val card = Queries.all("q209_release_manifest")(spark,
      "/root/testdata/sf0.001").collect()
    assert(card.nonEmpty && card.forall(r =>
      r.getAs[Long]("kmv_epoch") == 1L && !r.isNullAt(
        r.fieldIndex("counts_sig"))), "lineage columns must be present")

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
