package graft

import org.apache.spark.sql.functions._

import graft.sinks.VersionedStore

/** `spark.readStream.format("graft-vstore")` — the store as a
  * STREAMING SOURCE (round-15): per-epoch keyed change facts, exact
  * delta ops, epoch offsets (checkpoint resume replays nothing), and
  * the loud COW-delete refusal. */
class VStoreStreamSpec extends SparkSpec {
  import spark.implicits._

  // the FILE sink: fault-tolerant, so the same checkpoint recovers
  // across restarts (the memory sink cannot)
  private def factStream(root: String, ckpt: String, out: String,
                         startingEpoch: Long = 0L) =
    spark.readStream.format("graft-vstore")
      .option("path", root).option("changeFeed", "true")
      .option("startingEpoch", startingEpoch.toString)
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()

  // column-expression filters only: a typed-lambda filter would ship
  // the spec instance (scalatest Engine) into the task closure
  private def facts(out: String, epochPred: org.apache.spark.sql.Column =
      lit(true)) =
    spark.read.parquet(out).filter(epochPred)
      .as[(Long, Long, String, Long)]

  test("subscribe: per-epoch facts, exact delta ops, offset resume") {
    val work = tmpDir("vstream")
    val root = s"$work/store"
    VersionedStore.upsert((1L to 20L).map(k => (k, k * 10L)).toDF("k", "v"),
      Seq("k"), root, nBuckets = 4)
    val out = s"$work/out"
    val q = factStream(root, s"$work/ckpt", out)
    try {
      q.processAllAvailable()
      val e1 = facts(out).collect().toSet
      assert(e1 == (1L to 20L).map(k => (k, k * 10L, "upsert", 1L)).toSet,
        s"epoch-1 facts: ${e1.size}")

      // a DELTA epoch streams EXACTLY its changes, tombstone as delete
      VersionedStore.deltaApply(
        Seq((5L, 500L, "upsert"), (7L, 0L, "delete")).toDF("k", "v", "op"),
        Seq("k"), root, "op")
      q.processAllAvailable()
      val e2 = facts(out, col("_change_epoch") === 2L).collect().toSet
      assert(e2.map(t => (t._1, t._3)) == Set((5L, "upsert"), (7L, "delete")),
        s"delta epoch must stream exact ops: $e2")

      // a COW upsert epoch streams keyed facts (superset of changes —
      // every emitted row is a current-value assertion at epoch 3)
      VersionedStore.upsert(Seq((3L, 300L)).toDF("k", "v"), Seq("k"), root)
      q.processAllAvailable()
      val all = facts(out).collect().toSeq
      val e3 = all.filter(_._4 == 3L)
      assert(e3.exists(t => t._1 == 3L && t._2 == 300L && t._3 == "upsert"))
      assert(e3.forall(_._3 == "upsert"), "a COW upsert epoch has no deletes")

      // the keyed fold of the fact stream IS the store's snapshot
      val folded = all.groupBy(_._1).map { case (k, fs0) =>
        k -> fs0.maxBy(_._4)
      }
      val live = folded.collect { case (k, f) if f._3 == "upsert" =>
        k -> f._2
      }
      val want = VersionedStore.read(spark, root).as[(Long, Long)]
        .collect().toMap
      assert(live == want,
        "folding the change feed must reproduce the live snapshot")
      assert(folded(7L)._3 == "delete", "the tombstone survives the fold")
    } finally q.stop()

    // OFFLINE epochs land; a restart from the same checkpoint serves
    // exactly the missed epochs, exactly once
    VersionedStore.deltaUpsert(Seq((9L, 900L)).toDF("k", "v"), Seq("k"), root)
    val q2 = factStream(root, s"$work/ckpt", out)
    try {
      q2.processAllAvailable()
      val resumed = facts(out, col("_change_epoch") >= 4L).collect().toSeq
      assert(resumed == Seq((9L, 900L, "upsert", 4L)),
        s"resume must serve exactly the missed epochs once: $resumed")
      // and nothing before epoch 4 was re-emitted
      assert(facts(out, col("_change_epoch") === 1L).count() == 20L,
        "epoch-1 facts must not replay on resume")
    } finally q2.stop()
  }

  test("admission control: a lagging subscriber catches up in bounded strides") {
    val work = tmpDir("vstream_ac")
    val root = s"$work/store"
    // a 50-epoch backlog of delta commits, all before the stream starts
    (1 to 50).foreach { i =>
      VersionedStore.deltaUpsert(
        Seq((i.toLong, i * 10L), (1000L + i, i.toLong)).toDF("k", "v"),
        Seq("k"), root, nBuckets = 4)
    }
    val out = s"$work/out"
    val limit = 8L
    val q = spark.readStream.format("graft-vstore")
      .option("path", root).option("changeFeed", "true")
      .option("startingEpoch", "0")
      .option("maxEpochsPerTrigger", limit.toString)
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", s"$work/ckpt")
      .start()
    try {
      q.processAllAvailable()
      // the backlog drained in >= ceil(50/8) = 7 bounded micro-batches,
      // never one unbounded catch-up batch
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches >= (50L + limit - 1) / limit,
        s"a 50-epoch backlog at maxEpochsPerTrigger=$limit must take " +
          s">= 7 micro-batches, took $dataBatches")
      assert(q.recentProgress.filter(_.numInputRows > 0)
          .forall(_.numInputRows <= limit * 2),
        "no micro-batch may exceed the admitted epochs' rows")
      // byte-parity with the unlimited run: same facts, same epochs
      val got = facts(out).collect().toSet
      val unlimited = (1 to 50).flatMap(i => Seq(
        (i.toLong, i * 10L, "upsert", i.toLong),
        (1000L + i, i.toLong, "upsert", i.toLong))).toSet
      assert(got == unlimited,
        s"bounded catch-up must serve exactly the backlog: ${got.size}")
    } finally q.stop()
  }

  test("an epoch that evolved the schema fails the pinned-schema stream") {
    val work = tmpDir("vstream_evolve")
    val root = s"$work/store"
    VersionedStore.upsert((1L to 5L).map(k => (k, k)).toDF("k", "v"),
      Seq("k"), root, nBuckets = 2)
    val q = factStream(root, s"$work/ckpt", s"$work/out")
    try {
      q.processAllAvailable() // epoch 1 serves fine
      VersionedStore.deltaUpsert(Seq((6L, 6L, "x")).toDF("k", "v", "extra"),
        Seq("k"), root, evolve = true)
      val ex = intercept[
          org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable(); q.awaitTermination(10000)
      }
      val msg = ex.getMessage +
        Option(ex.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("evolved the store schema"),
        s"evolution must fail the stream loudly: ${msg.take(300)}")
    } finally q.stop()
  }

  test("COW delete/apply epochs refuse loudly; batch changeFeed refuses") {
    val work = tmpDir("vstream_cow")
    val root = s"$work/store"
    VersionedStore.upsert((1L to 10L).map(k => (k, k)).toDF("k", "v"),
      Seq("k"), root, nBuckets = 2)
    VersionedStore.delete(Seq(3L).toDF("k"), root) // COW delete epoch
    val q = factStream(root, s"$work/ckpt", s"$work/out")
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try { q.processAllAvailable(); q.awaitTermination(10000) }
      finally q.stop()
    }
    assert(ex.getMessage.contains("COW 'delete'") ||
      Option(ex.getCause).exists(_.getMessage.contains("COW 'delete'")),
      s"COW delete must fail the stream loudly: ${ex.getMessage.take(300)}")

    // and the change feed is a streaming surface only
    val batch = intercept[Exception] {
      spark.read.format("graft-vstore").option("path", root)
        .option("changeFeed", "true").load().collect()
    }
    assert(batch.getMessage.contains("changelog") ||
      batch.getMessage.contains("STREAMING"),
      batch.getMessage.take(200))
  }
}
