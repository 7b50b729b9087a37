package graft

import org.apache.spark.sql.functions._

import graft.sinks.VersionedStore
import graft.streaming.ReplicaStream

/** The change-feed replica maintainer ([[ReplicaStream]]): ingest →
  * subscribe → the replica store is byte-equal to the source's batch
  * snapshot, across kill/resume, bounded catch-up strides, and batch
  * replays — the lambda handoff driven end to end through the real
  * streaming source. */
class ReplicaStreamSpec extends SparkSpec {
  import spark.implicits._

  private def snap(root: String): Set[(Long, Long)] =
    VersionedStore.read(spark, root).as[(Long, Long)].collect().toSet

  test("subscribe -> replica == source snapshot across kill/resume") {
    val work = tmpDir("replica")
    val src = s"$work/src"
    val rep = s"$work/replica"
    VersionedStore.upsert((1L to 40L).map(k => (k, k * 10L)).toDF("k", "v"),
      Seq("k"), src, nBuckets = 4)
    VersionedStore.deltaApply(
      Seq((3L, 333L, "upsert"), (9L, 0L, "delete"), (41L, 410L, "upsert"))
        .toDF("k", "v", "op"), Seq("k"), src, "op")

    // phase 1: subscribe with a bounded stride, drain, KILL
    val q1 = ReplicaStream.subscribe(spark, src, rep, s"$work/ckpt",
      maxEpochsPerTrigger = Some(1L))
    try q1.processAllAvailable() finally q1.stop()
    assert(snap(rep) == snap(src), "replica must mirror the source")
    // one tagged replica commit per source epoch (stride 1)
    assert(VersionedStore.currentEpoch(rep) == 2L)
    assert(VersionedStore.taggedEpoch(rep, "src1").contains(1L) &&
      VersionedStore.taggedEpoch(rep, "src2").contains(2L),
      "per-epoch src tags carry the lineage")

    // offline source epochs land while the subscriber is down
    VersionedStore.deltaUpsert(Seq((5L, 555L), (42L, 420L)).toDF("k", "v"),
      Seq("k"), src)
    VersionedStore.deltaApply(Seq((1L, 0L, "delete")).toDF("k", "v", "op"),
      Seq("k"), src, "op")

    // phase 2: RESUME from the same checkpoint — only the missed
    // epochs fold, and the mirror converges again
    val q2 = ReplicaStream.subscribe(spark, src, rep, s"$work/ckpt",
      maxEpochsPerTrigger = Some(1L))
    try q2.processAllAvailable() finally q2.stop()
    assert(snap(rep) == snap(src), "resume must converge the mirror")
    assert(VersionedStore.currentEpoch(rep) == 4L,
      "exactly one replica epoch per missed source epoch")

    // the replica is a real store: its own history and time travel
    val hist = VersionedStore.history(spark, rep)
      .select("epoch").as[Long].collect().toSet
    assert(hist == Set(1L, 2L, 3L, 4L))
    assert(VersionedStore.readAsOf(spark, rep, 2L).as[(Long, Long)]
      .collect().toMap.get(3L).contains(333L))

    // batch replay (the crash window): re-applying served facts is a
    // tag-fenced no-op — same epoch count, same content
    val facts = (1L to 40L).map(k => (k, k * 10L, "upsert", 1L))
      .toDF("k", "v", "_op", "_change_epoch")
    ReplicaStream.applyFacts(facts, rep, Seq("k"), nBuckets = 8)
    assert(VersionedStore.currentEpoch(rep) == 4L && snap(rep) == snap(src),
      "replayed facts must not re-commit")
  }

  test("a COW-maintained source still mirrors (superset re-assertions fold)") {
    val work = tmpDir("replica_cow")
    val src = s"$work/src"
    val rep = s"$work/replica"
    VersionedStore.upsert((1L to 10L).map(k => (k, k)).toDF("k", "v"),
      Seq("k"), src, nBuckets = 2)
    // COW upsert epoch: rewritten buckets re-assert unchanged keys
    VersionedStore.upsert(Seq((3L, 33L)).toDF("k", "v"), Seq("k"), src)
    val q = ReplicaStream.subscribe(spark, src, rep, s"$work/ckpt")
    try q.processAllAvailable() finally q.stop()
    assert(snap(rep) == snap(src))
  }
}
