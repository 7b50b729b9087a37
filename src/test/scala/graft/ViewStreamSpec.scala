package graft

import org.apache.spark.sql.functions._

import graft.sinks.VersionedStore
import graft.streaming.ViewStream

/** The view follower's contracts: the persisted view equals a
  * from-scratch build after every catch-up, each source epoch costs
  * ONE view commit of O(changed groups) rows (view-store CDC pinned),
  * emptied groups become store deletes, replays and partial
  * catch-ups (kill/resume) land byte-identical to an uninterrupted
  * follower, and the `src<E>` tags record the lineage. */
class ViewStreamSpec extends SparkSpec {
  import spark.implicits._

  private def src(root: String): Unit = {
    // e1: groups a(1,2) b(10); e2: k2 moves a->b, k4 inserts c;
    // e3: delete k1 and k3 — group a EMPTIES; e4: b updates in place
    VersionedStore.upsert(Seq(
      (1L, "a", 1L), (2L, "a", 2L), (3L, "b", 10L)
    ).toDF("k", "g", "v"), Seq("k"), root)
    VersionedStore.upsert(Seq(
      (2L, "b", 5L), (4L, "c", 7L)).toDF("k", "g", "v"), Seq("k"), root)
    VersionedStore.delete(Seq(1L, 3L).toDF("k"), root)
    VersionedStore.upsert(Seq((2L, "b", 6L)).toDF("k", "g", "v"),
      Seq("k"), root)
  }

  private def scratch(root: String, e: Long) =
    graft.ops.MaterializedView.sumView(
        VersionedStore.readAsOf(spark, root, e), Seq("g"), col("v"))
      .orderBy("g").collect().toSeq

  test("follower equals from-scratch at every epoch; lineage tags; no-op replay") {
    val d = tmpDir("vs_follow"); val s = s"$d/src"; val v = s"$d/view"
    src(s)
    val f = ViewStream(Seq("g"), "v", "sum")
    (1L to 4L).foreach { e =>
      f.applyEpoch(spark, s, v, e)
      assert(f.lastApplied(v) == e)
      assert(VersionedStore.read(spark, v).orderBy("g").collect().toSeq
        == scratch(s, e), s"view diverged after source epoch $e")
    }
    // the emptied group is GONE from the persisted view (a delete op)
    assert(VersionedStore.read(spark, v).filter($"g" === "a").count() == 0)
    val epochs = VersionedStore.currentEpoch(v)
    f.catchUp(spark, s, v)
    assert(VersionedStore.currentEpoch(v) == epochs,
      "replayed catch-up must commit nothing")
    // per-epoch view write is O(changed groups): source e4 touched
    // only group b, so the view CDC across its fold is exactly 1 row
    val cdc = VersionedStore.changelog(spark, v, epochs - 1, epochs)
    assert(cdc.count() == 1L && cdc.collect()(0).getString(0) == "b")
  }

  test("kill/resume: a partial catch-up resumed by a fresh instance is byte-identical") {
    val d = tmpDir("vs_kill")
    val s1 = s"$d/src1"; val v1 = s"$d/view1"
    val s2 = s"$d/src2"; val v2 = s"$d/view2"
    src(s1); src(s2)
    // uninterrupted follower
    ViewStream(Seq("g"), "v", "sum").catchUp(spark, s1, v1)
    // killed mid-history, resumed by a NEW instance
    val half = ViewStream(Seq("g"), "v", "sum")
    half.applyEpoch(spark, s2, v2, 1L)
    half.applyEpoch(spark, s2, v2, 2L)
    ViewStream(Seq("g"), "v", "sum").catchUp(spark, s2, v2)
    val a = VersionedStore.commits(v1).map(c => (c.epoch, c.kind, c.buckets))
    val b = VersionedStore.commits(v2).map(c => (c.epoch, c.kind, c.buckets))
    assert(a == b, "view commit logs must match")
    assert(VersionedStore.read(spark, v1).orderBy("g").collect().toSeq ==
      VersionedStore.read(spark, v2).orderBy("g").collect().toSeq)
    // the view store itself time-travels: view@epoch2 equals the
    // from-scratch build at source epoch 2 (lineage tag = src2)
    val e2 = VersionedStore.taggedEpoch(v2, "src2").get
    assert(VersionedStore.readAsOf(spark, v2, e2).orderBy("g")
      .collect().toSeq == scratch(s2, 2L))
  }

  test("minmax follower: delete-driven retraction through the stream path") {
    val d = tmpDir("vs_minmax"); val s = s"$d/src"; val v = s"$d/view"
    src(s)
    val f = ViewStream(Seq("g"), "v", "minmax")
    f.catchUp(spark, s, v)
    val got = VersionedStore.read(spark, v)
      .as[(String, Long, Long, Long)].collect().toSeq.sorted
    val want = graft.ops.MaterializedView.minMaxView(
        VersionedStore.read(spark, s), Seq("g"), col("v"))
      .as[(String, Long, Long, Long)].collect().toSeq.sorted
    assert(got == want && got.nonEmpty)
  }

  test("follower over a merge-on-read source resolves chains per epoch") {
    val d = tmpDir("vs_mor"); val s = s"$d/src"; val v = s"$d/view"
    VersionedStore.deltaUpsert(Seq(
      (1L, "a", 1L), (2L, "a", 2L), (3L, "b", 10L)
    ).toDF("k", "g", "v"), Seq("k"), s)
    VersionedStore.deltaApply(Seq(
      (2L, "b", 5L, "upsert"), (3L, "", 0L, "delete")
    ).toDF("k", "g", "v", "op"), Seq("k"), s, "op")
    val f = ViewStream(Seq("g"), "v", "sum")
    f.catchUp(spark, s, v)
    assert(VersionedStore.read(spark, v).orderBy("g").collect().toSeq ==
      scratch(s, 2L))
  }
}
