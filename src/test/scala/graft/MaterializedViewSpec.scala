package graft

import org.apache.spark.sql.functions._

import graft.ops.MaterializedView
import graft.sinks.VersionedStore

/** The delta-propagation contract: view@e1 + changelog(e1,e2) equals a
  * from-scratch build at e2 BIT-FOR-BIT, group-moving updates retract
  * from the old group and insert into the new, emptied groups vanish,
  * and a changelog cut from the wrong epoch fails fast instead of
  * silently corrupting the view. */
class MaterializedViewSpec extends SparkSpec {
  import spark.implicits._

  private def viewOf(root: String, epoch: Long) =
    MaterializedView.sumView(
      VersionedStore.readAsOf(spark, root, epoch), Seq("g"), col("v"))

  test("incremental refresh equals from-scratch rebuild; group moves handled") {
    val root = tmpDir("mv") + "/store"
    // epoch 1: groups a(1,2), b(10)
    VersionedStore.upsert(Seq(
      (1L, "a", 1L), (2L, "a", 2L), (3L, "b", 10L)
    ).toDF("k", "g", "v"), Seq("k"), root)
    // epoch 2: k=2 MOVES a->b and changes v; k=4 inserts into c
    VersionedStore.upsert(Seq(
      (2L, "b", 5L), (4L, "c", 7L)
    ).toDF("k", "g", "v"), Seq("k"), root)
    // epoch 3: delete k=3 (b loses a row), k=1 (group a EMPTIES)
    VersionedStore.delete(Seq(1L, 3L).toDF("k"), root)

    for (from <- 1L to 3L; to <- from to 3L) {
      val cdc = VersionedStore.changelog(spark, root, from, to, images = true)
      val inc = MaterializedView.refreshSum(viewOf(root, from), cdc,
        Seq("g"), "v").orderBy("g").collect().toSeq
      val scratch = viewOf(root, to).orderBy("g").collect().toSeq
      assert(inc == scratch, s"view@$from + cdc($from,$to) != view@$to")
    }
    // the end state: a gone, b has only the moved row, c the insert
    assert(viewOf(root, 3).orderBy("g").as[(String, Long, Long)]
      .collect().toSeq == Seq(("b", 5L, 1L), ("c", 7L, 1L)))
  }

  test("a changelog cut from the wrong epoch fails fast") {
    val root = tmpDir("mv_bad") + "/store"
    VersionedStore.upsert(Seq((1L, "a", 1L)).toDF("k", "g", "v"), Seq("k"), root)
    VersionedStore.delete(Seq(1L).toDF("k"), root)
    val cdc = VersionedStore.changelog(spark, root, 1, 2, images = true)
    // applying the (1,2] delete-changelog to the ALREADY-DELETED view@2
    // would drive group a's count to -1
    val ex = intercept[Exception] {
      MaterializedView.refreshSum(viewOf(root, 2), cdc, Seq("g"), "v")
        .collect()
    }
    assert(ex.getMessage.contains("negative group count") ||
      Option(ex.getCause).exists(_.getMessage.contains("negative group count")),
      s"unexpected failure: ${ex.getMessage}")
  }

  // ----------------------------------------- min/max (non-distributive)

  private def mmViewOf(root: String, epoch: Long) =
    MaterializedView.minMaxView(
      VersionedStore.readAsOf(spark, root, epoch), Seq("g"), col("v"))

  /** Four epochs covering every refresh case: a broken max needing
    * recompute, interior retractions, dominating inserts, a SECOND
    * max-holder surviving a retraction at the max, an emptied group,
    * a group-moving update, and a fresh group. */
  private def buildMinMax(root: String): Unit = {
    VersionedStore.upsert(Seq(
      (1L, "a", 5L), (2L, "a", 8L),
      (3L, "b", 1L), (4L, "b", 9L), (5L, "b", 4L),
      (6L, "c", 7L), (7L, "d", 2L), (8L, "d", 3L)
    ).toDF("k", "g", "v"), Seq("k"), root)
    // e2: a's max retracted without a dominating insert (recompute);
    // b gains a dominating new min AND an interior row rises to a
    // second max-holder (both propagate); e is a fresh group
    VersionedStore.upsert(Seq(
      (2L, "a", 6L), (9L, "b", 0L), (5L, "b", 9L), (10L, "e", 100L)
    ).toDF("k", "g", "v"), Seq("k"), root)
    // e3: c empties (recompute to zero rows -> dropped); b loses ONE
    // of its two max-holders (recompute; the value survives)
    VersionedStore.delete(Seq(6L, 4L).toDF("k"), root)
    // e4: k=1 MOVES a->d, retracting a's min and inserting d's new max
    VersionedStore.upsert(Seq((1L, "d", 5L)).toDF("k", "g", "v"),
      Seq("k"), root)
  }

  test("min/max refresh equals rebuild over every epoch pair") {
    val root = tmpDir("mv_minmax") + "/store"
    buildMinMax(root)
    for (from <- 1L to 4L; to <- from to 4L) {
      val cdc = VersionedStore.changelog(spark, root, from, to, images = true)
      val inc = MaterializedView.refreshMinMax(mmViewOf(root, from), cdc,
          Seq("g"), "v", VersionedStore.readAsOf(spark, root, to))
        .orderBy("g").collect().toSeq
      val scratch = mmViewOf(root, to).orderBy("g").collect().toSeq
      assert(inc == scratch, s"minmax view@$from + cdc($from,$to) != view@$to")
    }
    assert(mmViewOf(root, 4).orderBy("g").as[(String, Long, Long, Long)]
      .collect().toSeq == Seq(
        ("a", 6L, 6L, 1L), ("b", 0L, 9L, 3L), ("d", 2L, 5L, 3L),
        ("e", 100L, 100L, 1L)))
  }

  test("min/max recompute touches EXACTLY the affected groups") {
    val root = tmpDir("mv_minmax_scope") + "/store"
    buildMinMax(root)
    // analytically, (1,2] breaks only group a's max: b's retraction
    // (4) is interior and its inserts dominate both sides it touches,
    // e is insert-only, c/d untouched. Serve the recompute from a
    // snapshot RESTRICTED to {a} — had the refresh recomputed any
    // other group, that group would vanish from the output and parity
    // with the full rebuild would break.
    val cdc = VersionedStore.changelog(spark, root, 1, 2, images = true)
    val restricted = VersionedStore.readAsOf(spark, root, 2)
      .filter($"g" === "a")
    val inc = MaterializedView.refreshMinMax(mmViewOf(root, 1), cdc,
        Seq("g"), "v", restricted)
      .orderBy("g").collect().toSeq
    assert(inc == mmViewOf(root, 2).orderBy("g").collect().toSeq,
      "recompute scope leaked beyond the affected groups")
  }

  test("randomized history: min/max refresh equals rebuild on every epoch pair") {
    // seeded random upsert/delete history over group-moving rows with
    // negative values — sweeps every (from, to) pair so any missed
    // recompute case (extreme retracted, group emptied, group moved,
    // re-inserted) surfaces as a rebuild mismatch
    val rnd = new scala.util.Random(17)
    val root = tmpDir("mv_minmax_prop") + "/store"
    val groups = Vector("a", "b", "c", "d")
    def randRows(ks: Seq[Long]) =
      ks.map(k => (k, groups(rnd.nextInt(groups.size)),
        (rnd.nextInt(41) - 20).toLong)).toDF("k", "g", "v")
    VersionedStore.upsert(randRows(1L to 30L), Seq("k"), root)
    (1 to 5).foreach { _ =>
      if (rnd.nextBoolean()) {
        val ks = (1L to 40L).filter(_ => rnd.nextInt(4) == 0)
        if (ks.nonEmpty) VersionedStore.upsert(randRows(ks), Seq("k"), root)
      } else {
        val ks = (1L to 40L).filter(_ => rnd.nextInt(6) == 0)
        if (ks.nonEmpty) VersionedStore.delete(ks.toDF("k"), root)
      }
    }
    val cur = VersionedStore.currentEpoch(root)
    assert(cur >= 3L, "fixture must commit a multi-epoch history")
    for (from <- 1L to cur; to <- from to cur) {
      val cdc = VersionedStore.changelog(spark, root, from, to, images = true)
      val inc = MaterializedView.refreshMinMax(mmViewOf(root, from), cdc,
          Seq("g"), "v", VersionedStore.readAsOf(spark, root, to))
        .orderBy("g").collect().toSeq
      assert(inc == mmViewOf(root, to).orderBy("g").collect().toSeq,
        s"minmax refresh diverged on epoch pair ($from,$to)")
    }
  }

  test("NULL group values merge through sum and min/max refresh") {
    // null is a legal group (groupBy gives it its own group), so the
    // view<->delta joins must be null-safe: an insert-only delta for
    // an existing null group must MERGE into it, never duplicate it
    val root = tmpDir("mv_nullg") + "/store"
    VersionedStore.upsert(Seq[(Long, Option[String], Long)](
      (1L, None, 5L), (2L, None, 8L), (3L, Some("a"), 2L)
    ).toDF("k", "g", "v"), Seq("k"), root)
    // e2: insert-only into the EXISTING null group, plus an update
    // that MOVES a row from group a into the null group
    VersionedStore.upsert(Seq[(Long, Option[String], Long)](
      (4L, None, 1L), (3L, None, 9L)
    ).toDF("k", "g", "v"), Seq("k"), root)
    // e3: retract the null group's max (forces the recompute path
    // through the null-safe semi-join)
    VersionedStore.delete(Seq(3L).toDF("k"), root)
    for (from <- 1L to 3L; to <- from to 3L) {
      val cdc = VersionedStore.changelog(spark, root, from, to, images = true)
      val sumInc = MaterializedView.refreshSum(viewOf(root, from), cdc,
        Seq("g"), "v").orderBy("g").collect().toSeq
      assert(sumInc == viewOf(root, to).orderBy("g").collect().toSeq,
        s"sum view with null group diverged on ($from,$to)")
      val mmInc = MaterializedView.refreshMinMax(mmViewOf(root, from), cdc,
          Seq("g"), "v", VersionedStore.readAsOf(spark, root, to))
        .orderBy("g").collect().toSeq
      assert(mmInc == mmViewOf(root, to).orderBy("g").collect().toSeq,
        s"minmax view with null group diverged on ($from,$to)")
    }
    assert(viewOf(root, 3).filter($"g".isNull).count() == 1L,
      "exactly one (merged) null-group row must survive")
  }

  test("min/max changelog cut from the wrong epoch fails fast") {
    val root = tmpDir("mv_minmax_bad") + "/store"
    VersionedStore.upsert(Seq((1L, "a", 1L)).toDF("k", "g", "v"), Seq("k"), root)
    VersionedStore.delete(Seq(1L).toDF("k"), root)
    val cdc = VersionedStore.changelog(spark, root, 1, 2, images = true)
    val ex = intercept[Exception] {
      MaterializedView.refreshMinMax(mmViewOf(root, 2), cdc, Seq("g"), "v",
        VersionedStore.readAsOf(spark, root, 2)).collect()
    }
    assert(ex.getMessage.contains("inconsistent group delta") ||
      Option(ex.getCause).exists(
        _.getMessage.contains("inconsistent group delta")),
      s"unexpected failure: ${ex.getMessage}")
  }
}
