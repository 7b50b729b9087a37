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
}
