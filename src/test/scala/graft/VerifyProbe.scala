package graft

import org.apache.spark.sql.functions._

/** Throwaway probe main (test scope) — rewritten per verify wave.
  * Wave: typed zero-job lookup, delete type cast, restore guard,
  * fold-forward history, null-safe view refresh. */
object VerifyProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    import spark.implicits._
    import graft.sinks.VersionedStore

    val root = java.nio.file.Files.createTempDirectory("probe_w1")
      .toString + "/store"
    VersionedStore.upsert(
      (1L to 40L).map(k => (k, k * 10)).toDF("k", "v"), Seq("k"), root)
    VersionedStore.upsert(
      (30L to 45L).map(k => (k, k * 10 + 1)).toDF("k", "v"), Seq("k"), root)

    // Int-typed probe against the BIGINT store finds rows
    val got = VersionedStore.lookup(spark, root, Seq(1, 30).toDF("k"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 10L), (30L, 301L)), s"typed lookup: $got")
    // pushed-down literal predicate visible in the plan
    val plan = VersionedStore.lookup(spark, root, Seq(1L).toDF("k"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && !plan.contains("Exchange"),
      s"lookup plan must be a pruned pushdown scan:\n$plan")

    // Int-typed delete hits; history serves per-epoch counts
    VersionedStore.delete(Seq(30).toDF("k"), root)
    val h = VersionedStore.history(spark, root)
      .orderBy("epoch").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(h.toSeq == Seq((1L, 40L), (2L, 45L), (3L, 44L)),
      s"history: ${h.mkString(",")}")

    // restore guard
    val ex = try { VersionedStore.restore(spark, root, 99L); "" }
    catch { case e: IllegalArgumentException => e.getMessage }
    assert(ex.contains("beyond current epoch"), s"guard: $ex")

    // null-safe sum view refresh over a null group
    val r2 = java.nio.file.Files.createTempDirectory("probe_w1b")
      .toString + "/store"
    VersionedStore.upsert(Seq[(Long, Option[String], Long)](
      (1L, None, 5L), (2L, Some("a"), 2L)).toDF("k", "g", "v"), Seq("k"), r2)
    VersionedStore.upsert(Seq[(Long, Option[String], Long)](
      (3L, None, 7L)).toDF("k", "g", "v"), Seq("k"), r2)
    val v1 = graft.ops.MaterializedView.sumView(
      VersionedStore.readAsOf(spark, r2, 1L), Seq("g"), col("v"))
    val ref = graft.ops.MaterializedView.refreshSum(v1,
      VersionedStore.changelog(spark, r2, 1L, 2L, images = true),
      Seq("g"), "v").collect()
    assert(ref.length == 2 &&
      ref.exists(r => r.isNullAt(0) && r.getLong(1) == 12L && r.getLong(2) == 2L),
      s"null group must merge: ${ref.mkString(",")}")

    println("PROBE OK: " + java.lang.Long.toString(100L + 23L))
    spark.stop()
  }
}
