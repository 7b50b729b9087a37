package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private val files = Seq(
    ("p1", "a", 60L), ("p1", "b", 60L), ("p1", "c", 60L),
    ("p1", "d", 200L), ("p1", "e", 10L),
    ("p2", "a", 500L)).toDF("part", "file", "bytes")

  test("bins cut at the running-total target, per partition") {
    val plan = Layout.compactionPlan(files, "part", "file", "bytes", 100L)
      .as[(String, String, Long, Long)].collect().toSet
    // p1: a(0)→bin0, b(60)→bin0, c(120)→bin1, d(180)→bin1, e(380)→bin3
    assert(plan == Set(
      ("p1", "a", 60L, 0L), ("p1", "b", 60L, 0L), ("p1", "c", 60L, 1L),
      ("p1", "d", 200L, 1L), ("p1", "e", 10L, 3L),
      ("p2", "a", 500L, 0L)))
  }

  test("summary aggregates per bin; re-planning compacted output is a no-op") {
    val summary = Layout.compactionSummary(
        Layout.compactionPlan(files, "part", "file", "bytes", 100L),
        "part", "bytes")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(summary == Set(
      ("p1", 0L, 2L, 120L), ("p1", 1L, 2L, 260L), ("p1", 3L, 1L, 10L),
      ("p2", 0L, 1L, 500L)))
    // idempotence: treat each produced bin as one compacted file of its
    // total size — re-planning at the SAME target yields only
    // single-file bins (every bin but a partition's last is ≥ target,
    // so consecutive files land in distinct bins)
    val compacted = summary.toSeq
      .map { case (p, b, _, tot) => (p, s"bin-$b", tot) }
      .toDF("part", "file", "bytes")
    val replan = Layout.compactionSummary(
        Layout.compactionPlan(compacted, "part", "file", "bytes", 100L),
        "part", "bytes")
      .as[(String, Long, Long, Long)].collect()
    assert(replan.forall(_._3 == 1L),
      s"re-plan should leave every bin single-file: ${replan.mkString(",")}")
  }

  test("plan is one window over the listing, no join or extra shuffle") {
    val plan = Layout.compactionPlan(files, "part", "file", "bytes", 100L)
    val ex = plan.queryExecution.executedPlan.toString
    assert(!ex.contains("Join"), s"metadata plan must not join:\n$ex")
  }
}
