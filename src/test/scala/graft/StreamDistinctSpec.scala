package graft

import org.apache.spark.sql.functions._
import graft.ops.Cardinality
import graft.streaming.StreamDistinct

/** Streaming HLL state == batch sketch, across micro-batch boundaries,
  * null values, and on replay — the merge-exactness property carried
  * into flatMapGroupsWithState. */
class StreamDistinctSpec extends SparkSpec {
  import spark.implicits._

  private def runStream(phases: Seq[Seq[(String, String)]]): Map[String, (Long, Long)] =
    StreamDistinct.replayEstimates(spark,
        phases.map(_.toDF("k", "v")), tmpDir("sdist"))
      .as[(String, Long, Long)].collect()
      .map { case (k, z, e) => k -> ((z, e)) }.toMap

  test("final streamed estimates equal the one-shot batch sketch") {
    // overlapping values across three phases (cross-batch register
    // merging must not double-count or lose state), plus null values
    // (skipped on BOTH paths — COUNT(DISTINCT) semantics)
    val phases = Seq(
      (1 to 400).map(i => ("a", s"u$i")) ++ (1 to 50).map(i => ("b", s"u$i")),
      (200 to 600).map(i => ("a", s"u$i")) ++ Seq(("a", null: String)),
      (1 to 80).map(i => ("b", s"x$i")) ++ Seq(("c", "only")))
    val streamed = runStream(phases)
    val batch = Cardinality.approxDistinct(
        phases.flatten.toDF("k", "v"), Seq("k"), $"v")
      .as[(String, Long, Long)].collect()
      .map { case (k, z, e) => k -> ((z, e)) }.toMap
    assert(streamed == batch,
      s"stream $streamed != batch $batch")
    // and replaying the identical stream reproduces it bit-for-bit
    assert(runStream(phases) == streamed)
  }
}
