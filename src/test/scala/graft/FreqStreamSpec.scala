package graft

import org.apache.spark.sql.functions._

import graft.streaming.FreqStream

/** Streaming MG state across micro-batch boundaries: exact-regime
  * equality with the batch aggregate, and truncating-regime
  * mergeable-summaries bounds (order-free, so deterministic even
  * though MG truncation is arrival-order sensitive). */
class FreqStreamSpec extends SparkSpec {
  import spark.implicits._

  private def runStream(phases: Seq[Seq[(String, String)]], k: Int)
      : Seq[(String, Long, String, Long)] =
    FreqStream.replayFrequent(spark,
        phases.map(_.toDF("k", "v")), tmpDir("sfreq"), k)
      .as[(String, Long, String, Long)].collect().toSeq

  test("exact regime: final streamed summary equals exact counts") {
    val phases = Seq(
      (1 to 300).map(i => ("a", s"t${i % 7}")) ++
        (1 to 40).map(i => ("b", s"t${i % 3}")),
      (1 to 200).map(i => ("a", s"t${i % 11}")) ++
        Seq(("a", null: String)), // nulls don't count on either path
      (1 to 60).map(i => ("b", s"x${i % 5}")) ++ Seq(("c", "only")))
    val streamed = runStream(phases, k = 32)
    val flat = phases.flatten.filter(_._2 != null)
    val wantCounts = flat.groupBy(identity).view.mapValues(_.size.toLong)
      .toMap.map { case ((g, it), c) => (g, it) -> c }
    val wantTotals = flat.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(streamed.map { case (g, _, it, c) => (g, it) -> c }.toMap
      == wantCounts)
    assert(streamed.map { case (g, n, _, _) => g -> n }.toMap == wantTotals)
    // replaying the identical stream reproduces it exactly
    assert(runStream(phases, k = 32).toSet == streamed.toSet)
  }

  test("a key with only-null values emits nothing (batch parity)") {
    val phases = Seq(Seq(("a", "x"), ("nul", null: String)),
      Seq(("nul", null: String)))
    val got = runStream(phases, k = 8)
    assert(got.map(_._1).toSet == Set("a"))
  }

  test("truncating regime: bounds hold across any batch split") {
    val heavy = Seq.fill(300)("H1") ++ Seq.fill(200)("H2")
    val tail = (1 to 600).map(i => s"t${i % 120}")
    val items = new scala.util.Random(7).shuffle(heavy ++ tail)
    val n = items.size
    val k = 12
    val (p1, p2) = items.splitAt(items.size / 3)
    val got = runStream(Seq(p1.map(("g", _)), p2.map(("g", _))), k)
    assert(got.size <= k)
    assert(got.forall(_._2 == n.toLong), "n_total must count every fold")
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = n.toDouble / (k + 1)
    val est = got.map { case (_, _, it, c) => it -> c }.toMap
    for ((it, c) <- truth if c > bound)
      assert(est.contains(it), s"guaranteed item $it (cnt=$c) missing")
    for ((it, e) <- est)
      assert(e <= truth(it) && truth(it) - e <= bound,
        s"$it: est=$e true=${truth(it)} bound=$bound")
  }
}
