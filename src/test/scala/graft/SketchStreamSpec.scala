package graft

import org.apache.spark.sql.functions._

import graft.ops.{Cardinality, CmSketch, ThetaSketch}
import graft.streaming.SketchStream

/** Streaming KMV/CMS maintainers: EXACT stream == batch equality (the
  * folds are order-independent, unlike MG), random-split invariance,
  * and seamless merge of a streamed KMV row with a batch ledger row. */
class SketchStreamSpec extends SparkSpec {
  import spark.implicits._

  private val K = 16

  private def runKmv(phases: Seq[Seq[(String, String)]])
      : Map[String, (Long, Seq[Long])] =
    SketchStream.replayKmv(spark, phases.map(_.toDF("k", "v")),
        tmpDir("skmv"), K)
      .as[(String, Long, Array[Long])].collect()
      .map { case (g, n, a) => g -> ((n, a.toSeq)) }.toMap

  test("streamed KMV state equals the batch sketch exactly") {
    val phases = Seq(
      (1 to 120).map(i => ("a", s"u-$i")) ++
        (1 to 10).map(i => ("b", s"v-$i")),
      (60 to 200).map(i => ("a", s"u-$i")) ++ Seq(("a", null: String)),
      Seq(("c", "solo")))
    val got = runKmv(phases)
    val flat = phases.flatten.filter(_._2 != null)
    flat.groupBy(_._1).foreach { case (g, rows) =>
      val batch = ThetaSketch.sketch(rows.toDF("k", "v"), Seq("k"), $"v", K)
        .select("kmv").as[Array[Long]].head().toSeq
      assert(got(g)._2 == batch, s"key $g: stream != batch")
      assert(got(g)._1 == rows.size.toLong)
    }
    // identical replay lands identical state
    assert(runKmv(phases) == got)
  }

  test("KMV split invariance: any phase partitioning, same state") {
    val items = (1 to 150).map(i => ("g", s"it-${i % 90}"))
    val rnd = new scala.util.Random(11)
    val whole = runKmv(Seq(items))
    (1 to 3).foreach { _ =>
      val cut1 = 1 + rnd.nextInt(items.size - 2)
      val cut2 = cut1 + 1 + rnd.nextInt(items.size - cut1 - 1)
      val split = Seq(items.take(cut1), items.slice(cut1, cut2),
        items.drop(cut2))
      assert(runKmv(split) == whole)
    }
  }

  test("streamed KMV row merges with a batch ledger row seamlessly") {
    val streamPart = (1 to 80).map(i => ("g", s"s-$i"))
    val batchPart = (41 to 140).map(i => ("g", s"s-$i"))
    val streamed = runKmv(Seq(streamPart))("g")._2
    val ledger = ThetaSketch.sketch(batchPart.toDF("k", "v"),
      Seq("k"), $"v", K)
    val merged = ThetaSketch.mergeSketches(
        ledger.unionByName(Seq(("g", streamed.toArray)).toDF("k", "kmv")),
        Seq("k"), K)
      .select("kmv").as[Array[Long]].head().toSeq
    val whole = ThetaSketch.sketch(
        (streamPart ++ batchPart).toDF("k", "v"), Seq("k"), $"v", K)
      .select("kmv").as[Array[Long]].head().toSeq
    assert(merged == whole, "stream/batch seam must be invisible")
  }

  test("streamed CMS grid equals the batch grid exactly") {
    val d = 3; val w = 32
    val phases = Seq(
      (1 to 200).map(i => ("a", s"x-${i % 40}")),
      (1 to 100).map(i => ("a", s"y-${i % 25}")) ++
        (1 to 30).map(i => ("b", s"z-${i % 7}")))
    val got = SketchStream.replayCms(spark,
        phases.map(_.toDF("k", "v")), tmpDir("scms"), d, w)
      .as[(String, Int, Int, Long)].collect()
      .map { case (g, dd, c, n) => (g, dd, c) -> n }.toMap
    val flat = phases.flatten
    val want = flat.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
      CmSketch.sketch(rows.toDF("k", "v"), Seq("k"), $"v",
          depth = d, width = w)
        .select("d", "c", "cnt").as[(Int, Int, Long)].collect()
        .map { case (dd, c, n) => (g, dd, c) -> n }.toSeq
    }.toMap
    assert(got == want)
  }

  test("hash parity: the stream fold uses the plan-side hash") {
    // one item through the stream must occupy exactly hashLong(item)
    val got = runKmv(Seq(Seq(("g", "probe-key"))))("g")
    assert(got == ((1L, Seq(Cardinality.hashLong("probe-key")))))
  }
}
