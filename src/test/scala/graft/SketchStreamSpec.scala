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

  test("versioned KMV ledger: kill/resume parity, time travel, replay fence, k guard") {
    import graft.sinks.VersionedStore
    val phase1 = ((1 to 120).map(i => ("a", s"u-$i")) ++
      (1 to 10).map(i => ("b", s"v-$i")))
    val phase2 = ((60 to 200).map(i => ("a", s"u-$i")) ++ Seq(("c", "solo")))

    def run(root: String, interrupted: Boolean): String = {
      val inDir = s"$root/in"
      val store = s"$root/store"
      phase1.toDF("k", "v").coalesce(1).write.parquet(inDir)
      var q = SketchStream.kmvToStore(spark, inDir, K, store)
      q.processAllAvailable()
      if (interrupted) {
        q.stop() // killed between batches; resume from the checkpoint
        q = SketchStream.kmvToStore(spark, inDir, K, store)
      }
      phase2.toDF("k", "v").coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
      q.stop()
      store
    }
    def ledger(store: String, asOf: Option[Long]) =
      SketchStream.readKmvLedger(spark, store, K, asOf)
        .as[(String, Long, Array[Long])].collect()
        .map { case (g, n, a) => (g, n, a.toSeq) }.sortBy(_._1).toSeq

    val clean = run(tmpDir("vkmv_clean"), interrupted = false)
    val killed = run(tmpDir("vkmv_kill"), interrupted = true)
    assert(ledger(clean, None) == ledger(killed, None),
      "kill/resume must land a byte-identical ledger")

    // final ledger == the batch sketch over everything
    def batchOf(rows: Seq[(String, String)]) =
      ThetaSketch.sketch(rows.toDF("k", "v"), Seq("k"), $"v", K)
        .as[(String, Array[Long])].collect()
        .map { case (g, a) =>
          (g, rows.count(_._1 == g).toLong, a.toSeq) }.sortBy(_._1).toSeq
    assert(ledger(clean, None) == batchOf(phase1 ++ phase2))

    // TIME TRAVEL: the ledger as of epoch 1 is exactly the phase-1
    // sketch fleet, served after epoch 2 rewrote the same keys
    assert(VersionedStore.currentEpoch(clean) == 2L)
    assert(ledger(clean, Some(1L)) == batchOf(phase1))

    // replay fence: re-landing batch 0 through the maintainer's write
    // path is a no-op (the tagged commit is the idempotency ledger)
    graft.streaming.EpochStream(Seq("k")).processBatch(
      phase1.toDF("k", "v").withColumn("k_param", lit(K)), 0L, clean)
    assert(VersionedStore.currentEpoch(clean) == 2L,
      "a replayed micro-batch must not commit a new epoch")

    // a consumer asking for a different k fails fast (setOps contract)
    val e = intercept[IllegalArgumentException] {
      SketchStream.readKmvLedger(spark, clean, K + 1)
    }
    assert(e.getMessage.contains("different k"), e.getMessage)
  }
}
