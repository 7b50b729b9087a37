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

  test("versioned MG ledger: eviction deletes, kill/resume parity, time travel") {
    import graft.sinks.VersionedStore
    val k = 3
    // phase 1 fills the k=3 counters; phase 2's flood of new items
    // EVICTS some of them — the ledger must drop the evicted rows,
    // which a plain keyed upsert never would
    val phase1 = Seq.fill(6)("a") ++ Seq.fill(5)("b") ++ Seq.fill(4)("c")
    val phase2 = (1 to 30).map(i => s"x${i % 5}")

    def run(root: String, interrupted: Boolean): String = {
      val inDir = s"$root/in"
      val store = s"$root/store"
      phase1.map(("g", _)).toDF("k", "v").coalesce(1).write.parquet(inDir)
      var q = FreqStream.frequentToStore(spark, inDir, k, store)
      q.processAllAvailable()
      if (interrupted) {
        q.stop()
        q = FreqStream.frequentToStore(spark, inDir, k, store)
      }
      phase2.map(("g", _)).toDF("k", "v").coalesce(1)
        .write.mode("append").parquet(inDir)
      q.processAllAvailable()
      q.stop()
      store
    }
    def ledger(store: String, asOf: Option[Long]): Seq[(String, String, Long, Long)] = {
      val df = asOf match {
        case Some(e) => VersionedStore.readAsOf(spark, store, e)
        case None => VersionedStore.read(spark, store)
      }
      df.select("k", "item", "n_total", "cnt")
        .as[(String, String, Long, Long)].collect().toSeq.sorted
    }
    def stateAfter(folds: Seq[String], n: Long): Seq[(String, String, Long, Long)] = {
      val agg = new graft.ops.FreqItems.MgAgg(k)
      val m = folds.foldLeft(Map.empty[String, Long])(agg.reduce)
      agg.finish(m).map(e => ("g", e.item, n, e.cnt)).toSeq.sorted
    }

    val clean = run(tmpDir("vmg_clean"), interrupted = false)
    val killed = run(tmpDir("vmg_kill"), interrupted = true)
    assert(ledger(clean, None) == ledger(killed, None),
      "kill/resume must land a byte-identical MG ledger")
    assert(VersionedStore.currentEpoch(clean) == 2L)
    // epoch 1 is the EXACT regime (3 distinct <= k), so its snapshot
    // is order-independent and equals the sequential fold state
    assert(ledger(clean, Some(1L)) == stateAfter(phase1, phase1.size.toLong))
    // epoch 2 is the truncating regime (order-sensitive estimates):
    // assert the order-FREE mergeable-summaries bounds instead
    val fin = ledger(clean, Some(2L))
    val n = (phase1.size + phase2.size).toLong
    assert(fin.size <= k && fin.forall(_._3 == n))
    val truth = (phase1 ++ phase2).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val bound = n.toDouble / (k + 1)
    fin.foreach { case (_, it, _, c) =>
      assert(c <= truth(it) && truth(it) - c <= bound,
        s"$it: est=$c true=${truth(it)} bound=$bound")
    }
    // eviction really happened: some phase-1 item left the ledger
    val items1 = ledger(clean, Some(1L)).map(_._2).toSet
    val items2 = fin.map(_._2).toSet
    assert((items1 -- items2).nonEmpty,
      s"fixture must evict a phase-1 counter: $items1 -> $items2")
    // and the CDC between the epochs shows those deletes
    val deletes = VersionedStore.changelog(spark, clean, 1L, 2L)
      .filter($"change" === "delete").select("item")
      .as[String].collect().toSet
    assert(deletes == (items1 -- items2))
  }
}
