package graft

import java.util.concurrent.CountDownLatch

import org.apache.spark.sql.functions._

import graft.sinks.VersionedStore

/** Writer-vs-writer and reader-vs-vacuum isolation contracts
  * (round-13): two deliberately racing writers with DISJOINT buckets
  * both commit through the optimistic rebase, overlapping writers
  * still conflict loudly, and a long-running reader is protected from
  * a concurrent vacuum by the grace window (or fails loudly without
  * one — never serves wrong rows). */
class ConcurrencySpec extends SparkSpec {
  import spark.implicits._

  /** Keys grouped by the bucket they hash to under the store's layout
    * (the exact pmod(hash) expression the writer uses). */
  private def bucketsOf(keys: Seq[Long], n: Int): Map[Long, Int] =
    keys.toDF("k")
      .select(col("k"), pmod(hash(col("k")), lit(n)).as("b"))
      .as[(Long, Int)].collect().toMap

  /** Run `writerA` on a named thread that PAUSES at the commit fence
    * until `resume` fires; run `writerB` inline meanwhile. Returns A's
    * failure, if any. */
  private def race(writerA: => Unit, writerB: => Unit): Option[Throwable] = {
    val reached = new CountDownLatch(1)
    val resume = new CountDownLatch(1)
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]
    VersionedStore.beforeCommit = { _ =>
      if (Thread.currentThread().getName == "writerA") {
        reached.countDown()
        resume.await()
      }
    }
    try {
      val a = new Thread(() => {
        try writerA catch { case t: Throwable => failure.set(t) }
      }, "writerA")
      a.start()
      reached.await()
      writerB // commits its epoch while A is held at the fence
      resume.countDown()
      a.join()
      Option(failure.get())
    } finally VersionedStore.beforeCommit = _ => ()
  }

  test("disjoint-bucket racers BOTH commit: the loser rebases, serialized") {
    val root = tmpDir("conc_disjoint") + "/store"
    val n = 8
    VersionedStore.upsert((1L to 50L).map(k => (k, k)).toDF("k", "v"),
      Seq("k"), root, nBuckets = n)
    // pick key sets from two DIFFERENT buckets so the race is
    // guaranteed disjoint whatever the hash layout
    val byBucket = bucketsOf(1L to 50L, n).groupMap(_._2)(_._1)
    val Seq(bA, bB) = byBucket.keys.toSeq.sorted.take(2)
    val keysA = byBucket(bA).toSeq.sorted.take(3)
    val keysB = byBucket(bB).toSeq.sorted.take(3)

    val aFail = race(
      writerA = VersionedStore.upsert(
        keysA.map(k => (k, k + 1000L)).toDF("k", "v"), Seq("k"), root),
      writerB = assert(VersionedStore.upsert(
        keysB.map(k => (k, k + 2000L)).toDF("k", "v"), Seq("k"), root) == 2L))
    assert(aFail.isEmpty, s"disjoint racer must rebase, failed: $aFail")

    // serialized history: B won epoch 2, A rebased onto epoch 3
    val cs = VersionedStore.commits(root)
    assert(cs.map(_.epoch) == Seq(1L, 2L, 3L), s"epochs: $cs")
    assert(cs(1).buckets == Seq(bB) && cs(2).buckets == Seq(bA),
      s"bucket attribution: $cs")
    // both writers' rows are live; the intermediate snapshot shows
    // only the epoch-2 winner's
    val cur = VersionedStore.read(spark, root).as[(Long, Long)]
      .collect().toMap
    keysA.foreach(k => assert(cur(k) == k + 1000L, s"A's key $k"))
    keysB.foreach(k => assert(cur(k) == k + 2000L, s"B's key $k"))
    val mid = VersionedStore.readAsOf(spark, root, 2L).as[(Long, Long)]
      .collect().toMap
    keysA.foreach(k => assert(mid(k) == k, s"A invisible at epoch 2: $k"))
    keysB.foreach(k => assert(mid(k) == k + 2000L))
  }

  test("overlapping-bucket racers still conflict LOUDLY; loser invisible") {
    val root = tmpDir("conc_overlap") + "/store"
    VersionedStore.upsert((1L to 20L).map(k => (k, k)).toDF("k", "v"),
      Seq("k"), root, nBuckets = 4)
    // same key => same bucket => guaranteed overlap
    val aFail = race(
      writerA = VersionedStore.upsert(Seq((7L, 777L)).toDF("k", "v"),
        Seq("k"), root),
      writerB = VersionedStore.upsert(Seq((7L, 888L)).toDF("k", "v"),
        Seq("k"), root))
    assert(aFail.exists(_.getMessage.contains("concurrent writer conflict")),
      s"overlapping racer must abort loudly: $aFail")
    // the loser's staged generation is invisible and the winner's
    // update is intact — no lost update, no torn state
    val cur = VersionedStore.read(spark, root).as[(Long, Long)]
      .collect().toMap
    assert(cur(7L) == 888L && VersionedStore.currentEpoch(root) == 2L)
    // vacuum sweeps the loser's abandoned epoch-2 staging rename target
    VersionedStore.vacuum(root, 2L)
    assert(VersionedStore.read(spark, root).as[(Long, Long)]
      .collect().toMap.apply(7L) == 888L)
  }

  test("a MOR delta racer rebases too: chain lands after the winner") {
    val root = tmpDir("conc_mor") + "/store"
    val n = 8
    VersionedStore.upsert((1L to 50L).map(k => (k, k)).toDF("k", "v"),
      Seq("k"), root, nBuckets = n)
    val byBucket = bucketsOf(1L to 50L, n).groupMap(_._2)(_._1)
    val Seq(bA, bB) = byBucket.keys.toSeq.sorted.take(2)
    val kA = byBucket(bA).head
    val kB = byBucket(bB).head
    val aFail = race(
      writerA = VersionedStore.deltaUpsert(Seq((kA, 111L)).toDF("k", "v"),
        Seq("k"), root),
      writerB = VersionedStore.deltaUpsert(Seq((kB, 222L)).toDF("k", "v"),
        Seq("k"), root))
    assert(aFail.isEmpty, s"disjoint delta racer must rebase: $aFail")
    val cur = VersionedStore.read(spark, root).as[(Long, Long)]
      .collect().toMap
    assert(cur(kA) == 111L && cur(kB) == 222L)
    assert(VersionedStore.commits(root).map(_.kind)
      == Seq("upsert", "dapply", "dapply"))
  }

  test("stress: eight real racers on disjoint buckets all commit, serialized") {
    val root = tmpDir("conc_stress") + "/store"
    val n = 32
    VersionedStore.upsert((1L to 200L).map(k => (k, k)).toDF("k", "v"),
      Seq("k"), root, nBuckets = n)
    // eight writers, each owning ONE distinct bucket's keys, all
    // released together — no pause hook, the races are real: losers
    // rebase through however many collisions the scheduler deals them
    val byBucket = bucketsOf(1L to 200L, n).groupMap(_._2)(_._1)
    val owners = byBucket.toSeq.sortBy(_._1).take(8)
      .map { case (b, ks) => b -> ks.toSeq.sorted.take(4) }
    val start = new CountDownLatch(1)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = owners.map { case (b, ks) =>
      new Thread(() => {
        try {
          start.await()
          VersionedStore.upsert(ks.map(k => (k, k + 10000L)).toDF("k", "v"),
            Seq("k"), root)
        } catch { case t: Throwable => failures.add(t) }
      }, s"racer-b$b")
    }
    threads.foreach(_.start())
    start.countDown()
    threads.foreach(_.join(120000))
    assert(failures.isEmpty, s"disjoint racers must all commit: " +
      s"${Option(failures.peek()).map(_.getMessage)}")
    // a correct serialization: epochs 2..9, one per writer, each
    // touching exactly its own bucket, and every write visible
    val cs = VersionedStore.commits(root)
    assert(cs.map(_.epoch) == (1L to 9L), s"epochs: ${cs.map(_.epoch)}")
    assert(cs.drop(1).map(_.buckets).forall(_.length == 1))
    assert(cs.drop(1).flatMap(_.buckets).sorted == owners.map(_._1).sorted,
      "each racer's bucket must appear exactly once")
    val cur = VersionedStore.read(spark, root).as[(Long, Long)]
      .collect().toMap
    owners.foreach { case (_, ks) =>
      ks.foreach(k => assert(cur(k) == k + 10000L, s"lost update for $k"))
    }
    assert(cur.size == 200)
  }

  test("vacuum grace window shields a concurrent reader; aged gens sweep") {
    val root = tmpDir("conc_grace") + "/store"
    VersionedStore.upsert((1L to 30L).map(k => (k, k)).toDF("k", "v"),
      Seq("k"), root, nBuckets = 2)
    VersionedStore.upsert((1L to 30L).map(k => (k, k * 2)).toDF("k", "v"),
      Seq("k"), root)
    // a reader resolves its snapshot BEFORE the vacuum lands
    val stale = VersionedStore.readAsOf(spark, root, 1L)
    val r1 = VersionedStore.vacuum(root, 2L, graceMillis = 3600_000L)
    assert(r1.watermark == 2L && r1.deletedGens == 0L,
      s"everything is younger than the grace window: $r1")
    // the in-flight reader finishes safely inside the window…
    assert(stale.as[(Long, Long)].collect().toMap.apply(5L) == 5L)
    // …while NEW reads fail fast at the bumped watermark
    intercept[IllegalArgumentException] {
      VersionedStore.readAsOf(spark, root, 1L)
    }
    // once aged past the grace window (clock injected), the same
    // vacuum sweeps the floor's predecessors
    val r2 = VersionedStore.vacuum(root, 2L, graceMillis = 3600_000L,
      nowMillis = System.currentTimeMillis() + 7200_000L)
    assert(r2.deletedGens > 0L, s"aged generations must sweep: $r2")
  }

  test("without grace, a racing reader fails LOUDLY — never wrong rows") {
    val root = tmpDir("conc_nograce") + "/store"
    VersionedStore.upsert((1L to 30L).map(k => (k, k)).toDF("k", "v"),
      Seq("k"), root, nBuckets = 2)
    VersionedStore.upsert((1L to 30L).map(k => (k, k * 2)).toDF("k", "v"),
      Seq("k"), root)
    val stale = VersionedStore.readAsOf(spark, root, 1L)
    val r = VersionedStore.vacuum(root, 2L) // grace 0: deletes now
    assert(r.deletedGens > 0L)
    // the stale reader's files are gone: its scan must FAIL (the
    // generations were immutable, so the only failure mode is loud)
    intercept[Exception] { stale.collect() }
    // and the current snapshot is untouched
    assert(VersionedStore.read(spark, root).as[(Long, Long)]
      .collect().toMap.apply(5L) == 10L)
  }
}
