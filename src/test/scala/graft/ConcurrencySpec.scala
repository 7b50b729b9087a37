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

  test("both-promoted overlapping writers: the replaced promoter aborts " +
      "LOUDLY, never publishes over foreign data") {
    // the round-13 ADVICE interleaving: A promotes, B promotes OVER A
    // (its crashed-leftover sweep deletes A's generation), then A
    // reaches the fence FIRST. With an existence-only ownership check
    // A would publish a commit marker over B's (soon-aborting) data —
    // a silent lost update for A's rows. The ownership TOKEN in
    // _SUCCESS makes A abort loudly instead; B, whose generation is
    // intact and its own, commits.
    val root = tmpDir("conc_bothpromoted") + "/store"
    VersionedStore.upsert((1L to 20L).map(k => (k, k)).toDF("k", "v"),
      Seq("k"), root, nBuckets = 4)
    val aAtFence = new CountDownLatch(1)
    val bAtFence = new CountDownLatch(1)
    val aGo = new CountDownLatch(1)
    val bGo = new CountDownLatch(1)
    VersionedStore.beforeCommit = { _ =>
      Thread.currentThread().getName match {
        case "writerA" => aAtFence.countDown(); aGo.await()
        case "writerB" => bAtFence.countDown(); bGo.await()
        case _ =>
      }
    }
    try {
      val aFail = new java.util.concurrent.atomic.AtomicReference[Throwable]
      val bFail = new java.util.concurrent.atomic.AtomicReference[Throwable]
      val a = new Thread(() => {
        try VersionedStore.upsert(Seq((7L, 777L)).toDF("k", "v"),
          Seq("k"), root)
        catch { case t: Throwable => aFail.set(t) }
      }, "writerA")
      a.start()
      aAtFence.await() // A fully promoted, held at the fence
      val b = new Thread(() => {
        try VersionedStore.upsert(Seq((7L, 888L)).toDF("k", "v"),
          Seq("k"), root)
        catch { case t: Throwable => bFail.set(t) }
      }, "writerB")
      b.start()
      bAtFence.await() // B promoted OVER A's generation, held too
      aGo.countDown(); a.join() // A commits FIRST — must abort
      bGo.countDown(); b.join()
      assert(Option(aFail.get()).exists(_.getMessage
          .contains("concurrent writer conflict")),
        s"the replaced promoter must abort loudly: ${aFail.get()}")
      assert(bFail.get() == null,
        s"the surviving promoter must commit: ${bFail.get()}")
      val cur = VersionedStore.read(spark, root).as[(Long, Long)]
        .collect().toMap
      assert(cur(7L) == 888L && VersionedStore.currentEpoch(root) == 2L,
        s"committed data must be the SURVIVING writer's: ${cur(7L)}")
    } finally VersionedStore.beforeCommit = _ => ()
  }

  test("sustained contention: looping racers all commit, attempts bounded") {
    val root = tmpDir("conc_sustained") + "/store"
    val n = 32
    VersionedStore.upsert((1L to 200L).map(k => (k, k)).toDF("k", "v"),
      Seq("k"), root, nBuckets = n)
    val byBucket = bucketsOf(1L to 200L, n).groupMap(_._2)(_._1)
    val owners = byBucket.toSeq.sortBy(_._1).take(4)
      .map { case (b, ks) => b -> ks.toSeq.sorted.take(2) }
    val epochsPer = 5
    VersionedStore.commitAttempts.clear()
    val start = new CountDownLatch(1)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = owners.map { case (b, ks) =>
      new Thread(() => {
        try {
          start.await()
          (1 to epochsPer).foreach { i =>
            VersionedStore.upsert(
              ks.map(k => (k, k + 1000L * i)).toDF("k", "v"), Seq("k"), root)
          }
        } catch { case t: Throwable => failures.add(t) }
      }, s"loop-racer-b$b")
    }
    threads.foreach(_.start())
    start.countDown()
    threads.foreach(_.join(240000))
    assert(failures.isEmpty, s"sustained racers must never starve: " +
      s"${Option(failures.peek()).map(_.getMessage)}")
    // serialized: 1 seed + 4 writers x 5 epochs
    val cs = VersionedStore.commits(root)
    assert(cs.map(_.epoch) == (1L to (1L + 4 * epochsPer)),
      s"epochs: ${cs.map(_.epoch)}")
    val cur = VersionedStore.read(spark, root).as[(Long, Long)]
      .collect().toMap
    assert(cur.size == 200, // round-15: completeness, not just own keys
      s"rebasing racers must never lose NON-batch rows: ${cur.size}")
    owners.foreach { case (_, ks) =>
      ks.foreach(k => assert(cur(k) == k + 5000L, s"lost update for $k"))
    }
    // fairness, measured: print the attempts histogram and assert the
    // tail is far from the 64-attempt livelock backstop
    import scala.jdk.CollectionConverters._
    val hist = VersionedStore.commitAttempts.asScala
      .map { case (k, v) => k -> v.get() }.toSeq.sortBy(_._1)
    info(s"commit-attempts histogram: " +
      hist.map { case (k, v) => s"$k->$v" }.mkString(", "))
    assert(hist.map(_._1).max <= 16,
      s"attempt tail must stay far from the livelock bound: $hist")
  }

  test("a checkpointed epoch is never re-committed (fence watermark guard)") {
    // the round-15 triple-stress root cause, pinned DETERMINISTICALLY:
    // writer A pauses at the fence for epoch 2; writer B commits epoch
    // 2; a vacuum checkpoint then TRUNCATES marker 2 into `_floors-2`
    // (aged clock — the age gate alone would also have held the
    // marker). A resumes: the marker it would probe is GONE, so
    // without the watermark guard A re-commits epoch 2 and its marker
    // SHADOWS the checkpoint — erasing B's bucket from history and
    // turning later merges into batch-only rewrites. With the guard, A
    // treats the retired epoch as a collision and rebases past the
    // watermark.
    val root = tmpDir("conc_retired") + "/store"
    val n = 8
    VersionedStore.upsert((1L to 50L).map(k => (k, k)).toDF("k", "v"),
      Seq("k"), root, nBuckets = n)
    val byBucket = bucketsOf(1L to 50L, n).groupMap(_._2)(_._1)
    val Seq(bA, bB) = byBucket.keys.toSeq.sorted.take(2)
    val keysA = byBucket(bA).toSeq.sorted.take(3)
    val keysB = byBucket(bB).toSeq.sorted.take(3)
    val aFail = race(
      writerA = VersionedStore.upsert(
        keysA.map(k => (k, k + 1000L)).toDF("k", "v"), Seq("k"), root),
      writerB = {
        assert(VersionedStore.upsert(
          keysB.map(k => (k, k + 2000L)).toDF("k", "v"), Seq("k"), root) == 2L)
        // age the MARKERS (not the clock: an injected future clock
        // would also age writer A's in-flight staged generation out of
        // the grace shield), then vacuum with a grace window: markers
        // truncate, young generations — including A's staging — stay
        val old = java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 2 * 3600_000L)
        Seq("_commit-0000001", "_commit-0000002").foreach { m =>
          java.nio.file.Files.setLastModifiedTime(
            java.nio.file.Paths.get(root.stripPrefix("file:"), m), old)
        }
        VersionedStore.vacuum(root, 2L, graceMillis = 3600_000L)
        val (fs, dir) = (new org.apache.hadoop.fs.Path(root).getFileSystem(
          spark.sparkContext.hadoopConfiguration),
          new org.apache.hadoop.fs.Path(root))
        assert(!fs.exists(new org.apache.hadoop.fs.Path(dir,
          "_commit-0000002")), "setup: marker 2 must be truncated")
      })
    assert(aFail.isEmpty, s"the retired-epoch writer must rebase: $aFail")
    val cs = VersionedStore.commits(root)
    assert(cs.map(_.epoch) == Seq(1L, 2L, 3L), s"epochs: $cs")
    assert(cs(1).buckets == Seq(bB) && cs(2).buckets == Seq(bA),
      "epoch 2 must stay B's checkpointed commit; A lands at 3: " + cs)
    val cur = VersionedStore.read(spark, root).as[(Long, Long)]
      .collect().toMap
    assert(cur.size == 50, s"no row may vanish: ${cur.size}")
    keysA.foreach(k => assert(cur(k) == k + 1000L))
    keysB.foreach(k => assert(cur(k) == k + 2000L))
  }

  test("TRIPLE stress: racers × follower polls × routine vacuums, zero loss") {
    // round-15 integration of the three pairwise contracts: sustained
    // contending writers keep committing, a follower keeps reading the
    // live snapshot, and ROUTINE vacuums (default grace — production
    // posture, shielded by the store-level grace floor) run throughout.
    // Zero lost updates, zero follower failures, attempts tail
    // unchanged vs the writers-only stress.
    val root = tmpDir("conc_triple") + "/store"
    val n = 32
    VersionedStore.upsert((1L to 200L).map(k => (k, k)).toDF("k", "v"),
      Seq("k"), root, nBuckets = n)
    VersionedStore.setVacuumGrace(root, 3600_000L) // the follower shield
    val byBucket = bucketsOf(1L to 200L, n).groupMap(_._2)(_._1)
    val owners = byBucket.toSeq.sortBy(_._1).take(4)
      .map { case (b, ks) => b -> ks.toSeq.sorted.take(2) }
    val epochsPer = 5
    VersionedStore.commitAttempts.clear()
    val start = new CountDownLatch(1)
    val writersDone = new java.util.concurrent.atomic.AtomicInteger(0)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val writers = owners.map { case (b, ks) =>
      new Thread(() => {
        try {
          start.await()
          (1 to epochsPer).foreach { i =>
            VersionedStore.upsert(
              ks.map(k => (k, k + 1000L * i)).toDF("k", "v"), Seq("k"), root)
          }
        } catch { case t: Throwable => failures.add(t) }
        finally { writersDone.incrementAndGet(); () }
      }, s"triple-racer-b$b")
    }
    val followerPolls = new java.util.concurrent.atomic.AtomicInteger(0)
    val follower = new Thread(() => {
      try {
        start.await()
        while (writersDone.get() < owners.size) {
          // a live-snapshot poll mid-contention: counts must always be
          // the full keyspace (upserts replace, never add/remove keys)
          val ks = VersionedStore.read(spark, root).select("k")
            .as[Long].collect().toSet
          if (ks.size != 200) {
            val missing = (1L to 200L).filterNot(ks.contains)
            val cs = VersionedStore.commits(root)
              .map(c => s"${c.epoch}:${c.kind}:${c.buckets.mkString("|")}")
            fail(s"follower saw a torn snapshot: ${ks.size} rows, " +
              s"missing $missing (buckets ${missing.map(k =>
                bucketsOf(Seq(k), n).head._2)}), commits=$cs")
          }
          followerPolls.incrementAndGet()
        }
      } catch { case t: Throwable => failures.add(t) }
    }, "triple-follower")
    val vacuums = new java.util.concurrent.atomic.AtomicInteger(0)
    val vacuumer = new Thread(() => {
      try {
        start.await()
        while (writersDone.get() < owners.size) {
          // routine vacuum at the current epoch, DEFAULT grace: the
          // store-level floor must shield every in-flight chain read
          VersionedStore.vacuum(root, VersionedStore.currentEpoch(root))
          vacuums.incrementAndGet()
          Thread.sleep(50)
        }
      } catch { case t: Throwable => failures.add(t) }
    }, "triple-vacuumer")
    // a CHANGE-FEED subscriber rides the stress too (round-15's two
    // big pieces, integrated): every epoch the racers commit must
    // stream as keyed facts whose fold reproduces the final snapshot
    val subDir = tmpDir("conc_triple_sub")
    val subscriber = spark.readStream.format("graft-vstore")
      .option("path", root).option("changeFeed", "true")
      .option("startingEpoch", "0")
      .load()
      .writeStream.format("parquet")
      .option("path", s"$subDir/out")
      .option("checkpointLocation", s"$subDir/ckpt")
      .start()
    // pin the stream's initial offset (epoch 0) BEFORE any routine
    // vacuum can raise the retention watermark past it — the real
    // deployment order too: subscribe, then run maintenance
    subscriber.processAllAvailable()
    (writers :+ follower :+ vacuumer).foreach(_.start())
    start.countDown()
    writers.foreach(_.join(240000))
    follower.join(240000); vacuumer.join(240000)
    assert(failures.isEmpty, s"triple stress must be loss- and " +
      s"failure-free: ${Option(failures.peek()).map(_.getMessage)}")
    try {
      subscriber.processAllAvailable()
      val folded = spark.read.parquet(s"$subDir/out")
        .groupBy("k")
        .agg(max_by(col("v"), col("_change_epoch")).as("v"))
        .as[(Long, Long)].collect().toMap
      val snap = VersionedStore.read(spark, root).as[(Long, Long)]
        .collect().toMap
      assert(folded == snap,
        s"the change feed's fold must reproduce the contended store: " +
          s"${folded.size} vs ${snap.size} keys")
    } finally subscriber.stop()
    assert(followerPolls.get() > 0 && vacuums.get() > 0,
      s"the stress must actually interleave: ${followerPolls.get()} polls, " +
        s"${vacuums.get()} vacuums")
    val cur = VersionedStore.read(spark, root).as[(Long, Long)]
      .collect().toMap
    owners.foreach { case (_, ks) =>
      ks.foreach(k => assert(cur(k) == k + 5000L, s"lost update for $k"))
    }
    import scala.jdk.CollectionConverters._
    val hist = VersionedStore.commitAttempts.asScala
      .map { case (k, v) => k -> v.get() }.toSeq.sortBy(_._1)
    info(s"triple-stress attempts histogram: " +
      hist.map { case (k, v) => s"$k->$v" }.mkString(", "))
    println(s"TRIPLE_STRESS polls=${followerPolls.get()} " +
      s"vacuums=${vacuums.get()} hist=" +
      hist.map { case (k, v) => s"$k->$v" }.mkString(","))
    assert(hist.map(_._1).max <= 16,
      s"attempt tail must stay far from the livelock bound: $hist")
  }

  test("default-grace vacuums hold the floor for a SLOW live subscriber") {
    // round-16 (task: vacuum × live-subscriber grace): a subscriber
    // whose checkpoint lags must survive routine DEFAULT-grace vacuums
    // — its heartbeat lease clamps the watermark at its last-committed
    // offset, so the per-epoch change files it has yet to serve are
    // never deleted. Compactions run between epochs so the vacuums
    // genuinely have superseded generations to claim.
    val root = tmpDir("conc_sub") + "/store"
    val subDir = tmpDir("conc_sub_run")
    VersionedStore.upsert((1L to 100L).map(k => (k, k)).toDF("k", "v"),
      Seq("k"), root, nBuckets = 4)
    // the subscriber drains ONLY epoch 1, then is KILLED (the slowest
    // subscriber there is): its lease stays on disk at offset 1
    def subscribe() = spark.readStream.format("graft-vstore")
      .option("path", root).option("changeFeed", "true")
      .option("startingEpoch", "0")
      .load()
      .writeStream.format("parquet")
      .option("path", s"$subDir/out")
      .option("checkpointLocation", s"$subDir/ckpt")
      .start()
    val sub1 = subscribe()
    try sub1.processAllAvailable() finally sub1.stop()
    // while it is down: deltas land, compaction supersedes them, and
    // ROUTINE vacuums (default grace, retain-current) run — the exact
    // sequence that deleted a lagging subscriber's epochs
    (1 to 6).foreach { i =>
      VersionedStore.deltaUpsert(
        Seq((i.toLong, i * 100L), (50L + i, i.toLong)).toDF("k", "v"),
        Seq("k"), root)
      if (i % 3 == 0) VersionedStore.compact(spark, root)
      VersionedStore.vacuum(root, VersionedStore.currentEpoch(root))
    }
    // the lease held the watermark at the subscriber's offset
    assert(VersionedStore.retentionWatermark(root) <= 1L,
      s"lease must clamp the watermark: " +
        s"${VersionedStore.retentionWatermark(root)}")
    // the subscriber resumes and drains the whole backlog — zero
    // failures, fold == the contended snapshot
    val sub2 = subscribe()
    try {
      sub2.processAllAvailable()
      val folded = spark.read.parquet(s"$subDir/out")
        .groupBy("k").agg(max_by(col("v"), col("_change_epoch")).as("v"))
        .as[(Long, Long)].collect().toMap
      val snap = VersionedStore.read(spark, root).as[(Long, Long)]
        .collect().toMap
      assert(folded == snap,
        s"slow subscriber must drain losslessly: ${folded.size} keys")
    } finally sub2.stop()
    // CONTROL (the test discriminates): expire the lease and re-run
    // the same routine vacuum — the floor releases and the superseded
    // delta generations really are claimed
    val ttl = VersionedStore.SubscriberLeaseTtlMillis
    VersionedStore.SubscriberLeaseTtlMillis = 0L
    try {
      val r = VersionedStore.vacuum(root, VersionedStore.currentEpoch(root))
      assert(r.deletedGens > 0L,
        s"an expired lease must release the floor: $r")
    } finally VersionedStore.SubscriberLeaseTtlMillis = ttl
  }

  test("grace-0 vacuum never sweeps YOUNG lock/staging dirs (live writer)") {
    val root = tmpDir("conc_infra") + "/store"
    VersionedStore.upsert((1L to 10L).map(k => (k, k)).toDF("k", "v"),
      Seq("k"), root, nBuckets = 2)
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val staging =
      new org.apache.hadoop.fs.Path(root, ".epoch-staging-livewriter")
    val lock = new org.apache.hadoop.fs.Path(root, "_commit-0000002.lock")
    fs.mkdirs(staging); fs.mkdirs(lock)
    // a grace-0 vacuum (the loud default) must leave the YOUNG infra
    // dirs alone — deleting a live writer's election lock hands its
    // epoch to a second writer (a silent lost update, round-13 ADVICE)
    VersionedStore.vacuum(root, 1L)
    assert(fs.exists(staging) && fs.exists(lock),
      "young infrastructure dirs must survive a grace-0 vacuum")
    // …but aged crash leftovers still sweep on a later pass
    VersionedStore.vacuum(root, 1L, nowMillis =
      System.currentTimeMillis() + VersionedStore.InfraSweepMinAgeMillis + 1000L)
    assert(!fs.exists(staging) && !fs.exists(lock),
      "aged infrastructure dirs must sweep")
  }

  test("vacuum sweeps AGED crashed tmp FILES; young ones survive") {
    // the link-fence (and writeMarker) stage through a writer-private
    // `<name>.tmp-<uuid>` FILE; a crash between write and link/rename
    // leaked it forever — the infra sweep matched only DIRECTORIES
    // (round-14 judge finding + ADVICE)
    val root = tmpDir("conc_tmpfiles") + "/store"
    VersionedStore.upsert((1L to 10L).map(k => (k, k)).toDF("k", "v"),
      Seq("k"), root, nBuckets = 2)
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def plant(name: String): org.apache.hadoop.fs.Path = {
      val p = new org.apache.hadoop.fs.Path(root, name)
      val out = fs.create(p, true)
      try out.write("crashed".getBytes) finally out.close()
      p
    }
    val u1 = java.util.UUID.randomUUID()
    val u2 = java.util.UUID.randomUUID()
    val aged = plant(s"_commit-0000002.tmp-$u1") // crashed link fence
    val agedMarker = plant(s"_floors-0000001.tmp-$u2") // crashed rename
    // grace-0 vacuum: YOUNG tmp files are a live writer's in-flight
    // window and must survive, like young lock dirs
    VersionedStore.vacuum(root, 1L)
    assert(fs.exists(aged) && fs.exists(agedMarker),
      "young tmp files must survive a grace-0 vacuum")
    // aged past the infra minimum (clock injected), both sweep
    val later = System.currentTimeMillis() +
      VersionedStore.InfraSweepMinAgeMillis + 1000L
    VersionedStore.vacuum(root, 1L, nowMillis = later)
    assert(!fs.exists(aged) && !fs.exists(agedMarker),
      "aged crashed tmp files must sweep")
    // non-tmp markers are untouched by the file sweep (the watermark
    // commit itself was checkpointed into the floors marker — that
    // durable marker must never match the uuid-suffix pattern)
    assert(fs.exists(new org.apache.hadoop.fs.Path(root, "_floors-0000001")),
      "real floor/commit markers must never match the tmp sweep")
    assert(VersionedStore.read(spark, root).count() == 10L)
  }

  test("a follower's poll survives a DEFAULT vacuum on a streamed store") {
    // EpochStream sets the store-level _vacuum_grace floor at start, so
    // a routine `vacuum(root, e)` — no grace argument — cannot delete a
    // generation from under an in-flight chain read (the production
    // posture a store with followers needs)
    val work = tmpDir("conc_follower")
    val store = s"$work/store"
    val phases = Seq(
      (1L to 30L).map(k => (k, k)).toDF("k", "v"),
      (1L to 30L).map(k => (k, k * 2)).toDF("k", "v"))
    graft.streaming.EpochStream.replay(spark, phases, Seq("k"), work, store,
      nBuckets = 2)
    assert(VersionedStore.readAuxMarker(store, "_vacuum_grace").isDefined,
      "the stream must set the store-level grace floor")
    val stale = VersionedStore.readAsOf(spark, store, 1L)
    val r = VersionedStore.vacuum(store, 2L) // DEFAULT grace
    assert(r.deletedGens == 0L,
      s"the grace floor must shield young generations: $r")
    assert(stale.as[(Long, Long)].collect().toMap.apply(5L) == 5L,
      "the in-flight reader must finish against intact generations")
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
