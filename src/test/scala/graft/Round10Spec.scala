package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.sinks.Sinks

/** The distributed store-upsert's SCALE contract: the number of Spark
  * jobs [[Sinks.upsertPartitioned]] runs is a small constant,
  * INDEPENDENT of how many buckets the batch touches — the merge
  * stages every touched bucket in one `partitionBy(_bucket)` write and
  * promotion is rename-only. The round-9 implementation ran one
  * sequential job per touched bucket from a driver loop (10k touched
  * buckets = 10k jobs); this spec would have failed it. */
class UpsertOneJobSpec extends SparkSpec {
  import spark.implicits._

  private def countJobs(body: => Unit): Int = {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    org.apache.spark.GraftTestBus.drain(spark.sparkContext)
    spark.sparkContext.addSparkListener(listener)
    try { body; org.apache.spark.GraftTestBus.drain(spark.sparkContext) }
    finally spark.sparkContext.removeSparkListener(listener)
    jobs.get()
  }

  test("job count does not grow with touched-bucket count") {
    val store = tmpDir("onejob_store") + "/s"
    // bootstrap: 64 buckets, all touched
    Sinks.upsertPartitioned((1L to 2000L).map(i => (i, s"v$i")).toDF("id", "v"),
      Seq("id"), store, nBuckets = 64)

    // batch A touches ~2 buckets; batch B touches all 64
    val narrow = Seq((1L, "N1"), (2L, "N2")).toDF("id", "v")
    val wide = (2001L to 4000L).map(i => (i, s"w$i")).toDF("id", "v")
    val jobsNarrow = countJobs(
      Sinks.upsertPartitioned(narrow, Seq("id"), store, nBuckets = 64))
    val jobsWide = countJobs(
      Sinks.upsertPartitioned(wide, Seq("id"), store, nBuckets = 64))

    assert(jobsWide <= jobsNarrow + 2,
      s"job count must be flat in touched buckets: narrow=$jobsNarrow wide=$jobsWide")
    assert(jobsWide <= 10,
      s"expected a constant handful of jobs, got $jobsWide for 64 touched buckets")

    // and the merge is still correct after both batches
    val got = Sinks.readPartitioned(spark, store)
      .as[(Long, String)].collect().toSeq.sorted
    val want = ((3L to 2000L).map(i => (i, s"v$i")) ++
      Seq((1L, "N1"), (2L, "N2")) ++
      (2001L to 4000L).map(i => (i, s"w$i"))).sorted
    assert(got == want)
  }

  test("store write path touches no staging leftovers and keeps one file per bucket") {
    val store = tmpDir("onejob_layout") + "/s"
    Sinks.upsertPartitioned((1L to 500L).map(i => (i, i * 2)).toDF("id", "x"),
      Seq("id"), store, nBuckets = 8)
    Sinks.upsertPartitioned((400L to 900L).map(i => (i, i * 3)).toDF("id", "x"),
      Seq("id"), store, nBuckets = 8)
    val root = java.nio.file.Paths.get(store)
    val entries = java.nio.file.Files.list(root).iterator()
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    while (entries.hasNext) names += entries.next().getFileName.toString
    assert(!names.contains(".upsert-staging"), s"staging dir leaked: $names")
    assert(!names.exists(_.endsWith(".swap")), s"swap dir leaked: $names")
    assert(!names.exists(_.endsWith(".old")), s"old dir leaked: $names")
    names.filter(_.matches("^b\\d{5}$")).foreach { b =>
      val files = java.nio.file.Files.list(root.resolve(b)).iterator()
      var parquets = 0
      while (files.hasNext) {
        val n = files.next().getFileName.toString
        if (n.endsWith(".parquet") && !n.startsWith(".")) parquets += 1
      }
      assert(parquets == 1, s"bucket $b must hold one live file, got $parquets")
    }
  }
}

/** Span masking ([[graft.ops.Dedup.maskSpans]]) — the dedup action on
  * mined duplicate spans: positional token removal with overlap,
  * full-mask and no-span semantics pinned, plus end-to-end
  * consistency with [[graft.ops.Dedup.dupSpans]]' own output. */
class MaskSpansSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._
  import graft.ops.Dedup

  test("positional masking: overlap, edges, full mask, no spans") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8"),
      (2L, "a b c"),        // fully masked
      (3L, "x y z"),        // no spans: normalized pass-through
      (4L, "w1  w2\tw3 w4") // whitespace normalizes in the rebuild
    ).toDF("doc_id", "text")
    val spans = Seq(
      (1L, 2L, 4L), (1L, 3L, 5L), // overlapping -> tokens 2..5 drop
      (1L, 8L, 8L),               // edge token
      (2L, 1L, 3L),
      (4L, 2L, 2L)
    ).toDF("doc_id", "span_start", "span_end")
    val got = Dedup.maskSpans(docs, "doc_id", col("text"), spans)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "t1 t6 t7", 5L),
      (2L, "", 3L),
      (3L, "x y z", 0L),
      (4L, "w1 w3 w4", 1L)))
  }

  test("random spans == driver-side positional mask, incl. out-of-range spans") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 3) {
      val docs = (1L to 30L).map(i =>
        (i, (1 to (1 + rnd.nextInt(12))).map(j => s"w${rnd.nextInt(9)}")
          .mkString(" ")))
      val spans = (1 to 40).map { _ =>
        val id = 1L + rnd.nextInt(30)
        val s = 1L + rnd.nextInt(14) // may start past the doc's end
        (id, s, s + rnd.nextInt(4))
      }
      val got = Dedup.maskSpans(docs.toDF("doc_id", "text"), "doc_id",
          col("text"), spans.toDF("doc_id", "span_start", "span_end"))
        .as[(Long, String, Long)].collect().toSeq.sorted
      val byDoc = spans.groupBy(_._1)
      val want = docs.map { case (id, t) =>
        val toks = t.split("\\s+")
        val sp = byDoc.getOrElse(id, Seq.empty)
        val kept = toks.zipWithIndex.collect {
          case (tok, i) if !sp.exists(s => i + 1 >= s._2 && i + 1 <= s._3) =>
            tok
        }
        (id, kept.mkString(" "), (toks.length - kept.length).toLong)
      }.sorted
      assert(got == want, s"trial $trial diverged")
    }
  }

  test("mine -> mask round trip leaves no duplicated n-gram behind") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = 8
    val spans = Dedup.dupSpans(docs, "doc_id", col("text"), n)
    val cleaned = Dedup.maskSpans(docs, "doc_id", col("text"), spans)
      .select(col("doc_id"), col("clean_text").as("text"))
    // token conservation: removed + kept == original token count
    val kept = Dedup.maskSpans(docs, "doc_id", col("text"), spans)
    val totals = kept.agg(sum(size(split(col("clean_text"), "\\s+")))
        .as("k"), sum(col("n_removed")).as("r")).collect().head
    assert(totals.getLong(1) > 0, "fixture must actually mask something")
    // every mined span's sites are gone: re-mining the cleaned corpus
    // finds strictly fewer spans and NONE of the original span grams
    // at their old weights — the corpus-level claim: every n-gram that
    // was duplicated is no longer present at >= 2 sites UNLESS it was
    // re-created by token adjacency across a masked gap (possible by
    // construction; assert the massive reduction instead of zero)
    val before = spans.count()
    val after = Dedup.dupSpans(cleaned, "doc_id", col("text"), n).count()
    assert(after < before / 2,
      s"masking must remove most duplicated spans ($before -> $after)")
  }
}

/** Integer-exact LM cross-entropy ([[graft.ops.CorpusSignals
  * .lmCrossEntropy]]) — the CCNet perplexity gate in eighth-bit
  * integer arithmetic: quantization anchors, a driver-side reference
  * replay on a controlled corpus, OOV/penalty semantics, and the
  * raw-count ledger's merge parity. */
class LmEntropySpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._
  import graft.ops.CorpusSignals

  private def bits8Of(cntGram: Long, cntCtx: Long): Long = {
    // the spec's independent replica of the eighth-bit -log2(p)
    val q8 = (cntCtx * 256L) / cntGram
    val l8 = 63 - java.lang.Long.numberOfLeadingZeros(q8)
    (l8 - 8) * 8 + (q8 * 8) / (1L << l8) - 8
  }

  test("eighth-bit quantization anchors: p=1 -> 0, p=1/2 -> 8, monotone") {
    assert(bits8Of(4, 4) == 0L)
    assert(bits8Of(2, 4) == 8L)
    assert(bits8Of(1, 4) == 16L)
    val seq = (1L to 64L).map(g => bits8Of(g, 64L))
    assert(seq == seq.sorted.reverse, "bits8 must fall as p rises")
    assert(seq.last == 0L && seq.head == 48L) // p=1/64 -> 6 bits
  }

  test("lmCrossEntropy == driver-side reference on a controlled corpus") {
    val corpus = Seq(
      (1L, "a b c a b c a b d"), // common trigrams + one rarer
      (2L, "a b c x y z"),       // mixes in-vocab and OOV sites
      (3L, "q r"),               // sub-n: no sites, absent from output
      (4L, "a b c a b c"))
    val df = corpus.toDF("doc_id", "text")
    val lm = CorpusSignals.lmConditionalCounts(df, col("text"), 3, 1L)
      .localCheckpoint()
    val got = CorpusSignals.lmCrossEntropy(df, "doc_id", col("text"), lm, 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

    // reference: counts + window + per-site bits over the same corpus
    val sites = corpus.flatMap { case (id, t) =>
      val w = t.split("\\s+").filter(_.nonEmpty)
      (0 until w.length - 2).map(i => (id, s"${w(i)} ${w(i + 1)}", w(i + 2)))
    }
    val gram = sites.groupBy { case (_, c, x) => (c, x) }
      .view.mapValues(_.size.toLong).toMap
    val ctx = sites.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val want = sites.groupBy(_._1).toSeq.sortBy(_._1).map { case (id, ss) =>
      val bits = ss.map { case (_, c, x) => bits8Of(gram((c, x)), ctx(c)) }
      (id, ss.size.toLong, 0L, bits.sum, bits.sum / ss.size)
    }
    assert(got == want)
    assert(!got.exists(_._1 == 3L), "a sub-n doc must be absent")
  }

  test("OOV sites pay the penalty; minCount-cut grams count as OOV") {
    val train = Seq((1L, "a b c a b c a b c")).toDF("doc_id", "text")
    val lm = CorpusSignals.lmConditionalCounts(train, col("text"), 3,
      minCount = 2L).localCheckpoint()
    // "a b d": context seen, word unseen -> OOV; "z z z": all OOV
    val score = CorpusSignals.lmCrossEntropy(
      Seq((10L, "a b d"), (11L, "z z z z")).toDF("doc_id", "text"),
      "doc_id", col("text"), lm, 3, oovBits8 = 100L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(score == Seq((10L, 1L, 1L, 100L, 100L), (11L, 2L, 2L, 200L, 100L)))
  }

  test("merged raw-count ledger == recomputed from the full corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val part = col("doc_id") % 10 === 0
    val merged = CorpusSignals.mergedLmRawCounts(
        CorpusSignals.lmRawCounts(docs.filter(!part), col("text"), 3),
        CorpusSignals.lmRawCounts(docs.filter(part), col("text"), 3))
      .as[(String, String, Long)].collect().toSeq.sorted
    val full = CorpusSignals.lmRawCounts(docs, col("text"), 3)
      .as[(String, String, Long)].collect().toSeq.sorted
    assert(merged == full && merged.nonEmpty)
  }
}

/** The streaming LM count maintainer ([[graft.streaming.LmStream]]):
  * counts are not keyed-idempotent, so its exactly-once story is the
  * epoch-guard pair (epoch-tagged count rows + epoch-filtered
  * novelty). The crash matrix SIMULATES each crash window by
  * filesystem snapshot/restore of one store between the two upserts'
  * effects, then replays the batch at the SAME epoch (what the
  * checkpoint does) — every path must converge to the clean run, and
  * redelivery at a LATER epoch must be a no-op. */
class LmStreamSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._
  import graft.ops.CorpusSignals
  import graft.streaming.LmStream

  private val dir = "/root/testdata/sf0.001"

  private def docsTable = spark.read.parquet(s"$dir/documents.parquet")
    .select(col("doc_id"), col("text"))

  private def countsOf(stream: LmStream, root: String) =
    stream.counts(spark, root).as[(String, String, Long)]
      .collect().toSeq.sorted

  private def fullCounts = CorpusSignals
    .lmRawCounts(docsTable, col("text"), 3)
    .as[(String, String, Long)].collect().toSeq.sorted

  private def snapshot(src: String): java.nio.file.Path = {
    val dst = java.nio.file.Files.createTempDirectory("lm_snap")
    val s = java.nio.file.Paths.get(src)
    java.nio.file.Files.walk(s).forEach { p =>
      val t = dst.resolve(s.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t)
    }
    dst
  }

  private def restore(snap: java.nio.file.Path, dst: String): Unit = {
    graft.sinks.Sinks.deleteRecursively(java.nio.file.Paths.get(dst))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dst))
    java.nio.file.Files.walk(snap).forEach { p =>
      val t = java.nio.file.Paths.get(dst).resolve(snap.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t)
    }
  }

  test("replay, redelivery, and both single-store crash windows all converge") {
    val docs = docsTable
    val old = docs.filter(col("doc_id") % 10 =!= 0)
    val land = docs.filter(col("doc_id") % 10 === 0).localCheckpoint()
    val b1 = land.filter(pmod(col("doc_id"), lit(20)) === 0).localCheckpoint()
    val b2 = land.filter(pmod(col("doc_id"), lit(20)) === 10).localCheckpoint()
    val stream = LmStream("doc_id", col("text"), 3)

    val root = tmpDir("lm_crash")
    stream.bootstrap(old, root)

    // crash window A: counts committed, docs ledger lost -> replay
    val docsSnap = snapshot(s"$root/lm_docs")
    stream.processBatch(b1, 0L, root)
    val afterClean1 = countsOf(stream, root)
    restore(docsSnap, s"$root/lm_docs")
    stream.processBatch(b1, 0L, root) // checkpoint replay, same epoch
    assert(countsOf(stream, root) == afterClean1,
      "replay with a lost docs ledger must not double-count")

    // crash window B: docs committed, counts lost mid-way -> replay
    val countsSnapB = snapshot(s"$root/lm_counts")
    stream.processBatch(b2, 1L, root)
    val afterClean2 = countsOf(stream, root)
    restore(countsSnapB, s"$root/lm_counts")
    stream.processBatch(b2, 1L, root)
    assert(countsOf(stream, root) == afterClean2,
      "replay with lost counts must re-apply exactly once")

    // plain replay (both stores intact) and later-epoch redelivery
    stream.processBatch(b2, 1L, root)
    stream.processBatch(b1, 5L, root)
    assert(countsOf(stream, root) == afterClean2)

    // the converged ledger == one-shot whole-corpus counts
    assert(countsOf(stream, root) == fullCounts && fullCounts.nonEmpty)
  }

  test("an empty bootstrap (no old corpus grams) starts an empty ledger, not a crash") {
    import spark.implicits._
    val stream = LmStream("doc_id", col("text"), 3)
    val root = tmpDir("lm_empty")
    // every bootstrap doc is shorter than n tokens: zero gram rows
    stream.bootstrap(Seq((1L, "a b")).toDF("doc_id", "text"), root)
    assert(countsOf(stream, root).isEmpty)
    stream.processBatch(
      Seq((2L, "x y z x y z")).toDF("doc_id", "text"), 0L, root)
    val got = countsOf(stream, root)
    assert(got == Seq(("x y", "z", 2L), ("y z", "x", 1L), ("z x", "y", 1L)))
  }

  test("any batch split of the landing set converges to the one-shot counts") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val words = Seq("a", "b", "c", "d", "e")
    val corpus = (1L to 80L).map(i =>
      (i, (1 to (2 + rnd.nextInt(8)))
        .map(_ => words(rnd.nextInt(words.size))).mkString(" ")))
    val all = corpus.toDF("doc_id", "text")
    val want = graft.ops.CorpusSignals.lmRawCounts(all, col("text"), 3)
      .as[(String, String, Long)].collect().toSeq.sorted
    for (trial <- 1 to 3) {
      val stream = LmStream("doc_id", col("text"), 3)
      val root = tmpDir(s"lm_split$trial")
      val nOld = rnd.nextInt(40)
      stream.bootstrap(corpus.take(nOld).toDF("doc_id", "text"), root)
      var rest = corpus.drop(nOld)
      var epoch = 0L
      while (rest.nonEmpty) {
        val take = 1 + rnd.nextInt(rest.size)
        stream.processBatch(rest.take(take).toDF("doc_id", "text"),
          epoch, root)
        rest = rest.drop(take)
        epoch += 1
      }
      assert(countsOf(stream, root) == want, s"trial $trial diverged")
    }
  }

  test("kill/resume through the real stream == one-shot corpus counts") {
    val docs = docsTable
    val stream = LmStream("doc_id", col("text"), 3)
    val root = tmpDir("lm_stream")
    stream.bootstrap(docs.filter(col("doc_id") % 10 =!= 0), root)
    val landing = s"$root/landing"
    val land = docs.filter(col("doc_id") % 10 === 0)
    land.filter(pmod(col("doc_id"), lit(20)) === 0)
      .write.mode("append").parquet(landing)
    val q1 = stream.start(spark, landing, docs.schema, root)
    q1.processAllAvailable(); q1.stop() // kill
    land.filter(pmod(col("doc_id"), lit(20)) === 10)
      .write.mode("append").parquet(landing)
    val q2 = stream.start(spark, landing, docs.schema, root) // resume
    q2.processAllAvailable(); q2.stop()
    assert(countsOf(stream, root) == fullCounts)
  }
}

/** SIX maintainers, one root: the round-9 ConcurrentStreamsSpec
  * proved RefreshStream + IndexStream don't interfere; this matrix
  * adds the MG ledger, the LM count store, and two maintainers that
  * write the MVCC VersionedStore (histogram + KMV sketch — tagged
  * epochs as the exactly-once fence). All six streams run interleaved
  * under one root, all six are killed mid-stream and resumed, and
  * each family's final state must equal its one-shot batch form
  * exactly — mutable swap-by-rename stores and versioned epoch stores
  * coexisting under concurrent kill/resume. */
class MaintainerMatrixSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.DataFrame
  import graft.streaming.{FreqStream, HistStream, IndexStream, LmStream,
    RefreshStream}

  private val dir = "/root/testdata/sf0.01"

  test("interleaved kill/resume of all six maintainers == each one-shot form") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val oldDocs = docs.filter(col("doc_id") % 10 =!= 0)
    val oldEmb = emb.filter(col("vec_id") % 10 =!= 0)
    val root = tmpDir("matrix_streams")

    // refresh + index: the round-9 pair, config mirroring q110
    val refresh = RefreshStream(
      id = "doc_id",
      fp = md5(concat_ws(" ", slice(split(lower(col("text")), "\\s+"), 1, 8))),
      shingles = graft.ops.ApproxDedup.wordNgrams(col("text"), 2),
      k = 16, bands = 4, rowsPerBand = 4, lexThreshold = 0.5,
      vecId = "vec_id", vecCol = "embedding",
      semK = 8, semIters = 2, semThreshold = 0.3)
    val index = IndexStream("vec_id", "embedding")
    refresh.bootstrap(oldDocs, oldEmb, root)
    index.bootstrap(oldEmb, k = 8, iters = 2, root)
    // the LM count maintainer shares the refresh stream's landing dir
    // (two independent file sources over one queue) and the same root
    val lm = LmStream("doc_id", col("text"), 3)
    lm.bootstrap(oldDocs, root)

    // freq + hist: token and length streams off the same corpus
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang").as("k"),
        explode(split(col("text"), "\\s+")).as("v"))
      .filter(col("v") =!= "")
    val lens = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source").as("k"), col("n_chars").cast("bigint").as("v"))

    def landHalf(src: DataFrame, half: Int, dest: String): Unit =
      src.withColumn("_h", pmod(hash(col("k"), col("v")), lit(2)))
        .filter(col("_h") === half).drop("_h")
        .write.mode("append").parquet(dest)
    def landDocs(i: Int): Unit = docs.filter(col("doc_id") % 10 === 0)
      .filter(pmod(col("doc_id"), lit(20)) === lit(if (i == 0) 0 else 10))
      .write.mode("append").parquet(s"$root/landing_docs")
    def landVecs(i: Int): Unit = emb.filter(col("vec_id") % 10 === 0)
      .filter(pmod(col("vec_id"), lit(20)) === lit(if (i == 0) 0 else 10))
      .write.mode("append").parquet(s"$root/landing_vecs")

    def startFreq() = FreqStream.frequent(
        spark.readStream.schema("k STRING, v STRING")
          .parquet(s"$root/freq_in").as[(String, String)], k = 64)
      .toDF().writeStream
      .option("checkpointLocation", s"$root/freq_ckpt")
      .outputMode("update")
      .foreachBatch { (df: DataFrame, bid: Long) =>
        df.withColumn("_bid", lit(bid))
          .write.mode("append").parquet(s"$root/freq_upd")
        ()
      }.start()
    // hist + kmv run on the MVCC VersionedStore (tagged-epoch fence):
    // the matrix exercises two versioned-ledger writers concurrently
    // with the mutable-store families under one root
    def startHist() = graft.streaming.HistStream.histogramToStore(
      spark, s"$root/hist_in", s"$root/hist_store")
    def startKmv() = graft.streaming.SketchStream.kmvToStore(
      spark, s"$root/kmv_in", 64, s"$root/kmv_store")
    // SEVENTH family: an epoch-ingest store plus its VIEW FOLLOWER
    // (ViewStream) — the follower is poll-based, driven mid-matrix
    // after each phase and "killed" by discarding the instance; its
    // exactly-once fence is the src<E> tag in the view store's log
    val keyed = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("k"), col("source").as("g"),
        col("n_chars").cast("bigint").as("v"))
    def landKeyed(i: Int): Unit =
      keyed.filter(pmod(col("k"), lit(2)) === i)
        .coalesce(1).write.mode("append").parquet(s"$root/epoch_in")
    def startEpoch() = graft.streaming.EpochStream(Seq("k"))
      .start(spark, s"$root/epoch_in", keyed.schema, s"$root/epoch_store")

    // phase 1 of every stream lands; all six run CONCURRENTLY, all
    // six are killed mid-stream
    landDocs(0); landVecs(0)
    landHalf(toks, 0, s"$root/freq_in"); landHalf(lens, 0, s"$root/hist_in")
    landHalf(toks, 0, s"$root/kmv_in"); landKeyed(0)
    val r1 = refresh.start(spark, s"$root/landing_docs", docs.schema, emb, root)
    val i1 = index.start(spark, s"$root/landing_vecs", emb.schema, root)
    val l1 = lm.start(spark, s"$root/landing_docs", docs.schema, root)
    val f1 = startFreq(); val h1 = startHist(); val s1 = startKmv()
    val e1 = startEpoch()
    Seq(r1, i1, l1, f1, h1, s1, e1).foreach(_.processAllAvailable())
    // the follower catches up mid-matrix, then its instance dies
    graft.streaming.ViewStream(Seq("g"), "v", "sum")
      .catchUp(spark, s"$root/epoch_store", s"$root/view_store")
    Seq(r1, i1, l1, f1, h1, s1, e1).foreach(_.stop())
    // resume all seven from their checkpoints, land phase 2, drain
    val r2 = refresh.start(spark, s"$root/landing_docs", docs.schema, emb, root)
    val i2 = index.start(spark, s"$root/landing_vecs", emb.schema, root)
    val l2 = lm.start(spark, s"$root/landing_docs", docs.schema, root)
    val f2 = startFreq(); val h2 = startHist(); val s2 = startKmv()
    val e2 = startEpoch()
    landDocs(1); landVecs(1)
    landHalf(toks, 1, s"$root/freq_in"); landHalf(lens, 1, s"$root/hist_in")
    landHalf(toks, 1, s"$root/kmv_in"); landKeyed(1)
    Seq(r2, i2, l2, f2, h2, s2, e2).foreach(_.processAllAvailable())
    Seq(r2, i2, l2, f2, h2, s2, e2).foreach(_.stop())
    // a FRESH follower instance resumes from the src tags alone
    graft.streaming.ViewStream(Seq("g"), "v", "sum")
      .catchUp(spark, s"$root/epoch_store", s"$root/view_store")

    // refresh family == one-shot q110 composition
    val accepted = refresh.accepted(spark, root)
      .select("doc_id", "source").as[(Long, String)].collect().toSeq.sorted
    val oneShotDocs = Queries.all("q110_refresh_pipeline")(spark, dir)
      .select("doc_id", "source").as[(Long, String)].collect().toSeq.sorted
    assert(accepted == oneShotDocs && accepted.nonEmpty)

    // index family == one-shot frozen-centroid upsert
    val postings = index.index(spark, root).assignments
      .select(col("corpus_id"), col("centroid_id"))
      .as[(Long, Long)].collect().toSeq.sorted
    val idx0 = ops.Similarity.ivfIndexBuild(oldEmb, "vec_id", "embedding", 8, 2)
    val oneShotAsg = ops.Similarity
      .ivfIndexUpsert(idx0, emb.filter(col("vec_id") % 10 === 0),
        "vec_id", "embedding")
      .assignments.select(col("corpus_id"), col("centroid_id"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(postings == oneShotAsg)

    def latest(updDir: String, a: String, b: String): Seq[(String, Any, Long)] = {
      val upd = spark.read.parquet(updDir)
      val latestBid = upd.groupBy("k").agg(max(col("_bid")).as("_bid"))
      upd.join(latestBid, Seq("k", "_bid"))
        .select(col("k"), col(a), col(b)).collect()
        .map(r => (r.getString(0), r.get(1), r.getLong(2))).toSeq
    }
    // freq == exact batch counts (k=64 over this vocab: exact regime)
    val gotFreq = latest(s"$root/freq_upd", "item", "cnt")
      .map { case (k, i, c) => (k, i.toString, c) }.sorted
    val wantFreq = toks.groupBy("k", "v").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq.sorted
    assert(gotFreq == wantFreq && gotFreq.nonEmpty)

    // hist (VERSIONED ledger) == one-shot batch log histogram
    val gotHist = graft.sinks.VersionedStore
      .read(spark, s"$root/hist_store")
      .as[(String, Long, Long)].collect().toSeq.sorted
    val wantHist = ops.Distribution.logHistogram(lens, Seq("k"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    assert(gotHist == wantHist && gotHist.nonEmpty)

    // kmv (VERSIONED ledger) == one-shot batch sketch fleet
    val gotKmv = graft.streaming.SketchStream
      .readKmvLedger(spark, s"$root/kmv_store", 64)
      .select("k", "kmv").as[(String, Array[Long])].collect()
      .map { case (g, a) => (g, a.mkString(",")) }.toSeq.sorted
    val wantKmv = ops.ThetaSketch.sketch(toks, Seq("k"), col("v"), 64)
      .as[(String, Array[Long])].collect()
      .map { case (g, a) => (g, a.mkString(",")) }.toSeq.sorted
    assert(gotKmv == wantKmv && gotKmv.nonEmpty)

    // LM counts == one-shot raw counts over the whole corpus
    val gotLm = lm.counts(spark, root)
      .as[(String, String, Long)].collect().toSeq.sorted
    val wantLm = ops.CorpusSignals.lmRawCounts(docs, col("text"), 3)
      .as[(String, String, Long)].collect().toSeq.sorted
    assert(gotLm == wantLm && gotLm.nonEmpty)

    // view follower (VERSIONED view over the VERSIONED epoch store)
    // == one-shot aggregate; one view epoch per source epoch; a
    // replayed catch-up is a no-op (the src-tag fence)
    val srcEpochs = graft.sinks.VersionedStore
      .currentEpoch(s"$root/epoch_store")
    assert(srcEpochs == 2L, s"two landings, two source epochs: $srcEpochs")
    assert(graft.sinks.VersionedStore.currentEpoch(s"$root/view_store")
      == srcEpochs, "view lineage must pair one view epoch per source epoch")
    graft.streaming.ViewStream(Seq("g"), "v", "sum")
      .catchUp(spark, s"$root/epoch_store", s"$root/view_store")
    assert(graft.sinks.VersionedStore.currentEpoch(s"$root/view_store")
      == srcEpochs, "replayed catch-up must commit nothing")
    val gotView = graft.sinks.VersionedStore
      .read(spark, s"$root/view_store")
      .as[(String, Long, Long)].collect().toSeq.sorted
    val wantView = keyed.groupBy("g")
      .agg(sum(col("v")).as("sum_v"), count(lit(1)).as("n_rows"))
      .as[(String, Long, Long)].collect().toSeq.sorted
    assert(gotView == wantView && gotView.nonEmpty)
  }
}

/** Phrase search served from the persisted gram index
  * ([[graft.ops.Retrieval.PhraseGramIndex]]): the probe joins phrase
  * grams against index TABLES — the round-9 path re-exploded and
  * re-persisted the corpus gram table on every call. Parity with the
  * direct path, incremental == bootstrap, and the serve plan proof
  * that only the index is probed (a stale index does NOT see corpus
  * edits; no gram kernel over the corpus text column in the plan). */
class PhraseIndexSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import graft.ops.Retrieval

  private val dir = "/root/testdata/sf0.001"

  private def fixturePhrases(docs: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    docs.filter(col("doc_id") % 100 === 50)
      .select(col("doc_id").as("phrase_id"),
        concat_ws(" ", slice(split(col("text"), "\\s+"), 3, 6)).as("phrase"))
      .unionByName(Seq(
        (900001L, "the"),                                  // short path
        (900002L, "zz unseen gram tokens here absent")     // unseen gram
      ).toDF("phrase_id", "phrase"))
  }

  test("index-served == direct, including short and unseen-gram phrases") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val phrases = fixturePhrases(docs)
    val idx = Retrieval.phraseGramIndex(docs, "doc_id", col("text"), 4)
    val served = Retrieval.phraseMatchesFromIndex(idx, docs, "doc_id",
        col("text"), phrases, "phrase_id", col("phrase"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = Retrieval.phraseMatches(docs, "doc_id", col("text"),
        phrases, "phrase_id", col("phrase"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(served == direct)
    assert(served.nonEmpty && served.exists(_._1 == 900001L))
    assert(!served.exists(_._1 == 900002L))
  }

  test("incremental index update == bootstrap over the full corpus; serves equal") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val oldDocs = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val inc = Retrieval.updatedPhraseGramIndex(
      Retrieval.phraseGramIndex(oldDocs, "doc_id", col("text"), 4),
      batch, "doc_id", col("text"))
    val boot = Retrieval.phraseGramIndex(docs, "doc_id", col("text"), 4)
    assert(inc.gramDf.as[(String, Long)].collect().toSeq.sorted ==
      boot.gramDf.as[(String, Long)].collect().toSeq.sorted)
    assert(inc.sites.as[(Long, String)].collect().toSeq.sorted ==
      boot.sites.as[(Long, String)].collect().toSeq.sorted)
    // replaying the batch is a no-op
    val replay = Retrieval.updatedPhraseGramIndex(inc, batch, "doc_id",
      col("text"))
    assert(replay.gramDf.as[(String, Long)].collect().toSeq.sorted ==
      boot.gramDf.as[(String, Long)].collect().toSeq.sorted)

    val phrases = fixturePhrases(docs)
    val a = Retrieval.phraseMatchesFromIndex(inc, docs, "doc_id", col("text"),
        phrases, "phrase_id", col("phrase"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Retrieval.phraseMatchesFromIndex(boot, docs, "doc_id", col("text"),
        phrases, "phrase_id", col("phrase"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("the serve path probes the INDEX, not the corpus: stale index, no corpus explode") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val phrase = docs.filter(col("doc_id") === 50)
      .select(concat_ws(" ",
        slice(split(col("text"), "\\s+"), 3, 6)).as("p"))
      .as[String].collect().head
    val phrases = Seq((1L, phrase)).toDF("phrase_id", "phrase")
    val idx = Retrieval.phraseGramIndex(docs, "doc_id", col("text"), 4)
    // localCheckpoint = the persisted-table stand-in (severed lineage,
    // exactly what reading the parquet fixtures gives q156)
    val frozen = Retrieval.PhraseGramIndex(idx.sites.localCheckpoint(),
      idx.gramDf.localCheckpoint(), idx.unigrams.localCheckpoint(),
      idx.docs.localCheckpoint(), idx.n)

    // edit the corpus AFTER indexing: a doc that did not contain the
    // phrase now does
    val victim = docs.filter(col("doc_id") === 7)
      .select("text").as[String].collect().head
    assert(!s" ${victim.replaceAll("\\s+", " ")} ".contains(s" $phrase "))
    val edited = docs.withColumn("text",
      when(col("doc_id") === 7, concat(col("text"), lit(" " + phrase)))
        .otherwise(col("text")))

    val direct = Retrieval.phraseMatches(edited, "doc_id", col("text"),
        phrases, "phrase_id", col("phrase"), 4)
      .collect().map(_.getLong(1)).toSet
    val served = Retrieval.phraseMatchesFromIndex(frozen, edited, "doc_id",
        col("text"), phrases, "phrase_id", col("phrase"))
      .collect().map(_.getLong(1)).toSet
    assert(direct.contains(7L), "the direct path re-derives and sees the edit")
    assert(!served.contains(7L),
      "a stale index must NOT see the edit — proves the probe reads the " +
        "index, never a corpus re-explode")
    assert(served == direct - 7L)

    // and the plan says the same: no gram kernel / token explode over
    // the corpus text column (the phrase side's _pt is the only one)
    val plan = Retrieval.phraseMatchesFromIndex(frozen, docs, "doc_id",
        col("text"), phrases, "phrase_id", col("phrase"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.matches("(?s).*word_ngrams\\(text#.*"),
      s"no corpus gram explode in the serve plan:\n${plan.take(2000)}")
    assert(!plan.matches("(?s).*explode\\(split\\(text#.*"),
      s"no corpus token explode in the serve plan:\n${plan.take(2000)}")
    val directPlan = Retrieval.phraseMatches(docs, "doc_id", col("text"),
        phrases, "phrase_id", col("phrase"), 4)
      .queryExecution.optimizedPlan.toString
    assert(directPlan.matches("(?s).*word_ngrams\\(text#.*"),
      "the contrast path explodes the corpus (guards the assertion above)")
  }
}

/** The fully-indexed BM25 serve path: per-term dfs and the
  * corpus-scalar row are PERSISTED index tables maintained by the
  * refresh (sum-merge for disjoint batches), so a serve plan is joins
  * only — no countDistinct re-aggregation of posting lists — and the
  * overflow guard derives its document-length bound from the actual
  * k1/b parameters instead of the default-parameter constant. */
class Bm25IndexTablesSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._
  import graft.ops.{Curation, Retrieval}

  private val dir = "/root/testdata/sf0.01"

  test("incremental df/stats merge == recomputed from the full corpus; serves equal") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val isBatch = Curation.hashBucket(col("doc_id"), "drift:", 10) === 0
    val oldPost = Retrieval.postings(docs.filter(!isBatch), "doc_id", col("text"))
    val batchPost = Retrieval.postings(docs.filter(isBatch), "doc_id", col("text"))
    val fullPost = Retrieval.postings(docs, "doc_id", col("text"))
    def dlOf(p: org.apache.spark.sql.DataFrame) =
      p.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))

    val merged = Retrieval.mergedTermDf(
        Retrieval.termDf(oldPost, "doc_id"), batchPost, "doc_id")
      .as[(String, Long)].collect().toSeq.sorted
    val recomputed = Retrieval.termDf(fullPost, "doc_id")
      .as[(String, Long)].collect().toSeq.sorted
    assert(merged == recomputed)

    val mergedStats = Retrieval.mergedCorpusStats(
        Retrieval.corpusStats(dlOf(oldPost)), dlOf(batchPost))
      .collect().head
    val recomputedStats = Retrieval.corpusStats(dlOf(fullPost)).collect().head
    assert(mergedStats == recomputedStats)

    // and the table-served ranking equals the derive-on-the-fly path
    val queries = docs.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(split(col("text"), "\\s+"), 1, 4)).as("qtext"))
    val viaTables = Retrieval.bm25TopKFromIndexTables(fullPost, dlOf(fullPost),
        Retrieval.termDf(fullPost, "doc_id"),
        Retrieval.corpusStats(dlOf(fullPost)), "doc_id",
        queries, "query_id", col("qtext"), 5)
      .orderBy("query_id", "rank").collect().toSeq
    val viaDerive = Retrieval.bm25TopKFromIndex(fullPost, dlOf(fullPost),
        "doc_id", queries, "query_id", col("qtext"), 5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(viaTables == viaDerive && viaTables.nonEmpty)
  }

  test("the table-served plan has no countDistinct; the derive path does") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val post = Retrieval.postings(docs, "doc_id", col("text"))
    val dl = post.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val queries = docs.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(split(col("text"), "\\s+"), 1, 4)).as("qtext"))
    val served = Retrieval.bm25TopKFromIndexTables(post, dl,
      Retrieval.termDf(post, "doc_id").localCheckpoint(),
      Retrieval.corpusStats(dl).localCheckpoint(), "doc_id",
      queries, "query_id", col("qtext"), 5)
    val plan = served.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("count(distinct"),
      s"serve plan must not re-aggregate dfs:\n${plan.take(2000)}")
    val derived = Retrieval.bm25TopKFromIndex(post, dl, "doc_id",
      queries, "query_id", col("qtext"), 5)
    assert(derived.queryExecution.optimizedPlan.toString
      .toLowerCase.contains("count(distinct"),
      "the contrast path should derive df (guards the assertion above)")
  }

  test("the overflow guard derives its bound from the actual k1/b") {
    // a 20k-token document is FINE at default parameters but overflows
    // the µ-unit chain at k1=1000 — the round-9 constant-bound guard
    // admitted it and mis-ranked silently
    assert(20000L <= Retrieval.maxDocTokensFor(1200000L, 750000L))
    assert(20000L > Retrieval.maxDocTokensFor(1000000000L, 750000L))
    val post = Seq(("w", 1L, 20000L)).toDF("term", "doc_id", "tf")
    val dl = Seq((1L, 20000L)).toDF("doc_id", "dl")
    val tdf = Seq(("w", 1L)).toDF("term", "df")
    val stats = Seq((1L, 20000L, 20000L)).toDF("n_docs", "total_len", "max_dl")
    val queries = Seq((1L, "w")).toDF("query_id", "qtext")
    val ok = Retrieval.bm25TopKFromIndexTables(post, dl, tdf, stats, "doc_id",
      queries, "query_id", col("qtext"), 1)
    assert(ok.collect().length == 1)
    val e = intercept[IllegalArgumentException] {
      Retrieval.bm25TopKFromIndexTables(post, dl, tdf, stats, "doc_id",
        queries, "query_id", col("qtext"), 1, k1Micro = 1000000000L)
    }
    assert(e.getMessage.contains("k1Micro=1000000000"), e.getMessage)
  }
}

/** The prefix-Jaccard hot-token guard: SCALING.md's measured
  * adversarial case — bigram grams over this corpus's stop-word-class
  * vocabulary, 19.4 s vs 2.1 s for the selective config at sf0.1 —
  * must now FAIL FAST at the default guard instead of silently
  * running the Σ df² candidate join, exactly as the blocked pair-join
  * family fails on hot blocks. The guard also consumes a persisted
  * ledger histogram so refreshes pay metadata cost. */
class PrefixGuardSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import graft.ops.ApproxDedup

  test("the SCALING.md bigram case trips the default guard; 4-grams pass") {
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val bigrams = docs.withColumn("grams", ApproxDedup.wordNgrams(col("text"), 2))
    val e = intercept[IllegalArgumentException] {
      ApproxDedup.jaccardPairsPrefixScoped(bigrams, "doc_id", "grams", 800000L)
    }
    assert(e.getMessage.contains("hot prefix token"), e.getMessage)
    assert(e.getMessage.contains("grams"), e.getMessage)

    // the shipped q147 config (4-gram selectivity) passes the same
    // default guard — construction runs the check eagerly
    val quad = docs.withColumn("grams", ApproxDedup.wordNgrams(col("text"), 4))
    val ok = ApproxDedup.jaccardPairsPrefixScoped(quad, "doc_id", "grams", 800000L)
    ok.release()
  }

  test("a ledger-held histogram drives the guard: an inflated entry trips it") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("grams", ApproxDedup.wordNgrams(col("text"), 4))
    // the persisted-ledger path: histogram rows say one token went hot
    // (e.g. merged in by a landing batch) even though this corpus
    // snapshot alone is fine — the guard must see the LEDGER's view
    import spark.implicits._
    val hist = ApproxDedup.prefixTokenHistogram(docs, "doc_id", "grams", 800000L)
      .unionByName(Seq(("synthetic hot gram x y", 500000L)).toDF("blk", "n"))
    val e = intercept[IllegalArgumentException] {
      ApproxDedup.jaccardPairsPrefixScoped(docs, "doc_id", "grams", 800000L,
        prefixHistogram = Some(hist))
    }
    assert(e.getMessage.contains("synthetic hot gram"), e.getMessage)
    // and the true histogram passes
    val ok = ApproxDedup.jaccardPairsPrefixScoped(docs, "doc_id", "grams",
      800000L, prefixHistogram = Some(
        ApproxDedup.prefixTokenHistogram(docs, "doc_id", "grams", 800000L)))
    ok.release()
  }
}

/** Vocab-scale BPE: the driver-local greedy trainer and the
  * chain-length-free iterative encoder must be bit-identical to the
  * distributed trainer and the expression-fold encoder — the round-9
  * implementations whose per-merge-job / per-merge-expression costs
  * walled off real (32k-merge) vocab sizes. Parity here is what lets
  * `train`/`encode` route by size without changing a single result. */
class BpeScaleSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Bpe

  private val dir = "/root/testdata/sf0.001"

  test("driver-local train == distributed train, merge for merge") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val local = Bpe.trainLocal(docs, col("text"), 12)
      .orderBy("step").collect().toSeq
    val dist = Bpe.trainDistributed(docs, col("text"), 12)
      .orderBy("step").collect().toSeq
    assert(local == dist)
    assert(local.size == 12)
  }

  test("encodeIter == expression-fold encode on the oracle config") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val chain = Bpe.mergeChain(Bpe.train(docs, col("text"), 8))
    val fold = Bpe.encode(docs, "doc_id", col("text"), chain)
      .orderBy("doc_id").collect().toSeq
    val iter = Bpe.encodeIter(docs, "doc_id", col("text"), chain)
      .orderBy("doc_id").collect().toSeq
    assert(fold == iter)
    assert(fold.nonEmpty)
  }

  test("a chain past ExprFoldMaxMerges trains and encodes; iter replay == sequential fold") {
    // compound words (spaces -> _) give the corpus enough adjacent
    // pairs to learn hundreds of merges — the regime the fold path
    // cannot reach
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        regexp_replace(col("text"), "\\s+", "_").as("text"))
    val n = 200
    assert(n > Bpe.ExprFoldMaxMerges)
    val table = Bpe.train(docs, col("text"), n)
    val chain = Bpe.mergeChain(table).toIndexedSeq
    assert(chain.size == n, s"corpus must support $n merges, got ${chain.size}")

    // the routed encode (iter path) against a driver-side SEQUENTIAL
    // replay of the whole chain — the executable definition of the
    // fold semantics at a depth the fold itself cannot express
    val got = Bpe.encode(docs, "doc_id", col("text"), chain)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val ranks = Bpe.rankTable(chain)
    val want = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().toSeq.sortBy(_._1)
      .map { case (id, t) =>
        val words = t.split("\\s+").filter(_.nonEmpty)
        val nBpe = words.map { w =>
          var syms = Bpe.splitCodePoints(w)
          chain.foreach { case (l, r) => syms = Bpe.mergeScanWord(syms, l, r) }
          syms.length.toLong
        }.sum
        (id, words.length.toLong, nBpe)
      }
    assert(got == want)
    // and the cursor-skipping replay equals the sequential one per word
    val sample = docs.limit(5).select("text").as[String].collect()
    sample.foreach { t =>
      var syms = Bpe.splitCodePoints(t)
      chain.foreach { case (l, r) => syms = Bpe.mergeScanWord(syms, l, r) }
      assert(Bpe.applyChainToWord(t, chain, ranks).toSeq == syms.toSeq)
    }
  }

  test("train routes by BOTH guard dimensions: word count and total chars") {
    import spark.implicits._
    val corpus = Seq("aa bb aa cc bb aa", "bb cc aa bb").toDF("text")
    // tiny vocab, but a 1-char budget forces the distributed path;
    // both paths must agree merge-for-merge
    val local = Bpe.train(corpus, col("text"), 3)
      .orderBy("step").collect().toSeq
    val forcedDistributed = Bpe.train(corpus, col("text"), 3,
      maxLocalVocabChars = 1L).orderBy("step").collect().toSeq
    assert(local == forcedDistributed && local.size == 3)
  }

  test("single-pass merge delta == brute-force re-bag on random words") {
    val rnd = new scala.util.Random(41)
    def bag(s: Array[String]) = s.sliding(2).filter(_.length == 2)
      .map(a => (a(0), a(1))).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    for (trial <- 1 to 300) {
      val alpha = Seq("a", "b", "c", "ab", "bc")
      val w = Array.fill(1 + rnd.nextInt(14))(alpha(rnd.nextInt(alpha.size)))
      val (l, r) = (alpha(rnd.nextInt(alpha.size)), alpha(rnd.nextInt(alpha.size)))
      val delta = scala.collection.mutable.HashMap.empty[(String, String), Int]
      val viaDiff = graft.ops.Bpe.mergeScanWordDiff(w, l, r, delta)
      val viaScan = graft.ops.Bpe.mergeScanWord(w, l, r)
      assert(viaDiff.toSeq == viaScan.toSeq,
        s"trial $trial: rewrites differ on ${w.toSeq} merge ($l,$r)")
      val before = bag(w)
      val after = bag(viaScan)
      val wantDelta = (before.keySet ++ after.keySet).flatMap { p =>
        val d = after.getOrElse(p, 0) - before.getOrElse(p, 0)
        if (d != 0) Some(p -> d) else None
      }.toMap
      assert(delta.toMap == wantDelta,
        s"trial $trial: delta differs on ${w.toSeq} merge ($l,$r): " +
          s"got ${delta.toMap}, want $wantDelta")
    }
  }

  test("driver-local train == independent reference on random corpora") {
    // the BpeSpec reference algorithm, replayed over randomized corpora
    // at merge depths that exercise the incremental bookkeeping
    def refMergeOnce(syms: List[String], l: String, r: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toList
    }
    def refTrain(words: Map[String, Long], n: Int): List[(String, String, Long)] = {
      var hist: Map[List[String], Long] =
        words.groupMapReduce { case (w, _) => w.map(_.toString).toList }(_._2)(_ + _)
      val merges = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
      var step = 0
      var done = false
      while (step < n && !done) {
        val pc = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((syms, cnt) <- hist; Seq(a, b) <- syms.sliding(2) if syms.length > 1)
          pc((a, b)) = pc.getOrElse((a, b), 0L) + cnt
        if (pc.isEmpty) done = true
        else {
          val ((l, r), w) = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
          merges += ((l, r, w))
          hist = hist.toSeq
            .map { case (syms, cnt) => (refMergeOnce(syms, l, r), cnt) }
            .groupMapReduce(_._1)(_._2)(_ + _)
          step += 1
        }
      }
      merges.toList
    }
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    for (trial <- 1 to 3) {
      val words = (1 to 60).map(_ =>
        (1 to (3 + rnd.nextInt(10))).map(_ => ('a' + rnd.nextInt(4)).toChar)
          .mkString)
      val corpus = (1 to 40).map(_ =>
        (1 to (5 + rnd.nextInt(10))).map(_ => words(rnd.nextInt(words.size)))
          .mkString(" "))
      val got = Bpe.trainLocal(corpus.toDF("text"), col("text"), 40)
        .orderBy("step").collect()
        .map(r => (r.getAs[String]("lft"), r.getAs[String]("rgt"),
          r.getAs[Long]("weight"))).toList
      val flat = corpus.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      val want = refTrain(
        flat.groupMapReduce(identity)(_ => 1L)(_ + _), 40)
      assert(got == want, s"trial $trial diverged")
      assert(got.size == 40, s"trial $trial learned only ${got.size}")
    }
  }

  test("a recurring pair in the chain applies at every occurrence") {
    // hand-built chain where a later merge recreates an earlier pair's
    // adjacency and the pair recurs: x y -> xy ; xy z -> xyz ; then a
    // second (x, y). The cursor replay must honor both occurrences in
    // order, exactly as the sequential fold does.
    val chain = IndexedSeq(("x", "y"), ("xy", "z"), ("a", "x"), ("x", "y"))
    val ranks = Bpe.rankTable(chain)
    for (w <- Seq("xyzxy", "axy", "xyxyz", "axyzxxy")) {
      var syms = Bpe.splitCodePoints(w)
      chain.foreach { case (l, r) => syms = Bpe.mergeScanWord(syms, l, r) }
      assert(Bpe.applyChainToWord(w, chain, ranks).toSeq == syms.toSeq,
        s"word $w")
    }
  }
}

/** Randomized differential test of the DISTRIBUTED partitioned
  * upsert: arbitrary overlapping batches must leave the partitioned
  * store, the monolithic store and a driver-side reference map in
  * exact agreement — the net behavioral contract the one-job rewrite
  * must preserve. */
class StorePropertySpec extends SparkSpec {
  import spark.implicits._
  import graft.sinks.Sinks

  test("a scheme-qualified store path round-trips (bucket paths keep their scheme)") {
    // the round-10 posture claim is "the store runs on HDFS/S3A
    // unchanged": bucket paths returned by the listing must keep
    // scheme+authority so readers never resolve them against the
    // session's default filesystem
    val store = "file:" + tmpDir("scheme_store") + "/s"
    val rows = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    Sinks.upsertPartitioned(rows, Seq("id"), store, nBuckets = 4)
    val buckets = Sinks.listBuckets(store)
    assert(buckets.nonEmpty && buckets.forall(_.startsWith("file:")),
      s"bucket paths must stay scheme-qualified: $buckets")
    val back = Sinks.readPartitioned(spark, store)
      .as[(Long, String)].collect().toSeq.sorted
    assert(back == (1L to 100L).map(i => (i, s"v$i")).sorted)
    val ds = spark.read.format("graft-store").load(store)
    assert(ds.count() == 100)
    val one = ds.filter(org.apache.spark.sql.functions.col("id") === 7L)
    assert(one.rdd.getNumPartitions == 1 && one.count() == 1)
  }

  test("random batch sequences: partitioned == monolithic == reference") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 3) {
      val pStore = tmpDir(s"prop_p$trial") + "/s"
      val mStore = tmpDir(s"prop_m$trial") + "/s"
      val ref = scala.collection.mutable.Map.empty[Long, String]
      for (b <- 1 to 5) {
        val batch = (1 to (20 + rnd.nextInt(120))).map { _ =>
          (rnd.nextInt(200).toLong, s"t${trial}b${b}v${rnd.nextInt(1000)}")
        }.distinct.groupBy(_._1).map(_._2.head).toSeq // unique keys per batch
        batch.foreach { case (k, v) => ref(k) = v }
        val df = batch.toDF("id", "v")
        Sinks.upsertPartitioned(df, Seq("id"), pStore,
          nBuckets = 1 + rnd.nextInt(16))
        Sinks.upsertParquet(df, Seq("id"), mStore)
      }
      val p = Sinks.readPartitioned(spark, pStore)
        .as[(Long, String)].collect().toSeq.sorted
      val m = spark.read.parquet(mStore)
        .as[(Long, String)].collect().toSeq.sorted
      val want = ref.toSeq.sorted
      assert(p == want, s"trial $trial: partitioned store diverged")
      assert(m == want, s"trial $trial: monolithic store diverged")
    }
  }
}

/** The `_stats` marker as the DSv2 reader's statistics source: an
  * upsert maintains per-bucket (rows, bytes) lines, and
  * `estimateStatistics` serves them WITHOUT listing bucket directories
  * — proven by tampering the marker and observing the tampered values
  * in the reported statistics. Plans are unchanged (StoreSourceSpec
  * still pins pruning and pushdown). */
class StoreStatsMarkerSpec extends SparkSpec {
  import spark.implicits._

  test("upsert writes _stats; estimateStatistics serves it; fallback on a missing line") {
    val store = tmpDir("stats_store") + "/s"
    val rows = (1L to 300L).map(i => (i, s"v$i")).toDF("id", "v")
    Sinks.upsertPartitioned(rows, Seq("id"), store, nBuckets = 4)

    val statsPath = java.nio.file.Paths.get(store, "_stats")
    assert(java.nio.file.Files.exists(statsPath), "_stats marker must exist")
    val lines = java.nio.file.Files.readString(statsPath).linesIterator.toSeq
    assert(lines.size == 4, s"one line per bucket: $lines")
    val byBucket = lines.map { l =>
      val Array(b, r, by) = l.split(","); (b.toInt, r.toLong, by.toLong)
    }
    assert(byBucket.map(_._2).sum == 300L, s"marker rows must total 300: $lines")
    assert(byBucket.forall(_._3 > 0L))

    def reportedStats(path: String) = {
      val df = spark.read.format("graft-store").load(path)
      val rel = df.queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
      }.get
      val s = rel.scan.asInstanceOf[
        org.apache.spark.sql.connector.read.SupportsReportStatistics]
        .estimateStatistics()
      (s.sizeInBytes().getAsLong,
        if (s.numRows().isPresent) Some(s.numRows().getAsLong) else None)
    }

    val (bytes0, rows0) = reportedStats(store)
    assert(rows0.contains(300L), s"numRows must come from the marker: $rows0")
    assert(bytes0 == byBucket.map(_._3).sum)

    // tamper the marker: the reader must reflect the tampered numbers,
    // proving statistics are served from it, not from directory listings
    // (drop the Hadoop checksum sidecar the out-of-band edit invalidates)
    def tamper(content: String): Unit = {
      java.nio.file.Files.writeString(statsPath, content)
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(store, "._stats.crc"))
    }
    val tampered = byBucket.map { case (b, _, _) => s"$b,1000000,999999999" }
      .mkString("\n")
    tamper(tampered)
    val (bytes1, rows1) = reportedStats(store)
    assert(rows1.contains(4000000L), s"tampered rows must surface: $rows1")
    assert(bytes1 == 4L * 999999999L)

    // a marker missing one bucket's line: rows unknown, bytes fall back
    // to listing that bucket (never a wrong total)
    tamper(byBucket.tail.map { case (b, r, by) => s"$b,$r,$by" }.mkString("\n"))
    val (bytes2, rows2) = reportedStats(store)
    assert(rows2.isEmpty, "partial marker must not fabricate a row count")
    assert(bytes2 == byBucket.map(_._3).sum,
      "bytes must fall back to listing the uncovered bucket")

    // the upsert's own correctness is untouched
    val got = Sinks.readPartitioned(spark, store)
      .as[(Long, String)].collect().toSeq.sorted
    assert(got == (1L to 300L).map(i => (i, s"v$i")).sorted)
  }
}
