package graft

import org.apache.spark.sql.functions._

import graft.ops.{AsOfJoin, CorpusSignals, RangeJoin, TextAnalysis}

/** Round-5 additions: union-window as-of join, bucketed band range
  * join, Bloom-prefiltered decontamination, vocabulary/OOV scan. Each
  * scalable formulation is checked row-for-row against the naive
  * quadratic formulation it replaces. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random fixture WITH ties: times collide both
  // within and across sides (t % 7), keys are hot (k % 3)
  private lazy val left = (1L to 60L)
    .map(i => (i, i % 3, (i * 13 % 7) + 10)).toDF("lid", "k", "t")
  private lazy val right = (1L to 80L)
    .map(i => (i, i % 3, (i * 29 % 7) + 10)).toDF("rid", "k", "t")
    .withColumn("payload", col("rid") * 100)

  test("lastPrior matches the naive argmax theta-join, ties included") {
    val fast = AsOfJoin.lastPrior(left, right, "k", "t", "lid", "rid",
        payload = Seq("payload"))
      .select("lid", "asof_time", "asof_rid", "asof_payload")
      .orderBy("lid")
      .collect()

    // naive oracle: all prior pairs, argmax by (t, rid)
    val naive = left.as("l")
      .join(right.as("r"), col("r.k") === col("l.k") && col("r.t") <= col("l.t"), "left")
      .groupBy(col("l.lid"))
      .agg(max(struct(col("r.t"), col("r.rid"), col("r.payload"))).as("m"))
      .select(col("lid"), col("m.t").as("asof_time"),
        col("m.rid").as("asof_rid"), col("m.payload").as("asof_payload"))
      .orderBy("lid")
      .collect()

    assert(fast.length == naive.length)
    fast.zip(naive).foreach { case (f, n) => assert(f == n) }
  }

  test("lastPrior: a left row with no prior right row keeps nulls") {
    val l = Seq((1L, 1L, 5L)).toDF("lid", "k", "t")
    val r = Seq((9L, 1L, 6L)).toDF("rid", "k", "t") // only AFTER
    val out = AsOfJoin.lastPrior(l, r, "k", "t", "lid", "rid").collect()
    assert(out.length == 1 && out(0).isNullAt(out(0).fieldIndex("asof_rid")))
  }

  test("lastPrior: extra left columns survive the enrichment") {
    val l = Seq((1L, 1L, 5L, "keep-me", 42.0))
      .toDF("lid", "k", "t", "tag", "amount")
    val r = Seq((9L, 1L, 3L)).toDF("rid", "k", "t")
    val out = AsOfJoin.lastPrior(l, r, "k", "t", "lid", "rid").collect()
    assert(out(0).getAs[String]("tag") == "keep-me")
    assert(out(0).getAs[Double]("amount") == 42.0)
    assert(out(0).getAs[Long]("asof_rid") == 9L)
  }

  test("lastPrior: equal timestamps count as prior (<= semantics)") {
    val l = Seq((1L, 1L, 5L)).toDF("lid", "k", "t")
    val r = Seq((7L, 1L, 5L), (3L, 1L, 5L)).toDF("rid", "k", "t")
    val out = AsOfJoin.lastPrior(l, r, "k", "t", "lid", "rid").collect()
    // tie at t=5 resolves to the larger rid
    assert(out(0).getAs[Long]("asof_rid") == 7L)
  }
}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val left = (1L to 50L)
    .map(i => (i, i % 4, i * 17 % 100)).toDF("lid", "k", "t")
  private lazy val right = (1L to 70L)
    .map(i => (i, i % 4, i * 23 % 100)).toDF("rid", "k", "t")

  test("withinBand matches the naive theta-join exactly once per pair") {
    for (band <- Seq(1L, 7L, 30L)) {
      val fast = RangeJoin.withinBand(left, right, "k", "t", band)
        .select(col("lid"), col("r_rid")).orderBy("lid", "r_rid").collect()
      val naive = left.as("l").join(right.as("r"),
          col("l.k") === col("r.k") &&
            abs(col("l.t") - col("r.t")) <= band)
        .select(col("lid"), col("rid").as("r_rid"))
        .orderBy("lid", "r_rid").collect()
      assert(fast.toSeq == naive.toSeq, s"band=$band")
    }
  }

  test("withinBand: a single hot key stays correct (bucket-spread path)") {
    // every row shares one key — the shape that melts a naive per-key
    // join; the bucketed form must still match the theta-join exactly
    val hotL = (1L to 150L).map(i => (i, 1L, i * 7 % 300)).toDF("lid", "k", "t")
    val hotR = (1L to 200L).map(i => (i, 1L, i * 11 % 300)).toDF("rid", "k", "t")
    val fast = RangeJoin.withinBand(hotL, hotR, "k", "t", band = 10L)
      .select(col("lid"), col("r_rid")).orderBy("lid", "r_rid").collect()
    val naive = hotL.as("l").join(hotR.as("r"),
        col("l.k") === col("r.k") && abs(col("l.t") - col("r.t")) <= 10L)
      .select(col("lid"), col("rid").as("r_rid"))
      .orderBy("lid", "r_rid").collect()
    assert(fast.nonEmpty && fast.toSeq == naive.toSeq)
  }

  test("nearbyStats keeps zero-match left rows at n_nearby = 0") {
    val l = Seq((1L, 9L, 5L), (2L, 1L, 5L)).toDF("lid", "k", "t")
    val r = Seq((7L, 1L, 6L)).toDF("rid", "k", "t")
    val out = RangeJoin.nearbyStats(l, r, "k", "t", band = 2L,
        leftId = "lid", aggs = Seq(sum(col("r_t")).as("tsum")))
      .orderBy("lid").collect()
    assert(out(0).getAs[Long]("n_nearby") == 0L)
    assert(out(1).getAs[Long]("n_nearby") == 1L)
  }
}

class BloomContaminationSpec extends SparkSpec {
  import spark.implicits._

  test("contaminationBloom is bit-identical to the broadcast-join form") {
    val docs = (1L to 120L).map { i =>
      val words = (0 until 12).map(j => s"w${(i * 7 + j * 3) % 40}")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val bench = docs.filter(col("doc_id") % 10 === 0)
    val exact = CorpusSignals.contamination(train, bench, "doc_id",
        col("text"), n = 3).orderBy("doc_id").collect()
    val bloom = CorpusSignals.contaminationBloom(train, bench, "doc_id",
        col("text"), n = 3, expectedItems = 1000L, fpp = 0.05)
      .orderBy("doc_id").collect()
    assert(exact.nonEmpty) // non-vacuous fixture
    assert(bloom.toSeq == exact.toSeq)
  }
}

class ChunkCapSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Curation

  test("chunkWindows: overlap, short tail, sub-window single chunk") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks, w4 s2
      (2L, "a b c"),                                  // sub-window
      (3L, "x y z w")                                 // exactly one window
    ).toDF("doc_id", "text")
    val out = Curation.chunkWindows(docs, "doc_id", col("text"),
        window = 4, stride = 2)
      .orderBy("doc_id", "chunk_id").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    // ceil((10-4)/2)=3 → chunks 0..3
    assert(d1.length == 4)
    assert(d1(0).getAs[String]("chunk_text") == "t1 t2 t3 t4")
    assert(d1(1).getAs[String]("chunk_text") == "t3 t4 t5 t6")
    assert(d1(3).getAs[String]("chunk_text") == "t7 t8 t9 t10")
    assert(out.filter(_.getLong(0) == 2L).map(_.getAs[String]("chunk_text")).toSeq
      == Seq("a b c"))
    assert(out.filter(_.getLong(0) == 3L).length == 1)
    // every token of every doc is covered by at least one chunk
    assert(d1.map(_.getAs[Long]("chunk_tokens")).sum >= 10)
  }

  test("cappedPerGroup equals the naive single-window top-k") {
    val rows = (1L to 300L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val staged = Curation.cappedPerGroup(rows, "g", "id", k = 7, salts = 8)
      .orderBy("g", "pos").collect()
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
      .orderBy(md5(concat(lit("cap:"), col("id").cast("string"))), col("id"))
    val naive = rows.withColumn("pos", row_number().over(w).cast("bigint"))
      .filter(col("pos") <= 7).orderBy("g", "pos").collect()
    assert(staged.length == 21 && staged.toSeq == naive.toSeq)
  }

  test("cappedPerGroup: groups smaller than k pass through whole") {
    val rows = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "g")
    val out = Curation.cappedPerGroup(rows, "g", "id", k = 10, salts = 4)
    assert(out.count() == 3)
  }

  test("topKPerGroup: one giant group stays exact through the salt stages") {
    val rows = (1L to 500L).map(i => (i, "only", (i * 13) % 251))
      .toDF("id", "g", "score")
    val staged = Curation.topKPerGroup(rows, "g", "id", k = 9,
        ord = -col("score"), salts = 16)
      .orderBy("pos").collect()
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
      .orderBy(col("score").desc, col("id"))
    val naive = rows.withColumn("pos", row_number().over(w).cast("bigint"))
      .filter(col("pos") <= 9).orderBy("pos").collect()
    assert(staged.length == 9 && staged.toSeq == naive.toSeq)
  }

  test("topKPerGroup: value-ranked form equals the naive window") {
    val rows = (1L to 200L).map(i => (i, s"g${i % 4}", (i * 37) % 97))
      .toDF("id", "g", "score")
    val staged = Curation.topKPerGroup(rows, "g", "id", k = 6,
        ord = -col("score"), salts = 8)
      .orderBy("g", "pos").collect()
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
      .orderBy(col("score").desc, col("id"))
    val naive = rows.withColumn("pos", row_number().over(w).cast("bigint"))
      .filter(col("pos") <= 6).orderBy("g", "pos").collect()
    assert(staged.length == 24 && staged.toSeq == naive.toSeq)
  }
}

class PqSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Similarity

  // 40 deterministic 8-dim vectors in two well-separated direction
  // families, so PQ's coarse codes must still rank family-mates first
  private lazy val vecs = (0L until 40L).map { i =>
    val base = if (i % 2 == 0) Array(1.0, 2, 3, 4, 5, 6, 7, 8)
               else Array(8.0, -7, 6, -5, 4, -3, 2, -1)
    (i, base.zipWithIndex.map { case (x, d) => x + (i * (d + 1) % 5) * 0.01 }.toSeq)
  }.toDF("vec_id", "embedding")

  test("pqFit/pqEncode: every vector gets one code per subspace, in range") {
    val cb = Similarity.pqFit(vecs, "vec_id", "embedding",
      m = 2, dsub = 4, ksub = 4, iters = 1)
    assert(cb.length == 2 && cb.forall(_.length == 4)
      && cb.forall(_.forall(_.length == 4)))
    val codes = Similarity.pqEncode(vecs, "vec_id", "embedding", 2, 4,
      Similarity.pqCodebookDf(spark, cb))
    assert(codes.count() == 80) // 40 vectors x 2 subspaces
    val rng = codes.agg(min("code"), max("code")).first()
    assert(rng.getLong(0) >= 0L && rng.getLong(1) <= 3L)
  }

  test("pqTopK: ADC ranking puts same-family vectors first") {
    val cb = Similarity.pqFit(vecs, "vec_id", "embedding",
      m = 2, dsub = 4, ksub = 4, iters = 2)
    val top = Similarity.pqTopK(vecs.filter(col("vec_id") < 2), vecs,
        "vec_id", "vec_id", "embedding", cb, m = 2, dsub = 4, k = 5)
      .collect()
    assert(top.length == 10) // 2 queries x 5
    // query 0 (even family): all top-5 should be even ids; query 1 odd
    top.foreach { r =>
      val q = r.getAs[Long]("query_id"); val c = r.getAs[Long]("corpus_id")
      assert(c % 2 == q % 2, s"query $q ranked cross-family $c")
    }
  }
}

class CentroidsBpeSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.{Similarity, TextAnalysis}

  test("groupCentroids: exact fixed-point means per (group, dim)") {
    val df = Seq(
      ("a", Seq(1.0, -2.0)), ("a", Seq(2.0, -3.0)), ("b", Seq(0.5, 0.5))
    ).toDF("g", "v")
    val out = Similarity.groupCentroids(df, "g", "v")
      .orderBy("g", "dim").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // a: dim0 (1e6+2e6)/2=1500000, dim1 (-2e6-3e6)/2=-2500000
    assert(out.toSeq == Seq(
      ("a", 0L, 1500000L, 2L), ("a", 1L, -2500000L, 2L),
      ("b", 0L, 500000L, 1L), ("b", 1L, 500000L, 1L)))
  }

  test("bpeMergePairs: adjacent pairs weighted by token frequency") {
    val docs = Seq((1L, "abc abc ab x"), (2L, "abc")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeMergePairs(docs, col("text"), minWeight = 1L)
      .orderBy("pair").collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[Long]("weight")))
    // tokens: abc x3, ab x1, x x1 → ab: 3+1=4, bc: 3; "x" contributes none
    assert(out.toSeq == Seq(("ab", 4L), ("bc", 3L)))
  }
}

class FunnelSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Funnel

  // u1 completes in order; u2 clicks BEFORE viewing (click must not
  // count); u3 only views; u4 purchases without ever viewing
  private lazy val ev = Seq(
    (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
    (2L, 10L, "click"), (2L, 20L, "view"), (2L, 30L, "purchase"),
    (3L, 10L, "view"),
    (4L, 10L, "purchase")
  ).toDF("u", "ts", "etype")

  test("stages: out-of-order events do not advance the funnel") {
    val out = Funnel.stages(ev, "u", col("ts"), col("etype"),
        Seq("view", "click", "purchase"))
      .orderBy("u").collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("depth")))
    assert(out.toSeq == Seq((1L, 3L), (2L, 1L), (3L, 1L), (4L, 0L)))
  }

  test("stages: same-timestamp stage counts (at-or-after semantics)") {
    val e = Seq((1L, 10L, "view"), (1L, 10L, "click")).toDF("u", "ts", "etype")
    val out = Funnel.stages(e, "u", col("ts"), col("etype"),
      Seq("view", "click")).collect()
    assert(out(0).getAs[Long]("depth") == 2L)
  }

  test("summary: monotone non-increasing stage counts") {
    val s = Funnel.summary(ev, "u", col("ts"), col("etype"),
        Seq("view", "click", "purchase"))
      .orderBy("stage_no").collect()
      .map(r => (r.getAs[String]("stage"), r.getAs[Long]("n_keys")))
    assert(s.toSeq == Seq(("view", 3L), ("click", 1L), ("purchase", 1L)))
  }
}

class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Funnel

  test("stagesStream: event-time-ordered batches match the batch funnel") {
    val root = tmpDir("funnel_stream")
    val inDir = s"$root/in"
    new java.io.File(inDir).mkdirs()
    def writeBatch(name: String, rows: Seq[(Long, Long, String)]): Unit = {
      val tmp = java.nio.file.Paths.get(s"$root/$name.json.tmp")
      java.nio.file.Files.writeString(tmp,
        rows.map { case (u, t, s) =>
          s"""{"u":$u,"ts":$t,"etype":"$s"}"""
        }.mkString("\n"))
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(s"$inDir/$name.json"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }

    // batch 1 = early window, batch 2 = later window (event-time order
    // across batches — stagesStream's documented contract)
    val b1 = Seq((1L, 10L, "view"), (1L, 20L, "click"), (2L, 10L, "click"),
      (3L, 15L, "view"))
    val b2 = Seq((1L, 30L, "purchase"), (2L, 40L, "view"), (2L, 50L, "purchase"),
      (3L, 60L, "click"), (3L, 70L, "purchase"))
    val stages = Seq("view", "click", "purchase")

    writeBatch("b1", b1)
    val stream = spark.readStream.schema("u LONG, ts LONG, etype STRING").json(inDir)
    val q = Funnel.stagesStream(stream, "u", col("ts"), col("etype"), stages)
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .outputMode("update")
      .format("memory").queryName("funnel_out")
      .start()
    q.processAllAvailable()
    writeBatch("b2", b2)
    q.processAllAvailable()
    q.stop()

    // last update per key == the batch funnel over the full log
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("u"))
      .orderBy(col("_bid").desc)
    val got = spark.table("funnel_out")
      .withColumn("_bid", monotonically_increasing_id())
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_bid", "_rn")
      .orderBy("u").collect()
    val want = Funnel.stages((b1 ++ b2).toDF("u", "ts", "etype"),
        "u", col("ts"), col("etype"), stages)
      .orderBy("u").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, x) =>
      assert(g.getAs[Long]("u") == x.getAs[Long]("u"))
      assert(g.getAs[Long]("depth") == x.getAs[Long]("depth"),
        s"user ${g.getAs[Long]("u")}")
      (0 until 3).foreach { i =>
        assert(g.getAs[Any](s"t_$i") == x.getAs[Any](s"t_$i"), s"t_$i")
      }
    }
  }

  test("stagesStream: string keys keep per-key state (no cast collapse)") {
    // mapGroupsWithState also runs in batch mode — enough to prove the
    // key survives as its own group and the output keeps its type
    val ev = Seq(("u-a", 10L, "view"), ("u-a", 20L, "click"),
        ("u-b", 10L, "view"))
      .toDF("u", "ts", "etype")
    val out = Funnel.stagesStream(ev, "u", col("ts"), col("etype"),
        Seq("view", "click"))
      .orderBy("u").collect()
      .map(r => (r.getAs[String]("u"), r.getAs[Long]("depth")))
    assert(out.toSeq == Seq(("u-a", 2L), ("u-b", 1L)))
  }
}

class RecallSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Similarity

  test("recallAtK: identical, partial and disjoint top-k tables") {
    val exact = Seq((1L, 1, 10L), (1L, 2, 11L), (2L, 1, 20L), (2L, 2, 21L))
      .toDF("query_id", "rank", "corpus_id")
    val approx = Seq((1L, 1, 10L), (1L, 2, 11L), (2L, 1, 99L), (2L, 2, 98L))
      .toDF("query_id", "rank", "corpus_id")
    val r = Similarity.recallAtK(approx, exact).orderBy("query_id").collect()
      .map(x => (x.getAs[Long]("query_id"), x.getAs[Long]("n_hit"),
        x.getAs[Long]("recall_ppm")))
    assert(r.toSeq == Seq((1L, 2L, 1000000L), (2L, 0L, 0L)))
  }
}

class LmCountsSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.CorpusSignals

  test("trigram conditional counts: exact MLE ppm, sub-n docs drop") {
    val docs = Seq((1L, "a b c a b c a b d"), (2L, "x y")).toDF("doc_id", "text")
    val out = CorpusSignals.lmConditionalCounts(docs, col("text"),
        n = 3, minCount = 1L)
      .orderBy("context", "word").collect()
      .map(r => (r.getAs[String]("context"), r.getAs[String]("word"),
        r.getAs[Long]("cnt_gram"), r.getAs[Long]("cnt_ctx"),
        r.getAs[Long]("p_ppm")))
    // trigrams: (a b→c)x2, (a b→d)x1, (b c→a)x2, (c a→b)x2; "x y" too short
    assert(out.toSeq == Seq(
      ("a b", "c", 2L, 3L, 666666L),
      ("a b", "d", 1L, 3L, 333333L),
      ("b c", "a", 2L, 2L, 1000000L),
      ("c a", "b", 2L, 2L, 1000000L)))
  }

  test("minCount cuts rows but not denominators") {
    val docs = Seq((1L, "a b c a b c a b d")).toDF("doc_id", "text")
    val out = CorpusSignals.lmConditionalCounts(docs, col("text"),
        n = 3, minCount = 2L).collect()
    // (a b, d) is cut, but (a b, c)'s denominator still counts it
    assert(out.length == 3)
    val ab = out.find(_.getAs[String]("context") == "a b").get
    assert(ab.getAs[Long]("cnt_ctx") == 3L)
  }
}

class IncrementalIngestSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Dedup

  private def fp = md5(col("text"))

  test("incrementalNovel: ledger and in-batch layers both drop dups") {
    val ledger = Seq("old-1", "old-2").toDF("text").select(fp.as("fp"))
    val batch = Seq((10L, "new-a"), (11L, "new-a"), (12L, "old-1"), (13L, "new-b"))
      .toDF("doc_id", "text")
    val novel = Dedup.incrementalNovel(batch, "doc_id", fp, ledger)
      .orderBy("doc_id").collect()
    // new-a keeps min id 10; old-1 drops (ledger); new-b lands
    assert(novel.map(_.getLong(0)).toSeq == Seq(10L, 13L))
  }

  test("re-running a landed batch against the updated ledger is a no-op") {
    val ledger0 = Seq("old-1").toDF("text").select(fp.as("fp"))
    val batch = Seq((1L, "x"), (2L, "y"), (3L, "old-1")).toDF("doc_id", "text")
    val ledger1 = Dedup.updatedLedger(ledger0, batch, fp)
    assert(ledger1.count() == 3) // old-1, x, y — distinct
    val rerun = Dedup.incrementalNovel(batch, "doc_id", fp, ledger1)
    assert(rerun.count() == 0) // idempotent: nothing lands twice
  }
}

class DriftSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.CorpusSignals

  test("distributionDrift: identical mixes drift 0, disjoint drift 2M") {
    val docs = Seq(
      // group "same": identical lang mix on both sides (en+fr each)
      ("same", "en", 0L), ("same", "fr", 2L), ("same", "en", 1L), ("same", "fr", 3L),
      // group "flip": side 0 all-en, side 1 all-fr → L1 = 2,000,000
      ("flip", "en", 0L), ("flip", "en", 2L), ("flip", "fr", 1L), ("flip", "fr", 3L)
    ).toDF("src", "lang", "id")
    val out = CorpusSignals.distributionDrift(docs, "src", col("lang"),
        col("id") % 2 === 1)
      .orderBy("src").collect()
      .map(r => (r.getAs[String]("src"), r.getAs[Long]("l1_drift_ppm")))
    assert(out.toSeq == Seq(("flip", 2000000L), ("same", 0L)))
  }

  test("distributionDrift: a category absent from one side counts fully") {
    val docs = Seq(("g", "en", 0L), ("g", "en", 1L), ("g", "zh", 2L))
      .toDF("src", "lang", "id")
    // side0: en 1/2, zh 1/2; side1: en 1/1 → |500000-1000000| + |500000-0|
    val out = CorpusSignals.distributionDrift(docs, "src", col("lang"),
      col("id") % 2 === 1).collect()
    assert(out(0).getAs[Long]("l1_drift_ppm") == 1000000L)
  }
}

class GroupOverlapSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.CorpusSignals

  test("groupOverlap counts one row per fingerprint per group pair") {
    val docs = Seq(
      ("a", "x"), ("a", "x"), ("b", "x"), ("c", "x"), // fp x: a,b,c (a dup'd)
      ("a", "y"), ("b", "y"),                          // fp y: a,b
      ("c", "z")                                       // fp z: c only
    ).toDF("src", "fp0")
    val out = CorpusSignals.groupOverlap(docs, "src", col("fp0"))
      .orderBy("g_a", "g_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // x contributes (a,b),(a,c),(b,c); y contributes (a,b); z nothing.
    // The duplicated (a,x) row must NOT double-count.
    assert(out.toSeq == Seq(("a", "b", 2L), ("a", "c", 1L), ("b", "c", 1L)))
  }
}

class ZOrderSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Layout

  test("zValue interleaves bits: known small values") {
    val df = Seq((1L, 0L), (0L, 1L), (3L, 3L), (2L, 1L))
      .toDF("x", "y")
      .withColumn("z", Layout.zValue(Seq(col("x"), col("y")), bits = 4))
    val z = df.orderBy("x", "y").collect().map(_.getAs[Long]("z"))
    // (0,1)->2, (1,0)->1, (2,1)->6, (3,3)->15
    assert(z.toSeq == Seq(2L, 1L, 6L, 15L))
  }

  test("zProfile buckets bound both dimensions (footer-pruning locality)") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val prof = Layout.zProfile(li,
        Seq(col("l_orderkey") % 1024, col("l_partkey") % 1024),
        bits = 10, bucketBits = 6)
      .collect()
    assert(prof.nonEmpty && prof.length <= 64)
    // top-6 z bits pin the top-3 bits of BOTH dims: range < 2^7 each
    prof.foreach { r =>
      assert(r.getAs[Long]("max_d0") - r.getAs[Long]("min_d0") <= 127L)
      assert(r.getAs[Long]("max_d1") - r.getAs[Long]("min_d1") <= 127L)
    }
  }
}

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.TextAnalysis

  test("CMS-prefiltered heavy hitters equal the exact groupBy form") {
    val docs = (1L to 200L)
      .map(i => (i, s"common w${i % 50} w${i % 7} filler${i}"))
      .toDF("doc_id", "text")
    val fast = TextAnalysis.heavyHitters(docs, col("text"), minCount = 20L)
      .orderBy("token").collect()
    val exact = docs.select(explode(split(col("text"), "\\s+")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 20L).orderBy("token").collect()
    assert(exact.nonEmpty && fast.toSeq == exact.toSeq)
    // "common" (200) and the w%7 family (28-29 each) are in; tail is out
    assert(fast.exists(_.getAs[String]("token") == "common"))
    assert(!fast.exists(_.getAs[String]("token").startsWith("filler")))
  }
}

class VocabOovSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a a a b b c"),
    (2L, "a b rare1 rare2"),
    (3L, "c c c c")
  ).toDF("doc_id", "text")

  test("vocabulary ranks by count desc then token asc, cut at V") {
    val v = TextAnalysis.vocabulary(docs, col("text"), v = 3)
      .orderBy("rank").collect()
    // counts: c=5, a=4, b=3, rare1=1, rare2=1 → c(1), a(2), b(3)
    assert(v.map(r => (r.getAs[String]("token"), r.getAs[Long]("rank"))).toSeq
      == Seq(("c", 1L), ("a", 2L), ("b", 3L)))
  }

  test("oovRate: exact integer ppm against the top-3 vocab") {
    val vocab = TextAnalysis.vocabulary(docs, col("text"), v = 3)
    val r = TextAnalysis.oovRate(docs, "doc_id", col("text"), vocab)
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_oov") == 0L)
    assert(r(1).getAs[Long]("n_oov") == 2L) // rare1, rare2 of 4 tokens
    assert(r(1).getAs[Long]("oov_ppm") == 500000L)
    assert(r(2).getAs[Long]("oov_ppm") == 0L)
  }
}
