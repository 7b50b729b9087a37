package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.ops.{ApproxDedup, Multimodal, SemanticDedup}

/** The streaming refresh pipeline ([[graft.streaming.RefreshStream]])
  * vs the one-shot q110 composition: landing the batch as a stream of
  * micro-batches — killed and resumed mid-stream — must produce the
  * byte-identical accepted set, because the ledgers make each gate's
  * view of history exact regardless of batching, and the
  * self-excluding views + keyed upserts make replay idempotent. */
class RefreshStreamSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import graft.streaming.RefreshStream

  private val dir = "/root/testdata/sf0.01"

  // q110's exact parameters (prefix fingerprint, word-bigram shingles,
  // 16 = 4x4 MinHash, lexical 0.5, k-means 8x2, semantic 0.3)
  private def pipeline = RefreshStream(
    id = "doc_id",
    fp = md5(concat_ws(" ", slice(split(lower(col("text")), "\\s+"), 1, 8))),
    shingles = graft.ops.ApproxDedup.wordNgrams(col("text"), 2),
    k = 16, bands = 4, rowsPerBand = 4, lexThreshold = 0.5,
    vecId = "vec_id", vecCol = "embedding",
    semK = 8, semIters = 2, semThreshold = 0.3)

  test("kill-and-resume stream of 3 landing files == one-shot q110, byte-identical") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val old = docs.filter(col("doc_id") % 10 =!= 0)
    val landing = docs.filter(col("doc_id") % 10 === 0)
      .orderBy("doc_id").collect()
    // ascending-id terciles: micro-batch order then matches the
    // one-shot within-batch smaller-id winner convention
    val batches = landing.grouped((landing.length + 2) / 3).toSeq
    assert(batches.size == 3)

    val root = tmpDir("refresh_stream")
    val landingDir = s"$root/landing"
    val p = pipeline
    p.bootstrap(old, emb.filter(col("vec_id") % 10 =!= 0), root)

    def writeFile(i: Int): Unit =
      spark.createDataFrame(
          spark.sparkContext.parallelize(batches(i).toIndexedSeq, 1),
          docs.schema)
        .write.mode("append").parquet(landingDir)

    // land file 1, then KILL the query
    writeFile(0)
    val q1 = p.start(spark, landingDir, docs.schema, emb, root)
    q1.processAllAvailable()
    q1.stop()
    // resume from the checkpoint; land the remaining files in order
    val q2 = p.start(spark, landingDir, docs.schema, emb, root)
    q2.processAllAvailable()
    writeFile(1)
    q2.processAllAvailable()
    writeFile(2)
    q2.processAllAvailable()
    q2.stop()

    val streamed = p.accepted(spark, root)
      .select("doc_id", "source").as[(Long, String)]
      .collect().toSeq.sorted
    val oneShot = Queries.all("q110_refresh_pipeline")(spark, dir)
      .select("doc_id", "source").as[(Long, String)]
      .collect().toSeq.sorted
    assert(streamed == oneShot)
    assert(streamed.nonEmpty && streamed.size < landing.length,
      "vacuous: the landing set must contain both accepted and dropped docs")

    // replay the whole landing set once more (queue redelivery): the
    // accepted store must not change — keyed upserts + self-excluding
    // views make re-landing a no-op
    batches.indices.foreach { i =>
      p.processBatch(spark.createDataFrame(
        spark.sparkContext.parallelize(batches(i).toIndexedSeq, 1),
        docs.schema), emb, root)
    }
    val replayed = p.accepted(spark, root)
      .select("doc_id", "source").as[(Long, String)]
      .collect().toSeq.sorted
    assert(replayed == streamed)
  }
}

/** The native `minhash_sig` kernel vs the composable explode + k-min
  * groupBy baseline — docs/KERNELS.md's bitwise-equality rule. */
class MinhashSigSpec extends SparkSpec {
  import spark.implicits._

  private def withSets = spark.read
    .parquet("/root/testdata/sf0.01/documents.parquet")
    .withColumn("_sh", ApproxDedup.wordNgrams(col("text"), 2))

  test("kernel signature == explode-form signature, every doc, every k-slot") {
    val k = 16
    val fast = ApproxDedup.minhashSignature(withSets, "doc_id", "_sh", k)
      .orderBy("doc_id").collect()
    val slow = ApproxDedup.minhashSignatureHof(withSets, "doc_id", "_sh", k)
      .orderBy("doc_id").collect()
    assert(fast.length == slow.length && fast.nonEmpty)
    fast.zip(slow).foreach { case (f, s) =>
      assert(f == s, s"signature mismatch for doc ${f.getLong(0)}")
    }
  }

  test("null/empty shingle sets drop the document in both forms") {
    val df = Seq(
      (1L, Seq("a b", "b c")),
      (2L, Seq.empty[String]),
      (3L, null.asInstanceOf[Seq[String]])
    ).toDF("doc_id", "_sh")
    val fast = ApproxDedup.minhashSignature(df, "doc_id", "_sh", 4)
      .select("doc_id").as[Long].collect().toSeq
    val slow = ApproxDedup.minhashSignatureHof(df, "doc_id", "_sh", 4)
      .select("doc_id").as[Long].collect().toSeq
    assert(fast == Seq(1L) && slow == Seq(1L))
  }

  test("minhash_sig runs inside whole-stage codegen") {
    // NB the shingle input must itself be codegen-able here: a
    // higher-order-function child (wordNgrams' transform) would force
    // the whole projection out of the span regardless of the kernel —
    // which is why production pipelines persist the shingle sets first
    // (minhashLshPairsScoped) and the kernel projects off the cache
    val df = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("_sh"))
    val sig = ApproxDedup.minhashSignature(df, "doc_id", "_sh", 8)
    val plan = sig.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[.*minhash_sig""".r.findFirstIn(plan).isDefined,
      plan.take(1500))
    assert(sig.count() > 0)
  }
}

/** Round-7 contracts for the persisted semantic ledger
  * ([[SemanticDedup.SemLedger]]) — the q109 sibling of
  * [[LshLedgerSpec]]: frozen centroids + unit-vector assignments
  * round-trip parquet, the refresh never re-reads the ingested
  * embeddings, and the append contract keeps re-landing idempotent. */
class SemLedgerSpec extends SparkSpec {
  import spark.implicits._

  private val embPath = "/root/testdata/sf0.01/embeddings.parquet"

  /** Every file-scan root path in the PHYSICAL plan, descending into
    * cached (InMemoryRelation) subtrees — a `.persist` must not hide a
    * scan of the forbidden table from this audit. */
  private def scanPaths(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def walk(p: SparkPlan): Seq[String] = p.collect {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
      case m: InMemoryTableScanExec => walk(m.relation.cachedPlan)
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
    }.flatten
    walk(df.queryExecution.executedPlan)
  }

  test("parquet-round-tripped ledger form == self-contained form") {
    val emb = spark.read.parquet(embPath)
    val old = emb.filter(col("vec_id") % 10 =!= 0)
    val batch = emb.filter(col("vec_id") % 10 === 0)

    val root = tmpDir("sem_ledger_rt")
    val built = SemanticDedup.semLedger(old, "vec_id", "embedding", 8, 2)
    built.centroids.write.parquet(s"$root/cent")
    built.assignments.write.parquet(s"$root/asn")
    val ledger = SemanticDedup.SemLedger(
      spark.read.parquet(s"$root/cent"), spark.read.parquet(s"$root/asn"))

    val viaLedger = SemanticDedup.incrementalSurvivorsFromLedger(
        ledger, batch, "vec_id", "embedding", threshold = 0.3)
      .select("vec_id").orderBy("vec_id").as[Long].collect().toSeq
    val selfContained = SemanticDedup.incrementalSurvivors(
        old, batch, "vec_id", "embedding", k = 8, iters = 2,
        threshold = 0.3)
      .select("vec_id").orderBy("vec_id").as[Long].collect().toSeq
    assert(viaLedger == selfContained)
    assert(viaLedger.size < batch.count(),
      "fixture has no semantic near-dups — the equality proved nothing")
  }

  test("refresh plan scans ledger + batch only — never the old embeddings") {
    val emb = spark.read.parquet(embPath)
    val root = tmpDir("sem_ledger_plan")
    emb.filter(col("vec_id") % 10 =!= 0)
      .write.parquet(s"$root/old_embeddings")
    emb.filter(col("vec_id") % 10 === 0)
      .write.parquet(s"$root/landing_batch")

    val built = SemanticDedup.semLedger(
      spark.read.parquet(s"$root/old_embeddings"),
      "vec_id", "embedding", 8, 2)
    built.centroids.write.parquet(s"$root/cent")
    built.assignments.write.parquet(s"$root/asn")

    val refreshSc = SemanticDedup.incrementalSurvivorsFromLedgerScoped(
      SemanticDedup.SemLedger(
        spark.read.parquet(s"$root/cent"), spark.read.parquet(s"$root/asn")),
      spark.read.parquet(s"$root/landing_batch"),
      "vec_id", "embedding", threshold = 0.3)
    // the SCOPED (lazy) form exposes the real plan — the eager form
    // returns a checkpoint scan that hides it
    val paths = scanPaths(refreshSc.df)
    refreshSc.release()
    assert(paths.nonEmpty)
    assert(!paths.exists(_.contains("old_embeddings")),
      s"refresh plan re-scans the ingested embeddings: $paths")
    assert(paths.exists(_.contains("cent")) &&
      paths.exists(_.contains("asn")) &&
      paths.exists(_.contains("landing_batch")), paths.toString)
  }

  test("updatedSemLedger freezes centroids, appends, re-landing drops all") {
    val emb = spark.read.parquet(embPath)
    val old = emb.filter(col("vec_id") % 10 =!= 0)
    val batch = emb.filter(col("vec_id") % 10 === 0)

    val ledger0 = SemanticDedup.semLedger(old, "vec_id", "embedding", 8, 2)
    val novelIds = SemanticDedup.incrementalSurvivorsFromLedger(
      ledger0, batch, "vec_id", "embedding", threshold = 0.3)
    val novel = batch.join(novelIds.select("vec_id"), Seq("vec_id"))
    val ledger1 = SemanticDedup.updatedSemLedger(
      ledger0, novel, "vec_id", "embedding")

    // centroids are the SAME object — frozen by construction
    assert(ledger1.centroids eq ledger0.centroids)
    assert(ledger1.assignments.count() ==
      ledger0.assignments.count() + novel.count())
    // every re-landed batch vector meets itself (cosine 1.0) or its
    // original dup in the updated ledger → zero survivors
    val rerun = SemanticDedup.incrementalSurvivorsFromLedger(
      ledger1, batch, "vec_id", "embedding", threshold = 0.3)
    assert(rerun.count() == 0L)
  }
}

/** Perceptual-hash image near-dup (q112/q113's operator in isolation):
  * recall within the Hamming banding radius and the dHash invariances
  * that make it a PERCEPTUAL fingerprint. */
class PerceptualHashSpec extends SparkSpec {
  import spark.implicits._

  /** The q113 image corpus: every document + a re-encoded copy of
    * every fifth one. */
  private def images(): DataFrame = {
    val docs = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
    docs.select(col("doc_id").as("img_id"), col("text").as("px"))
      .unionByName(docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000L).as("img_id"),
          Multimodal.fakeReencode(col("text")).as("px")))
  }

  test("banded mining == brute force within the guaranteed radius") {
    val sig = Multimodal.dhashSignatures(images(), "img_id", col("px"))
      .persist()
    val banded = ApproxDedup.simhashPairs(sig, "img_id", "dhash",
        bits = 60, bands = 4, maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute force is exact ground truth; maxHamming=3 < bands=4 means
    // the pigeonhole guarantees banding misses NOTHING inside radius 3
    val a = sig.select(col("img_id").as("id_a"), col("dhash").as("ha"))
    val b = sig.select(col("img_id").as("id_b"), col("dhash").as("hb"))
    val brute = a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    sig.unpersist()
    assert(banded == brute)
    // non-vacuous: the re-encoded copies actually collide
    assert(brute.count { case (x, y) => y - x == 1000000L } > 50,
      s"fixture produced too few re-encode collisions: $brute")
  }

  test("dHash absorbs pixel edits but not crops/appends") {
    val base = ("a1b2" * 100).take(331)
    val df = Seq(
      1L -> base,
      2L -> ("zz" + base.drop(2)), // re-encode-class: same length
      3L -> (base + " tail12345"), // append shifts every cell boundary
      4L -> base.drop(10) // crop likewise
    ).toDF("img_id", "px")
    val h = Multimodal.dhashSignatures(df, "img_id", col("px"))
      .as[(Long, Long)].collect().toMap
    def hd(x: Long, y: Long): Int = java.lang.Long.bitCount(x ^ y)
    assert(hd(h(1L), h(2L)) <= 3, s"pixel edit moved ${hd(h(1L), h(2L))} bits")
    assert(hd(h(1L), h(3L)) > 3 && hd(h(1L), h(4L)) > 3,
      "append/crop should read as different images")
  }

  test("short scanlines (len < 66 cells) hash deterministically") {
    val df = Seq(5L -> "short but real content here!", 6L -> "x")
      .toDF("img_id", "px")
    val once = Multimodal.dhashSignatures(df, "img_id", col("px"))
      .as[(Long, Long)].collect().toMap
    assert(once.size == 2 && once.values.forall(_ >= 0L))
  }
}

/** Round-7 contracts for the persisted MinHash-LSH ledger
  * ([[ApproxDedup.LshLedger]]): the incremental near-dup refresh must
  * read persisted state — never re-derive the ingested corpus's
  * signatures from raw text — and the ledger's append contract must
  * keep refreshes equivalent to a from-scratch bootstrap. */
class LshLedgerSpec extends SparkSpec {
  import spark.implicits._

  private val K = 16; private val B = 4; private val R = 4

  /** Synthetic corpus with guaranteed cross-split and in-batch
    * near-dups: ids ending in 0 are the landing batch; several batch
    * docs share (near-)identical text with old docs or each other. */
  private def corpus(): DataFrame = {
    val base = (0L until 40L).map { i =>
      (i, s"unique text alpha${i * 7} beta${i * 13} gamma${i * 29} delta${i * 31} epsilon${i * 37} zeta${i * 41} eta${i * 43} theta${i * 47}")
    }
    // batch doc 10 duplicates old doc 3; batch 20 near-dups old 7;
    // batch 30 duplicates batch 0 (in-batch, smaller-id winner)
    val dups = Map(
      10L -> base(3)._2,
      20L -> (base(7)._2 + " tail"),
      30L -> base(0)._2)
    base.map { case (i, t) => (i, dups.getOrElse(i, t)) }
      .toDF("doc_id", "text")
  }

  private def withSets(df: DataFrame): DataFrame =
    df.withColumn("_sh", ApproxDedup.wordNgrams(col("text"), 2))

  /** Root paths of every file scan in the optimized plan. */
  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten

  test("parquet-round-tripped ledger form == self-contained form") {
    val all = withSets(corpus())
    val old = all.filter(col("doc_id") % 10 =!= 0)
    val batch = all.filter(col("doc_id") % 10 === 0)

    val root = tmpDir("lsh_ledger_rt")
    val built = ApproxDedup.lshLedger(old, "doc_id", "_sh", K, B, R)
    built.buckets.write.parquet(s"$root/buckets")
    built.sets.write.parquet(s"$root/sets")
    val ledger = ApproxDedup.LshLedger(
      spark.read.parquet(s"$root/buckets"),
      spark.read.parquet(s"$root/sets"))

    val viaLedger = ApproxDedup.incrementalLshNovelFromLedger(
        ledger, batch, "doc_id", "_sh", K, B, R, threshold = 0.5)
      .select("doc_id").orderBy("doc_id").as[Long].collect().toSeq
    val selfContained = ApproxDedup.incrementalLshNovel(
        old, batch, "doc_id", "_sh", K, B, R, threshold = 0.5)
      .select("doc_id").orderBy("doc_id").as[Long].collect().toSeq

    assert(viaLedger == selfContained)
    // non-vacuous: the fixture must actually drop batch docs
    assert(viaLedger.size < batch.count(),
      "fixture has no near-dups — the equality above proved nothing")
    assert(!viaLedger.contains(10L) && !viaLedger.contains(30L))
  }

  test("refresh plan scans ledger + batch only — never the old corpus") {
    val all = corpus()
    val root = tmpDir("lsh_ledger_plan")
    all.filter(col("doc_id") % 10 =!= 0)
      .write.parquet(s"$root/old_corpus")
    all.filter(col("doc_id") % 10 === 0)
      .write.parquet(s"$root/landing_batch")

    val built = ApproxDedup.lshLedger(
      withSets(spark.read.parquet(s"$root/old_corpus")),
      "doc_id", "_sh", K, B, R)
    built.buckets.write.parquet(s"$root/buckets")
    built.sets.write.parquet(s"$root/sets")

    val refresh = ApproxDedup.incrementalLshNovelFromLedger(
      ApproxDedup.LshLedger(
        spark.read.parquet(s"$root/buckets"),
        spark.read.parquet(s"$root/sets")),
      withSets(spark.read.parquet(s"$root/landing_batch")),
      "doc_id", "_sh", K, B, R, threshold = 0.5)

    val paths = scanPaths(refresh)
    assert(paths.nonEmpty)
    // the property that makes "incremental" real at 100 TB: the old
    // corpus's raw text is never re-read, so no scan points at it
    assert(!paths.exists(_.contains("old_corpus")),
      s"refresh plan re-scans the ingested corpus: $paths")
    assert(paths.exists(_.contains("buckets")) &&
      paths.exists(_.contains("sets")) &&
      paths.exists(_.contains("landing_batch")), paths.toString)
  }

  test("updatedLshLedger append == from-scratch bootstrap over survivors") {
    val all = withSets(corpus())
    val old = all.filter(col("doc_id") % 10 =!= 0)
    val batch = all.filter(col("doc_id") % 10 === 0)

    val ledger0 = ApproxDedup.lshLedger(old, "doc_id", "_sh", K, B, R)
    val novel = ApproxDedup.incrementalLshNovelFromLedger(
      ledger0, batch, "doc_id", "_sh", K, B, R, threshold = 0.5)
    val ledger1 = ApproxDedup.updatedLshLedger(
      ledger0, novel, "doc_id", "_sh", K, B, R)

    val survivors = old.unionByName(novel.select(old.columns.map(col): _*))
    val bootstrap = ApproxDedup.lshLedger(survivors, "doc_id", "_sh", K, B, R)

    def key(df: DataFrame): Seq[String] =
      df.select(concat_ws("|", df.columns.map(c => col(c).cast("string")): _*))
        .as[String].collect().toSeq.sorted
    assert(key(ledger1.buckets) == key(bootstrap.buckets))
    assert(key(ledger1.sets.select("doc_id")) ==
      key(bootstrap.sets.select("doc_id")))

    // a re-landing of the same batch against the updated ledger drops
    // everything — the idempotency that makes at-least-once delivery
    // safe (same contract as Dedup.updatedLedger, Round5Spec)
    val rerun = ApproxDedup.incrementalLshNovelFromLedger(
      ledger1, batch, "doc_id", "_sh", K, B, R, threshold = 0.5)
    assert(rerun.count() == 0L)
  }
}
