package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.ops.{ApproxDedup, Layout}

/** The distributed compaction executor's SCALE contract: the number of
  * Spark jobs [[graft.ops.Layout.compactFiles]] runs is a small
  * constant, INDEPENDENT of the bin count — all multi-file bins merge
  * in one `partitionBy(bin)` write and all singleton copies run in one
  * executor-side job. The round-8 implementation ran one job per
  * multi-file bin from a driver loop (plus driver-thread NIO copies);
  * this spec would have failed it. */
class CompactionOneJobSpec extends SparkSpec {
  import spark.implicits._

  test("job count is constant in the bin count; output complete; _SUCCESS written") {
    val root = tmpDir("compact_onejob")
    val src = s"$root/src"
    // 40 same-sized small files; target ≈ 3 files/bin → ~13 multi-file
    // bins, plus two oversized compact files to exercise the copy path
    val small = (1L to 8000L).map(i => (i, s"row$i")).toDF("id", "v")
    small.repartition(40, col("id")).write.parquet(src)
    val big = (100000L to 108000L).map(i => (i, s"R$i" * 40)).toDF("id", "v")
    big.coalesce(1).write.mode("append").parquet(src)
    val sizes = {
      val fs = new org.apache.hadoop.fs.Path(src)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(src))
        .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen)
    }
    val target = sizes.sorted.take(40).sum / 13

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    org.apache.spark.GraftTestBus.drain(spark.sparkContext)
    spark.sparkContext.addSparkListener(listener)
    val out = s"$root/out"
    val summary =
      try {
        val s = Layout.compactFiles(spark, src, out, target).collect()
        org.apache.spark.GraftTestBus.drain(spark.sparkContext)
        s
      } finally spark.sparkContext.removeSparkListener(listener)

    val rewrites = summary.count(_.getString(3) == "rewrite")
    val copies = summary.count(_.getString(3) == "copy")
    assert(rewrites >= 8, s"fixture must produce many multi-file bins: $rewrites")
    assert(copies >= 1, s"fixture must exercise the copy path: $copies")
    // constant job budget: listing + copy job + merge write (AQE may
    // stage the shuffle) + small metadata jobs — NOT O(bins). The old
    // driver loop would have run >= rewrites jobs here.
    assert(jobs.get() < rewrites,
      s"job count must not scale with bin count: ${jobs.get()} jobs for " +
        s"$rewrites rewrite bins")
    assert(jobs.get() <= 8,
      s"expected a constant handful of jobs, got ${jobs.get()}")

    // completeness: every row survives, _SUCCESS marks the output
    val pre = small.unionByName(big).as[(Long, String)].collect().toSeq.sorted
    val post = spark.read.parquet(out).as[(Long, String)]
      .collect().toSeq.sorted
    assert(post == pre)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(out, "_SUCCESS")),
      "compacted output must carry the store's _SUCCESS convention")
  }
}

/** Two maintainers, one root: a [[graft.streaming.RefreshStream]]
  * (corpus ledgers + accepted store) and an
  * [[graft.streaming.IndexStream]] (ANN postings) land INTERLEAVED
  * batches concurrently against stores under the same root, both are
  * killed mid-stream and resumed — and each family's state must equal
  * its one-shot form row-for-row. The prior specs prove each stream
  * alone; this one proves they don't interfere: disjoint store
  * directories, stream-specific checkpoints, and per-bucket
  * swap-by-rename isolation between the two writers. */
class ConcurrentStreamsSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import graft.streaming.{IndexStream, RefreshStream}

  private val dir = "/root/testdata/sf0.01"

  test("interleaved kill/resume of both streams == each one-shot form") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val oldDocs = docs.filter(col("doc_id") % 10 =!= 0)
    val oldEmb = emb.filter(col("vec_id") % 10 =!= 0)
    val landDocs = docs.filter(col("doc_id") % 10 === 0)
      .orderBy("doc_id").collect()
    val landVecs = emb.filter(col("vec_id") % 10 === 0)
      .orderBy("vec_id").collect()
    val docBatches = landDocs.grouped((landDocs.length + 1) / 2).toSeq
    val vecBatches = landVecs.grouped((landVecs.length + 1) / 2).toSeq
    assert(docBatches.size == 2 && vecBatches.size == 2)

    val root = tmpDir("concurrent_streams")
    val (docLand, vecLand) = (s"$root/landing_docs", s"$root/landing_vecs")
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

    def writeDocs(i: Int): Unit = spark.createDataFrame(
        spark.sparkContext.parallelize(docBatches(i).toIndexedSeq, 1),
        docs.schema)
      .write.mode("append").parquet(docLand)
    def writeVecs(i: Int): Unit = spark.createDataFrame(
        spark.sparkContext.parallelize(vecBatches(i).toIndexedSeq, 1),
        emb.schema)
      .write.mode("append").parquet(vecLand)

    // file 1 of each lands; both queries run CONCURRENTLY, then both
    // are killed mid-stream
    writeDocs(0); writeVecs(0)
    val r1 = refresh.start(spark, docLand, docs.schema, emb, root)
    val i1 = index.start(spark, vecLand, emb.schema, root)
    r1.processAllAvailable(); i1.processAllAvailable()
    r1.stop(); i1.stop()
    // resume both from their (stream-specific) checkpoints, land the
    // remaining file of each, drain both
    val r2 = refresh.start(spark, docLand, docs.schema, emb, root)
    val i2 = index.start(spark, vecLand, emb.schema, root)
    writeDocs(1); writeVecs(1)
    r2.processAllAvailable(); i2.processAllAvailable()
    r2.stop(); i2.stop()

    // refresh family == one-shot q110 composition
    val accepted = refresh.accepted(spark, root)
      .select("doc_id", "source").as[(Long, String)].collect().toSeq.sorted
    val oneShotDocs = Queries.all("q110_refresh_pipeline")(spark, dir)
      .select("doc_id", "source").as[(Long, String)].collect().toSeq.sorted
    assert(accepted == oneShotDocs)
    assert(accepted.nonEmpty && accepted.size < landDocs.length)

    // index family == one-shot frozen-centroid upsert of all vectors
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
    assert(postings.size == emb.count())
  }
}

/** The persisted hot-block histogram ([[graft.ops.ApproxDedup
  * .blockHistogram]]) — ledger state for the pair-join guard: the
  * fail-fast contract survives the move from a per-run corpus scan to
  * a metadata-sized table read, including a block that goes hot only
  * when the ledger counts and a landing batch's delta combine. */
class BlockHistogramSpec extends SparkSpec {
  import spark.implicits._

  private def docs(block: String, ids: Range) =
    ids.map(i => (i.toLong, block, Seq(s"w$i", "shared"))).toDF("id", "b", "s")

  test("hot block raises through the persisted-histogram guard") {
    val hot = docs("hot", 0 until 1200).unionByName(docs("cold", 5000 until 5010))
    val hist = ApproxDedup.blockHistogram(hot, "b")
    val e = intercept[IllegalArgumentException] {
      ApproxDedup.jaccardPairs(hot, "id", "b", "s", 0.1,
        maxBlockRows = 1000, histogram = Some(hist)).count()
    }
    assert(e.getMessage.contains("hot block"), e.getMessage)
    assert(e.getMessage.contains("'hot'=1200"), e.getMessage)
  }

  test("ledger + batch delta: a block the BATCH pushes over the limit raises") {
    val ledgerDocs = docs("warm", 0 until 600)
    val batch = docs("warm", 10000 until 10600)
    val ledgerHist = ApproxDedup.blockHistogram(ledgerDocs, "b")
    // neither side alone exceeds 1000; the merged view must
    val merged = ApproxDedup.updatedBlockHistogram(ledgerHist, batch, "b")
    val all = ledgerDocs.unionByName(batch)
    val e = intercept[IllegalArgumentException] {
      ApproxDedup.jaccardPairs(all, "id", "b", "s", 0.1,
        maxBlockRows = 1000, histogram = Some(merged)).count()
    }
    assert(e.getMessage.contains("'warm'=1200"), e.getMessage)
    // and each side alone passes the same guard
    ApproxDedup.requireBoundedBlocksHist(ledgerHist, 1000, "spec")
    ApproxDedup.requireBoundedBlocksHist(
      ApproxDedup.blockHistogram(batch, "b"), 1000, "spec")
  }

  test("bounded blocks pass and pair results are unchanged by the guard path") {
    val ok = docs("a", 0 until 40).unionByName(docs("b", 100 until 140))
    val hist = ApproxDedup.blockHistogram(ok, "b")
    val viaHist = ApproxDedup.jaccardPairs(ok, "id", "b", "s", 0.1,
      maxBlockRows = 1000, histogram = Some(hist))
      .orderBy("id_a", "id_b").collect().toSeq
    val viaScan = ApproxDedup.jaccardPairs(ok, "id", "b", "s", 0.1,
      maxBlockRows = 1000)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(viaHist == viaScan && viaHist.nonEmpty)
  }
}

/** [[graft.ops.Similarity.driftReport]] — the retrain decision over a
  * frozen-centroid IVF index: an in-distribution landing batch keeps
  * the index, a genuinely drifted batch (a direction the training
  * corpus never contained) flips the verdict to `retrain`. */
class DriftGateSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Similarity

  // deterministic synthetic embeddings: near-axis clusters + jitter
  private def vec(id: Long, axis: Int, dims: Int = 8): Seq[Double] =
    Seq.tabulate(dims) { d =>
      (if (d == axis) 10.0 else 0.0) + ((id * 31 + d * 17) % 7).toDouble / 10.0
    }

  test("in-distribution batch keeps; drifted batch flips to retrain") {
    val corpus = (0L until 200L).map(i => (i, vec(i, (i % 4).toInt)))
      .toDF("id", "v")
    val index = Similarity.ivfIndexBuild(corpus, "id", "v", k = 4, iters = 2)

    def report(batch: org.apache.spark.sql.DataFrame) =
      Similarity.driftReport(index, batch, "id", "v",
          k = 3, nprobe = 1, sampleMod = 2,
          maxShiftPpm = 150000L, minRecallPpm = 200000L)
        .collect().head

    // same generator, new ids: the batch lands across all 4 clusters
    val inDist = (1000L until 1100L).map(i => (i, vec(i, (i % 4).toInt)))
      .toDF("id", "v")
    val keep = report(inDist)
    assert(keep.getAs[String]("verdict") == "keep", keep.toString)

    // a direction the corpus never contained: the whole batch piles
    // onto one nearest centroid -> TV distance jumps
    val drifted = (2000L until 2100L).map(i => (i, vec(i, 7)))
      .toDF("id", "v")
    val retrain = report(drifted)
    assert(retrain.getAs[String]("verdict") == "retrain", retrain.toString)
    assert(retrain.getAs[Long]("shift_ppm") > keep.getAs[Long]("shift_ppm"))
  }
}
