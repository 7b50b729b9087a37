package graft

import org.apache.spark.sql.functions._

/** Throwaway drive-the-library probe (test scope — NOT library surface;
  * run with `sbt -batch "Test/runMain graft.VerifyProbe"`). Exercises
  * whatever changed most recently through a real session over the
  * driver testdata. */
object VerifyProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    import graft.ops._

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sf01 = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$sf01/documents.parquet")
    val emb = spark.read.parquet(s"$sf01/embeddings.parquet")

    // ---- LMS probe: train on quantized embeddings, serve, calibrate
    val feats = LinearTrainer.embeddingFeatures(emb, "vec_id",
      col("embedding"))
    val labels = emb.select(col("vec_id"),
      LinearTrainer.labelU(col("label") < 5).as("y_u"))
    val res = time("lmsTrain sf0.1 8 steps") {
      LinearTrainer.lmsTrain(feats, labels, "vec_id", steps = 8,
        lrDenom = 1048576L)
    }
    println(s"PROBE n=${res.nDocs} metrics=" +
      res.metrics.map(m => s"${m.step}:${m.nCorrect}").mkString(" "))
    require(res.metrics.last.nCorrect > res.metrics.head.nCorrect,
      "probe must beat the zero model")
    val served = time("serve") {
      LinearTrainer.serve(emb, feats, "vec_id", res.weights)
        .join(labels, Seq("vec_id"))
    }
    val cal = time("calibrate 5 thresholds") {
      LinearTrainer.calibrate(served, "vec_id",
        Seq(-400000L, -200000L, 0L, 200000L, 400000L))
        .orderBy("thr_u").collect()
    }
    println("CALIBRATE " + cal.map(r =>
      s"${r.getLong(0)}:${r.getLong(1)}").mkString(" "))

    // ---- hybrid RRF over real BM25 + dense lists
    val queries = docs.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(split(col("text"), "\\s+"), 1, 4)).as("qtext"))
    val lex = time("bm25 top-20") {
      Retrieval.bm25TopK(docs, "doc_id", col("text"),
          queries, "query_id", col("qtext"), k = 20)
        .select(col("query_id"), col("doc_id"), col("rank"))
        .localCheckpoint()
    }
    val dense = time("cosine top-20") {
      Similarity.bruteForceTopK(emb.filter(col("vec_id") % 100 === 0),
          emb, "vec_id", "vec_id", "embedding", k = 20)
        .select(col("query_id"), col("corpus_id").as("doc_id"), col("rank"))
        .localCheckpoint()
    }
    val fused = time("rrfFuse") {
      Retrieval.rrfFuse(Seq(lex, dense), "query_id", "doc_id", "rank",
        k = 10).collect()
    }
    require(fused.nonEmpty && fused.forall(_.getLong(4) <= 10),
      "fused ranks must be bounded by k")
    println(s"RRF fused rows=${fused.length} " +
      s"bothLists=${fused.count(_.getLong(3) == 2L)}")

    // ---- weighted sample: πps by n_chars
    val ws = time("weightedSample k=10") {
      Curation.weightedSample(docs.select(col("doc_id"), col("source"),
          col("n_chars")), "source", "doc_id", col("n_chars"), k = 10)
        .collect()
    }
    println(s"WSAMPLE rows=${ws.length}")

    // ---- dup-graph maintenance: ledger CC + incremental pair feed
    val withSh = docs.withColumn("_sh", ApproxDedup.wordNgrams(col("text"), 2))
    val old = withSh.filter(col("doc_id") % 10 =!= 0)
    val batch = withSh.filter(col("doc_id") % 10 === 0)
    val ledgerCc = time("old-pairs CC (ledger)") {
      ConnectedComponents(
        ApproxDedup.minhashLshPairs(old, "doc_id", "_sh", 16, 4, 4, 0.5),
        "id_a", "id_b")
    }
    val pairs = time("incremental pair feed") {
      ApproxDedup.incrementalLshPairsFromLedger(
        ApproxDedup.lshLedger(old, "doc_id", "_sh", 16, 4, 4), batch,
        "doc_id", "_sh", 16, 4, 4, 0.5).localCheckpoint()
    }
    val refreshed = time("CC refresh") {
      ConnectedComponents.refresh(ledgerCc, "id", "comp",
        pairs, "id_new", "id_other")
    }
    println(s"DUPGRAPH ledger=${ledgerCc.count()} pairs=${pairs.count()} " +
      s"refreshed=${refreshed.count()}")
    val lookup = time("neardup point lookup") {
      ApproxDedup.lshNeighborsFromLedger(
        ApproxDedup.lshLedger(old, "doc_id", "_sh", 16, 4, 4),
        withSh.filter(col("doc_id") % 5 === 0), "doc_id", "_sh",
        16, 4, 4, 0.5).count()
    }
    println(s"LOOKUP neighbors=$lookup")

    // ---- streaming mini-batch trainer: 3 landing files at sf0.1
    val tsRoot = java.nio.file.Files.createTempDirectory("probe_ts").toString
    val ts = graft.streaming.TrainStream("vec_id",
      b => LinearTrainer.embeddingFeatures(b, "vec_id", col("embedding")),
      LinearTrainer.labelU(col("label") < 5), 1048576L)
    val landing = s"$tsRoot/landing"
    def land(bt: Int): Unit =
      emb.filter(col("vec_id") % 3 === bt).coalesce(1)
        .write.mode("append").parquet(landing)
    time("TrainStream 3 batches") {
      land(0)
      val q = ts.start(spark, landing, emb.schema, tsRoot)
      try {
        q.processAllAvailable()
        land(1); q.processAllAvailable()
        land(2); q.processAllAvailable()
      } finally q.stop()
    }
    val wRows = ts.weights(spark, tsRoot).count()
    println(s"TRAINSTREAM weights=$wRows")
    require(wRows == 64, "streamed model must carry all 64 coordinates")

    spark.stop()
  }
}
