package graft

import org.apache.spark.sql.functions._

/** Throwaway drive-the-library probe (test scope — NOT library surface;
  * run with `sbt -batch "Test/runMain graft.VerifyProbe"`). Exercises
  * whatever changed most recently through a real session over the
  * driver testdata. */
object VerifyProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    import spark.implicits._

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sf01 = "/root/testdata/sf0.1"
    val emb = spark.read.parquet(s"$sf01/embeddings.parquet")
    val docs = spark.read.parquet(s"$sf01/documents.parquet")

    // IVF-PQ: build once, serve many — candidates confined to probed
    // cells, scored from codes; then the two-stage exact re-rank
    val idx = time("ivfpq-build-sf0.1") {
      val i = ops.Similarity.ivfPqIndexBuild(emb, "vec_id", "embedding",
        k = 8, iters = 2, m = 4, dsub = 16, ksub = 16, pqIters = 1)
      i.codes.persist().count()
      i
    }
    val served = time("ivfpq-serve-50q") {
      ops.Similarity.ivfPqTopKFromIndex(emb.filter(col("vec_id") < 50),
        idx, "vec_id", "embedding", m = 4, dsub = 16, k = 10, nprobe = 2)
        .collect()
    }
    assert(served.length == 50 * 10, "every query must fill k with nprobe=2")
    val reranked = time("ivfpq-rerank-50q") {
      ops.Similarity.ivfPqTopKRerank(emb.filter(col("vec_id") < 50),
        idx, emb, "vec_id", "vec_id", "embedding",
        m = 4, dsub = 16, k = 10, nprobe = 2, rerank = 30)
        .collect()
    }
    assert(reranked.length == 50 * 10)

    // dup spans: full mine + ledger probe over the sf0.1 corpus
    val spans = time("dup-spans-sf0.1") {
      ops.Dedup.dupSpans(docs, "doc_id", col("text"), n = 8).collect()
    }
    assert(spans.nonEmpty, "sf0.1 corpus contains duplicated 8-grams")
    val ledger = ops.Dedup.dupSpanLedger(
      docs.filter(col("doc_id") % 10 =!= 0), "doc_id", col("text"), 8)
    val probed = time("dup-span-probe-sf0.1") {
      ops.Dedup.dupSpansFromLedger(ledger,
        docs.filter(col("doc_id") % 10 === 0),
        "doc_id", col("text"), 8).collect()
    }
    println(s"spans=${spans.length} batchSpans=${probed.length}")

    // linear quality scoring over the same corpus
    val model = ops.TextAnalysis.QualityModel.toDF("term", "w_fp")
    val scored = time("linear-quality-sf0.1") {
      ops.TextAnalysis.linearScore(docs, "doc_id", col("text"),
        model, biasFp = -30000L)
        .groupBy(col("label")).count().collect()
    }
    println(scored.map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(" "))
    assert(scored.map(_.getLong(1)).sum == docs.count(),
      "every doc must be labeled")

    println("PROBE_OK")
    spark.stop()
  }
}
