package graft

import org.apache.spark.sql.functions._

/** Throwaway drive-the-library probe (test scope — NOT library surface;
  * run with `sbt -batch "Test/runMain graft.VerifyProbe"`). Exercises
  * whatever changed most recently through a real session over the
  * driver testdata. */
object VerifyProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")

    // 1) Gopher repetition signals over the real corpus
    val rep = ops.CorpusSignals.repetitionSignals(docs, "doc_id", col("text"), 3)
    val repN = rep.count()
    val dupDocs = rep.filter(col("dup_word_frac") > 0).count()
    println(s"repetition rows=$repN dup_word>0=$dupDocs")
    assert(repN == docs.count() && dupDocs > 0)

    // 2) C4 global line dedup: reassembled corpus never grows
    val lines = ops.CorpusSignals.syntheticLines(docs, "doc_id", col("text"), 10)
    val ld = ops.CorpusSignals.lineDedup(lines, "doc_id", "line_no", "line")
    val shrunk = ld.filter(col("n_kept") < col("n_lines")).count()
    println(s"line-dedup docs=${ld.count()} shrunk=$shrunk")
    assert(ld.filter(col("n_kept") > col("n_lines")).isEmpty)

    // 3) decontamination round trip: flagged + kept partitions the corpus
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val train = docs.filter(col("doc_id") % 50 =!= 0)
    val flagged = ops.CorpusSignals.contamination(train, bench, "doc_id", col("text"), 4)
    val kept = ops.CorpusSignals.decontaminate(train, bench, "doc_id", col("text"), 4)
    println(s"train=${train.count()} flagged=${flagged.count()} kept=${kept.count()}")
    assert(flagged.count() + kept.count() == train.count())

    // 4) TF-IDF top terms: exactly k or fewer per document
    val tt = ops.CorpusSignals.tfidfTopTerms(docs, "doc_id", col("text"), 5)
    val over = tt.groupBy("doc_id").count().filter(col("count") > 5).count()
    println(s"tfidf rows=${tt.count()} over-k=$over")
    assert(over == 0)

    // 5) SemDeDup end to end over the real embeddings table
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val surv = ops.SemanticDedup.survivors(emb, "vec_id", "embedding",
      k = 4, iters = 2, threshold = 0.3)
    println(s"embeddings=${emb.count()} semantic survivors=${surv.count()}")
    assert(surv.count() > 0 && surv.count() <= emb.count())

    // 6) ranged part explosion: per-part digests recombine to the doc count
    val parts = functions.MultipartEtag.explodeParts(
      docs.select(col("doc_id"), col("text").cast("binary").as("c")),
      "doc_id", "c", 256)
    println(s"part rows=${parts.count()} docs=${parts.select("path").distinct().count()}")
    assert(parts.select("path").distinct().count() == docs.count())

    println("PROBE_OK")
    spark.stop()
  }
}
