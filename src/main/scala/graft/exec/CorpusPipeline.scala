package graft.exec

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{ApproxDedup, TextAnalysis}

/** End-to-end training-corpus cleaning pipeline: the composition a
  * 100 TB documents table actually runs —
  *
  *   quality filter → exact dedup (fingerprint) → near-dup dedup
  *   (MinHash-LSH, keep the lowest doc_id of each dup cluster)
  *
  * Every stage is one of the library's declarative operators, so the
  * whole pipeline is a single lazy DataFrame program: one scan of the
  * corpus feeds the quality filter; the dedups shuffle once each on
  * their keys; nothing collects to the driver.
  */
object CorpusPipeline {

  case class Summary(input: Long, afterQuality: Long, afterExact: Long,
                     afterNearDup: Long)

  /** Quality gate (the filter q19's stats feed): enough tokens, not
    * punctuation soup, and at least minimal stopword signal. */
  def qualityFilter(docs: DataFrame, minTokens: Int = 8,
                    maxPunctRatio: Double = 0.1): DataFrame =
    TextAnalysis.qualityStats(docs, col("text"))
      .filter(col("n_tokens") >= minTokens &&
        col("punct_ratio") <= maxPunctRatio)
      .drop("n_chars_q", "n_tokens", "avg_token_len", "punct_ratio",
        "stopword_ratio")

  /** Full pipeline; returns the cleaned corpus plus stage counts. */
  def clean(spark: SparkSession, docs: DataFrame,
            minTokens: Int = 8, maxPunctRatio: Double = 0.1,
            nearDupThreshold: Double = 0.6): (DataFrame, Summary) = {
    val input = docs.count()

    val quality = qualityFilter(docs, minTokens, maxPunctRatio).cache()
    val nQuality = quality.count()

    // exact dedup on the normalized fingerprint: keep min doc_id
    val exact = quality
      .withColumn("fingerprint", TextAnalysis.fingerprint(col("text")))
      .withColumn("_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("fingerprint"))
          .orderBy(col("doc_id"))))
      .filter(col("_rank") === 1)
      .drop("_rank", "fingerprint")
      .cache()
    val nExact = exact.count()

    // near-dup dedup: LSH-verified pairs collapse into duplicate
    // CLUSTERS via connected components, so exactly ONE document
    // survives per cluster (the per-pair id_b drop could keep several —
    // e.g. pairs (2,3),(1,3) kept both 1 and 2 since 2 is never an
    // id_b, even though all three sit in one duplicate cluster)
    val withSets = exact.withColumn("_sh", ApproxDedup.wordNgrams(col("text"), 2))
    val pairs = ApproxDedup.minhashLshPairs(withSets, "doc_id", "_sh",
      k = 16, bands = 4, rowsPerBand = 4, threshold = nearDupThreshold)
    val cleaned = graft.ops.ConnectedComponents
      .survivors(exact, "doc_id", pairs, "id_a", "id_b")
    val nFinal = cleaned.count()

    quality.unpersist()
    (cleaned, Summary(input, nQuality, nExact, nFinal))
  }
}
