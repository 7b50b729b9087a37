package graft.exec

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{ApproxDedup, CorpusSignals, TextAnalysis}

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

  /** Gopher repetition gate: drop documents whose duplicate-word
    * fraction exceeds the threshold (narrow map, no shuffle). 1.0
    * disables the gate. */
  def repetitionGate(docs: DataFrame, maxDupWordFrac: Double): DataFrame =
    if (maxDupWordFrac >= 1.0) docs
    else docs.filter(CorpusSignals.dupWordFrac(col("text")) <= maxDupWordFrac)

  /** Exact dedup on the normalized fingerprint: keep the min-id row of
    * each fingerprint group (whole row, not just the key — the window
    * shuffles once on the fingerprint). */
  def exactDedup(docs: DataFrame, id: String = "doc_id"): DataFrame =
    docs
      .withColumn("fingerprint", TextAnalysis.fingerprint(col("text")))
      .withColumn("_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("fingerprint"))
          .orderBy(col(id))))
      .filter(col("_rank") === 1)
      .drop("_rank", "fingerprint")

  /** Near-dup dedup: LSH-verified pairs collapse into duplicate
    * CLUSTERS via connected components, so exactly ONE document
    * survives per cluster (the per-pair id_b drop could keep several —
    * e.g. pairs (2,3),(1,3) kept both 1 and 2 since 2 is never an
    * id_b, even though all three sit in one duplicate cluster). */
  /** [[cleanPlan]]'s pre-near-dup stages (quality → repetition → exact
    * dedup), exposed so diagnostics (ScalingProbe, VerifyProbe) measure
    * the SAME pipeline the shipped q64 runs — a probe-local copy would
    * silently drift when these parameters change. */
  def filteredCorpus(docs: DataFrame, minTokens: Int = 8,
                     maxPunctRatio: Double = 0.1,
                     maxDupWordFrac: Double = 1.0): DataFrame =
    exactDedup(repetitionGate(qualityFilter(docs, minTokens, maxPunctRatio),
      maxDupWordFrac))

  /** The MinHash-LSH near-dup pair graph [[nearDupCollapse]] collapses
    * (word-bigram shingles, k=16, 4×4 bands) — the other probe-visible
    * half of the q64 pipeline. Caller owns the [[ApproxDedup.Scoped]]
    * release. */
  def nearDupPairGraph(docs: DataFrame, threshold: Double,
                       id: String = "doc_id"): ApproxDedup.Scoped = {
    val withSets = docs.withColumn("_sh", ApproxDedup.wordNgrams(col("text"), 2))
    ApproxDedup.minhashLshPairsScoped(withSets, id, "_sh",
      k = 16, bands = 4, rowsPerBand = 4, threshold = threshold)
  }

  def nearDupCollapse(docs: DataFrame, threshold: Double,
                      id: String = "doc_id"): DataFrame = {
    val scoped = nearDupPairGraph(docs, threshold, id)
    // survivors() runs the CC iterations eagerly and localCheckpoints the
    // loser set, so the pair plan is fully consumed here — release the
    // minhash set/signature caches before returning (nothing orphans).
    val out = graft.ops.ConnectedComponents.survivors(docs, id, scoped.df, "id_a", "id_b")
    scoped.release()
    out
  }

  /** The full clean as ONE lazy DataFrame program (no driver actions):
    * quality filter → repetition gate → exact dedup → near-dup
    * collapse. This is what a 100 TB run submits; [[clean]] wraps it
    * with per-stage counts for reporting. */
  def cleanPlan(docs: DataFrame, minTokens: Int = 8,
                maxPunctRatio: Double = 0.1, maxDupWordFrac: Double = 1.0,
                nearDupThreshold: Double = 0.6): DataFrame =
    nearDupCollapse(
      filteredCorpus(docs, minTokens, maxPunctRatio, maxDupWordFrac),
      nearDupThreshold)

  /** [[cleanPlan]] with the filtered corpus persisted across its TWO
    * consumers — the shingle/pair-mining branch and the final
    * survivor anti-join both sit on the filter→gate→window subtree,
    * and without a shared materialization the whole subtree evaluates
    * twice per run (the expensive half is the per-document expression
    * work: tokenization, punctuation scrub, dup-word fraction). The
    * caller owns the release ([[ApproxDedup.Scoped]]), the same
    * lifetime contract as the LSH intermediates. */
  def cleanPlanScoped(docs: DataFrame, minTokens: Int = 8,
                      maxPunctRatio: Double = 0.1,
                      maxDupWordFrac: Double = 1.0,
                      nearDupThreshold: Double = 0.6): ApproxDedup.Scoped = {
    val filtered =
      filteredCorpus(docs, minTokens, maxPunctRatio, maxDupWordFrac)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = nearDupCollapse(filtered, nearDupThreshold)
    ApproxDedup.Scoped(out, () => { filtered.unpersist(); () })
  }

  /** Training-data preparation as ONE lazy plan — the curation half
    * that follows [[cleanPlan]]'s dedup half:
    *
    *   quality filter → exact dedup → PII scrub → deterministic
    *   train/val/test split → per-source mixing sample → per-
    *   (split, source) sequence packing → shard summary
    *
    * Returns one row per (split, source): document count, total tokens
    * and packed `seqTokens`-token sequence count. Scrub/split/sample
    * are per-row expressions on the single corpus scan; packing
    * windows per shard; the summary is one aggregation — nothing
    * global, nothing collected. */
  def prepareTrainingData(docs: DataFrame, minTokens: Int,
                          maxPunctRatio: Double, testPerMyriad: Int,
                          valPerMyriad: Int,
                          rate: org.apache.spark.sql.Column,
                          seqTokens: Int): DataFrame = {
    import graft.ops.{Curation, TextAnalysis}
    val cleaned = exactDedup(qualityFilter(docs, minTokens, maxPunctRatio))
    val scrubbed = cleaned.withColumn("text", Curation.scrubText(col("text")))
    val sampled = Curation.sampleByRate(
      Curation.assignSplit(scrubbed, "doc_id", testPerMyriad, valPerMyriad),
      "doc_id", rate)
    // shard key = (split, source) as REAL columns — the packing window
    // partitions by the tuple, never a string-encoded key
    val withTok = sampled.select(col("doc_id"), col("split"), col("source"),
      TextAnalysis.tokenCount(col("text")).cast("bigint").as("n_tokens"))
    Curation.packSequences(withTok, "doc_id", Seq("split", "source"),
        col("n_tokens"), seqTokens)
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("bigint").as("total_tokens"),
        (max(col("last_seq")) + 1L).as("n_seqs"))
  }

  /** Full pipeline; returns the cleaned corpus plus stage counts. */
  def clean(spark: SparkSession, docs: DataFrame,
            minTokens: Int = 8, maxPunctRatio: Double = 0.1,
            nearDupThreshold: Double = 0.6,
            maxDupWordFrac: Double = 1.0): (DataFrame, Summary) = {
    val input = docs.count()

    val quality = repetitionGate(
      qualityFilter(docs, minTokens, maxPunctRatio), maxDupWordFrac).cache()
    val nQuality = quality.count()

    val exact = exactDedup(quality).cache()
    val nExact = exact.count()

    val cleaned = nearDupCollapse(exact, nearDupThreshold)
    val nFinal = cleaned.count()

    // Release every stage cache before returning: the counts are done and
    // the returned frame is a plain plan — re-materializing it re-derives
    // the stages (the caller that wants it hot can cache it themselves).
    // A long-lived session running clean() in a loop must not accumulate
    // per-run relations.
    quality.unpersist()
    exact.unpersist()
    (cleaned, Summary(input, nQuality, nExact, nFinal))
  }
}
