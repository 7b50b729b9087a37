package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed BPE tokenizer training and encoding (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword
  * Units"). Extends [[TextAnalysis.bpeMergePairs]] — which computes the
  * pair statistics of ONE training iteration — into the full greedy
  * loop: learn the merge table, then encode a corpus with it.
  *
  * Scale design (the property that makes BPE training tractable at
  * 100 TB): ONE corpus-wide shuffle builds the word-frequency
  * histogram; every training iteration after that runs over the
  * HISTOGRAM (|vocab| rows — millions at web scale, never the corpus).
  * Each iteration is a map-side-combined pair aggregation plus a
  * single-row argmax collect (the same driver-resident-model shape as
  * [[Similarity.kmeansFit]]'s k·d-cell collect: the merge table IS the
  * model, and it is O(numMerges) rows by construction). The learned
  * state between iterations is a persisted vocab-sized DataFrame; the
  * previous iteration is unpersisted as soon as the next materializes,
  * so the loop's footprint is two vocab snapshots regardless of merge
  * count.
  *
  * Encoding never re-runs per-document merge folds over the corpus:
  * it applies the merge chain to the DISTINCT word table (vocab-sized),
  * then broadcast-joins word→symbol-count back onto the per-document
  * word stream — the corpus-side work is one narrow explode + one
  * map-side-combined per-doc sum, with zero corpus shuffle beyond the
  * per-doc re-aggregation.
  *
  * Determinism contract: the argmax tie-breaks on (weight DESC, left
  * ASC, right ASC), and the greedy merge application is the standard
  * left-to-right non-overlapping scan, expressed as an `aggregate`
  * higher-order fold (codegen-friendly, no UDF). Both are replayed
  * bit-for-bit by the DuckDB oracle (`Queries.oBpeChain`).
  *
  * One deliberate divergence from common implementations: no
  * end-of-word marker symbol is appended (reference pipelines differ
  * on `</w>` vs `##` vs none); the merge semantics are identical
  * modulo that marker, and the oracle replays this exact convention.
  */
object Bpe {

  /** A learned merge: at `step`, the adjacent pair (`lft`,`rgt`) with
    * corpus weight `weight` is merged into `merged` = lft+rgt. */
  final case class Merge(step: Int, lft: String, rgt: String,
                         merged: String, weight: Long)

  /** Word-frequency histogram (word, cnt), empty tokens dropped —
    * the one corpus-wide shuffle of the whole training run. */
  def wordHistogram(df: DataFrame, text: Column): DataFrame =
    df.filter(text.isNotNull)
      .select(explode(split(text, "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Split a (non-empty) word into single-character symbols.
    * Character-indexed `substr`, so multi-byte code points stay whole
    * (mirrors the oracle's `word[i:i]`). */
  def charSymbols(word: Column): Column =
    transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1)))

  /** Apply ONE merge (lft,rgt)→lft+rgt to a symbols array with the
    * standard greedy left-to-right non-overlapping scan, as a pure
    * expression fold: the accumulator is the rewritten prefix; a step
    * either fuses the incoming symbol into the accumulator's tail or
    * appends it. `get` (null out-of-bounds) keeps the empty-prefix
    * probe ANSI-safe. */
  def mergeOnce(symbols: Column, lft: String, rgt: String): Column = {
    val merged = lft + rgt
    aggregate(symbols, array().cast("array<string>"),
      (acc, x) =>
        when(get(acc, size(acc) - 1) === lit(lft) && x === lit(rgt),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
        .otherwise(concat(acc, array(x))))
  }

  /** Apply a merge chain in learned order. */
  def applyMerges(symbols: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(symbols) { case (c, (l, r)) => mergeOnce(c, l, r) }

  /** Train `numMerges` BPE merges over `text`'s word histogram.
    * Returns the merge table (step, lft, rgt, merged, weight) — the
    * model, O(numMerges) rows. Stops early if no adjacent pair
    * remains. */
  def train(df: DataFrame, text: Column, numMerges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    var hist = wordHistogram(df, text)
      .select(charSymbols(col("word")).as("symbols"), col("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // ONE job per iteration: the argmax collect below is also the
    // action that materializes the current snapshot's cache (it reads
    // the PREVIOUS persisted snapshot, which is only unpersisted after
    // this collect returns — no lineage recompute, no extra count()).
    var prev: Option[DataFrame] = None

    val merges = ArrayBuffer.empty[Merge]
    var exhausted = false
    var step = 1
    try {
    while (step <= numMerges && !exhausted) {
      // adjacent-pair weights over the vocab histogram
      val best = hist
        .select(col("cnt"), explode(zip_with(
          slice(col("symbols"), lit(1), size(col("symbols")) - 1),
          slice(col("symbols"), lit(2), size(col("symbols")) - 1),
          (a, b) => struct(a.as("lft"), b.as("rgt")))).as("p"))
        .groupBy(col("p.lft").as("lft"), col("p.rgt").as("rgt"))
        .agg(sum(col("cnt")).as("weight"))
        .orderBy(col("weight").desc, col("lft"), col("rgt"))
        .limit(1)
        .collect() // 1 row: the argmax merge (the model update)
      prev.foreach(_.unpersist())
      prev = None
      if (best.isEmpty) exhausted = true
      else {
        val row = best.head
        val (l, r) = (row.getString(0), row.getString(1))
        merges += Merge(step, l, r, l + r, row.getLong(2))
        val next = hist
          .withColumn("symbols", mergeOnce(col("symbols"), l, r))
          .persist(StorageLevel.MEMORY_AND_DISK)
        prev = Some(hist)
        hist = next
        step += 1
      }
    }
    } finally { // no orphaned caches, also on a failed iteration
      hist.unpersist()
      prev.foreach(_.unpersist())
    }
    merges.toSeq.toDF()
      .select(col("step").cast("bigint"), col("lft"), col("rgt"),
        col("merged"), col("weight"))
  }

  /** Collect a merge table (train's output, O(numMerges) rows) into the
    * driver-side chain `encode` needs. */
  def mergeChain(mergeTable: DataFrame): Seq[(String, String)] =
    mergeTable.orderBy("step").collect()
      .map(r => (r.getAs[String]("lft"), r.getAs[String]("rgt"))).toSeq

  /** Encode a corpus with a learned merge chain; returns per-document
    * (id, n_words, n_bpe_tokens). The merge fold runs over DISTINCT
    * words only; the vocab-sized (word → n_sym) map broadcast-joins
    * back onto the per-document word stream. */
  def encode(df: DataFrame, id: String, text: Column,
             merges: Seq[(String, String)]): DataFrame = {
    val docWords = df.filter(text.isNotNull)
      .select(col(id), explode(split(text, "\\s+")).as("word"))
      .filter(col("word") =!= "")
    val wordSyms = docWords.select(col("word")).distinct()
      .withColumn("n_sym",
        size(applyMerges(charSymbols(col("word")), merges)).cast("bigint"))
    docWords
      .join(broadcast(wordSyms), Seq("word"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_bpe_tokens"))
  }
}
