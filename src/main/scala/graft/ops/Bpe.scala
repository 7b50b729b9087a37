package graft.ops

import java.nio.charset.StandardCharsets

import scala.collection.mutable
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
  * histogram; everything after runs over the HISTOGRAM (|vocab| rows —
  * millions at web scale, never the corpus). The histogram is the
  * MODEL-SIDED state — the same driver-resident-model position
  * [[Similarity.kmeansFit]]'s k·d centroid table holds — so training
  * collects it behind a size guard and runs the greedy loop
  * DRIVER-LOCALLY with incremental pair-weight bookkeeping (an ordered
  * pair heap: argmax is O(log pairs), a merge touches only the words
  * containing its pair). That is what makes real vocab sizes
  * reachable: 32k merges are 32k heap pops, not 32k Spark jobs.
  * Corpora whose vocabulary exceeds the guard fall back to the
  * distributed per-iteration loop ([[trainDistributed]] — one
  * map-side-combined pair aggregation plus a single-row argmax collect
  * per merge), which is corpus-safe at any scale but pays one job per
  * merge.
  *
  * Encoding never re-runs per-word merge folds over the corpus: it
  * applies the merge chain to the DISTINCT word table (vocab-sized),
  * then broadcast-joins word→symbol-count back onto the per-document
  * word stream — the corpus-side work is one narrow explode + one
  * map-side-combined per-doc sum, with zero corpus shuffle beyond the
  * per-doc re-aggregation. Short chains (≤ [[ExprFoldMaxMerges]])
  * evaluate as a codegen-friendly `aggregate` HOF fold; longer chains
  * switch to a typed map over the distinct words with a broadcast
  * rank table ([[encodeIter]]) — per-word cost scales with the merges
  * that APPLY, not the chain length, so a 32k-merge vocabulary never
  * builds a 32k-deep expression tree (Catalyst analysis is linear and
  * codegen safe at any merge count).
  *
  * Determinism contract: the argmax tie-breaks on (weight DESC, left
  * ASC, right ASC) — string order is UTF-8 byte order, matching both
  * Spark's UTF8String comparisons and the DuckDB oracle — and the
  * greedy merge application is the standard left-to-right
  * non-overlapping scan. All three implementations (driver-local
  * train, distributed train, iterative encode) replay these contracts
  * bit-for-bit (BpeSpec / BpeScaleSpec pin the parities; the DuckDB
  * oracle replays the fold in `Queries.oBpeChain`).
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

  /** Longest merge chain the expression-fold [[encode]] path unrolls;
    * beyond it the typed-map [[encodeIter]] path serves (a fold nests
    * one `aggregate` HOF per merge — fine at oracle sizes, quadratic
    * analysis cost and eventual codegen failure at vocab scale). */
  val ExprFoldMaxMerges = 64

  /** Largest vocabulary (distinct words) [[train]] collects for the
    * driver-local greedy loop. The histogram at this bound is
    * ~hundreds of MB — the accepted driver-model budget (kmeansFit's
    * centroid table holds the same position); above it training falls
    * back to the distributed per-iteration loop. */
  val DefaultMaxLocalVocab = 2000000L

  /** Companion byte-dimension guard: the driver structures scale with
    * TOTAL vocabulary characters (symbol arrays + pair maps), not just
    * word count — a small histogram of very long words (compound-word
    * corpora) would pass the count guard and still exhaust the driver.
    * 200M chars ≈ low-GB of driver structures. */
  val DefaultMaxLocalVocabChars = 200000000L

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

  // ------------------------------------------------------- plain scala
  // The driver/executor-side replicas of the two column contracts
  // above — bit-compatible by construction, parity-pinned in BpeSpec /
  // BpeScaleSpec.

  /** [[charSymbols]] driver-side: one string per code point. */
  private[graft] def splitCodePoints(w: String): Array[String] = {
    val out = new ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** [[mergeOnce]] driver-side: the same left-to-right scan. */
  private[graft] def mergeScanWord(syms: Array[String], lft: String,
                                   rgt: String): Array[String] = {
    val out = new ArrayBuffer[String](syms.length)
    val merged = lft + rgt
    syms.foreach { x =>
      if (out.nonEmpty && out(out.length - 1) == lft && x == rgt)
        out(out.length - 1) = merged
      else out += x
    }
    out.toArray
  }

  /** [[mergeScanWord]] that also accumulates the word's adjacent-pair
    * DELTA into `delta` (net occurrence changes) in the same single
    * pass — the trainer's hot path: a merge then costs O(fusions)
    * heap/bag updates instead of re-bagging the whole word (~2·len
    * updates), which is what makes thousands of merges tractable.
    * Accounting discipline: every boundary adjustment is made against
    * the CURRENT (possibly already-rewritten) left symbol, so later
    * adjustments cancel earlier ones exactly; a fused tail records
    * the old crossing pair (rgt, next) when the next symbol arrives.
    * Bit-identical rewriting to [[mergeScanWord]] (a fused tail is
    * l+r ≠ l, so it can never chain-fuse — same rule both scans
    * follow); BpeScaleSpec's randomized differential test pins the
    * delta against brute-force re-bagging. */
  private[graft] def mergeScanWordDiff(
      syms: Array[String], lft: String, rgt: String,
      delta: mutable.HashMap[(String, String), Int]): Array[String] = {
    val out = new ArrayBuffer[String](syms.length)
    val merged = lft + rgt
    var tailFused = false
    def d(p: (String, String), by: Int): Unit = {
      val v = delta.getOrElse(p, 0) + by
      if (v == 0) delta.remove(p) else delta(p) = v
      ()
    }
    syms.foreach { x =>
      if (out.nonEmpty && out(out.length - 1) == lft && x == rgt) {
        if (out.length >= 2) {
          d((out(out.length - 2), lft), -1)
          d((out(out.length - 2), merged), +1)
        }
        d((lft, rgt), -1)
        out(out.length - 1) = merged
        tailFused = true
      } else {
        if (out.nonEmpty && tailFused) {
          d((rgt, x), -1)
          d((merged, x), +1)
        }
        out += x
        tailFused = false
      }
    }
    out.toArray
  }

  /** UTF-8 byte order — Spark's UTF8String / DuckDB VARCHAR order, NOT
    * Java's UTF-16 `compareTo` (they differ beyond the BMP). */
  private def utf8Compare(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(
      a.getBytes(StandardCharsets.UTF_8), b.getBytes(StandardCharsets.UTF_8))

  /** Replay a merge CHAIN on one word, chain-length-free: maintains a
    * rank cursor and repeatedly applies the lowest-rank pair at or
    * past the cursor that is PRESENT in the current symbols — skipping
    * a rank whose pair is absent is exactly what the sequential fold's
    * identity step does, so the result is bit-identical to
    * [[applyMerges]] at any chain length (BpeScaleSpec pins it), at
    * O(applied merges · word length) instead of O(chain · length).
    * `ranks` maps a pair to its ascending chain positions (a pair CAN
    * recur in a learned chain: a later merge may recreate an adjacency
    * an earlier step cleared, and training may legitimately relearn
    * it). */
  private[graft] def applyChainToWord(word: String,
                                      merges: IndexedSeq[(String, String)],
                                      ranks: Map[(String, String), Array[Int]])
      : Array[String] = {
    var syms = splitCodePoints(word)
    var cursor = 0
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue
      var j = 0
      while (j < syms.length - 1) {
        ranks.get((syms(j), syms(j + 1))) match {
          case Some(rs) =>
            // lowest occurrence of this pair at or past the cursor
            var k = 0
            while (k < rs.length && rs(k) < cursor) k += 1
            if (k < rs.length && rs(k) < best) best = rs(k)
          case None =>
        }
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (l, r) = merges(best)
        syms = mergeScanWord(syms, l, r)
        cursor = best + 1
        done = syms.length < 2
      }
    }
    syms
  }

  private[graft] def rankTable(merges: IndexedSeq[(String, String)])
      : Map[(String, String), Array[Int]] =
    merges.zipWithIndex.groupMap(_._1)(_._2)
      .view.mapValues(_.toArray.sorted).toMap

  // ------------------------------------------------------------ train

  /** Train `numMerges` BPE merges over `text`'s word histogram.
    * Returns the merge table (step, lft, rgt, merged, weight) — the
    * model, O(numMerges) rows. Stops early if no adjacent pair
    * remains. Routes by vocabulary size: at or under `maxLocalVocab`
    * distinct words the greedy loop runs driver-locally over the
    * collected histogram (vocab-sized driver state, zero jobs per
    * merge); above it, the distributed per-iteration loop. Both paths
    * are merge-for-merge identical (BpeScaleSpec). */
  def train(df: DataFrame, text: Column,
            numMerges: Int,
            maxLocalVocab: Long = DefaultMaxLocalVocab,
            maxLocalVocabChars: Long = DefaultMaxLocalVocabChars): DataFrame = {
    val hist = wordHistogram(df, text).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // one pass sizes BOTH guard dimensions (rows and characters)
      val sized = hist
        .agg(count(lit(1)), coalesce(sum(length(col("word"))), lit(0L)))
        .collect()(0)
      if (sized.getLong(0) <= maxLocalVocab &&
          sized.getLong(1) <= maxLocalVocabChars)
        trainLocalHist(hist, df.sparkSession, numMerges)
      else trainDistributedHist(hist, df.sparkSession, numMerges)
    } finally { hist.unpersist(); () }
  }

  /** The distributed per-iteration loop, directly (parity harness /
    * above-guard fallback). */
  private[graft] def trainDistributed(df: DataFrame, text: Column,
                                      numMerges: Int): DataFrame =
    trainDistributedHist(wordHistogram(df, text), df.sparkSession, numMerges)

  /** The driver-local greedy loop, directly (parity harness). */
  private[graft] def trainLocal(df: DataFrame, text: Column,
                                numMerges: Int): DataFrame =
    trainLocalHist(wordHistogram(df, text), df.sparkSession, numMerges)

  /** Driver-local greedy training over a collected (word, cnt)
    * histogram — the vocab-scale path. Incremental bookkeeping: pair
    * weights live in a hash map mirrored by an ordered set keyed
    * (weight DESC, lft, rgt) so each argmax is a `head` and each
    * weight change two log-time moves; a merge rewrites ONLY the words
    * containing its pair (`pairWords` posting sets) and re-diffs their
    * adjacent-pair multisets. Work per merge is proportional to the
    * occurrences touched — the classic in-memory BPE trainer shape —
    * so 32k merges cost 32k heap pops plus touched-word rescans, with
    * zero Spark jobs inside the loop. */
  private def trainLocalHist(histWords: DataFrame, spark: SparkSession,
                             numMerges: Int): DataFrame = {
    import spark.implicits._
    val entries = histWords
      .select(col("word"), col("cnt").cast("bigint")).as[(String, Long)]
      .collect()
    val words: Array[Array[String]] = entries.map(e => splitCodePoints(e._1))
    val cnts: Array[Long] = entries.map(_._2)

    implicit val heapOrd: Ordering[(Long, String, String)] =
      new Ordering[(Long, String, String)] {
        def compare(a: (Long, String, String), b: (Long, String, String)): Int = {
          val c = java.lang.Long.compare(b._1, a._1) // weight DESC
          if (c != 0) c
          else {
            val c2 = utf8Compare(a._2, b._2)
            if (c2 != 0) c2 else utf8Compare(a._3, b._3)
          }
        }
      }
    val heap = mutable.TreeSet.empty[(Long, String, String)]
    val pairW = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]

    def bump(p: (String, String), delta: Long): Unit = {
      val old = pairW.getOrElse(p, 0L)
      if (old > 0L) heap.remove((old, p._1, p._2))
      val nw = old + delta
      require(nw >= 0L, s"negative pair weight for $p")
      if (nw > 0L) { pairW(p) = nw; heap.add((nw, p._1, p._2)) }
      else { pairW.remove(p); pairWords.remove(p) }
      ()
    }

    def pairBag(syms: Array[String]): mutable.HashMap[(String, String), Int] = {
      val bag = mutable.HashMap.empty[(String, String), Int]
      var j = 0
      while (j < syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        bag(p) = bag.getOrElse(p, 0) + 1
        j += 1
      }
      bag
    }

    // per-word pair bags, maintained incrementally by the scan deltas
    // (rebuilding a bag per touched word would cost O(word length)
    // heap updates per merge — the delta form costs O(fusions))
    val bags: Array[mutable.HashMap[(String, String), Int]] =
      words.map(pairBag)
    words.indices.foreach { i =>
      bags(i).foreach { case (p, occ) =>
        bump(p, occ.toLong * cnts(i))
        pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += i
      }
    }

    val merges = ArrayBuffer.empty[Merge]
    var step = 1
    while (step <= numMerges && heap.nonEmpty) {
      val (w, l, r) = heap.head
      merges += Merge(step, l, r, l + r, w)
      val affected = pairWords.getOrElse((l, r), mutable.HashSet.empty).toArray
      affected.foreach { i =>
        val delta = mutable.HashMap.empty[(String, String), Int]
        words(i) = mergeScanWordDiff(words(i), l, r, delta)
        val bag = bags(i)
        delta.foreach { case (p, dOcc) =>
          bump(p, dOcc.toLong * cnts(i))
          val nb = bag.getOrElse(p, 0) + dOcc
          require(nb >= 0, s"negative bag count for $p in word $i")
          if (nb == 0) { bag.remove(p); pairWords.get(p).foreach(_ -= i) }
          else {
            if (!bag.contains(p))
              pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += i
            bag(p) = nb
          }
        }
      }
      require(!pairW.contains((l, r)),
        s"merge ($l,$r) must clear its own pair") // scan removes every site
      step += 1
    }
    mergesToDF(spark, merges.toSeq)
  }

  /** One Spark job per iteration over the vocab-sized symbol table:
    * the argmax collect below is also the action that materializes the
    * current snapshot's cache (it reads the PREVIOUS persisted
    * snapshot, which is only unpersisted after this collect returns —
    * no lineage recompute, no extra count()). Corpus-safe at any
    * vocabulary size; pays numMerges sequential jobs, which is why it
    * is the above-guard fallback rather than the default. */
  private def trainDistributedHist(histWords: DataFrame, spark: SparkSession,
                                   numMerges: Int): DataFrame = {
    var hist = histWords
      .select(charSymbols(col("word")).as("symbols"), col("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
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
    mergesToDF(spark, merges.toSeq)
  }

  private def mergesToDF(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF()
      .select(col("step").cast("bigint"), col("lft"), col("rgt"),
        col("merged"), col("weight"))
  }

  /** Collect a merge table (train's output, O(numMerges) rows) into the
    * driver-side chain `encode` needs. */
  def mergeChain(mergeTable: DataFrame): Seq[(String, String)] =
    mergeTable.orderBy("step").collect()
      .map(r => (r.getAs[String]("lft"), r.getAs[String]("rgt"))).toSeq

  // ----------------------------------------------------------- encode

  /** Encode a corpus with a learned merge chain; returns per-document
    * (id, n_words, n_bpe_tokens). The merge fold runs over DISTINCT
    * words only; the vocab-sized (word → n_sym) map broadcast-joins
    * back onto the per-document word stream. Chains past
    * [[ExprFoldMaxMerges]] route to [[encodeIter]] (identical result,
    * chain-length-free plan). */
  def encode(df: DataFrame, id: String, text: Column,
             merges: Seq[(String, String)]): DataFrame =
    if (merges.size <= ExprFoldMaxMerges) {
      val docWords = explodeWords(df, id, text)
      val wordSyms = docWords.select(col("word")).distinct()
        .withColumn("n_sym",
          size(applyMerges(charSymbols(col("word")), merges)).cast("bigint"))
      joinBack(docWords, wordSyms, id)
    } else encodeIter(df, id, text, merges)

  /** [[encode]] as a typed map over the distinct-word table with a
    * broadcast rank table — the vocab-scale path (and the only
    * difference from the fold path; the corpus-side plan is the same
    * broadcast join + per-doc sum). */
  private[graft] def encodeIter(df: DataFrame, id: String, text: Column,
                                merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val chain = merges.toIndexedSeq
    val bc = spark.sparkContext.broadcast((chain, rankTable(chain)))
    val docWords = explodeWords(df, id, text)
    // the vocab-sized word→count table materializes EAGERLY so the
    // chain broadcast can be released here — a lazily-broadcast chain
    // would leak one block-manager copy per encode for the
    // application lifetime
    val wordSyms =
      try docWords.select(col("word")).distinct().as[String]
        .mapPartitions { it =>
          val (m, ranks) = bc.value
          it.map(w => (w, applyChainToWord(w, m, ranks).length.toLong))
        }.toDF("word", "n_sym").localCheckpoint()
      finally bc.destroy()
    joinBack(docWords, wordSyms, id)
  }

  private def explodeWords(df: DataFrame, id: String, text: Column): DataFrame =
    df.filter(text.isNotNull)
      .select(col(id), explode(split(text, "\\s+")).as("word"))
      .filter(col("word") =!= "")

  private def joinBack(docWords: DataFrame, wordSyms: DataFrame,
                       id: String): DataFrame =
    docWords
      .join(broadcast(wordSyms), Seq("word"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_bpe_tokens"))
}
