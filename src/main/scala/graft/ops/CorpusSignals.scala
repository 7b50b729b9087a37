package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-quality signals and cleaning passes a large-scale
  * training-data pipeline runs beyond per-document stats
  * ([[TextAnalysis]]) and near-dup mining ([[ApproxDedup]]):
  *
  *  - Gopher-style repetition signals (Rae et al. 2021 §A1.1):
  *    duplicate-word fraction, most-frequent-bigram character fraction,
  *    duplicated-n-gram character fraction — the filters that catch
  *    boilerplate and degenerate repetition which per-token stats miss.
  *  - C4/CCNet-style global line-level dedup (Raffel et al. 2020 §2.2):
  *    drop every line already seen anywhere else in the corpus, keep
  *    the first occurrence, reassemble documents.
  *  - Benchmark decontamination (GPT-3 appendix C shape): flag training
  *    documents sharing any word n-gram with an evaluation set.
  *  - TF-IDF top terms per document (salient-term extraction).
  *
  * Scale design: every pass is one or two shuffles keyed by document id
  * or by the gram/line itself (map-side combined), never an all-pairs
  * join; the benchmark side of decontamination is broadcast (eval
  * suites are small by nature). All ratios are exact int/int double
  * divisions and all scores integer-derived, so a DuckDB oracle
  * reproduces them bit-for-bit.
  */
object CorpusSignals {

  private def toks(text: Column): Column = split(text, "\\s+")

  /** Word n-grams WITH multiplicity (repetition counting needs every
    * occurrence; [[ApproxDedup.wordNgrams]] is the distinct form).
    * Tokenization is let-bound (computed once per row, not per gram).
    * Documents shorter than `n` tokens yield an empty array. */
  def wordNgramsAll(text: Column, n: Int): Column =
    element_at(
      transform(array(toks(text)), ws =>
        when(size(ws) >= n,
          transform(sequence(lit(1), size(ws) - (n - 1)),
            i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + j)): _*)))
          .otherwise(array().cast("array<string>"))),
      1)

  /** Distinct word n-grams with EMPTY output for sub-`n`-token
    * documents — the oracle-matching form for gram-set intersection
    * ops ([[ApproxDedup.wordNgrams]] instead falls back to the whole
    * text as one gram, which MinHash needs for nonempty sets but which
    * a SQL `generate_series(1, len-n+1)` replay never emits). */
  def wordNgramsDistinct(text: Column, n: Int): Column =
    array_distinct(wordNgramsAll(text, n))

  /** The duplicate-word fraction alone, as a filter-ready column —
    * the cheapest Gopher gate (narrow map, no gram explode): fraction
    * of tokens that repeat an earlier token. */
  def dupWordFrac(text: Column): Column = {
    val ws = toks(text)
    (size(ws) - size(array_distinct(ws))).cast("double") / size(ws)
  }

  /** Gopher repetition signals, one row per document:
    *  - `dup_word_frac`: fraction of tokens that are repeats of an
    *    earlier token (1 - distinct/total);
    *  - `top_bigram` / `top_bigram_n` / `top_bigram_frac`: the most
    *    frequent word 2-gram (ties broken toward the lexicographically
    *    LARGEST gram — an arbitrary but total order both engines share),
    *    its count, and the fraction of characters its occurrences cover
    *    (count × gram length / document length; overlapping occurrences
    *    may push this past 1 — it is a repetition score, not a measure);
    *  - `dup_ngram_frac`: fraction of characters covered by word
    *    `n`-grams occurring at least twice (Σ count×len over duplicated
    *    grams / document length), the Gopher "duplicate n-gram" gate.
    *
    * Two aggregations keyed by (doc, gram) then doc — map-side combined,
    * linear in corpus size, no cross-document shuffle wider than the
    * gram lists themselves. */
  def repetitionSignals(df: DataFrame, id: String, text: Column,
                        dupN: Int = 5): DataFrame = {
    val base = df
      .select(col(id), text.as("t"), toks(text).as("ws"))
      .select(col(id), col("t"), col("ws"),
        length(col("t")).cast("bigint").as("n_chars"),
        size(col("ws")).cast("bigint").as("n_tokens"))
      .withColumn("dup_word_frac",
        (col("n_tokens") - size(array_distinct(col("ws"))).cast("bigint"))
          .cast("double") / col("n_tokens"))

    // most frequent bigram: count per (doc, gram), then an argmax by
    // (count, gram) — max over a struct, so the tie-break is total
    val biCounts = base
      .select(col(id), explode(wordNgramsAll(col("t"), 2)).as("gram"))
      .groupBy(col(id), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    val biTop = biCounts
      .groupBy(col(id))
      .agg(max(struct(col("cnt"), col("gram"))).as("top"))
      .select(col(id),
        col("top.gram").as("top_bigram"),
        col("top.cnt").as("top_bigram_n"))

    // characters covered by duplicated n-grams
    val dupChars = base
      .select(col(id), explode(wordNgramsAll(col("t"), dupN)).as("gram"))
      .groupBy(col(id), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .groupBy(col(id))
      .agg(sum(col("cnt") * length(col("gram")).cast("bigint")).as("dup_chars"))

    base
      .join(biTop, Seq(id), "left")
      .join(dupChars, Seq(id), "left")
      .select(col(id), col("n_tokens"), col("dup_word_frac"),
        col("top_bigram"), col("top_bigram_n"),
        ((col("top_bigram_n") * length(col("top_bigram")).cast("bigint"))
          .cast("double") / col("n_chars")).as("top_bigram_frac"),
        (coalesce(col("dup_chars"), lit(0L)).cast("double") / col("n_chars"))
          .as("dup_ngram_frac"))
  }

  /** Split a document into fixed-width lines of `wordsPerLine` tokens —
    * the deterministic line synthesizer the line-dedup demo query uses
    * (the synthetic corpus has no newlines; a real corpus splits on
    * '\n' instead and skips this step). One row per (id, line_no, line),
    * line_no 1-based. */
  def syntheticLines(df: DataFrame, id: String, text: Column,
                     wordsPerLine: Int): DataFrame =
    df.select(col(id), toks(text).as("ws"))
      .select(col(id), col("ws"),
        // `/` on columns is double division; the truncating cast is
        // ceil(size / wordsPerLine) for the positive sizes here
        explode(sequence(lit(1),
          ((size(col("ws")) + (wordsPerLine - 1)) / wordsPerLine).cast("int")))
          .as("line_no"))
      .select(col(id), col("line_no").cast("bigint").as("line_no"),
        concat_ws(" ",
          slice(col("ws"), (col("line_no") - 1) * wordsPerLine + 1,
            lit(wordsPerLine))).as("line"))

  /** Global line-level exact dedup (the C4/CCNet pass): a line survives
    * only at its globally FIRST occurrence — ordered by (doc id,
    * line number) — and every later copy anywhere in the corpus drops.
    * Returns one row per document: total and kept line counts plus the
    * reassembled text (null when every line dropped).
    *
    * Shape: winner-per-line is a map-side-combined `min(struct)` keyed
    * by the line itself (partial aggregation absorbs hot keys), then
    * one join back on the line. A pathologically hot line (billions of
    * copies of "Click here to subscribe") skews that JOIN key — one
    * reducer receives every copy. `salts > 0` spreads each line's rows
    * over that many sub-partitions via [[Salting.saltedJoin]] (winners
    * carry exactly one row per line, so replicating them `salts`× is
    * cheap); the result is row-identical to the unsalted join. 0 leaves
    * the plain join for AQE's runtime skew handling. */
  def lineDedup(lines: DataFrame, id: String, lineNo: String,
                line: String, salts: Int = 0): DataFrame = {
    val winners = lines
      .groupBy(col(line))
      .agg(min(struct(col(id), col(lineNo))).as("w"))
    val joined =
      if (salts > 0)
        Salting.saltedJoin(lines, winners, line, salts,
          saltSource = Seq(col(id), col(lineNo)))
      else lines.join(winners, Seq(line))
    joined
      .withColumn("kept", struct(col(id), col(lineNo)) === col("w"))
      .groupBy(col(id))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("kept"), lit(1L)).otherwise(lit(0L))).as("n_kept"),
        // collect_list drops the nulls `when` leaves for non-kept lines;
        // array_sort orders by the struct's leading line_no
        array_join(
          transform(
            array_sort(collect_list(
              when(col("kept"), struct(col(lineNo).as("ln"), col(line).as("lv"))))),
            s => s.getField("lv")),
          " ").as("kept_joined"))
      .select(col(id), col("n_lines"), col("n_kept"),
        when(col("n_kept") > 0, col("kept_joined")).as("kept_text"))
  }

  /** Per-document contamination counts: for every training document
    * sharing at least one distinct word `n`-gram with the benchmark
    * set, the number of distinct grams shared. Benchmark grams are
    * broadcast — evaluation suites are tiny next to a training corpus,
    * so the training side never shuffles on the gram key. */
  def contamination(train: DataFrame, bench: DataFrame, id: String,
                    text: Column, n: Int): DataFrame = {
    // wordNgramsDistinct, not ApproxDedup.wordNgrams: the whole-text
    // fallback for sub-n documents would diverge from the SQL replay
    val tg = train.select(col(id),
      explode(wordNgramsDistinct(text, n)).as("gram"))
    val bg = bench.select(
        explode(wordNgramsDistinct(text, n)).as("gram"))
      .distinct()
    tg.join(broadcast(bg), Seq("gram"))
      // wordNgrams is distinct-per-document, so count(*) = distinct grams
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Drop every training document sharing any word `n`-gram with the
    * benchmark set (the decontamination pass itself). */
  def decontaminate(train: DataFrame, bench: DataFrame, id: String,
                    text: Column, n: Int): DataFrame =
    train.join(contamination(train, bench, id, text, n).select(col(id)),
      Seq(id), "left_anti")

  /** Per-group length quantiles (p50/p90/p99 of a numeric column) —
    * the corpus-profile summary a mixing pass reads before choosing
    * per-source rates. Uses Spark's EXACT interpolating `percentile`
    * (sort-per-group): right for per-source profiles where groups are
    * few; at 100 TB with high-cardinality groups swap in
    * `approx_percentile`, whose t-digest sketch merges map-side (the
    * result then has sketch error, so the exact form stays the oracle
    * surface). Results round to 6 decimals so the interpolation's last
    * ulp can't differ across engines. */
  def lengthQuantiles(df: DataFrame, group: String, value: Column): DataFrame =
    df.groupBy(col(group))
      .agg(
        round(percentile(value, lit(0.5)), 6).as("p50"),
        round(percentile(value, lit(0.9)), 6).as("p90"),
        round(percentile(value, lit(0.99)), 6).as("p99"),
        count(lit(1)).as("n_docs"))

  /** Top-k salient terms per document by TF-IDF. The score uses the
    * linear-idf form score = tf × (N / df) — a single IEEE double
    * division of exact integers, bit-portable across engines, where a
    * log-idf would hang rank order on libm's last ulp. Rank ties break
    * on the term itself. */
  def tfidfTopTerms(df: DataFrame, id: String, text: Column,
                    k: Int): DataFrame = {
    val terms = df.select(col(id), explode(toks(text)).as("term"))
    val tf = terms.groupBy(col(id), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.select(countDistinct(col(id)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(id)).orderBy(col("score").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score", (col("tf") * col("n_docs")).cast("double") / col("df"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col(id), col("rank"), col("term"), col("tf"), col("score"))
  }

  /** N-gram language-model count table (the KenLM-style training-prep
    * surface): for every word `n`-gram occurring at least `minCount`
    * times, its count, its context's total continuation count
    * (Σ_w c(context, w) — the MLE conditional denominator) and the
    * exact-ppm conditional estimate p(word | context). Integer-exact
    * throughout, so the table is bit-replayable.
    *
    * Shape: one gram explode + map-side-combined count (the corpus's
    * wide shuffle), then a whole-partition window on the context for
    * the denominator — contexts are bounded key groups (the distinct
    * continuations of an (n-1)-gram), so no single partition holds
    * more than one context's vocabulary fan-out. The `minCount` cut
    * applies AFTER the denominator sums, so reported probabilities
    * are true corpus MLE values, not post-cut renormalizations. */
  /** Positional (context, word) n-gram sites of `text` — the shared
    * derivation of [[lmConditionalCounts]] (training side) and
    * [[lmCoverage]] (scoring side), so the two can never tokenize
    * differently. Let-bound token array (split once per doc); sub-n
    * docs yield no sites. */
  private def lmPairs(text: Column, n: Int): Column = {
    require(n >= 2, s"LM grams need n >= 2, got $n")
    val pairStruct = (w: Column, i: Column) => struct(
      concat_ws(" ", (0 until n - 1).map(j => element_at(w, i + j)): _*)
        .as("context"),
      element_at(w, i + (n - 1)).as("word"))
    element_at(
      transform(array(toks(text)), w =>
        when(size(w) >= n,
          transform(sequence(lit(1), size(w) - (n - 1)), i => pairStruct(w, i)))
          .otherwise(array().cast("array<struct<context:string,word:string>>"))),
      1)
  }

  def lmConditionalCounts(df: DataFrame, text: Column, n: Int,
                          minCount: Long): DataFrame =
    lmCountsFromRaw(lmRawCounts(df, text, n), minCount)

  /** The LM ledger's MERGEABLE form: raw (context, word, cnt_gram)
    * with no denominators and no cut — counts sum, so a landing
    * batch's raw counts fold in by [[mergedLmRawCounts]] and the old
    * corpus is never re-tokenized. Denominators and the minCount cut
    * are serve-time derivations ([[lmCountsFromRaw]]) over the
    * vocabulary-sized ledger, never the corpus. */
  def lmRawCounts(df: DataFrame, text: Column, n: Int): DataFrame =
    df.select(explode(lmPairs(text, n)).as("g"))
      .select(col("g.context").as("context"), col("g.word").as("word"))
      .groupBy("context", "word").agg(count(lit(1)).as("cnt_gram"))

  /** Ledger merge: per-(context, word) count sum — cost
    * O(ledger + batch), associative and replay-order-free. */
  def mergedLmRawCounts(ledger: DataFrame, batch: DataFrame): DataFrame =
    ledger.unionByName(batch)
      .groupBy("context", "word").agg(sum(col("cnt_gram")).as("cnt_gram"))

  /** Context denominators, the minCount cut and exact-ppm MLE
    * probabilities, from a raw-count ledger. The cut applies AFTER the
    * denominator sums, so probabilities are true corpus MLE values. */
  def lmCountsFromRaw(raw: DataFrame, minCount: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("context"))
    raw
      .withColumn("cnt_ctx", sum(col("cnt_gram")).over(w))
      .filter(col("cnt_gram") >= minCount)
      .withColumn("p_ppm", expr("cnt_gram * 1000000 div cnt_ctx"))
  }

  /** Integer-exact per-document CROSS-ENTROPY against a reference LM
    * — the CCNet "score against a reference model" quality gate
    * itself, not just the coverage stand-in: each n-gram site pays
    * −log₂ p(word|context) quantized to EIGHTH-bit units (the same
    * bit-length + 3-bit-mantissa construction as the BM25 idf:
    * q8 = 256·cnt_ctx div cnt_gram, then floor-log₂ from the bit
    * length — exact integers, so the DuckDB oracle replays every
    * score bit-for-bit where float `ln` would split on the last ulp).
    * Sites absent from the reference (out-of-vocabulary, or cut by
    * the LM's minCount) pay the fixed `oovBits8` backoff penalty
    * (default 256 = 32 bits ≈ p = 2⁻³²). Output per document:
    * (id, n_sites, n_oov, bits8_total, bits8_per_site) —
    * bits8_per_site/8 is the cross-entropy in bits; perplexity =
    * 2^(bits8_per_site/8). Documents with fewer than n tokens have no
    * sites and are absent (unscorable, not zero — [[lmCoverage]]'s
    * rule).
    *
    * Shape: one gram explode over the SCORED documents, one hash join
    * against the vocabulary-sized weight table, one map-side-combined
    * per-doc sum — the [[lmCoverage]] plan with a weighted payload;
    * the reference corpus is never re-read at serve time. */
  def lmCrossEntropy(df: DataFrame, id: String, text: Column,
                     lm: DataFrame, n: Int,
                     oovBits8: Long = 256L): DataFrame =
    lmCrossEntropyFromWeights(df, id, text, lmWeights(lm), n, oovBits8)

  /** The eighth-bit weight table (context, word, bits8) derived from a
    * count table — PERSIST THIS next to the LM (the BM25 df rule):
    * the quantized log and the defensive dedupe then run once per
    * refresh, and every serve is a pure join
    * ([[lmCrossEntropyFromWeights]]). The input is deduplicated BY
    * KEY ([[lmCoverage]]'s rule, which a whole-row distinct would NOT
    * honor — two conflicting rows for one gram would both survive and
    * fan the serve join out): conflicting duplicates collapse
    * deterministically to the LOWEST cost. */
  def lmWeights(lm: DataFrame): DataFrame =
    lm.select(col("context"), col("word"),
        col("cnt_gram"), col("cnt_ctx"))
      .withColumn("bits8", expr(graft.functions.Fns.bits8FromQ8Sql(
        "(cnt_ctx * CAST(256 AS BIGINT)) div cnt_gram")))
      .groupBy(col("context"), col("word"))
      .agg(min(col("bits8")).as("bits8"))

  /** [[lmCrossEntropy]] from a persisted weight table: one gram
    * explode over the scored documents, one join, one map-side-combined
    * per-doc sum — nothing derived, nothing deduplicated at serve
    * time. */
  def lmCrossEntropyFromWeights(df: DataFrame, id: String, text: Column,
                                weights: DataFrame, n: Int,
                                oovBits8: Long = 256L): DataFrame = {
    require(oovBits8 >= 0, s"oovBits8 must be >= 0, got $oovBits8")
    val sites = df.select(col(id), explode(lmPairs(text, n)).as("g"))
      .select(col(id), col("g.context").as("context"),
        col("g.word").as("word"))
    sites.join(weights.select(col("context"), col("word"), col("bits8")),
        Seq("context", "word"), "left")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_sites"),
        sum(when(col("bits8").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(coalesce(col("bits8"), lit(oovBits8))).as("bits8_total"))
      .withColumn("bits8_per_site", expr("bits8_total div n_sites"))
  }

  /** Per-document LM coverage against a reference gram table — the
    * integer-exact stand-in for perplexity filtering (CCNet's "score
    * against a reference LM" step without float logs, whose last-ulp
    * libm differences would break bit-replay): every n-gram SITE of a
    * document either appears in the reference table or is
    * out-of-vocabulary, and the seen fraction in exact ppm is the
    * quality signal. High-coverage documents read like the reference
    * corpus; low coverage flags boilerplate, other languages, or
    * garbage.
    *
    * `lm` is any (context, word) table — typically
    * [[lmConditionalCounts]] of a reference slice; it is deduplicated
    * defensively because a duplicate gram row would multiply join rows
    * and inflate BOTH counters. Documents with fewer than n tokens
    * have no sites and are absent from the output (callers treat
    * absence as unscorable, not as zero coverage).
    *
    * Shape: one gram explode, one hash join keyed (context, word) —
    * the join is corpus-sized vs vocabulary-sized, exactly a shuffle
    * join's sweet spot — and one map-side-combined per-doc count. */
  def lmCoverage(df: DataFrame, id: String, text: Column,
                 lm: DataFrame, n: Int): DataFrame = {
    val sites = df.select(col(id), explode(lmPairs(text, n)).as("g"))
      .select(col(id), col("g.context").as("context"),
        col("g.word").as("word"))
    val ref = lm.select(col("context"), col("word")).distinct()
      .withColumn("_hit", lit(1L))
    sites.join(ref, Seq("context", "word"), "left")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_sites"),
        coalesce(sum(col("_hit")), lit(0L)).as("n_seen"))
      .withColumn("coverage_ppm", expr("n_seen * 1000000 div n_sites"))
      .withColumn("oov_ppm", lit(1000000L) - col("coverage_ppm"))
  }

  /** Distribution drift between two corpus snapshots (the refresh
    * monitor: did the language/source/length mix shift?): per group,
    * the L1 distance between the two snapshots' category distributions
    * in EXACT ppm (total-variation distance = L1/2 — kept as L1 so the
    * value stays integer). A KL divergence would hang the result on
    * log()'s last ulp; L1 over integer ppm shares is bit-replayable.
    *
    * Shape: category counts and side totals are map-side-combined
    * aggregates; everything after operates on (group, category) rows —
    * sketch-sized next to the corpus. A category absent from one side
    * contributes its full share (the drift a disappearing category IS). */
  def distributionDrift(df: DataFrame, group: String, category: Column,
                        inB: Column): DataFrame = {
    val base = df.select(col(group).as("g"), category.as("cat"),
      when(inB, 1).otherwise(0).as("side"))
    val counts = base.groupBy("g", "side", "cat").agg(count(lit(1)).as("cnt"))
    val totals = counts.groupBy("g", "side").agg(sum("cnt").as("tot"))
    val p = counts.join(totals, Seq("g", "side"))
      .withColumn("p_ppm", expr("cnt * 1000000 div tot"))
    val a = p.filter(col("side") === 0)
      .select(col("g"), col("cat"), col("p_ppm").as("pa"))
    val b = p.filter(col("side") === 1)
      .select(col("g"), col("cat"), col("p_ppm").as("pb"))
    a.join(b, Seq("g", "cat"), "full_outer")
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_cats"),
        sum(abs(coalesce(col("pa"), lit(0L)) - coalesce(col("pb"), lit(0L))))
          .as("l1_drift_ppm"))
      .withColumnRenamed("g", group)
  }

  /** Cross-group duplicate-overlap matrix (the dataset-composition
    * audit: "how much of source A is copies of source B?"): for every
    * unordered group pair sharing at least one content fingerprint,
    * the number of shared fingerprints. The caller picks the
    * fingerprint column — [[TextAnalysis.fingerprint]] for literal
    * copies, a token-prefix digest for shared-opening partial dups, a
    * SimHash band for near-dups. A mixing pass reads this before
    * setting per-source rates — two heavily overlapping crawls should
    * not both enter at full weight.
    *
    * Shape: fingerprints aggregate to (fingerprint, distinct groups)
    * — map-side combined, the corpus's one wide shuffle — then pairs
    * explode only within a fingerprint's distinct-group LIST (bounded
    * by the group count, not the copy count: a fingerprint duplicated
    * a million times across 2 sources contributes ONE (a,b) row from a
    * 2-element list). */
  def groupOverlap(df: DataFrame, group: String, fp: Column): DataFrame = {
    val fps = df.select(col(group).as("g"), fp.as("fp"))
      .groupBy(col("fp"))
      .agg(array_sort(collect_set(col("g"))).as("gs"))
      .filter(size(col("gs")) >= 2)
    fps
      .select(col("fp"), explode(col("gs")).as("g_a"), col("gs"))
      .select(col("fp"), col("g_a"), explode(col("gs")).as("g_b"))
      .filter(col("g_a") < col("g_b"))
      .groupBy(col("g_a"), col("g_b"))
      .agg(count(lit(1)).as("n_shared_fps"))
  }

  /** Bloom-prefiltered contamination scan — same result as
    * [[contamination]], different scale posture. The broadcast-join
    * form ships every distinct benchmark GRAM to every executor; once
    * the eval suite grows past broadcast size (many suites × many
    * grams), that join falls back to shuffling the full training gram
    * stream. This form instead:
    *
    *   1. builds a Bloom filter over the benchmark grams (one pass on
    *      the bench side; `expectedItems`/`fpp` size it — bits, not
    *      rows, travel to executors);
    *   2. prefilters training grams through `mightContain` — a narrow
    *      map that drops the overwhelming non-contaminated majority
    *      BEFORE any shuffle;
    *   3. exact-confirms the tiny survivor set against the true gram
    *      set, so Bloom false positives never reach the result.
    *
    * Output is bit-identical to [[contamination]] — the sketch only
    * prunes, the exact join decides. Insertion order cannot change a
    * Bloom filter (bit-OR is commutative), so the prefilter is
    * deterministic across partitionings. */
  def contaminationBloom(train: DataFrame, bench: DataFrame, id: String,
                         text: Column, n: Int,
                         expectedItems: Long = 1000000L,
                         fpp: Double = 0.01): DataFrame = {
    val bg = bench.select(
        explode(wordNgramsDistinct(text, n)).as("gram"))
      .distinct()
    val bloom = bg.stat.bloomFilter("gram", expectedItems, fpp)
    val spark = train.sparkSession
    val bloomBc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((g: String) => g != null && bloomBc.value.mightContainString(g))
    val tg = train.select(col(id),
        explode(wordNgramsDistinct(text, n)).as("gram"))
      .filter(mightContain(col("gram")))
    tg.join(bg, Seq("gram")) // exact confirm: kills false positives
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_shared"))
  }
}
