package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token statistics, quality scoring, n-gram-heuristic language ID and
  * document fingerprinting.
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions`
  * (split / filter / transform / aggregate) — no UDFs — so a 100 TB
  * documents table streams through whole-stage codegen with map-side
  * partial aggregation and zero shuffles for the per-document columns.
  */
object TextAnalysis {

  /** HTML → text extraction (the Common-Crawl-style ingest stage that
    * precedes every other text signal): drops `<script>`/`<style>`
    * blocks WITH their contents, strips remaining tags, unescapes the
    * common entities (`&amp;` last, so `&amp;lt;` round-trips as the
    * literal `&lt;`), and collapses whitespace. Pure per-row regex /
    * replace chain — codegen'd, zero shuffle, scan-speed at 100 TB —
    * and every step has an exact DuckDB counterpart (RE2-compatible
    * patterns: no backreferences, inline `(?is)` flags only), so the
    * q111 oracle replays it byte-for-byte. Real-world HTML boilerplate
    * removal (trafilatura-class DOM scoring) plugs in ABOVE this as a
    * better extractor; this is the portable, deterministic baseline. */
  def extractHtmlText(html: Column): Column = {
    // ONE pass, per-tag pairing preserved as alternation branches (not
    // <(script|style)>.*?</(script|style)>, whose unanchored pairing
    // lets '<script>…</style>' match and an unclosed script swallow
    // content up to an unrelated closing tag). Each branch pairs its
    // own open/close tag; both Java regex and RE2 (the DuckDB oracle)
    // resolve alternation leftmost-first, so parity holds. Two
    // sequential passes cost a second full-text scan for nothing
    // (r7 measured it: 0.14 -> 0.82 s on q111).
    val noBlocks = regexp_replace(html,
      "(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noBlocks, "(?s)<[^>]+>", " ")
    val unescaped = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, ch)) => replace(c, lit(e), lit(ch)) }
    // explicit whitespace class: Java \s and RE2 (DuckDB oracle) \s
    // disagree on \x0B, so neither side may use the shorthand
    trim(regexp_replace(unescaped, "[ \\t\\n\\f\\r\\x0B]+", " "))
  }

  /** Whitespace tokenization (the BPE-ish regex variant is `tokensBy`). */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** Tokenize on a caller-supplied regex, e.g. a BPE-ish
    * word/number/punct splitter. */
  def tokensBy(text: Column, pattern: String): Column = split(text, pattern)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Language-ID stopword profiles (tiny n-gram heuristic: a document's
    * language is argmax over per-language stopword hit counts). */
  val StopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "los", "del", "se", "las"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "une"),
    "de" -> Seq("der", "die", "und", "das", "den", "von", "zu", "mit", "sich", "auf"))

  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Per-document quality stats: char/token counts, average token
    * length, punctuation ratio, English-stopword ratio. All ratios are
    * exact int/int double divisions (engine-portable bit-for-bit). */
  def qualityStats(df: DataFrame, text: Column): DataFrame = {
    val toks = tokens(lower(text))
    df.withColumn("n_chars_q", length(text))
      .withColumn("n_tokens", size(toks))
      .withColumn("avg_token_len",
        aggregate(transform(toks, t => length(t)), lit(0), (acc, x) => acc + x)
          .cast("double") / size(toks))
      .withColumn("punct_ratio",
        length(regexp_replace(text, "[a-zA-Z0-9 ]", "")).cast("double") / length(text))
      .withColumn("stopword_ratio",
        stopwordHits(toks, StopwordProfiles.head._2).cast("double") / size(toks))
  }

  /** Language ID: per-profile hit counts + argmax with a fixed
    * profile-order tie-break; 'unknown' when nothing hits. */
  def langId(df: DataFrame, text: Column): DataFrame = {
    val toks = tokens(lower(text))
    val scored = StopwordProfiles.foldLeft(df) { case (d, (lang, words)) =>
      d.withColumn(s"score_$lang", stopwordHits(toks, words))
    }
    val scores = StopwordProfiles.map { case (lang, _) => col(s"score_$lang") }
    val pred = StopwordProfiles.zipWithIndex.foldRight(lit("unknown")) {
      case (((lang, _), i), acc) =>
        val c = col(s"score_$lang")
        val beatsAll = scores.zipWithIndex.collect { case (s, j) if j != i =>
          if (j < i) c > s else c >= s
        }.reduceOption(_ && _).getOrElse(lit(true))
        when(c > 0 && beatsAll, lit(lang)).otherwise(acc)
    }
    scored.withColumn("lang_pred", pred)
  }

  /** Document fingerprint: md5 of the normalized text (lowercase, strip
    * non-alphanumerics, collapse whitespace). Exact-dedup key robust to
    * formatting/casing jitter. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " ")))

  /** BPE-granularity tokenization (GPT-2-style pre-tokenizer shape,
    * without the learned merges): letter runs, single digits and single
    * punctuation marks each count as one token. The merge table is a
    * model artifact; this regex reproduces the pre-merge token COUNT
    * scale that corpus budgeting actually needs. */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  def bpeTokenCount(text: Column): Column =
    size(bpeTokens(text)).cast("bigint")

  /** Winnowing document fingerprints (the standard public scheme behind
    * MOSS: Schleimer/Wilkerson/Aiken, SIGMOD'03): hash every char
    * k-gram IN ORDER, slide a window of `w` consecutive hashes, keep
    * each window's minimum, dedupe. Guarantees any match of length
    * ≥ w+k-1 shares a fingerprint — the rolling-hash selection that
    * keeps per-doc fingerprint count ~n/w instead of n.
    *
    * All arrays are let-bound (singleton-array transform) so the k-gram
    * hash array computes once per document, not once per window. Hashes
    * are md5-derived 32-bit ([[ApproxDedup.hash32]]) — engine-portable,
    * no JVM hashCode. */
  def winnow(text: Column, k: Int, w: Int): Column =
    call_function("winnow_fps", text, lit(k), lit(w))

  /** The composable higher-order-function form of [[winnow]] — kept as
    * the portable reference implementation (works without the session
    * extensions) and WinnowSpec's equivalence baseline; [[winnow]]'s
    * native kernel ([[graft.plans.WinnowFingerprints]]) replaces the
    * per-gram md5→hex→conv expression chain and per-window
    * slice+array_min with one fused pass. */
  def winnowHof(text: Column, k: Int, w: Int): Column = {
    val grams = transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => ApproxDedup.hash32(text.substr(i, lit(k))))
    element_at(
      transform(array(grams), hs =>
        array_distinct(transform(
          sequence(lit(1), greatest(size(hs) - (w - 1), lit(1))),
          j => array_min(slice(hs, j, lit(w)))))),
      1)
  }

  /** Top-`v` corpus vocabulary by token frequency — the tokenizer-
    * training precursor (counts feed BPE/unigram trainers; the top-V
    * word list itself is the classic closed-vocab baseline). Ties
    * break by the token string, so the cut is total and engine-
    * portable. One map-side-combined aggregation on the token, then a
    * global top-V — the only global step moves V rows, not the corpus.
    * Output: (token, cnt, rank), rank 1-based. */
  def vocabulary(df: DataFrame, text: Column, v: Int): DataFrame = {
    val counts = df.select(explode(tokens(text)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    // top-V via sort+limit (Spark plans TakeOrderedAndProject — a
    // per-partition heap + single merge, not a global sort)
    val top = counts.orderBy(col("cnt").desc, col("token")).limit(v)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("token"))
    // the rank window runs over V rows only (post-limit), so the
    // single-partition window is bounded by the vocab size, not data
    top.withColumn("rank", row_number().over(w).cast("bigint"))
  }

  /** Corpus heavy hitters: every token occurring at least `minCount`
    * times, with its exact count. The exact form is one
    * map-side-combined groupBy; this form cuts the shuffle with a
    * count-min sketch (Cormode/Muthukrishnan 2005) built in one pass:
    * CMS estimates NEVER undercount, so `estimate >= minCount` keeps a
    * superset of the true heavy hitters — the narrow prefilter drops
    * the long tail (the overwhelming majority of distinct tokens)
    * before the exact groupBy confirms survivors. Bit-identical to the
    * exact form: the sketch only prunes, the exact count decides.
    * Deterministic: CMS counter merges are commutative sums, and the
    * hash seed is fixed. */
  def heavyHitters(df: DataFrame, text: Column, minCount: Long,
                   eps: Double = 0.001, confidence: Double = 0.99): DataFrame = {
    val toks = df.select(explode(tokens(text)).as("token"))
    val cms = toks.stat.countMinSketch("token", eps, confidence, seed = 42)
    val spark = df.sparkSession
    val cmsBc = spark.sparkContext.broadcast(cms)
    val maybeHeavy = udf((t: String) =>
      t != null && cmsBc.value.estimateCount(t) >= minCount)
    toks.filter(maybeHeavy(col("token")))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount) // exact confirm: kills overcounts
  }

  /** BPE merge-pair statistics — the inner computation of one BPE
    * training iteration (Sennrich et al. 2016): count every ADJACENT
    * character pair across the corpus, weighting each distinct token's
    * pairs by the token's corpus frequency; the argmax pair is the
    * next merge. Runs over the token-frequency DICTIONARY, not the
    * corpus — after the one corpus-wide token count, the pair explode
    * touches |vocab| rows regardless of corpus size (the property that
    * makes BPE training tractable at 100 TB). */
  def bpeMergePairs(df: DataFrame, text: Column, minWeight: Long): DataFrame = {
    val counts = df.select(explode(tokens(text)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    counts
      .select(col("cnt"), explode(transform(
        sequence(lit(1), greatest(length(col("token")) - 1, lit(1))),
        i => col("token").substr(i, lit(2)))).as("pair"))
      .filter(length(col("pair")) === 2) // 1-char tokens contribute none
      .groupBy("pair").agg(sum(col("cnt")).as("weight"))
      .filter(col("weight") >= minWeight)
  }

  /** Per-document out-of-vocabulary rate against a vocabulary built by
    * [[vocabulary]] (or any (token) set): total tokens, OOV tokens and
    * the exact ppm rate (integer-derived, bit-portable). The vocab is
    * broadcast — V rows by construction — so the token stream joins
    * map-side with zero shuffle on the corpus side beyond the per-doc
    * re-aggregation. */
  def oovRate(df: DataFrame, id: String, text: Column,
              vocab: DataFrame): DataFrame = {
    val toksOf = df.select(col(id), explode(tokens(text)).as("token"))
    toksOf
      .join(broadcast(vocab.select(col("token"), lit(1).as("in_v"))),
        Seq("token"), "left")
      .groupBy(col(id))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      // `div`, not `/`: column / is double division — ppm must stay
      // integer-exact for the oracle (DuckDB `//`)
      .withColumn("oov_ppm", expr("n_oov * 1000000 div n_tokens"))
  }

  /** Model-based quality scoring — the fasttext-classifier filtering
    * step of the CCNet/GPT-3-style cleaning pipelines, reduced to its
    * distributed essence: a LINEAR model over unigram features, the
    * model a broadcast (term, w_fp) table of fixed-point micro-unit
    * weights. score = Σ w(term) over the document's tokens + bias;
    * label = keep iff score >= 0 (the raw margin thresholds directly —
    * the sigmoid is monotone, so applying it would change no
    * decision but would cost bit-portability).
    *
    * Distributed shape: tokenize-explode → LEFT join the broadcast
    * model (weights ride along, misses stay for the token count) →
    * one map-side-combined groupBy(id). No collect, no UDF; the model
    * table is the only state, swappable per corpus. `split` always
    * yields at least [""], so every input document emits a row even
    * with zero vocabulary hits (margin = bias).
    *
    * Output: (id, n_hits, margin_fp, label). */
  def linearScore(df: DataFrame, id: String, text: Column,
                  model: DataFrame, biasFp: Long): DataFrame =
    df.select(col(id), explode(tokens(lower(text))).as("term"))
      .join(broadcast(model.select(col("term"), col("w_fp"))), Seq("term"), "left")
      .groupBy(col(id))
      .agg(sum(when(col("w_fp").isNotNull, 1L).otherwise(0L)).as("n_hits"),
        (sum(coalesce(col("w_fp"), lit(0L))) + biasFp).as("margin_fp"))
      .withColumn("label",
        when(col("margin_fp") >= 0, lit("keep")).otherwise(lit("drop")))

  /** A frozen demonstration model for [[linearScore]] (micro-unit
    * weights): structure/content terms vote keep, degradation markers
    * ("slow", "dup", filler) vote drop. A production pipeline trains
    * these weights offline (logistic regression over labeled pages)
    * and ships them as exactly this table shape. */
  val QualityModel: Seq[(String, Long)] = Seq(
    "join" -> 40000L, "hash" -> 35000L, "scan" -> 30000L,
    "filter" -> 30000L, "merge" -> 25000L, "vector" -> 25000L,
    "query" -> 20000L, "table" -> 20000L, "stream" -> 15000L,
    "window" -> 15000L, "slow" -> -60000L, "dup" -> -120000L,
    "big" -> -20000L, "small" -> -20000L, "a" -> -10000L,
    "the" -> -10000L)
}
