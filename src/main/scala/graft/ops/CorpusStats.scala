package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level lexical statistics for training-data profiling: PMI
  * co-occurrence (collocation mining / tokenizer-merge evidence),
  * Zipf rank-frequency (distribution-health fingerprint), and Heaps
  * vocabulary growth (how fast new types appear as the corpus grows —
  * the curve that says whether more data still buys vocabulary).
  *
  * Scale shapes:
  *  - PMI pair generation is a per-document EXPRESSION (nested
  *    `transform` over token positions) — n·w pair rows map-side, one
  *    vocab²-bounded groupBy; no self-join, no shuffle of positions.
  *  - All log₂ arithmetic is the engine's eighth-bit integer idiom
  *    ([[graft.functions.Fns.bits8FromQ8Sql]]); PMI is the SIGNED SUM
  *    of per-term quantizations, so no product of counts is ever
  *    materialized — overflow-free at any corpus size (each term is
  *    ≤ 8·63), at the documented cost of ≤5/8-bit quantization error.
  *  - Zipf is one vocab-sized aggregate + a vocab-sized rank window.
  *  - Heaps needs only min(first position) per TYPE (vocab-sized
  *    shuffle) and a doc-spine cumulative window — the corpus is
  *    scanned once; no per-prefix rescan.
  *
  * Tokenization matches the engine-wide whitespace-split convention
  * (TextAnalysis / the `tok` oracle CTE: `split(text, '\s+')`).
  */
object CorpusStats {

  private def toks(textCol: Column): Column = split(textCol, "\\s+")

  /** Unordered co-occurrence pairs within `window` tokens, one row per
    * SITE: (a, b) with a ≤ b, emitted by a per-document expression —
    * for every position i, partners i+1..i+window. */
  def windowPairs(docs: DataFrame, textCol: Column, window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    val pairs =
      s"""CASE WHEN size(_t) < 2 THEN array() ELSE
         |  flatten(transform(sequence(0, size(_t) - 2), i ->
         |    transform(sequence(1, least($window, size(_t) - 1 - i)), d ->
         |      struct(least(element_at(_t, i + 1), element_at(_t, i + 1 + d)) AS a,
         |             greatest(element_at(_t, i + 1), element_at(_t, i + 1 + d)) AS b))))
         |END""".stripMargin
    docs.select(toks(textCol).as("_t"))
      .select(explode(expr(pairs)).as("_p"))
      .select(col("_p.a").as("a"), col("_p.b").as("b"))
  }

  /** Windowed PMI table: (a, b, c_ab, pmi_bits8) for unordered token
    * pairs with c_ab ≥ minCount.
    *
    * pmi_bits8 ≈ 8·log₂( (c_ab/P) / ((c_a/T)·(c_b/T)) ) computed as
    * the SIGNED SUM of eighth-bit quantizations
    * L(c_ab) + 2·L(T) − L(P) − L(c_a) − L(c_b), L(x) = bits8(256·x):
    * exact integers end to end, defined at any corpus size. c_a/c_b
    * are corpus unigram counts, T total tokens, P total pair sites. */
  def pmi(docs: DataFrame, textCol: Column, window: Int,
          minCount: Long = 1L): DataFrame =
    pmiFromCounts(unigramCounts(docs, textCol),
      pairCounts(docs, textCol, window), minCount)

  /** Corpus unigram counts (t, c) — the PMI marginal state. Plain sums,
    * so two count tables MERGE exactly ([[mergeCounts]]): the ledger
    * form of co-occurrence statistics. */
  def unigramCounts(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(toks(textCol)).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))

  /** Windowed pair counts (a, b, c_ab) — vocab²-bounded, sum-mergeable
    * like [[unigramCounts]]. */
  def pairCounts(docs: DataFrame, textCol: Column, window: Int): DataFrame =
    windowPairs(docs, textCol, window)
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))

  /** Merge two count tables by summing over `keys` — associative and
    * commutative, so ledger ⊕ batch equals the whole-corpus count
    * table EXACTLY under any batching (the q152/q177 mergeable-ledger
    * contract, here for co-occurrence state). */
  def mergeCounts(x: DataFrame, y: DataFrame, keys: Seq[String],
                  countCol: String): DataFrame =
    x.unionByName(y).groupBy(keys.map(col): _*)
      .agg(sum(col(countCol)).as(countCol))

  /** PMI scored from count TABLES (the serve path over persisted
    * ledgers — no corpus access): totals re-aggregate the inputs. */
  def pmiFromCounts(uni: DataFrame, pairs: DataFrame,
                    minCount: Long = 1L): DataFrame = {
    val l = (x: String) =>
      expr(graft.functions.Fns.bits8FromQ8Sql(s"($x) * CAST(256 AS BIGINT)"))
    val totals = uni.agg(sum(col("c")).as("T")).withColumn("lT", l("T"))
    val pTotal = pairs.agg(sum(col("c_ab")).as("P")).withColumn("lP", l("P"))
    pairs.filter(col("c_ab") >= minCount)
      .join(uni.select(col("t").as("a"), col("c").as("c_a")), Seq("a"))
      .join(uni.select(col("t").as("b"), col("c").as("c_b")), Seq("b"))
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(pTotal))
      .withColumn("pmi_bits8",
        l("c_ab") + lit(2L) * col("lT") - col("lP") - l("c_a") - l("c_b"))
      .select(col("a"), col("b"), col("c_ab"), col("pmi_bits8"))
  }

  /** Zipf rank-frequency table: (rank, token, freq, rf) with rank by
    * (freq desc, token asc) and rf = rank·freq — the product Zipf's
    * law predicts near-constant; its drift across ranks is the
    * distribution-health signal. Vocab-sized end to end. */
  def zipf(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(toks(textCol)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("freq").desc, col("token").asc)).cast("long"))
      .withColumn("rf", col("rank") * col("freq"))
      .select(col("rank"), col("token"), col("freq"), col("rf"))

  /** Per-source lexical drift: the plug-in KL divergence of each
    * source's token distribution from the corpus-wide one, in
    * eighth-bit integers — the "which source stopped looking like the
    * corpus" gate a mixing pipeline runs before re-weighting.
    *
    * KL(Pₛ‖Q) = Σₜ pₜ·log₂(pₜ/qₜ) with pₜ = cₛ(t)/Tₛ, qₜ = c(t)/T.
    * Each token's log factors additively through the engine's
    * eighth-bit idiom — cₛ(t)·(L(cₛ)+L(T)−L(c)−L(Tₛ)), L(x)=⌊8·log₂ x⌋
    * via bit length — so no count PRODUCT is ever formed: every term
    * is ≤ 8·63 and the per-source sum is ≤ 512·Tₛ, overflow-free at
    * any corpus size (per-token terms can be negative; the quantized
    * total can dip slightly below the true KL's ≥ 0). ONE corpus
    * explode: the global counts re-aggregate the per-source table.
    * Output: (source, n_tokens, kl8_sum, kl8_per_mtok) — kl8_per_mtok
    * = kl8_sum·10⁶ div n_tokens (eighth-bits per million tokens; at
    * Tₛ beyond ~10¹² report kl8_sum div (n_tokens div 10⁶) instead to
    * keep the product under 2⁶³). */
  def sourceDivergence(docs: DataFrame, sourceCol: Column,
                       textCol: Column): DataFrame =
    sourceDivergenceFromCounts(docs
      .select(sourceCol.as("source"), explode(toks(textCol)).as("t"))
      .groupBy(col("source"), col("t")).agg(count(lit(1)).as("c_s")))

  /** [[sourceDivergence]] served from the PERSISTED per-(source,
    * token) count ledger — the sum-mergeable table [[mergeCounts]]
    * maintains incrementally — so the KL gate never re-explodes the
    * corpus: its cost is ledger-sized (Σ per-source vocabularies),
    * the release-manifest / drift-dashboard serve path. `counts` is
    * (source, t, c_s). */
  def sourceDivergenceFromCounts(counts: DataFrame): DataFrame = {
    val l = (x: String) =>
      expr(graft.functions.Fns.bits8FromQ8Sql(s"($x) * CAST(256 AS BIGINT)"))
    val bySrc = counts.select(col("source"), col("t"), col("c_s"))
    val global = bySrc.groupBy(col("t")).agg(sum(col("c_s")).as("c"))
    val srcTot = bySrc.groupBy(col("source")).agg(sum(col("c_s")).as("ts"))
    val tot = global.agg(sum(col("c")).as("tt"))
    bySrc
      .join(global, Seq("t"))
      .join(broadcast(srcTot), Seq("source"))
      .crossJoin(broadcast(tot))
      .withColumn("contrib",
        col("c_s") * (l("c_s") + l("tt") - l("c") - l("ts")))
      .groupBy(col("source"))
      .agg(max(col("ts")).as("n_tokens"),
        sum(col("contrib")).as("kl8_sum"))
      .withColumn("kl8_per_mtok",
        expr("kl8_sum * 1000000 div n_tokens"))
  }

  /** Heaps vocabulary-growth curve in corpus order `orderCol` (must be
    * unique per doc): one row per spine point —
    * (ord, n_docs, cum_tokens, vocab) where vocab counts the types
    * whose FIRST occurrence is at or before that point. The corpus is
    * read once: type → first doc is a vocab-sized aggregate; the curve
    * is a spine window over per-doc aggregates. `bucket` coarsens the
    * spine (ord div bucket) BEFORE the cumulative window — at corpus
    * scale the curve is sampled every 10⁶ docs, keeping the single
    * global window spine-sized instead of corpus-sized; bucket = 1
    * keeps the exact per-document curve. */
  def heapsCurve(docs: DataFrame, orderCol: Column, textCol: Column,
                 bucket: Long = 1L): DataFrame = {
    require(bucket >= 1, s"bucket must be >= 1: $bucket")
    // integer `div` (not double `/` — exact at any ord magnitude)
    def ordB(d: DataFrame): DataFrame =
      d.withColumn("ord", expr(s"_ord div ${bucket}L")).drop("_ord")
    val perDoc = ordB(
        docs.select(orderCol.cast("long").as("_ord"), toks(textCol).as("_t")))
      .groupBy(col("ord"))
      .agg(count(lit(1)).as("docs_in"), sum(size(col("_t"))).as("n_tok"))
    val firstOcc = ordB(
        docs.select(orderCol.cast("long").as("_ord"),
          explode(toks(textCol)).as("t")))
      .groupBy(col("t")).agg(min(col("ord")).as("first_ord"))
      .groupBy(col("first_ord")).agg(count(lit(1)).as("new_types"))
    val w = Window.orderBy(col("ord"))
    perDoc
      .join(firstOcc.withColumnRenamed("first_ord", "ord"), Seq("ord"), "left")
      .withColumn("new_types", coalesce(col("new_types"), lit(0L)))
      .withColumn("n_docs", sum(col("docs_in")).over(w).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tok")).over(w).cast("long"))
      .withColumn("vocab", sum(col("new_types")).over(w).cast("long"))
      .select(col("ord"), col("n_docs"), col("cum_tokens"), col("vocab"))
  }
}
