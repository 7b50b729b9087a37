package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-curation passes a training-data pipeline runs after the
  * quality/dedup stages ([[CorpusSignals]], [[ApproxDedup]]): PII
  * scrubbing, deterministic train/val/test splitting, hash-based
  * stratified sampling (dataset mixing), sequence packing, and
  * cross-document span statistics.
  *
  * Scale design: every pass is either a narrow map (PII, splitting,
  * sampling — zero shuffle, runs at scan speed) or one map-side-combined
  * aggregation keyed by document or gram. Sequence packing is the one
  * inherently sequential pass — it windows per source shard, never
  * globally, so each shard packs independently exactly as a sharded
  * tokenizer job would.
  *
  * All decisions are hash-derived (md5-prefix buckets, the engine's
  * portable-hash idiom), never RNG-derived: re-running the pipeline on
  * a grown corpus keeps every previous assignment stable, which is what
  * makes incremental corpus refreshes reproducible.
  */
object Curation {

  // Conservative, RE2-compatible PII patterns (no backrefs, no
  // lookarounds — they must behave identically under Java regex and
  // any engine a downstream consumer swaps in).
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** The redaction expression alone (composable into pipelines): each
    * PII class replaced by a typed placeholder. Email runs first so its
    * digits can't be re-matched as phone fragments; phone before IP for
    * the same reason. */
  def scrubText(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** Per-document PII signals and the scrubbed text: counts of email /
    * IPv4 / US-phone matches plus [[scrubText]]'s redaction. Pure
    * per-row expressions — zero shuffle. */
  def piiScrub(df: DataFrame, id: String, text: Column): DataFrame = {
    val nEmail = size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("bigint")
    val nIp = size(regexp_extract_all(text, lit(Ipv4Re), lit(0))).cast("bigint")
    val nPhone = size(regexp_extract_all(text, lit(PhoneRe), lit(0))).cast("bigint")
    val scrubbed = scrubText(text)
    df.select(col(id),
      nEmail.as("n_email"), nPhone.as("n_phone"), nIp.as("n_ip"),
      (nEmail + nIp + nPhone > 0).as("has_pii"),
      scrubbed.as("scrubbed"))
  }

  /** Deterministic bucket in [0, buckets) from the md5 prefix of the
    * salted key — the engine's portable-hash idiom (stable across
    * engines, JVMs, and corpus growth). Salting decorrelates
    * independent decisions (split vs sample) made on the same key. */
  def hashBucket(key: Column, salt: String, buckets: Int): Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 8), 16, 10)
      .cast("bigint") % buckets

  /** Train/val/test assignment by hash bucket: the two fractions are
    * expressed per myriad (out of 10000). Hash-based, so adding
    * documents later never reassigns an existing one — the property
    * that keeps eval sets uncontaminated across corpus refreshes. */
  def assignSplit(df: DataFrame, id: String,
                  testPerMyriad: Int, valPerMyriad: Int): DataFrame = {
    val b = hashBucket(col(id), "split:", 10000)
    df.withColumn("split",
      when(b < testPerMyriad, "test")
        .when(b < testPerMyriad + valPerMyriad, "val")
        .otherwise("train"))
  }

  /** Hash-threshold sampling at a per-row rate in [0, 1] (dataset
    * mixing: pass a CASE over the source column as `rate`). Keeps a row
    * when its bucket falls below rate×10000 — deterministic, exact in
    * expectation, stable under corpus growth. Narrow filter, pushes
    * down to the scan. */
  def sampleByRate(df: DataFrame, id: String, rate: Column): DataFrame =
    // floor()+cast, not a bare cast: DuckDB's double->int cast ROUNDS
    // while Spark's truncates — the repo-wide oracle-parity rule
    df.filter(hashBucket(col(id), "sample:", 10000) <
      floor(rate * 10000).cast("bigint"))

  /** Temperature-scaled sampling mix (α = 1/2) — the standard
    * multilingual/multi-domain rebalance (mC4/XLM-R style): a group's
    * sampling weight is its size^α, flattening the head so low-resource
    * groups are upsampled relative to proportional sampling while
    * ordering is preserved. Engine-portable determinism: sqrt is the
    * ONE floating step (IEEE-exact in every correctly-rounded libm,
    * unlike ln/pow), immediately floored into integer µ-units, so the
    * normalization Σw and both quotients are exact integer arithmetic —
    * no cross-partition double-sum ordering anywhere.
    *
    * Returns one row per group: total size, sampling rate in
    * myriads (per-10000) and the group's share of `budget`.
    * Long-range note: w = floor(sqrt(size)·1e6), so budget·w stays
    * inside int64 only while w ≤ Long.MaxValue/budget — per-group size
    * ≤ (Long.MaxValue/(budget·1e6))², which at a million-token budget
    * is ~85 teratokens per group (NOT petatokens — Spark's non-ANSI
    * mode would wrap silently past that). A per-row guard raises
    * loudly at the bound; a larger deployment drops the µ-scale to 1e3
    * or lifts the products to decimal(38,0). */
  def temperatureMix(df: DataFrame, groupCols: Seq[String],
                     sizeExpr: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    // overflow guard on the weight itself, BEFORE any product reads it:
    // budget and the myriad scale are plan-time constants, so the
    // largest safe w is too. A group past it must fail with THIS error
    // on every engine config — non-ANSI multiply wraps silently, and
    // ANSI's generic ARITHMETIC_OVERFLOW fires from whichever product
    // column happens to evaluate first, naming neither the group nor
    // the remedy.
    val maxW = Long.MaxValue / math.max(budget, 10000L)
    val per = df.groupBy(groupCols.map(col): _*)
      .agg(sum(sizeExpr.cast("bigint")).as("total_tokens"))
      .withColumn("w", floor(sqrt(col("total_tokens")) * 1e6).cast("bigint"))
      .withColumn("w", expr(s"CASE WHEN w > ${maxW}L THEN raise_error(" +
        "'temperatureMix: group weight overflows int64 at this budget " +
        "- drop the u-scale or lift to decimal') ELSE w END"))
      // one row per group: materialize so the normalizer and the final
      // select both read it — without this, `tot` re-derives the whole
      // upstream aggregate and the corpus is scanned twice
      .localCheckpoint()
    val tot = per.agg(sum("w").as("w_sum"))
    // fail fast on a degenerate corpus (every group's weight floored
    // to 0, or all sizes NULL): `div` would silently emit NULL rates
    // where a SQL replay errors on the zero division — surface it as
    // an error on BOTH engines instead of an engine-parity split
    val guarded = "CASE WHEN w_sum IS NULL OR w_sum <= 0 THEN " +
      "raise_error('temperatureMix: total weight is zero') ELSE w_sum END"
    per.crossJoin(broadcast(tot)) // 1-row total: broadcast by contract
      .select(groupCols.map(col) :+ col("total_tokens") :+
        expr(s"(w * 10000) div ($guarded)").as("rate_myriad") :+
        expr(s"(${budget}L * w) div ($guarded)").as("budget_tokens"): _*)
  }

  /** Budget-driven dataset mixing: derive each group's sampling rate
    * FROM a per-group weight budget (tokens, chars, bytes — whatever
    * `weight` measures) instead of hand-tuning rates. A pretraining mix
    * is specified this way in practice: "at most B tokens from each
    * source". rate = min(1, budget/total) in integer per-myriad
    * arithmetic (floor division — bit-replayable, no float drift), then
    * the usual stable hash-threshold keep. Groups under budget pass
    * through whole.
    *
    * Shape: one map-side-combined aggregate for the per-group totals
    * (tiny — one row per group, broadcast back), then the narrow
    * hash-threshold filter; the corpus never shuffles. Hash-derived,
    * so refreshing the corpus never flips an existing row's decision
    * (beyond the rate shift the new totals imply). */
  def sampleToBudget(df: DataFrame, id: String, groupCols: Seq[String],
                     weight: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val groups = groupCols.map(col)
    val totals = df.groupBy(groups: _*)
      .agg(sum(weight.cast("bigint")).as("_total"))
      .withColumn("rate_myriad",
        least(lit(10000L), expr(s"(${budget}L * 10000) div _total")))
      .drop("_total")
    df.join(broadcast(totals), groupCols)
      .filter(hashBucket(col(id), "sample:", 10000) < col("rate_myriad"))
  }

  /** Concat-and-chunk sequence packing: documents stream in (shard,
    * id) order into fixed `seqTokens`-token training sequences; each
    * document reports its token offset and the first/last sequence it
    * lands in. The cumulative sum windows per shard-key tuple — shards
    * pack independently (this is how a sharded tokenizer job behaves),
    * so no global single-partition window exists at any scale. Shard
    * columns stay real columns (never string-encoded keys — a '/' or a
    * null in a value would corrupt a re-parsed encoding). */
  def packSequences(df: DataFrame, id: String, shardCols: Seq[String],
                    nTokens: Column, seqTokens: Int): DataFrame = {
    val shards = shardCols.map(col)
    val w = Window.partitionBy(shards: _*).orderBy(col(id))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(id) +: shards :+ nTokens.cast("bigint").as("n_tokens"): _*)
      .withColumn("token_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("first_seq", expr(s"token_offset div $seqTokens"))
      .withColumn("last_seq",
        expr(s"(token_offset + n_tokens - 1) div $seqTokens"))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + 1L)
  }

  /** Single-shard-column convenience form of [[packSequences]]. */
  def packSequences(df: DataFrame, id: String, shard: String,
                    nTokens: Column, seqTokens: Int): DataFrame =
    packSequences(df, id, Seq(shard), nTokens, seqTokens)

  /** Deterministic corpus shuffle for training-order serving: each row
    * lands in a hash-assigned shard and gets a dense 1-based position
    * from a second, independent hash order (ties broken by id — total
    * order). Reproducible end to end: re-running on the same corpus
    * yields byte-identical serving order, and the position window runs
    * per shard (shards are the parallelism unit — no global sort). */
  def shardShuffle(df: DataFrame, id: String, shards: Int): DataFrame = {
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("_ord"), col(id))
    df.withColumn("shard", hashBucket(col(id), "shard:", shards))
      .withColumn("_ord", md5(concat(lit("order:"), col(id).cast("string"))))
      .withColumn("pos", row_number().over(w).cast("bigint"))
      .drop("_ord")
  }

  /** Hashing-trick feature vectorization (the fixed-dimension sparse
    * encoding behind fastText-style corpus quality classifiers): every
    * token hashes into one of `dim` buckets; output is the sparse
    * (id, bucket, cnt) count vector. One map-side-combined aggregation,
    * dimensionality fixed regardless of vocabulary size — the property
    * that lets a scorer run before any vocabulary exists. */
  def hashedFeatures(df: DataFrame, id: String, text: Column,
                     dim: Int): DataFrame =
    df.select(col(id), explode(split(text, "\\s+")).as("_tok"))
      .select(col(id), (ApproxDedup.hash32(col("_tok")) % dim).as("bucket"))
      .groupBy(col(id), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Linear scorer over hashed features with a weight per bucket —
    * the serving half of a hashed classifier (weights normally come
    * from training; callers pass any bucket→weight expression). Score
    * is Σ cnt×w(bucket): with integer weights the sum is exact and
    * order-independent at any partitioning. */
  def linearScore(features: DataFrame, id: String,
                  weight: Column => Column): DataFrame =
    features
      .withColumn("_w", weight(col("bucket")))
      .groupBy(col(id))
      .agg(sum(col("cnt") * col("_w")).cast("bigint").as("score"))

  /** DSIR-style importance weights for data selection (Xie et al.
    * 2023 shape, integer-exact variant): score every document by how
    * much its unigram profile resembles a target subset versus the
    * whole corpus. Per token, the add-one-smoothed ratio
    * (target-df + 1)/(corpus-df + 1) scaled to parts-per-million and
    * floored; per document, the tf-weighted SUM of those integer
    * ratios. All arithmetic is exact bigint (multiply before the
    * integral `div`, never a double), so the sum is order-independent
    * — the property that lets a SQL oracle replay it bit-for-bit AND
    * makes the score stable across partitionings at any scale. Two
    * map-side-combined aggregations (term df, per-doc sum) and one
    * gram-keyed join — linear, no all-pairs anything. */
  def importanceWeights(df: DataFrame, id: String, text: Column,
                        isTarget: Column): DataFrame =
    importanceWeightsScoped(df, id, text, isTarget).df

  /** [[importanceWeights]] with an ownable cache lifetime
    * ([[ApproxDedup.Scoped]]): release() drops the per-(doc,term)
    * frequency cache once the result is materialized. */
  def importanceWeightsScoped(df: DataFrame, id: String, text: Column,
                              isTarget: Column): ApproxDedup.Scoped = {
    val terms = df.select(col(id), isTarget.as("_tgt"),
        explode(split(text, "\\s+")).as("term"))
    // tf feeds two branches (dfreq + the join-back); persist it so the
    // corpus scan + explode + aggregation doesn't re-run per branch
    val tf = terms.groupBy(col(id), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("_tgt")).as("_tgt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("bdf"),
        sum(when(col("_tgt"), 1L).otherwise(0L)).as("tdf"))
    val out = tf.join(dfreq, Seq("term"))
      .groupBy(col(id))
      .agg(sum(expr("(1000000 * tf * (tdf + 1)) div (bdf + 1)"))
        .cast("bigint").as("weight"))
    ApproxDedup.Scoped(out, () => { tf.unpersist(); () })
  }

  /** Cross-document span statistics: per document, how many of its
    * distinct word `n`-grams also occur in at least one OTHER document
    * (the signal behind exact-substring train-set dedup). Gram
    * df-counting is one map-side-combined aggregation on the gram key;
    * the join back ships only grams with df ≥ 2. */
  def crossDocSpans(df: DataFrame, id: String, text: Column, n: Int): DataFrame =
    crossDocSpansScoped(df, id, text, n).df

  /** [[crossDocSpans]] with an ownable cache lifetime
    * ([[ApproxDedup.Scoped]]): release() drops the gram-table cache
    * once the result is materialized. */
  def crossDocSpansScoped(df: DataFrame, id: String, text: Column,
                          n: Int): ApproxDedup.Scoped = {
    // wordNgramsDistinct (empty for sub-n docs), matching the SQL
    // replay; the gram table feeds two branches (df-count + tag-back),
    // so persist it — tokenize+ngram is the dominant cost and would
    // otherwise run once per branch
    val grams = df
      .select(col(id), explode(CorpusSignals.wordNgramsDistinct(text, n)).as("gram"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val shared = grams.groupBy(col("gram"))
      .agg(countDistinct(col(id)).as("gdocs"))
      .filter(col("gdocs") >= 2)
      .select(col("gram"), lit(1).as("_shared"))
    // one aggregation does both totals: count(*) for all grams,
    // count(_shared) for the left-join hits only
    val out = grams.join(shared, Seq("gram"), "left")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_grams"), count(col("_shared")).as("n_shared_grams"))
      .select(col(id), col("n_grams"), col("n_shared_grams"),
        (col("n_shared_grams").cast("double") / col("n_grams")).as("shared_frac"))
    ApproxDedup.Scoped(out, () => { grams.unpersist(); () })
  }

  /** Sliding-window document chunking (the long-document → context-
    * window pass: RAG indexing and long-doc training prep both cut
    * documents into overlapping `window`-token chunks every `stride`
    * tokens). Chunk c covers tokens [c·stride+1, c·stride+window]; the
    * last chunk may be short; a sub-window document yields exactly one
    * chunk. Pure narrow map + explode — zero shuffle, scan-speed, and
    * the token array is let-bound so it splits once per document, not
    * once per chunk. */
  def chunkWindows(df: DataFrame, id: String, text: Column,
                   window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    df.select(col(id), split(text, "\\s+").as("_ws"))
      .withColumn("_n", size(col("_ws")))
      // last chunk id: 0 when the doc fits one window, else
      // ceil((n - window) / stride) in integer arithmetic
      .withColumn("chunk_id",
        explode(sequence(lit(0), when(col("_n") <= window, lit(0))
          .otherwise(expr(s"(_n - $window + ${stride - 1}) div $stride")))))
      .select(col(id), col("chunk_id").cast("bigint").as("chunk_id"),
        concat_ws(" ", slice(col("_ws"),
          col("chunk_id") * stride + 1, lit(window))).as("chunk_text"),
        size(slice(col("_ws"), col("chunk_id") * stride + 1, lit(window)))
          .cast("bigint").as("chunk_tokens"))
  }

  /** Per-group deterministic cap: keep at most `k` rows per group,
    * chosen by an id-derived hash order (corpus-growth-stable like
    * every sampling pass here — a surviving row only drops when enough
    * NEW rows hash below it, never from reordering). Equals the naive
    * single window `row_number() OVER (PARTITION BY group ORDER BY
    * md5(id), id) <= k` row-for-row.
    *
    * The naive window is the scale trap: groups are usually FEW and
    * HUGE (per-source caps → one partition per source sorts the whole
    * source). This runs two stages: stage 1 windows over (group, salt)
    * — `salts` sub-partitions spread each group — and keeps k per
    * salt; stage 2 re-windows the ≤ k·salts survivors per group. Any
    * global top-k row is top-k within its salt (pruning k per salt is
    * lossless), so the two-stage result is exactly the naive one. */
  def cappedPerGroup(df: DataFrame, group: String, id: String, k: Int,
                     salts: Int = 32): DataFrame =
    topKPerGroup(df, group, id, k,
      md5(concat(lit("cap:"), col(id).cast("string"))), salts)

  /** General salt-staged per-group top-k: keep the `k` smallest rows
    * per group by ANY total order `(ord, id)` — value-ranked variants
    * (top docs by score, shortest by length via a negated column) use
    * the same lossless two-stage pruning as the hash-ordered cap:
    * every global top-k row is top-k within its salt, so stage 1's
    * per-(group, salt) window prunes to k·salts survivors and stage 2
    * ranks only those. No whole-group single-partition sort at any
    * group size. */
  def topKPerGroup(df: DataFrame, group: String, id: String, k: Int,
                   ord: Column, salts: Int = 32): DataFrame = {
    require(k > 0 && salts > 0, s"need positive k/salts, got k=$k salts=$salts")
    val w1 = Window.partitionBy(col(group), col("_salt"))
      .orderBy(col("_ord"), col(id))
    val w2 = Window.partitionBy(col(group)).orderBy(col("_ord"), col(id))
    df.withColumn("_ord", ord)
      .withColumn("_salt", hashBucket(col(id), "capsalt:", salts))
      .withColumn("_rn1", row_number().over(w1))
      .filter(col("_rn1") <= k)
      .withColumn("pos", row_number().over(w2).cast("bigint"))
      .filter(col("pos") <= k)
      .drop("_ord", "_salt", "_rn1")
  }

  /** Weighted sampling WITHOUT replacement — sequential Poisson
    * sampling (Ohlsson 1998, the estimator used by national statistics
    * offices for πps samples): each row draws the key ξ = u/w with u a
    * uniform hash of its id, and the k SMALLEST keys per group win, so
    * inclusion probability is ≈ k·w/Σw without replacement. The
    * quality-weighted subcorpus draw ("sample 1M docs, favoring high
    * quality scores") that [[sampleByRate]] can't do without
    * replacement artifacts and [[stratifiedSampleBy]] only does at
    * stratum granularity.
    *
    * Integer-exact ordering: u is the 32-bit md5 hash and the key is
    * the BIGINT quotient (u·1e6) div w — u ≤ 2³² keeps the product
    * under 2⁶³ for any µ-scaled weight, both engines truncate the
    * division identically, and ties break on (key, id) — so the sample
    * is deterministic, stable under corpus reshuffles, and
    * bit-replayable in SQL. Weights must be positive (guarded INSIDE
    * the consumed expression, the temperatureMix rule).
    *
    * Scale shape: the key is a per-row expression and selection is the
    * same lossless salted two-stage window as [[topKPerGroup]] — no
    * whole-group single-partition sort at any group size.
    *
    * Output: the sampled rows + `pos` (1-based rank by key). */
  def weightedSample(df: DataFrame, group: String, id: String,
                     weight: Column, k: Int, salts: Int = 32): DataFrame = {
    val u = ApproxDedup.hash32(concat(lit("sps:"), col(id).cast("string")))
    val keyed = df
      .withColumn("_w", weight.cast("long"))
      .withColumn("_u", u)
      .withColumn("_key", expr(
        "CASE WHEN _w <= 0 THEN raise_error(" +
          "'weightedSample: weights must be positive') " +
          "ELSE (_u * 1000000L) div _w END"))
    topKPerGroup(keyed, group, id, k, col("_key"), salts)
      .drop("_w", "_u", "_key")
  }

  /** EXACT-size proportional stratified sample: `totalN` rows overall,
    * apportioned across the strata by largest-remainder (Hamilton)
    * apportionment — quota_g = floor(totalN·n_g/N) plus one for the
    * strata with the largest remainders until the quotas sum to
    * exactly `totalN`. Within a stratum, membership is hash-ordered
    * (md5 of the id — uniform, deterministic, stable under corpus
    * reshuffles), so the same corpus always yields the same sample.
    *
    * Contrast with the rate family: [[sampleByRate]]/[[sampleToBudget]]
    * are exact only in expectation (each row gated independently);
    * this op's output size is exact by construction — the eval-set /
    * fixed-budget-subcorpus contract where "~1000 rows" isn't
    * acceptable.
    *
    * Scale shape: quota math runs on the per-stratum SIZE table
    * (metadata-sized — distinct strata, not rows; the unpartitioned
    * windows over it never see corpus-scale data), quotas broadcast
    * back, and membership is the same lossless salted two-stage
    * window as [[topKPerGroup]] — no whole-stratum single-partition
    * sort at any stratum size. Integer-exact throughout (guarded
    * against totalN·n_g overflow), so an engine replaying the same
    * md5 order reproduces the sample bit-for-bit.
    *
    * Output: the sampled rows with their within-stratum `pos`
    * (1-based hash rank) and the stratum's `quota`.
    * Requires totalN ≤ N; largest-remainder bumps only land on
    * strata with a nonzero remainder, which guarantees
    * quota_g ≤ n_g — no stratum is ever asked for more rows than it
    * has. */
  def stratifiedSample(df: DataFrame, strata: String, id: String,
                      totalN: Long, salts: Int = 32): DataFrame =
    stratifiedSampleBy(df, strata, id, totalN, col("_n"), salts)

  /** [[stratifiedSample]] with an ARBITRARY per-stratum quota weight
    * (an expression over the size table's `_n` column, e.g.
    * `floor(sqrt(_n) * 1e6)` for the α=1/2 temperature rebalance):
    * quotas apportion `totalN` by weight instead of size — the
    * exact-count form of [[temperatureMix]]'s rate-based mixing.
    * A weighting that asks a stratum for more rows than it has fails
    * loudly (sampling is without replacement; proportional weights
    * can't trip this, temperature weights can on tiny strata). */
  def stratifiedSampleBy(df: DataFrame, strata: String, id: String,
                         totalN: Long, weight: Column,
                         salts: Int = 32): DataFrame = {
    require(totalN > 0 && salts > 0,
      s"need positive totalN/salts, got totalN=$totalN salts=$salts")
    val wAll = Window.partitionBy(lit(0))
    val wBump = Window.partitionBy(lit(0))
      .orderBy(col("_rem").desc, col(strata))
    // guards live INSIDE the consumed expressions (the temperatureMix
    // rule): a free-standing guard column would be pruned unevaluated
    val maxW = Long.MaxValue / totalN
    val guardedW = s"CASE WHEN _w > ${maxW}L THEN raise_error(" +
      s"'stratifiedSample: stratum weight x totalN=$totalN overflows int64')" +
      " ELSE _w END"
    val guardedTotal = s"CASE WHEN ${totalN}L > _sz THEN raise_error(" +
      s"'stratifiedSample: totalN=$totalN exceeds the corpus size')" +
      s" ELSE ${totalN}L END"
    // quota ≤ stratum size or fail loudly — a silent cap would break
    // the exact-totalN contract
    val guardedQuota = "CASE WHEN _quota0 > _n THEN raise_error(" +
      "'stratifiedSample: weighting asks a stratum for more rows than " +
      "it has') ELSE _quota0 END"
    val quotas = df.groupBy(col(strata))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_w", weight.cast("bigint"))
      .withColumn("_tot", sum(col("_w")).over(wAll))
      .withColumn("_sz", sum(col("_n")).over(wAll))
      .withColumn("_base", expr(s"(($guardedTotal) * ($guardedW)) div _tot"))
      .withColumn("_rem", expr(s"((${totalN}L) * _w) % _tot"))
      .withColumn("_leftover", lit(totalN) - sum(col("_base")).over(wAll))
      .withColumn("_bump_rank", row_number().over(wBump))
      .withColumn("_quota0",
        col("_base") + when(col("_bump_rank") <= col("_leftover"), 1L)
          .otherwise(0L))
      .withColumn("quota", expr(guardedQuota).cast("bigint"))
      .select(col(strata), col("quota"))
    val w1 = Window.partitionBy(col(strata), col("_salt"))
      .orderBy(col("_ord"), col(id))
    val w2 = Window.partitionBy(col(strata)).orderBy(col("_ord"), col(id))
    df.join(broadcast(quotas), Seq(strata))
      .withColumn("_ord", md5(concat(lit("strat:"), col(id).cast("string"))))
      .withColumn("_salt", hashBucket(col(id), "stratsalt:", salts))
      .withColumn("_rn1", row_number().over(w1))
      .filter(col("_rn1") <= col("quota"))
      .withColumn("pos", row_number().over(w2).cast("bigint"))
      .filter(col("pos") <= col("quota"))
      .drop("_ord", "_salt", "_rn1")
  }

  /** Contrastive training-pair export: one labeled row per
    * positive/negative pair — positives are the given similarity edges
    * (mutual-kNN edges in the q206 composition: the highest-precision
    * free labels a corpus carries), negatives are hash-derived partners
    * (`md5_hash60("neg:<a>:<b>") mod nIds` — deterministic, so two
    * engines and two runs emit the SAME pairs, and every positive row
    * proposes exactly one negative for class balance). A proposed
    * negative that collides with its anchor or with ANY real edge (both
    * orientations) is dropped rather than re-drawn — re-draw loops
    * aren't expression-shaped, and at corpus scale a collision is
    * vanishingly rare (edges are k·N of N² pairs), so the balance skew
    * is negligible and EXACTLY reproducible.
    *
    * Scale: negatives are a per-row expression over the edge list plus
    * one anti-join against the (k·N-row) edge set — the corpus is never
    * touched; ids need not be dense, `nIds` only seeds the hash range
    * (a partner id that maps to a gap is simply a row whose features a
    * downstream join will drop). */
  def contrastivePairs(edges: DataFrame, aCol: String, bCol: String,
                       nIds: Long): DataFrame = {
    require(nIds > 1, s"contrastivePairs needs an id range: $nIds")
    val pos = edges.select(col(aCol).as("anchor"), col(bCol).as("partner"))
      .withColumn("label", lit(1L))
    val both = pos.select(col("anchor"), col("partner"))
      .unionByName(pos.select(col("partner").as("anchor"),
        col("anchor").as("partner")))
    val neg = edges.select(col(aCol).as("anchor"),
        pmod(ThetaSketch.hash60(concat(lit("neg:"), col(aCol).cast("string"),
          lit(":"), col(bCol).cast("string"))), lit(nIds)).as("partner"))
      .filter(col("partner") =!= col("anchor"))
      .join(both, Seq("anchor", "partner"), "left_anti")
      .withColumn("label", lit(0L))
    pos.unionByName(neg)
  }
}
