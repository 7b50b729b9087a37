package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization" —
  * the SentencePiece unigram model), the segmental complement to
  * [[Bpe]]: BPE composes greedily from a learned merge order; the
  * unigram model scores every piece independently and Viterbi-decodes
  * the MINIMUM-COST segmentation of each word. The engine keeps the
  * whole family integer-exact:
  *
  *  - piece scores are eighth-bit negative log₂ probabilities
  *    ([[graft.functions.Fns.bits8FromQ8Sql]] — the BM25-idf / LM
  *    cross-entropy quantization, one shared definition), so Viterbi
  *    costs are BIGINT sums a SQL oracle replays bit-for-bit;
  *  - decode ties resolve by the total order (cost, n_pieces) — both
  *    components are additive, so the lexicographic Bellman recursion
  *    is well-defined and engine/oracle agree without materializing
  *    paths;
  *  - vocabulary selection is deterministic: every single character
  *    is retained (full coverage — no unreachable position), and the
  *    top `vocabSize` multi-character substrings by
  *    (count DESC, piece ASC in UTF-8 byte order) join them.
  *
  * Scale shape (the [[Bpe]] discipline): training's only corpus-wide
  * work is the word-frequency histogram shuffle; the substring
  * explode, ranking and scoring run over the HISTOGRAM (vocab-sized ×
  * maxPieceLen² rows). Decoding applies the DP to the DISTINCT word
  * table under a broadcast piece map (model-sized, guarded) and
  * broadcast-joins word→(cost, pieces) back onto the per-document
  * word stream — per-word work is O(len · maxPieceLen), and the
  * corpus never shuffles beyond the per-group re-aggregation. */
object UnigramLm {

  val DefaultMaxPieceLen = 4
  val DefaultMinCount = 2L
  /** Cost of an out-of-vocabulary single-character step (256 = 32
    * bits ≈ p = 2⁻³² — the LM cross-entropy OOV convention). Only
    * reachable when the vocabulary does not cover a character, i.e.
    * never with a [[train]]ed vocabulary over the same corpus. */
  val DefaultOovBits8 = 256L
  /** Broadcast guard: the decoder collects the piece table to the
    * driver (the kmeansFit model position); a vocabulary beyond this
    * is a config error, not a corpus property. */
  val MaxVocabRows = 4000000L

  /** Train a unigram piece vocabulary: (piece, pcnt, bits8) where
    * pcnt sums WEIGHTED substring occurrences (every start position,
    * weighted by word frequency) and bits8 ≈ 8·log₂(total/pcnt) over
    * the RETAINED vocabulary's total. All single characters are
    * retained; multi-character pieces need pcnt ≥ minCount and rank
    * in the top `vocabSize` by (pcnt DESC, piece ASC). */
  def train(df: DataFrame, text: Column,
            maxPieceLen: Int = DefaultMaxPieceLen,
            minCount: Long = DefaultMinCount,
            vocabSize: Int = 1000): DataFrame = {
    require(maxPieceLen >= 1 && maxPieceLen <= 16,
      s"maxPieceLen must be in [1,16], got $maxPieceLen")
    require(vocabSize >= 0, s"vocabSize must be >= 0, got $vocabSize")
    val wh = Bpe.wordHistogram(df, text) // (word, cnt) — the one shuffle
    val pieces = wh
      .select(col("word"), col("cnt"),
        explode(sequence(lit(1), length(col("word")))).as("s"))
      .select(col("word"), col("cnt"), col("s"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("l"))
      .filter(col("s") + col("l") - 1 <= length(col("word")))
      .select(expr("substr(word, s, l)").as("piece"), col("cnt"))
      .groupBy("piece").agg(sum(col("cnt")).as("pcnt"))
    val singles = pieces.filter(length(col("piece")) === 1)
    // global rank over the candidate table — vocab-sized, the
    // model-derivation step, not a corpus sort
    val multis = pieces
      .filter(length(col("piece")) > 1 && col("pcnt") >= minCount)
      .withColumn("_rnk", row_number().over(
        Window.orderBy(col("pcnt").desc, col("piece").asc)))
      .filter(col("_rnk") <= vocabSize)
      .drop("_rnk")
    val kept = singles.unionByName(multis)
    val total = kept.agg(sum(col("pcnt")).as("_total"))
    kept.crossJoin(total)
      .withColumn("bits8", expr(graft.functions.Fns.bits8FromQ8Sql(
        "(_total * CAST(256 AS BIGINT)) div pcnt")))
      .select(col("piece"), col("pcnt"), col("bits8"))
  }

  /** Viterbi-decode the distinct `word` column of `words` under a
    * piece vocabulary: appends (bits8, n_pieces) per word — the
    * (cost, pieces)-lexicographic optimum. Pieces are code-point
    * sequences ([[Bpe.splitCodePoints]] — `substr` semantics in both
    * engines). */
  def decodeWords(words: DataFrame, vocab: DataFrame,
                  maxPieceLen: Int = DefaultMaxPieceLen,
                  oovBits8: Long = DefaultOovBits8): DataFrame = {
    require(oovBits8 >= 0, s"oovBits8 must be >= 0, got $oovBits8")
    val spark = words.sparkSession
    import spark.implicits._
    val rows = vocab.select(col("piece"), col("bits8"))
      .limit((MaxVocabRows + 1).toInt).collect()
    require(rows.length <= MaxVocabRows,
      s"vocabulary exceeds the $MaxVocabRows-row broadcast guard")
    val pieceMap = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val bc = spark.sparkContext.broadcast(pieceMap)
    val maxL = maxPieceLen
    val oov = oovBits8
    val decoded = words.select(col("word")).as[String].mapPartitions { it =>
      val m = bc.value
      it.map { w => (w, decodeWord(w, m, maxL, oov)) }
    }.map { case (w, (c, n)) => (w, c, n) }
      .toDF("word", "bits8", "n_pieces")
    words.join(broadcast(decoded), Seq("word"))
  }

  /** The per-word Viterbi DP, driver/executor twin of the SQL-oracle
    * chain: dp(i) = lexicographic min over piece lengths l ≤
    * maxPieceLen of dp(i−l) + (bits8(piece), 1), with a single-char
    * OOV edge (cost `oovBits8`) only where the character itself is
    * not in the vocabulary. */
  private[graft] def decodeWord(word: String, vocab: Map[String, Long],
                                maxPieceLen: Int,
                                oovBits8: Long): (Long, Long) = {
    val syms = Bpe.splitCodePoints(word)
    val n = syms.length
    if (n == 0) return (0L, 0L)
    val cost = new Array[Long](n + 1)
    val np = new Array[Long](n + 1)
    java.util.Arrays.fill(cost, 1, n + 1, Long.MaxValue)
    var i = 1
    while (i <= n) {
      var l = 1
      val lMax = math.min(maxPieceLen, i)
      while (l <= lMax) {
        if (cost(i - l) != Long.MaxValue) {
          val piece = syms.slice(i - l, i).mkString
          vocab.get(piece) match {
            case Some(b) =>
              val c = cost(i - l) + b
              val p = np(i - l) + 1
              if (c < cost(i) || (c == cost(i) && p < np(i))) {
                cost(i) = c; np(i) = p
              }
            case None if l == 1 => // OOV char fallback
              val c = cost(i - 1) + oovBits8
              val p = np(i - 1) + 1
              if (c < cost(i) || (c == cost(i) && p < np(i))) {
                cost(i) = c; np(i) = p
              }
            case None => ()
          }
        }
        l += 1
      }
      i += 1
    }
    (cost(n), np(n))
  }

  /** The Viterbi path for a word under the SAME DP as [[decodeWord]]:
    * returns the piece sequence of the (cost, pieces)-lexicographic
    * optimum, with the remaining tie broken deterministically by
    * preferring the LONGEST piece at each boundary (scanning l
    * ascending and replacing on ties makes the kept transition the
    * longest optimal one — a piece of a given length from a given
    * position is unique, so the path is fully determined). The
    * (cost, n_pieces) of the returned path equal [[decodeWord]]'s
    * exactly (UnigramLmSpec pins it). */
  private[graft] def decodePath(word: String, vocab: Map[String, Long],
                                maxPieceLen: Int,
                                oovBits8: Long): Seq[String] = {
    val syms = Bpe.splitCodePoints(word)
    val n = syms.length
    if (n == 0) return Seq.empty
    val cost = new Array[Long](n + 1)
    val np = new Array[Long](n + 1)
    val back = new Array[Int](n + 1) // winning piece length at i
    java.util.Arrays.fill(cost, 1, n + 1, Long.MaxValue)
    var i = 1
    while (i <= n) {
      var l = 1
      val lMax = math.min(maxPieceLen, i)
      while (l <= lMax) {
        if (cost(i - l) != Long.MaxValue) {
          val piece = syms.slice(i - l, i).mkString
          val step = vocab.get(piece) match {
            case Some(b) => Some(b)
            case None if l == 1 => Some(oovBits8)
            case None => None
          }
          step match {
            case Some(b) =>
              val c = cost(i - l) + b
              val p = np(i - l) + 1
              // ties replace: ascending l leaves the LONGEST winner
              if (c < cost(i) || (c == cost(i) && p <= np(i))) {
                cost(i) = c; np(i) = p; back(i) = l
              }
            case None => ()
          }
        }
        l += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var pos = n
    while (pos > 0) {
      val l = back(pos)
      out.prepend(syms.slice(pos - l, pos).mkString)
      pos -= l
    }
    out.toSeq
  }

  /** One hard-EM (Viterbi-EM) refinement iteration, the
    * SentencePiece-style vocabulary polish: decode every DISTINCT word
    * under the current vocabulary, count expected piece USAGE weighted
    * by word frequency, drop multi-character pieces the optimal
    * segmentations never use, and re-score the survivors' bits8 from
    * the usage distribution (single characters are always retained at
    * usage ≥ 1 — the [[train]] coverage rule, so decoding stays total).
    * Scale shape: the decode runs over the word HISTOGRAM (vocab-sized)
    * under the broadcast piece map; the usage aggregation is
    * model-sized. Input `wordHist` is [[Bpe.wordHistogram]] output;
    * returns the same (piece, pcnt, bits8) shape as [[train]]. */
  def emStep(wordHist: DataFrame, vocab: DataFrame,
             maxPieceLen: Int = DefaultMaxPieceLen,
             oovBits8: Long = DefaultOovBits8): DataFrame = {
    val spark = wordHist.sparkSession
    import spark.implicits._
    val rows = vocab.select(col("piece"), col("bits8"))
      .limit((MaxVocabRows + 1).toInt).collect()
    require(rows.length <= MaxVocabRows,
      s"vocabulary exceeds the $MaxVocabRows-row broadcast guard")
    val bc = spark.sparkContext.broadcast(
      rows.map(r => r.getString(0) -> r.getLong(1)).toMap)
    val maxL = maxPieceLen
    val oov = oovBits8
    val usage = wordHist.select(col("word"), col("cnt"))
      .as[(String, Long)]
      .flatMap { case (w, cnt) =>
        decodePath(w, bc.value, maxL, oov).map(p => (p, cnt))
      }
      .toDF("piece", "u")
      .groupBy("piece").agg(sum(col("u")).as("u"))
    // survivors: used pieces + every single character seen in the
    // corpus (usage floor 1 keeps the score finite and decode total)
    val chars = wordHist
      .select(explode(expr(
        "transform(sequence(1, length(word)), i -> substr(word, i, 1))"))
        .as("piece"))
      .distinct()
    val kept = chars.join(usage, Seq("piece"), "left")
      .select(col("piece"), greatest(coalesce(col("u"), lit(0L)), lit(1L))
        .as("pcnt"))
      .unionByName(
        usage.filter(length(col("piece")) > 1)
          .select(col("piece"), col("u").as("pcnt")))
    val total = kept.agg(sum(col("pcnt")).as("_total"))
    kept.crossJoin(total)
      .withColumn("bits8", expr(graft.functions.Fns.bits8FromQ8Sql(
        "(_total * CAST(256 AS BIGINT)) div pcnt")))
      .select(col("piece"), col("pcnt"), col("bits8"))
  }

  /** Tokenize a corpus: per-`id` word/piece/cost totals
    * (id, n_words, n_pieces, bits8_total). The DP runs once per
    * DISTINCT word; the corpus side is one narrow explode + one
    * broadcast join + one map-side-combined sum. */
  def encode(df: DataFrame, id: String, text: Column, vocab: DataFrame,
             maxPieceLen: Int = DefaultMaxPieceLen,
             oovBits8: Long = DefaultOovBits8): DataFrame = {
    val docWords = df.filter(text.isNotNull)
      .select(col(id), explode(split(text, "\\s+")).as("word"))
      .filter(col("word") =!= "")
    val wordCosts = decodeWords(docWords.select("word").distinct(), vocab,
      maxPieceLen, oovBits8)
    docWords.join(broadcast(wordCosts), Seq("word"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_pieces"),
        sum(col("bits8")).as("bits8_total"))
  }
}
