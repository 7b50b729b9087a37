package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Signed random projection (SimHash for dense embeddings — Charikar,
  * STOC 2002): compress a d-dimensional float vector to a `bits`-bit
  * signature whose pairwise Hamming distance estimates angular
  * distance. At 100 TB this is the compressed scan path for vector
  * search: d=64 floats (256 B) shrink to one BIGINT (8 B) — a 32×
  * smaller scan whose serve kernel is xor + popcount instead of d
  * multiply-adds, with the exact re-rank reserved for the shortlist
  * (the same two-tier shape as the PQ/ADC family,
  * Similarity.scala:630-698).
  *
  * Everything is integer-exact and oracle-replayable:
  *  - each dimension quantizes to fixed point ⌊v·10⁶⌋ (the engine's
  *    q24/q118 convention), so hyperplane sums are BIGINT sums — no
  *    float-order nondeterminism between engines;
  *  - hyperplane signs derive from the engine-wide 60-bit md5 kernel
  *    (`md5_hash60("rp:<bit>:<dim>") mod 2`, plans/Md5Hash60.scala) —
  *    a DuckDB oracle regenerates the same ±1 matrix from `md5()`.
  *
  * The reference system has no vector surface; this extends the
  * engine's LLM-pipeline family (SURVEY §2 "beyond the reference").
  */
object RandomProjection {

  /** Hyperplane sign s(b,i) ∈ {+1,−1} — the JVM mirror of the kernel
    * derivation (Cardinality.hashLong == md5_hash60 by KmvKernelSpec). */
  def sign(bit: Int, dim: Int): Long =
    if (Cardinality.hashLong(s"rp:$bit:$dim") % 2 == 0) 1L else -1L

  /** Fixed-point quantization of the float vector: ⌊v·10⁶⌋ as BIGINT
    * per dimension. Exact in both engines (float widens to double
    * losslessly; floor is deterministic). */
  private def qvec(vecCol: Column): Column =
    transform(vecCol, v =>
      floor(v.cast("double") * lit(1000000L)).cast("long"))

  /** Per-row signatures: (idCol, rp_sig) with bit b of rp_sig set iff
    * Σᵢ s(b,i)·⌊vᵢ·10⁶⌋ > 0. One narrow codegen'd pass — no shuffle,
    * no UDF, no join; the ±1 matrix is a bits×dim literal (≤ 63·d
    * longs) folded into the plan. Zero-sum ties resolve to 0, matching
    * the oracle's `> 0` test exactly. */
  def signatures(vecs: DataFrame, idCol: String, vecCol: String,
                 bits: Int, dim: Int): DataFrame = {
    require(bits >= 1 && bits <= 63, s"bits must be in [1,63]: $bits")
    // |Σ| ≤ dim · 10⁶ · max|v|: far under 2^63 for any sane embedding
    val q = qvec(col(vecCol))
    val sig = (0 until bits).map { b =>
      val signs = typedLit((0 until dim).map(i => sign(b, i)))
      val dot = aggregate(
        zip_with(q, signs, (x, s) => x * s), lit(0L), (acc, x) => acc + x)
      when(dot > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    vecs.select(col(idCol), sig.as("rp_sig"))
  }

  /** Compressed-domain top-k: rank the corpus per query by Hamming
    * distance between signatures (xor + popcount — integer-exact),
    * ties broken by corpus id. The query side broadcasts BY CONTRACT
    * (serve batches are small); the corpus side is one narrow scan of
    * 8-byte signatures. Returns (query_id, rank, corpus_id, hamming). */
  def hammingTopK(queries: DataFrame, corpus: DataFrame,
                  qid: String, cid: String, sigCol: String,
                  k: Int): DataFrame = {
    val q = queries.select(col(qid).as("query_id"), col(sigCol).as("qsig"))
    val c = corpus.select(col(cid).as("corpus_id"), col(sigCol).as("csig"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("corpus_id").asc)
    c.join(broadcast(q), col("query_id") =!= col("corpus_id"))
      .withColumn("hamming", bit_count(col("qsig").bitwiseXOR(col("csig"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("hamming"))
  }
}
