package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** KMV / bottom-k ("theta") distinct sketches (Bar-Yossef et al. 2002;
  * the set-operation framing follows Dasgupta et al. 2016's theta
  * sketch analysis): keep the k SMALLEST distinct 60-bit hash values
  * per group. Where [[Cardinality]]'s HLL answers only "how many
  * distinct", the KMV state is a uniform SAMPLE of the distinct keys'
  * hash space — so two sketches built independently over two corpora
  * compose into set-operation estimates (Jaccard, intersection,
  * union) without ever co-scanning the corpora. That is the 100 TB
  * use: per-snapshot / per-source sketches persist as ≤k-row ledger
  * entries, and "how much does crawl N overlap crawl M" is a join of
  * two ledger rows, not a join of two corpora (the contamination-
  * overlap triage question that exact anti-joins are too expensive to
  * ask casually at fleet scale).
  *
  * Every step is integer-exact and bit-replayable by a SQL oracle:
  *  - the hash is [[Cardinality.hashOf]]'s 60-bit md5 prefix (one
  *    shared definition; a portability fix cannot miss one operator);
  *  - the sketch state (sorted ascending array of ≤k distinct longs)
  *    is CANONICAL — independent of partitioning and merge order,
  *    because "k smallest distinct values" is itself associative —
  *    so shard-merge equals whole-corpus sketch bit-for-bit
  *    (ThetaSketchSpec pins it);
  *  - the estimator (k−1)·2^60 // h_(k) is an exact Decimal integer
  *    quotient (HUGEINT `//` in DuckDB), and a group with fewer than
  *    k distinct keys short-circuits to the EXACT count (its state
  *    holds every distinct hash).
  *
  * Scale shape: the aggregation is a map-side-combined partial — each
  * partition carries at most k longs per group across the shuffle,
  * never the key long tail — and set operations touch only sketch
  * rows (≤2k per group), so they are metadata-sized regardless of
  * corpus size.
  */
object ThetaSketch {

  /** Hash-space size: hashes are uniform in [0, 2^60). */
  val HashBits: Int = Cardinality.HashBits
  private val HashSpace: BigInt = BigInt(1) << HashBits

  /** The engine-wide 60-bit hash via the native
    * [[graft.plans.Md5Hash60]] kernel — one digest pass, no hex
    * encode/parse round-trip per row (the per-row cost IS the sketch
    * bill at scale). [[Cardinality.hashOf]] remains the executable
    * specification; KmvKernelSpec pins kernel == chain bitwise. */
  private[ops] def hash60(key: Column): Column =
    call_function("md5_hash60", key.cast("string"))

  /** Insert `hv` into the sorted bounded buffer if it belongs among
    * the k smallest distinct values (also the per-event streaming
    * fold — [[graft.streaming.SketchStream]]). */
  private[graft] def insert(b: Array[Long], hv: Long, k: Int): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(b, hv)
    if (pos >= 0) b // already present
    else {
      val ins = -pos - 1
      if (b.length < k) {
        val out = new Array[Long](b.length + 1)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = hv
        System.arraycopy(b, ins, out, ins + 1, b.length - ins)
        out
      } else if (ins < k) { // displaces the current maximum
        val out = new Array[Long](k)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = hv
        System.arraycopy(b, ins, out, ins + 1, k - ins - 1)
        out
      } else b
    }
  }

  private def mergeSorted(a: Array[Long], b: Array[Long], k: Int): Array[Long] =
    if (b.isEmpty) a
    else if (a.isEmpty) b.distinct.sorted.take(k) // defensive on raw input
    else {
      val out = new scala.collection.mutable.ArrayBuffer[Long](k)
      var i = 0; var j = 0
      while (out.length < k && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
          else { val x = b(j); j += 1; x }
        if (out.isEmpty || out.last != v) out += v
      }
      out.toArray
    }

  /** Per-row KMV update aggregator: 60-bit hash stream → sorted
    * ascending array of the ≤k smallest distinct hashes. */
  final class KmvAgg(k: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k >= 2, "KMV sketch needs k >= 2")
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(b: Array[Long], hv: Long): Array[Long] =
      insert(b, hv, k)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      mergeSorted(a, b, k)
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Sketch-merge aggregator over stored sketch arrays — the ledger
    * primitive: persisted per-shard/per-snapshot sketches re-merge
    * without touching any corpus. */
  final class KmvMergeAgg(k: Int)
      extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    require(k >= 2, "KMV sketch needs k >= 2")
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(b: Array[Long], sk: Array[Long]): Array[Long] =
      if (sk == null) b else mergeSorted(b, sk, k)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      mergeSorted(a, b, k)
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Per-group KMV sketch of `key`: (groupCols..., kmv: array<bigint>
    * sorted ascending, |kmv| ≤ k). Null keys are dropped (SQL
    * COUNT(DISTINCT) semantics, the [[Cardinality.sketch]] rule). */
  def sketch(df: DataFrame, groupCols: Seq[String], key: Column,
             k: Int): DataFrame = {
    val agg = udaf(new KmvAgg(k))
    df.filter(key.isNotNull)
      .select(groupCols.map(col) :+ hash60(key).as("_hv"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(agg(col("_hv")).as("kmv"))
  }

  /** Merge a union of sketch tables (shape of [[sketch]] output) into
    * one sketch per group. Bit-equal to sketching the union. */
  def mergeSketches(df: DataFrame, groupCols: Seq[String], k: Int,
                    kmvCol: String = "kmv"): DataFrame = {
    val agg = udaf(new KmvMergeAgg(k))
    df.groupBy(groupCols.map(col): _*)
      .agg(agg(col(kmvCol)).as("kmv"))
  }

  /** Exact-integer distinct estimate column pair from a sketch array:
    * appends (n_kept, estimate). n_kept < k ⇒ the sketch holds every
    * distinct hash ⇒ estimate is EXACT; otherwise the classic KMV
    * estimator (k−1)·2^60 // h_(k) as an exact Decimal quotient. */
  private def withEstimate(df: DataFrame, k: Int): DataFrame = {
    val num = lit(new java.math.BigDecimal(
      (BigInt(k - 1) * HashSpace).bigInteger))
    val kth = element_at(col("kmv"), k).cast("decimal(38,0)")
    val raw = ((num - (num % kth)) / kth).cast("bigint")
    df.withColumn("n_kept", size(col("kmv")).cast("bigint"))
      .withColumn("estimate",
        when(col("n_kept") < k, col("n_kept")).otherwise(raw))
  }

  /** Estimate from sketch state: (groupCols..., n_kept, estimate). */
  def estimate(sk: DataFrame, groupCols: Seq[String], k: Int): DataFrame =
    withEstimate(sk, k)
      .select(groupCols.map(col) :+ col("n_kept") :+ col("estimate"): _*)

  /** sketch → estimate in one call. */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], key: Column,
                     k: Int): DataFrame =
    estimate(sketch(df, groupCols, key, k), groupCols, k)

  /** Set-operation estimates between two per-group sketch tables
    * (matching `groupCols`; inner-joined on them): for each group,
    * form the combined sketch L = k smallest distinct hashes of
    * A ∪ B, count how many members of L appear in BOTH input sketches
    * (each hash in L below both thetas is a fair coin for membership
    * in the intersection), and return
    * (groupCols..., n_l, matched, union_est, jaccard_ppm, inter_est)
    * — all exact-integer arithmetic:
    *   union_est   = KMV estimate of L (exact when |L| < k),
    *   jaccard_ppm = matched·10⁶ // n_l,
    *   inter_est   = matched·union_est // n_l.
    *
    * Validity requires both sketches built with the SAME k — a CALLER
    * contract, not runtime-enforced: a kmv array alone cannot reveal
    * its build k (a short array may be a small group OR a smaller-k
    * sketch), and a smaller-k' input silently skews union/intersection
    * estimates because L's k-th-smallest threshold argument no longer
    * holds. Persist k next to sketch ledgers (SketchStream does) and
    * validate at load. The same hash is shared by construction. The
    * combine runs on
    * sketch rows only — ≤2k per group — so the window sort is
    * model-sized, never corpus-sized. */
  def setOps(skA: DataFrame, skB: DataFrame, groupCols: Seq[String],
             k: Int): DataFrame = {
    require(k >= 2, "KMV sketch needs k >= 2")
    val a = skA.select(groupCols.map(col) :+
      explode(col("kmv")).as("hv"): _*).withColumn("side", lit(1))
    val b = skB.select(groupCols.map(col) :+
      explode(col("kmv")).as("hv"): _*).withColumn("side", lit(2))
    val both = a.unionByName(b)
      .groupBy((groupCols :+ "hv").map(col): _*)
      .agg(max(when(col("side") === 1, 1).otherwise(0)).as("in_a"),
        max(when(col("side") === 2, 1).otherwise(0)).as("in_b"))
    // keep the k smallest of the union — ≤2k rows per group feed the
    // window, the sketch-combine step, not a data-scale sort
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("hv"))
    val l = both.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
    val agg = l.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_l"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L)
          .otherwise(0L)).as("matched"),
        sum(col("in_a").cast("bigint")).as("n_a"),
        sum(col("in_b").cast("bigint")).as("n_b"),
        max(col("hv")).as("_kth"))
    val num = lit(new java.math.BigDecimal(
      (BigInt(k - 1) * HashSpace).bigInteger))
    val kth = col("_kth").cast("decimal(38,0)")
    val raw = ((num - (num % kth)) / kth).cast("bigint")
    // union_est ≤ 2^60 always (h_(k) ≥ k−1 for k distinct non-negative
    // hashes), so it fits a long — but matched·union_est can reach
    // k·2^60 > 2^63, so the intersection quotient runs in exact
    // Decimal (HUGEINT `//` in the oracle).
    val interNum = (col("matched").cast("decimal(38,0)") *
      col("union_est").cast("decimal(38,0)")).cast("decimal(38,0)")
    val interDen = col("n_l").cast("decimal(38,0)")
    agg
      .withColumn("union_est", when(col("n_l") < k, col("n_l")).otherwise(raw))
      .withColumn("jaccard_ppm",
        expr("matched * CAST(1000000 AS BIGINT) div n_l"))
      .withColumn("inter_est",
        ((interNum - (interNum % interDen)) / interDen).cast("bigint"))
      // per-side sample memberships: matched/n_b estimates the
      // CONTAINMENT of B in A (and symmetrically) — the right gate
      // when the sides' sizes differ (Jaccard punishes asymmetry)
      .select(groupCols.map(col) :+ col("n_l") :+ col("matched") :+
        col("n_a") :+ col("n_b") :+ col("union_est") :+
        col("jaccard_ppm") :+ col("inter_est"): _*)
  }

  /** The overlap MATRIX over one sketch table: [[setOps]] for every
    * unordered group pair (g_a < g_b) — the decontamination /
    * snapshot-triage view ("which sources share content with which")
    * computed ENTIRELY from ledger rows. The pair domain is the
    * group-list crossed with itself (model-sized by definition — G
    * groups make G·k sketch rows, and the broadcast side is the G-row
    * group list, never a corpus), and each pair's combine touches
    * ≤2k hash rows; corpus cost: zero. Output:
    * (g_a, g_b, n_l, matched, union_est, jaccard_ppm, inter_est). */
  def pairwiseSetOps(sk: DataFrame, groupCol: String, k: Int): DataFrame = {
    require(k >= 2, "KMV sketch needs k >= 2")
    val groups = sk.select(col(groupCol).as("g_b")).distinct()
    val ex = sk.select(col(groupCol).as("g"), explode(col("kmv")).as("hv"))
    // replicate each group's hashes against every OTHER group — both
    // sides are sketch/model-sized by contract (G·k × G)
    val aSide = ex.select(col("g").as("g_a"), col("hv"))
      .join(broadcast(groups), col("g_a") < col("g_b"))
      .withColumn("side", lit(1))
    val bSide = ex.select(col("g").as("g_b"), col("hv"))
      .join(broadcast(groups.select(col("g_b").as("g_a"))),
        col("g_a") < col("g_b"))
      .withColumn("side", lit(2))
    val both = aSide.unionByName(bSide)
      .groupBy(col("g_a"), col("g_b"), col("hv"))
      .agg(max(when(col("side") === 1, 1).otherwise(0)).as("in_a"),
        max(when(col("side") === 2, 1).otherwise(0)).as("in_b"))
    val w = Window.partitionBy(col("g_a"), col("g_b")).orderBy(col("hv"))
    val l = both.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
    val agg = l.groupBy(col("g_a"), col("g_b"))
      .agg(count(lit(1)).as("n_l"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L)
          .otherwise(0L)).as("matched"),
        max(col("hv")).as("_kth"))
    val num = lit(new java.math.BigDecimal(
      (BigInt(k - 1) * HashSpace).bigInteger))
    val kth = col("_kth").cast("decimal(38,0)")
    val raw = ((num - (num % kth)) / kth).cast("bigint")
    val interNum = (col("matched").cast("decimal(38,0)") *
      col("union_est").cast("decimal(38,0)")).cast("decimal(38,0)")
    val interDen = col("n_l").cast("decimal(38,0)")
    agg
      .withColumn("union_est", when(col("n_l") < k, col("n_l")).otherwise(raw))
      .withColumn("jaccard_ppm",
        expr("matched * CAST(1000000 AS BIGINT) div n_l"))
      .withColumn("inter_est",
        ((interNum - (interNum % interDen)) / interDen).cast("bigint"))
      .select(col("g_a"), col("g_b"), col("n_l"), col("matched"),
        col("union_est"), col("jaccard_ppm"), col("inter_est"))
  }

  /** Containment drift gate over a [[setOps]] output: appends
    * `containment_ppm` = matched·10⁶ // n_b (how much of the B-side
    * sample is old news to A) and a `verdict` against `thresholdPpm`.
    * n_b = 0 — every union-sample hash came from the A side, possible
    * when ALL of B's hashes sit above A's theta — is the MOST
    * divergent evidence, not a null to fall through to "stable": the
    * gate returns verdict "shifted" with a NULL containment (no
    * fair-coin sample of B exists to quantify it). Letting the null
    * containment reach a `containment < threshold` comparison instead
    * would fail the gate OPEN on exactly the most-shifted input
    * (ThetaSketchSpec pins this). */
  def containmentGate(ops: DataFrame, thresholdPpm: Long): DataFrame =
    ops
      .withColumn("containment_ppm",
        when(col("n_b") > 0L,
          expr("matched * CAST(1000000 AS BIGINT) div n_b")))
      .withColumn("verdict",
        when(col("n_b") === 0L, lit("shifted"))
          .when(col("containment_ppm") < thresholdPpm, lit("shifted"))
          .otherwise(lit("stable")))
}
