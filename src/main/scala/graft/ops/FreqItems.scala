package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra-Gries frequent-items summaries (Misra & Gries 1982; merge
  * rule from Agarwal et al. 2012, "Mergeable Summaries"): a ≤k-counter
  * sketch that finds every item with frequency > n/(k+1) in ONE pass
  * with O(k) state per partition.
  *
  * Why it earns a place next to the exact [[TextAnalysis.heavyHitters]]
  * (CMS-prefiltered) form: the exact form still hash-shuffles every
  * DISTINCT surviving token, and its CMS prefilter needs a first full
  * pass to build the sketch it broadcasts. The MG aggregator is a
  * partial aggregate like `sum` — each partition carries at most k
  * counters, the shuffle moves k rows per partition (never the token
  * long tail), and the merge is associative — so a vocabulary-scale
  * pass over 100 TB moves O(k · partitions) rows total. The price is
  * approximation: counts are LOWER bounds with
  * `true − estimate ≤ n/(k+1)` (any merge tree), so items above that
  * threshold are guaranteed present, and a sketch sized at or above
  * the distinct-item count is simply exact.
  *
  * Determinism contract: with k ≥ distinct items the result is the
  * exact count map regardless of Spark's merge order (nothing is ever
  * evicted) — that is the oracle-checked configuration. Truncating
  * configurations keep the mergeable-summaries guarantees under ANY
  * merge order (FreqItemsSpec pins them) but individual estimates may
  * vary run-to-run with partitioning, as with any MG deployment; the
  * shrink step itself is canonical (subtract the (k+1)-th largest
  * count, drop non-positives — never an arbitrary tie pick).
  */
object FreqItems {

  final case class Entry(item: String, cnt: Long)

  private def shrink(m: Map[String, Long], k: Int): Map[String, Long] =
    if (m.size <= k) m
    else {
      // canonical MG merge-shrink: subtract the (k+1)-th largest count
      val offset = m.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
      m.collect { case (i, c) if c > offset => i -> (c - offset) }
    }

  /** Per-row MG update aggregator: item stream → ≤k (item, lowerBound)
    * entries, sorted (cnt DESC, item) for a deterministic finish. */
  final class MgAgg(k: Int)
      extends Aggregator[String, Map[String, Long], Array[Entry]] {
    require(k >= 1, "MG sketch needs k >= 1")
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
      if (item == null) b
      else b.get(item) match {
        case Some(c) => b.updated(item, c + 1)
        case None if b.size < k => b.updated(item, 1L)
        case None => // classic decrement-all step (drop zeroed counters)
          b.collect { case (i, c) if c > 1 => i -> (c - 1) }
      }
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
      shrink(small.foldLeft(big) { case (m, (i, c)) =>
        m.updated(i, m.getOrElse(i, 0L) + c)
      }, k)
    }
    override def finish(b: Map[String, Long]): Array[Entry] =
      b.toArray.map { case (i, c) => Entry(i, c) }
        .sortBy(e => (-e.cnt, e.item))
    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Array[Entry]] =
      ExpressionEncoder[Array[Entry]]()
  }

  /** Sketch-merge aggregator: merges stored sketches (arrays of
    * entries — [[sketch]] output or ledger rows) into one ≤k summary.
    * This is what makes the sketch a LEDGER primitive: persisted
    * per-shard summaries re-merge without touching the corpus. */
  final class MgMergeAgg(k: Int)
      extends Aggregator[Array[Entry], Map[String, Long], Array[Entry]] {
    private val one = new MgAgg(k)
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], sk: Array[Entry]): Map[String, Long] =
      one.merge(b,
        if (sk == null) Map.empty
        else sk.iterator.map(e => e.item -> e.cnt).toMap)
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      one.merge(a, b)
    override def finish(b: Map[String, Long]): Array[Entry] = one.finish(b)
    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Array[Entry]] =
      ExpressionEncoder[Array[Entry]]()
  }

  /** Per-group MG sketch of `key`: (groupCols..., mg: array<struct<
    * item,cnt>>). One map-side-combined aggregation; the shuffle moves
    * ≤k entries per partition per group. */
  def sketch(df: DataFrame, groupCols: Seq[String], key: Column,
             k: Int): DataFrame = {
    val agg = udaf(new MgAgg(k))
    df.groupBy(groupCols.map(col): _*)
      .agg(agg(key.cast("string")).as("mg"))
  }

  /** Merge a union of sketch tables (same shape as [[sketch]] output)
    * back into one summary per group — the ledger-refresh primitive. */
  def mergeSketches(df: DataFrame, groupCols: Seq[String], k: Int,
                    mgCol: String = "mg"): DataFrame = {
    val agg = udaf(new MgMergeAgg(k))
    df.groupBy(groupCols.map(col): _*)
      .agg(agg(col(mgCol)).as("mg"))
  }

  /** Frequent items per group: exploded (groupCols..., item, cnt) for
    * entries whose lower-bound count reaches `minCount`. Every item
    * with true frequency > n/(k+1) + minCount is guaranteed present;
    * with k ≥ distinct(key) the counts are exact. */
  def frequent(df: DataFrame, groupCols: Seq[String], key: Column,
               k: Int, minCount: Long): DataFrame =
    sketch(df, groupCols, key, k)
      .select(groupCols.map(col) :+ explode(col("mg")).as("e"): _*)
      .select(groupCols.map(col) :+ col("e.item").as("item")
        :+ col("e.cnt").as("cnt"): _*)
      .filter(col("cnt") >= minCount)
}
