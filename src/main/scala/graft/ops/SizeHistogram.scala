package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A1/A2 — size-histogram statistics (ListProducer/ListProducer.py:60-100,
  * 135-149; target stat names docs/Schema.txt:26-35).
  *
  * Reference semantics preserved exactly:
  *  - buckets are CUMULATIVE (an object ≤1e6 also counts in every larger
  *    bucket), thresholds are 1000-based bytes {1e6 … 5e9} even though the
  *    reference's field names say GB/TB — see SURVEY.md §7.4;
  *  - objects with size > max threshold are excluded from every bucket but
  *    still counted in totalObjects/totalSize (ListProducer.py:63-65).
  *
  * One pass, map-side partial aggregation, no shuffle beyond the final
  * single-row reduce — identical shape at 6k rows or 100 TB.
  */
object SizeHistogram {

  /** Reference thresholds in bytes (ListProducer.py:22). */
  val ReferenceThresholds: Seq[Long] =
    Seq(1000000L, 5000000L, 10000000L, 50000000L, 100000000L, 1000000000L, 5000000000L)

  /** Cumulative histogram of `size` with the given ascending thresholds.
    * Output: one row — total_objects, total_size, sub_<t> per threshold. */
  def apply(df: DataFrame, size: Column, thresholds: Seq[Long] = ReferenceThresholds): DataFrame = {
    val buckets = thresholds.map { t =>
      sum(when(size <= t, 1L).otherwise(0L)).as(s"sub_$t")
    }
    val cols = count(lit(1)).as("total_objects") +:
      sum(size).cast("bigint").as("total_size") +: buckets
    df.agg(cols.head, cols.tail: _*)
  }

  /** Per-group variant (A2 per-file stats then rolled up = one groupBy). */
  def byGroup(df: DataFrame, group: Column, size: Column,
              thresholds: Seq[Long] = ReferenceThresholds): DataFrame = {
    val buckets = thresholds.map { t =>
      sum(when(size <= t, 1L).otherwise(0L)).as(s"sub_$t")
    }
    val cols = count(lit(1)).as("total_objects") +:
      sum(size).cast("bigint").as("total_size") +: buckets
    df.groupBy(group).agg(cols.head, cols.tail: _*)
  }
}
