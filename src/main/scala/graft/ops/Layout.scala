package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering keys for
  * co-locating rows that file-level min/max pruning should keep
  * together.
  *
  * A single-column sort prunes one predicate dimension; a Z-order
  * (Morton) key interleaves the bits of several dimensions so rows
  * close in ANY dimension land close in the sort order — after
  * `repartitionByRange(zvalue).sortWithinPartitions(zvalue)`, each
  * file's min/max footer covers a narrow hyper-rectangle and a scan
  * with a predicate on any clustered dimension skips most files. This
  * is the standard layout trick behind Delta/Iceberg OPTIMIZE ZORDER —
  * here as a plain integer expression (pure bit math, codegen'd, and
  * bit-replayable by any SQL engine).
  */
object Layout {

  /** Morton/Z-value of `dims` columns at `bits` bits each: output bit
    * (b·n + i) = bit b of dims(i). Columns must already be
    * non-negative and < 2^bits (callers bucket/clamp first — the
    * expression masks to `bits` for safety). Total bits·n must fit a
    * long (≤ 62). */
  def zValue(dims: Seq[Column], bits: Int): Column = {
    val n = dims.length
    require(n >= 2, "zValue needs at least 2 dimensions")
    require(bits * n <= 62, s"bits*dims = ${bits * n} exceeds long range")
    val terms = for {
      b <- 0 until bits
      (d, i) <- dims.zipWithIndex
    } yield shiftleft(shiftright(d.cast("bigint"), b).bitwiseAND(lit(1L)),
      b * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Z-ordered parquet write — the layout [[zProfile]] only reports.
    * Range-partitions on the Z-value into `numFiles` output files and
    * sorts within each, so every file's parquet footer covers a narrow
    * hyper-rectangle of the clustered dimensions; a subsequent scan
    * with a predicate on ANY clustered dimension reads only the files
    * whose rectangle intersects it (row-group min/max pruning — the
    * Delta/Iceberg OPTIMIZE ZORDER effect on plain parquet). The
    * helper Z-column is dropped before the write (ProjectExec is
    * order-preserving, so the intra-file sort survives): the layout
    * benefit needs no schema change.
    *
    * At 100 TB, `numFiles` is the dataset-size / target-file-size
    * quotient (e.g. 1 GB files); `repartitionByRange` samples the
    * Z-values to place its bounds, so file sizes stay balanced even
    * under skewed dimensions. */
  def zWrite(df: DataFrame, dims: Seq[Column], bits: Int,
             numFiles: Int, path: String): Unit =
    zLayout(df, dims, bits, numFiles)
      .write.mode("overwrite").parquet(path)

  /** The clustered frame [[zWrite]] writes (range-partitioned on the
    * Z-value, sorted within partitions, helper column dropped) —
    * exposed so plan audits can inspect the layout job's shape without
    * executing a write. */
  def zLayout(df: DataFrame, dims: Seq[Column], bits: Int,
              numFiles: Int): DataFrame = {
    // the helper column is dropped on the way out, so a user column
    // with the same name would be silently clobbered AND removed from
    // the written output — refuse instead
    require(!df.columns.contains("_z"),
      "zLayout uses '_z' as its helper column; rename the input's _z column")
    df.withColumn("_z", zValue(dims, bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }

  /** Z-layout profile: bucket rows by the TOP `bucketBits` of their
    * Z-value (the file-grain a range-partitioned write would produce)
    * and report each bucket's row count and per-dimension min/max —
    * the exact bounds a parquet footer would carry, i.e. what a
    * pruning scan has to work with. Narrow map + one
    * map-side-combined aggregate. */
  def zProfile(df: DataFrame, dims: Seq[Column], bits: Int,
               bucketBits: Int): DataFrame = {
    require(bucketBits > 0 && bucketBits <= bits * dims.length,
      s"bucketBits must be in (0, ${bits * dims.length}]")
    val named = dims.zipWithIndex.map { case (d, i) => d.as(s"d$i") }
    val z = zValue(dims.indices.map(i => col(s"d$i")), bits)
    val aggs = dims.indices.flatMap(i =>
      Seq(min(col(s"d$i")).as(s"min_d$i"), max(col(s"d$i")).as(s"max_d$i")))
    df.select(named: _*)
      .withColumn("zbucket",
        shiftright(z, bits * dims.length - bucketBits))
      .groupBy("zbucket")
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }
}
