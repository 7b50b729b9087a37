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

  /** Persist both sides of a RECURRING equi-join bucketed (+ sorted)
    * on their join keys and hand back the catalog reads: with equal
    * bucket counts the join — and any aggregate grouped on the key —
    * plans with ZERO shuffle exchanges, because matching buckets are
    * co-located by construction and the within-bucket sort feeds
    * sort-merge-join directly. This is the pay-once layout for the
    * 100 TB fact⨝dim-refresh pattern: one bucketed write amortizes the
    * shuffle across every subsequent join instead of re-exchanging
    * both sides per query. BucketingSpec pins the no-Exchange plan
    * property with broadcast disabled.
    *
    * Bucket count is a FIXED property of the table (choose
    * size/target-partition at write time — e.g. 100 TB / 256 MB ≈
    * 400k buckets); both sides must agree on it. */
  def bucketedPair(a: DataFrame, keyA: String, b: DataFrame, keyB: String,
                   buckets: Int, nameA: String, nameB: String)
      : (DataFrame, DataFrame) = {
    val spark = a.sparkSession
    // a PREVIOUS session's managed-table location can survive on disk
    // after the catalog entry is gone (fresh metastore, old warehouse):
    // drop both halves so saveAsTable never hits
    // LOCATION_ALREADY_EXISTS. Hadoop FS API, not java.nio — the
    // warehouse is HDFS/S3 on a cluster.
    Seq(nameA, nameB).foreach { name =>
      spark.sql(s"DROP TABLE IF EXISTS $name")
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val loc = new org.apache.hadoop.fs.Path(wh, name.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    a.write.bucketBy(buckets, keyA).sortBy(keyA)
      .mode("overwrite").saveAsTable(nameA)
    b.write.bucketBy(buckets, keyB).sortBy(keyB)
      .mode("overwrite").saveAsTable(nameB)
    (spark.table(nameA), spark.table(nameB))
  }

  /** Small-file compaction plan — the metadata half of Delta/Iceberg
    * OPTIMIZE (bin-packing): assign each file of a partition to an
    * output bin so every bin's total is ~`targetBytes`, by walking the
    * files in name order and cutting a new bin each time the running
    * total crosses the target. Deterministic and engine-replayable:
    * bin = exclusive-prefix-sum(bytes) // targetBytes — one window
    * over the LISTING (metadata: millions of rows at 100 TB, never the
    * data itself), partitioned by the table partition so planning
    * parallelizes across partitions.
    *
    * Name-order packing (vs first-fit-decreasing) is what the log-
    * structured stores ship: it preserves ingestion locality and needs
    * no global sort by size. Bins can overshoot by at most one file —
    * acceptable when targetBytes >> typical file size (the compaction
    * regime by definition).
    *
    * @return one row per file: (partCol, fileCol, bytesCol, bin) */
  def compactionPlan(files: DataFrame, partCol: String, fileCol: String,
                     bytesCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    files.select(col(partCol), col(fileCol),
        col(bytesCol).cast("bigint").as(bytesCol))
      .withColumn("bin",
        expr(s"coalesce(sum($bytesCol) over (partition by $partCol " +
          s"order by $fileCol rows between unbounded preceding and " +
          s"1 preceding), 0) div $targetBytes"))
  }

  /** The per-bin summary a compactor executes from: files + bytes per
    * output bin, with the single-file bins flagged (nothing to rewrite
    * there — skipping them is the idempotence property: re-planning
    * already-compacted output yields only single-file bins). */
  def compactionSummary(plan: DataFrame, partCol: String,
                        bytesCol: String): DataFrame =
    plan.groupBy(partCol, "bin")
      .agg(count(lit(1)).as("n_files"),
        sum(col(bytesCol)).as("total_bytes"))

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
