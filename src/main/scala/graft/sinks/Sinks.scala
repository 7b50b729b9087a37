package graft.sinks

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sinks — SURVEY.md §2.8 (K4/K5/K6) as Spark writers plus a
  * parquet-backed upsert store standing in for the DynamoDB stat table.
  */
object Sinks {

  /** K5 — single-document JSON write (job.json manifest write-back,
    * ListProducer.py:157; s3_utils.py:37-41). A manifest is one nested
    * document, not a table, so the render is a driver-side single-row
    * `toJSON`; the write is atomic via temp-file rename. */
  def writeJsonDoc(df: DataFrame, path: String): Unit = {
    val doc = df.toJSON.collect() match {
      case Array(one) => one
      case rows => rows.mkString("[", ",", "]")
    }
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    val tmp = Paths.get(path + ".tmp")
    Files.writeString(tmp, doc)
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** K5 readback verify (ListProducer.py:159-161). */
  def readJsonDoc(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)

  /** K6 — result CSVs partitioned by outcome (AzureEtagCheck/
    * etag_app.py:258-272 writes success vs errors files). */
  def writePartitionedCsv(df: DataFrame, path: String, partCol: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partCol)
      .option("header", "true")
      .csv(path)

  /** K4/J5 — keyed upsert into a parquet-backed store: new rows REPLACE
    * existing rows with the same key (the reference's update_item PUT of
    * per-bucket sums, s3_monitor_statistic.py:47-91). Batch-idempotent:
    * re-upserting the same batch is a no-op. Used standalone or from
    * `foreachBatch` in the streaming stats job.
    *
    * Write path is swap-by-rename so readers never observe a partial
    * store, and a crash at ANY point leaves a complete copy on disk:
    * the live store is renamed aside (`.old`) before the swap is
    * promoted, never deleted first, and [[recoverStore]] restores from
    * a leftover `.old`/`.swap` on the next call. At cluster scale this
    * store is a Delta/Iceberg MERGE, which shares this exact
    * key-replace contract (and its own transaction log). */
  def upsertParquet(batch: DataFrame, keyCols: Seq[String], storeDir: String): Unit = {
    val spark = batch.sparkSession
    recoverStore(storeDir)
    val existing =
      if (Files.exists(Paths.get(storeDir, "_SUCCESS")))
        Some(spark.read.parquet(storeDir))
      else None
    val merged = existing match {
      case Some(cur) =>
        cur.join(batch.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti")
          .unionByName(batch)
      case None => batch
    }
    val dir = Paths.get(storeDir)
    val old = Paths.get(storeDir + ".old")
    // the merged plan still READS the live store — write the swap first
    merged.write.mode(SaveMode.Overwrite).parquet(storeDir + ".swap")
    deleteRecursively(old)
    if (Files.exists(dir)) Files.move(dir, old)
    Files.move(Paths.get(storeDir + ".swap"), dir)
    deleteRecursively(old)
  }

  /** [[upsertParquet]] at log-structured cost: the store is
    * hash-partitioned into `nBuckets` bucket directories
    * (`b00000`…`bNNNNN`, key bucket = `pmod(hash(keyCols…), n)`), and
    * an upsert rewrites ONLY the buckets containing the batch's keys —
    * per-batch cost O(batch + touched buckets), not O(store), the
    * DynamoDB-update-item shape (the reference touches only written
    * keys, s3_monitor_statistic.py:47-91). Untouched bucket files are
    * never opened, never rewritten (PartitionedStoreSpec asserts
    * bit-identity). Each bucket keeps [[upsertParquet]]'s whole
    * crash-safety story — swap-by-rename + [[recoverStore]] — so a
    * crash at any point leaves every bucket complete. A crash BETWEEN
    * buckets leaves the store half-upserted; callers that need
    * batch-level replay safety get it the same way RefreshStream does
    * across stores: keyed idempotency (replaying the batch re-writes
    * identical rows) — no new failure mode is introduced.
    *
    * The bucket count is fixed at store creation (`_nbuckets` marker,
    * written atomically before the first bucket): a different `n` on a
    * later call is ignored in favor of the store's own — re-hashing
    * live keys into a new layout is a rebuild, not an upsert. The key
    * columns are recorded the same way (`_keycols`), making the store
    * self-describing for the DSv2 point-lookup reader
    * ([[graft.connectors.GraftStoreSource]] prunes buckets from pushed
    * key filters).
    *
    * CONCURRENCY CONTRACT — single writer, no concurrent reader during
    * a write: upserts are atomic per bucket (swap-by-rename) but not
    * across buckets, and [[readPartitioned]] heals (renames) crashed
    * buckets on read. A reader racing a writer's two-rename swap
    * window can observe a half-applied batch or contend on the moves.
    * Every in-repo caller serializes writes and reads (the streaming
    * maintainers run batches sequentially per store; replay idempotency
    * covers crash-retry) — a deployment needing snapshot-isolated
    * concurrent readers swaps in Delta/Iceberg MERGE, which is the
    * documented production analogue of this store. */
  def upsertPartitioned(batch: DataFrame, keyCols: Seq[String],
                        storeDir: String, nBuckets: Int = 8): Unit = {
    require(nBuckets > 0 && nBuckets <= 99999,
      s"nBuckets must be in [1, 99999], got $nBuckets")
    val spark = batch.sparkSession
    Files.createDirectories(Paths.get(storeDir))
    storeKeyCols(storeDir, keyCols)
    // heal EVERY crashed bucket before merging, not just the ones this
    // batch touches — an untouched bucket left mid-promotion must not
    // stay invisible across writes
    recoverPartitioned(storeDir)
    val n = storeBucketCount(storeDir, nBuckets)
    val withB = batch.withColumn("_bucket",
      pmod(hash(keyCols.map(col): _*), lit(n)))
    // one materialization of the batch; every touched bucket's merge
    // reads it (and the collect is bounded: ≤ n small ints)
    val mat = withB.localCheckpoint()
    val touched = mat.select("_bucket").distinct()
      .collect().map(_.getInt(0)).sorted
    touched.foreach { b =>
      val bDir = s"$storeDir/${bucketName(b)}"
      val bBatch = mat.filter(col("_bucket") === b).drop("_bucket")
      val merged =
        if (Files.exists(Paths.get(bDir, "_SUCCESS")))
          spark.read.parquet(bDir)
            .join(bBatch.select(keyCols.map(col): _*).distinct(),
              keyCols, "left_anti")
            .unionByName(bBatch)
        else bBatch
      // one file per bucket: the log-structured unit a reader opens
      merged.coalesce(1).write.mode(SaveMode.Overwrite).parquet(bDir + ".swap")
      val dir = Paths.get(bDir)
      val old = Paths.get(bDir + ".old")
      deleteRecursively(old)
      if (Files.exists(dir)) Files.move(dir, old)
      Files.move(Paths.get(bDir + ".swap"), dir)
      deleteRecursively(old)
    }
  }

  /** Read a partitioned store: recover any bucket a crash left
    * mid-promotion (a bucket whose live dir was renamed aside survives
    * only as `.old`/`.swap` — without recovery here its rows would
    * silently vanish from reads until the NEXT upsert happened to
    * touch it, and a self-excluding ledger view would under-exclude;
    * PartitionedStoreSpec pins the crash case), then union the live
    * bucket directories (explicit driver-side listing — never a glob
    * that could catch a `.swap`/`.old` sibling). At least one bucket
    * must exist (a store is always bootstrapped before it is read). */
  def readPartitioned(spark: SparkSession, storeDir: String): DataFrame = {
    recoverPartitioned(storeDir)
    val dirs = listBuckets(storeDir)
    require(dirs.nonEmpty, s"partitioned store has no buckets: $storeDir")
    spark.read.parquet(dirs: _*)
  }

  /** Run [[recoverStore]] for every bucket that exists in ANY form —
    * live, `.old`, or `.swap` — so a crash between "live aside" and
    * "promote swap" heals on the next read or write, not only when
    * that bucket is next written. */
  def recoverPartitioned(storeDir: String): Unit = {
    val root = Paths.get(storeDir)
    if (!Files.isDirectory(root)) return
    val it = Files.list(root).iterator()
    val names = scala.collection.mutable.Set.empty[String]
    while (it.hasNext) {
      val n = it.next().getFileName.toString
      n match {
        case BucketAnyRe(bucket) => names += bucket
        case _ =>
      }
    }
    names.toSeq.sorted.foreach(b => recoverStore(s"$storeDir/$b"))
  }

  private def bucketName(b: Int): String = f"b$b%05d"

  private val BucketRe = "^b\\d{5}$".r
  private val BucketAnyRe = "^(b\\d{5})(?:\\.old|\\.swap)?$".r

  private[graft] def listBuckets(storeDir: String): Seq[String] = {
    val root = Paths.get(storeDir)
    if (!Files.isDirectory(root)) return Seq.empty
    val it = Files.list(root).iterator()
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val p = it.next()
      if (BucketRe.matches(p.getFileName.toString) &&
          Files.exists(p.resolve("_SUCCESS")))
        out += p.toString
    }
    out.sorted.toSeq
  }

  /** Record the store's key columns at creation (`_keycols` marker,
    * atomic rename; first writer wins — same fixed-at-creation rule as
    * the bucket count, since the bucket hash is a function of them). */
  private def storeKeyCols(storeDir: String, keyCols: Seq[String]): Unit = {
    val meta = Paths.get(storeDir, "_keycols")
    if (!Files.exists(meta)) {
      val tmp = Paths.get(storeDir, "_keycols.tmp")
      Files.writeString(tmp, keyCols.mkString(","))
      Files.move(tmp, meta, StandardCopyOption.ATOMIC_MOVE)
    }
  }

  /** The store's fixed bucket count: read the `_nbuckets` marker, or
    * write it (atomic rename) on first creation. */
  private def storeBucketCount(storeDir: String, requested: Int): Int = {
    val meta = Paths.get(storeDir, "_nbuckets")
    if (Files.exists(meta)) Files.readString(meta).trim.toInt
    else {
      val tmp = Paths.get(storeDir, "_nbuckets.tmp")
      Files.writeString(tmp, requested.toString)
      Files.move(tmp, meta, StandardCopyOption.ATOMIC_MOVE)
      requested
    }
  }

  /** If a previous upsert crashed between "live aside" and "promote
    * swap", the accumulated store survives as `.old` (or as a complete
    * `.swap`); restore it instead of silently starting over from one
    * batch. No-op when the live store is healthy. */
  def recoverStore(storeDir: String): Unit = {
    val dir = Paths.get(storeDir)
    if (!Files.exists(dir.resolve("_SUCCESS"))) {
      val old = Paths.get(storeDir + ".old")
      val swap = Paths.get(storeDir + ".swap")
      if (Files.exists(old.resolve("_SUCCESS"))) {
        deleteRecursively(dir); Files.move(old, dir)
      } else if (Files.exists(swap.resolve("_SUCCESS"))) {
        deleteRecursively(dir); Files.move(swap, dir)
      }
    }
  }

  private[graft] def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
}
