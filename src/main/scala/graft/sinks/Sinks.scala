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
