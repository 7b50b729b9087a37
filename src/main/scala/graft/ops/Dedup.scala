package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Fns

/** J2/J3 — idempotent-send dedup, plus exact record dedup.
  *
  * Reference: before enqueuing, probe the sent-message ledger by
  * (fileName, msgId) and skip if present (AzureTaskProducer/
  * inventory_lib.py:146-162); msgId = md5(endpoint+name+eventType)
  * (inventory_lib.py:74).
  *
  * Scale notes: the anti-join broadcasts when the sent-ledger is small
  * (Spark does this automatically under the broadcast threshold);
  * otherwise it is a shuffled hash join on msgId — the ledger should be
  * stored partitioned by msgId prefix so the probe is co-located.
  */
object Dedup {

  /** Skip tasks whose (fileName,msgId) already appears in the sent ledger. */
  def antiJoin(tasks: DataFrame, sentLedger: DataFrame,
               keys: Seq[String] = Seq("fileName", "msgId")): DataFrame =
    tasks.join(sentLedger.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** Attach the deterministic message id column. */
  def withMsgId(df: DataFrame, endpoint: Column, name: Column, eventType: Column): DataFrame =
    df.withColumn("msg_id", Fns.msgId(endpoint, name, eventType))

  /** Exact dedup: keep one representative row per value of `keyCols`,
    * choosing the row with the minimum `tieBreak` (deterministic, unlike
    * dropDuplicates). One shuffle on the dedup key.
    *
    * The whole row is selected ATOMICALLY — a single
    * `min_by(struct(allCols), struct(tieBreak, allCols))` — so even when
    * `tieBreak` is not unique within a key group, all output columns come
    * from the same input row (the full-row struct breaks remaining ties
    * totally, keeping the result deterministic). Per-column independent
    * min_by would stitch a frankenrow from different tied rows. */
  def exact(df: DataFrame, keyCols: Seq[String], tieBreak: String): DataFrame = {
    val all = df.columns.toSeq
    df.groupBy(keyCols.map(col): _*)
      .agg(min_by(
        struct(all.map(col): _*),
        struct(col(tieBreak) +: all.map(col): _*)).as("_rep"))
      .select(all.map(c => col(s"_rep.$c").as(c)): _*)
  }

  /** Incremental corpus ingest — the reference's sent-ledger pattern
    * (K7, AzureTaskProducer/inventory_lib.py:146-162) applied to
    * corpus refreshes: a new batch lands only the documents whose
    * content fingerprint is novel, both against the accumulated ledger
    * AND within the batch itself (daily crawls re-fetch yesterday's
    * pages; both layers must drop them). Re-running the same batch
    * against the updated ledger lands zero rows — the idempotency
    * that makes refresh pipelines restartable.
    *
    * Shape: one anti-join on the fingerprint (broadcast under the
    * threshold, else shuffled hash — store the ledger partitioned by
    * fingerprint prefix for co-location; duplicate ledger rows are
    * harmless to a left_anti join, so NO distinct pass runs over the
    * side that grows without bound) plus [[exact]]'s one-shuffle
    * winner pick inside the batch.
    *
    * @param ledgerFp the ledger's fingerprint column name ("fp" as
    *        written by [[updatedLedger]]) */
  def incrementalNovel(batch: DataFrame, id: String, fp: Column,
                       ledger: DataFrame, ledgerFp: String = "fp"): DataFrame = {
    val tagged = batch.withColumn("_fp", fp)
    val inBatch = exact(tagged, Seq("_fp"), id)
    inBatch.join(ledger.select(col(ledgerFp).as("_fp")),
        Seq("_fp"), "left_anti")
      .drop("_fp")
  }

  /** The ledger after landing a batch: previous fingerprints plus the
    * batch's (distinct union — the ledger stays one row per fp).
    *
    * @param ledgerFp the ledger's fingerprint column name, matching
    *        what [[incrementalNovel]] reads back */
  def updatedLedger(ledger: DataFrame, batch: DataFrame, fp: Column,
                    ledgerFp: String = "fp"): DataFrame =
    ledger.select(col(ledgerFp))
      .unionByName(batch.select(fp.as(ledgerFp)))
      .distinct()
}
