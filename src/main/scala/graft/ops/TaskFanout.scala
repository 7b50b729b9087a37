package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fan-out / fan-in of task messages — SURVEY.md §2.10(5), K1.
  *
  * Reference: ListProducer packs ≤100 inventory records per SQS message
  * (message_body_max_num at ListProducer.py:17, batching :109-118) into
  * one of N queues picked at random (:111-118); TaskExecutor unpacks the
  * JSON array back into per-object actions (TaskExecutor.py:47-53).
  *
  * Engine form: deterministic queue routing (hash-mod instead of random —
  * reproducible and uniformly balanced), batch key = row_number within
  * queue div batchSize, message body = to_json(collect_list(struct)).
  * Unpack = explode(from_json(...)): a lossless round trip.
  *
  * Scale: the window is partitioned BY QUEUE, so each queue's numbering
  * is an independent partition-local sort — with N queues sized to the
  * cluster (reference runs up to 100), no single-partition bottleneck.
  */
object TaskFanout {

  /** Assign queue + batch ids. `routeKey` must be non-null; `orderKeys`
    * must be a unique ordering within each queue (determinism). */
  def withBatchKeys(df: DataFrame, routeKey: Column, orderKeys: Seq[Column],
                    queues: Int, batchSize: Int): DataFrame = {
    val w = Window.partitionBy(col("queue")).orderBy(orderKeys: _*)
    df.withColumn("queue", pmod(routeKey.cast("bigint"), lit(queues.toLong)).cast("int"))
      .withColumn("batch_id", ((row_number().over(w) - 1) / batchSize).cast("bigint"))
  }

  /** Pack: one row per (queue, batch) with the JSON message body.
    *
    * Intra-message order follows `orderKeys` — the same ordering used for
    * batch assignment — matching the reference's inventory-file order
    * (ListProducer.py:109-118 appends in scan order). The sort key is an
    * explicit comparator over the orderKeys struct only, so the payload
    * may contain unorderable types (maps) and never influences order. */
  def pack(df: DataFrame, routeKey: Column, orderKeys: Seq[Column],
           queues: Int, batchSize: Int): DataFrame = {
    val payloadCols = df.columns.toIndexedSeq.map(col)
    val tagged = withBatchKeys(df, routeKey, orderKeys, queues, batchSize)
    val okStruct = struct(orderKeys: _*)
    val collected = collect_list(struct(okStruct.as("o"), struct(payloadCols: _*).as("p")))
    val ordered = transform(
      array_sort(collected, (l, r) =>
        when(l.getField("o") < r.getField("o"), -1)
          .when(l.getField("o") > r.getField("o"), 1)
          .otherwise(0)),
      s => s.getField("p"))
    tagged
      .groupBy(col("queue"), col("batch_id"))
      .agg(
        count(lit(1)).as("n_objects"),
        to_json(ordered).as("body"))
  }

  /** Unpack: explode a JSON-array message body back into typed rows. */
  def unpack(messages: DataFrame, body: Column,
             elementSchema: org.apache.spark.sql.types.StructType): DataFrame = {
    import org.apache.spark.sql.types.ArrayType
    messages
      .withColumn("action", explode(from_json(body, ArrayType(elementSchema))))
      .select(col("queue"), col("batch_id"), col("action.*"))
  }
}
