package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Fns

/** F9 — Azure Event-Grid notification rendering
  * (AzureTaskProducer/inventory_lib.py:62-100): one nested JSON event
  * per object, mimicking `Microsoft.Storage.BlobCreated|BlobDeleted`.
  *
  * Struct-first: the event is a typed `named_struct` rendered with
  * `to_json` only at the sink — so Catalyst sees (and can prune /
  * push into) real columns, and the render stays in codegen. The
  * reference builds the JSON by f-string splicing; the engine's id is
  * the same deterministic md5 (J3, inventory_lib.py:74).
  */
object EventJson {

  /** Build the typed event struct.
    * @param eventType "Microsoft.Storage.BlobCreated" or ...BlobDeleted
    *        (P8 dispatch on Variance upstream) */
  def eventStruct(storageAccount: Column, name: Column, size: Column,
                  etag: Column, eventType: Column, eventTimeIso: Column): Column = {
    val endpoint = Fns.azureEndpoint(storageAccount)
    struct(
      concat(lit("/subscriptions/graft/resourceGroups/rg/providers/"),
        lit("Microsoft.Storage/storageAccounts/"), storageAccount).as("topic"),
      concat(lit("/blobServices/default/containers/inventory/blobs/"), name).as("subject"),
      eventType.as("eventType"),
      Fns.msgId(endpoint, name, eventType).as("id"),
      struct(
        lit("PutBlob").as("api"),
        etag.as("eTag"),
        lit("application/octet-stream").as("contentType"),
        size.as("contentLength"),
        lit("BlockBlob").as("blobType"),
        Fns.blobUrl(endpoint, name).as("url")).as("data"),
      lit("1.0").as("dataVersion"),
      lit("1").as("metadataVersion"),
      eventTimeIso.as("eventTime"))
  }

  /** Attach `event` (struct) and `event_json` (rendered) columns. */
  def withEvent(df: DataFrame, storageAccount: Column, name: Column, size: Column,
                etag: Column, eventType: Column, eventTimeIso: Column): DataFrame = {
    val ev = eventStruct(storageAccount, name, size, etag, eventType, eventTimeIso)
    df.withColumn("event", ev).withColumn("event_json", to_json(ev))
  }
}
