package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function pack — SURVEY.md §2.7 (F1–F15).
  *
  * Everything here is built from `org.apache.spark.sql.functions` so it
  * stays inside whole-stage codegen; the only UDF in the library is the
  * multipart-ETag digest concat (see [[MultipartEtag]]), which has no
  * built-in equivalent.
  */
object Fns {

  /** F1 — S3-inventory key decode: '+' means space, then percent-decode.
    * Reference semantics: `unquote_plus` (ListProducer/ListProducer.py:26-27).
    * `url_decode` alone does NOT decode '+' the same way for '%2B', so
    * first protect literal "%2B", then swap '+'→' ' via the %20 escape.
    */
  def plusDecode(c: Column): Column =
    url_decode(regexp_replace(c, lit("\\+"), lit("%20")))

  /** F8/J3 — deterministic message id: md5(endpoint + name + eventType)
    * (AzureTaskProducer/inventory_lib.py:74). */
  def msgId(endpoint: Column, name: Column, eventType: Column): Column =
    md5(concat(endpoint, name, eventType))

  /** F4/F5 — floor a timestamp-in-epoch-seconds to a bucket of `unitSec`
    * seconds (TaskMonitor/s3_monitor_statistic.py:27-36, ddbModel.py:225). */
  def bucketFloor(epochSec: Column, unitSec: Int): Column =
    (epochSec.cast("bigint") / unitSec).cast("bigint") * unitSec

  /** F6 — ISO-8601 UTC render (inventory_lib.py:64-67). */
  def isoUtc(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")

  /** F10 — Azure endpoint synth (diff_azure_inventory_sqs.py:53). */
  def azureEndpoint(storageAccount: Column): Column =
    concat(lit("https://"), storageAccount, lit(".blob.core.windows.net"))

  /** F10 — blob url = endpoint + '/' + name. */
  def blobUrl(endpoint: Column, name: Column): Column =
    concat(endpoint, lit("/"), name)

  /** F11 — parse `s3://bucket/key...` (TaskExecutor/TaskExecutor.py:113-117). */
  def s3Bucket(uri: Column): Column =
    regexp_extract(uri, "^s3://([^/]+)/(.*)$", 1)
  def s3Key(uri: Column): Column =
    regexp_extract(uri, "^s3://([^/]+)/(.*)$", 2)

  /** F12 — 1000-based byte humanization with 1 decimal
    * (UICenter common.js:75-93; BytesConverterNumber=1000). */
  def humanBytes(bytes: Column): Column = {
    val units = Seq("B", "KB", "MB", "GB", "TB", "PB")
    val b = bytes.cast("double")
    // round() before format: printf-style rounding of a raw double is
    // rounding-mode-dependent across runtimes; round(x,1) is HALF_UP
    // everywhere, so the formatted digit is already settled.
    units.zipWithIndex.foldRight(lit(null).cast("string")) {
      case ((u, i), acc) =>
        val scale = math.pow(1000.0, i.toDouble)
        val cond =
          if (i == 0) b < 1000.0
          else if (i == units.size - 1) b >= scale
          else b >= scale && b < scale * 1000.0
        when(cond, concat(format_string("%.1f", round(b / scale, 1)), lit(u))).otherwise(acc)
    }
  }

  /** F13 — long parse with null on garbage (largeInventoryDiffToSQS.py:106-111). */
  def safeLong(c: Column): Column = c.cast("bigint")

  /** F15 — deterministic queue pick: `key mod n`, rendered `prefix-%03d`
    * (ListProducer.py:111-118 uses random; the engine replaces the random
    * pick with a stable hash-mod so task routing is reproducible). */
  def queueName(prefix: Column, key: Column, n: Int): Column =
    format_string("%s-%03d", prefix, pmod(key.cast("bigint"), lit(n.toLong)) + 1)

  /** P13 — string flag coercion (TaskExecutor.py:58-64). */
  def boolFlag(c: Column): Column = lower(c) === "true"
  def replicatedFlag(c: Column): Column =
    when(length(coalesce(c, lit(""))) > 0, 1).otherwise(0)

  /** P10 — null-key fallback (AzureEtagCheck/etag_app.py:185-187). */
  def keyOrBlob(s3Key: Column, blobName: Column): Column =
    coalesce(s3Key, blobName)
}
