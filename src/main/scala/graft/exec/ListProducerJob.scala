package graft.exec

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{SizeHistogram, TaskFanout}
import graft.sinks.Sinks
import graft.sources.InventoryReader

/** Module-0 pipeline (SURVEY.md §3.1): manifest scan → gzip-CSV
  * inventory scan → cumulative size histogram → task fan-out → enriched
  * job.json write-back + readback verify.
  *
  * One cached scan feeds two actions (stats + fan-out), mirroring the
  * reference's single pass (ListProducer.py:131-163) while letting Spark
  * parallelize across inventory shards.
  */
object ListProducerJob {

  /** Reference bucket names ↔ byte thresholds (ListProducer.py:22,63-100
    * — labels say GB/TB, thresholds are 1000-based BYTES; cumulative;
    * objects >5e9 excluded from buckets but counted in totalObjects). */
  val BucketNames: Seq[(String, Long)] = Seq(
    "totalObjectsSub1GB" -> 1000000L,
    "totalObjectsSub5GB" -> 5000000L,
    "totalObjectsSub10GB" -> 10000000L,
    "totalObjectsSub50GB" -> 50000000L,
    "totalObjectsSub100GB" -> 100000000L,
    "totalObjectsSub1TB" -> 1000000000L,
    "totalObjectsSub5TB" -> 5000000000L)

  /** The A1/A2 statistics row with reference field names. */
  def statistics(inventory: DataFrame): DataFrame = {
    val hist = SizeHistogram(inventory, col("Size"), BucketNames.map(_._2))
    BucketNames.foldLeft(hist.withColumnRenamed("total_objects", "totalObjects")) {
      case (df, (name, t)) => df.withColumnRenamed(s"sub_$t", name)
    }.drop("total_size")
  }

  case class Result(totalObjects: Long, corruptRows: Long, messages: Long)

  /** Run the full pipeline.
    * @param manifestPath  multi-line manifest.json
    * @param inventoryGlob gzip CSV shards (the manifest's files[], already
    *                      staged locally — the S3 download of
    *                      s3_utils.py:89-104 is the storage layer's job)
    * @param jobJsonPath   output job.json
    * @param queueDir      output task-message JSON dir (the SQS stand-in)
    */
  def run(spark: SparkSession, manifestPath: String, inventoryGlob: String,
          jobJsonPath: String, queueDir: String, dstBucket: String,
          queues: Int = 4, batchSize: Int = 100): Result = {
    val manifest = InventoryReader.readManifest(spark, manifestPath)

    // cache=true: raw feeds goodRows AND the corrupt-only count below —
    // released on every path (a failed write/readback must not orphan
    // the scan in a long-lived session)
    val raw = InventoryReader.readS3Inventory(spark, inventoryGlob, cache = true)
    val inv = InventoryReader.goodRows(raw).cache()
    try {

    // action 1: histogram statistics
    val statsRow = statistics(inv).first()
    val statsStruct = struct(
      ("totalObjects" +: BucketNames.map(_._1)).map(n =>
        lit(statsRow.getAs[Long](n)).as(n)): _*)

    // action 2: task fan-out (≤batchSize objects per message, hash-routed
    // across queues — ListProducer.py:109-118 with deterministic routing)
    val tasks = inv
      .withColumn("dst_bucket", lit(dstBucket))
      .select("Bucket", "Key", "Size", "ETag", "IsMultipartUploaded", "dst_bucket")
    val messages = TaskFanout.pack(
      tasks, abs(hash(col("Key")).cast("bigint")), Seq(col("Key")), queues, batchSize)
    messages.write.mode(SaveMode.Overwrite).json(queueDir)

    val corrupt = InventoryReader.corruptRows(raw).count()

    // enrich manifest → job.json (ListProducer.py:148-157)
    val job = manifest
      .withColumn("statistics", statsStruct)
      .withColumn("job_info", struct(
        lit("s3_inventory").as("src_type"),
        lit(queueDir).as("queue_url_prefix"),
        lit(queues).as("queue_num"),
        lit(batchSize).as("message_body_max_num"),
        lit(dstBucket).as("dst_bucket")))
    Sinks.writeJsonDoc(job, jobJsonPath)

    // readback verify (ListProducer.py:159-161)
    val back = Sinks.readJsonDoc(spark, jobJsonPath)
    require(back.select("statistics.totalObjects").first().getLong(0)
      == statsRow.getAs[Long]("totalObjects"), "job.json readback mismatch")

    val nMsg = spark.read.json(queueDir).count()
    Result(statsRow.getAs[Long]("totalObjects"), corrupt, nMsg)
    } finally {
      inv.unpersist()
      InventoryReader.unpersist(raw)
    }
  }
}
