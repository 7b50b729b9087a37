package graft

import org.apache.spark.sql.functions._

/** Throwaway drive-the-library probe (test scope — NOT library surface;
  * run with `sbt -batch "Test/runMain graft.VerifyProbe"`). Exercises
  * whatever changed most recently through a real session over the
  * driver testdata. */
object VerifyProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"

    // 1) per-queue budget cap: plan must show a PARTITIONED window
    val q30 = Queries.all("q30_budget_cap")(spark, sf)
    val plan = q30.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), "expected a window in q30")
    println(s"q30 rows=${q30.count()} (partitioned window: " +
      !plan.contains("No Partition Defined") + ")")

    // 2) k-means trained IVF over the real embeddings table
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = ops.Similarity.kmeansFit(emb, "vec_id", "embedding", k = 4, iters = 2)
    println(s"kmeans centroids: ${cents.length} x ${cents.head.length}")
    val centDf = cents.zipWithIndex.map { case (c, i) => (i.toLong, c.toSeq) }
      .toSeq.toDF("vec_id", "embedding")
    val topk = ops.Similarity.ivfTopK(emb.filter(col("vec_id") < 3), emb, centDf,
      "vec_id", "vec_id", "vec_id", "embedding", k = 3)
    println(s"ivf topk rows=${topk.count()}")

    // 3) checksum validation over a real gzip shard fixture
    val root = java.nio.file.Files.createTempDirectory("probe").toString
    Seq("\"b\",\"k\",\"1\",\"t\",\"e\",\"s\",\"true\",\"\"").toDF("value")
      .coalesce(1).write.option("compression", "gzip").text(s"$root/shards")
    val shard = java.nio.file.Files.list(java.nio.file.Paths.get(s"$root/shards"))
      .filter(p => p.toString.endsWith(".gz")).findFirst().get()
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest(java.nio.file.Files.readAllBytes(shard)).map("%02x".format(_)).mkString
    val manifest = Seq((s"inv/${shard.getFileName}", java.nio.file.Files.size(shard), md5hex))
      .toDF("key", "size", "md5")
    val validated = sources.InventoryReader.validateChecksums(
      spark, manifest, s"$root/shards")
    validated.select("file_name", "checksum_status").show(false)
    assert(sources.InventoryReader.validShards(validated).count() == 1)

    // 4) connector-trait streaming pipeline end to end
    val q = connectors.FileQueue(s"$root/queue", streaming.TaskPipeline.messageSchema)
    q.enqueue(Seq((0, 0L, 1,
      """[{"Bucket":"b","Key":"k1","Size":5,"ETag":"e","dst_bucket":"d"}]"""))
      .toDF("queue", "batch_id", "receive_count", "body"))
    val sq = streaming.TaskPipeline.runExecutor(spark, q, s"$root/log",
      connectors.FileQueue(s"$root/dlq", streaming.TaskPipeline.messageSchema),
      s"$root/ckpt", lit(false))
    sq.processAllAvailable(); sq.stop()
    val logged = spark.read.parquet(s"$root/log").count()
    println(s"trait pipeline logged=$logged")
    assert(logged == 1)

    // 5) incremental stats through the KeyedStore trait
    val store = connectors.ParquetStore(s"$root/stat")
    streaming.TaskPipeline.statsIncrement(spark, s"$root/log", store)
    println(s"stat rows=${store.read(spark).get.count()}")

    // 6) new text operators over the real documents table
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val nBpe = docs.select(ops.TextAnalysis.bpeTokenCount(col("text"))).first().getLong(0)
    val nFps = docs.select(explode(
      ops.TextAnalysis.winnow(substring(col("text"), 1, 256), 5, 8))).count()
    println(s"bpe first-doc tokens=$nBpe, winnow fingerprints=$nFps")
    assert(nBpe > 0 && nFps > 0)

    // 7) multimodal frame sampling fan-out
    val frames = ops.Multimodal.sampleFrames(spark,
      ops.Multimodal.withPayload(docs, "text"), "doc_id", "payload", 2).count()
    println(s"sampled frames=$frames")
    assert(frames >= docs.count())

    // 8) ranged-read multipart etag recompute over the checksum fixture
    val etags = functions.MultipartEtag.etagOfFiles(spark, s"$root/shards", 512)
    println(s"ranged etags=${etags.count()}")
    assert(etags.filter(col("etag").isNotNull).count() == 1)

    // 9) SimHash pair mining with the banding path + capped inverted index
    val sig = ops.ApproxDedup.simhash(docs, "doc_id", col("text"), 60)
    val pairs = ops.ApproxDedup.simhashPairs(sig, "doc_id", "simhash", 60, 4, 20).count()
    val inv = ops.ApproxDedup.jaccardPairsInverted(
      docs.withColumn("blk", col("lang"))
        .withColumn("bg", ops.ApproxDedup.wordNgrams(col("text"), 2)),
      "doc_id", "blk", "bg", 0.3, maxDf = 50).count()
    println(s"simhash pairs=$pairs, capped inverted pairs=$inv")

    println("PROBE_OK")
    spark.stop()
  }
}
