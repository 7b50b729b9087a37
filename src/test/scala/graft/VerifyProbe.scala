package graft

import org.apache.spark.sql.functions._

/** Throwaway drive-the-library probe (test scope — NOT library surface;
  * run with `sbt -batch "Test/runMain graft.VerifyProbe"`). Exercises
  * whatever changed most recently through a real session over the
  * driver testdata. */
object VerifyProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")

    // 1) q26 path: near-dup pairs re-blocked on (label, LSH bucket) with
    //    the hot-block guard ON — must produce bounded blocks and rows
    val planes = ops.Similarity.hyperplanes(6, 64)
    val blocked = emb.withColumn("blk", concat_ws("/", col("label"),
      ops.Similarity.lshBucket(col("embedding").cast("array<double>"), planes)))
    val maxBlock = blocked.groupBy("blk").count()
      .agg(max("count")).first().getLong(0)
    val pairs = ops.Similarity.nearDupPairs(
      blocked, "vec_id", "blk", "embedding", 0.3, maxBlockRows = 1000)
    println(s"nearDup blocks max=$maxBlock pairs=${pairs.count()}")
    assert(maxBlock <= 1000)

    // 2) guard actually fires on a hot block
    val hot = emb.withColumn("blk", lit("all"))
    val fired =
      try { ops.Similarity.nearDupPairs(hot, "vec_id", "blk", "embedding", 0.3,
        maxBlockRows = 10).count(); false }
      catch { case e: IllegalArgumentException => e.getMessage.contains("nearDupPairs") }
    println(s"guard fired=$fired")
    assert(fired)

    // 3) q28 path: inverted-index Jaccard at 0.05 returns rows now, and
    //    the Scoped form releases its posting-list cache
    val bg = docs.filter(col("source") === "src0")
      .withColumn("blk", col("lang"))
      .withColumn("bigrams", ops.ApproxDedup.wordNgrams(col("text"), 2))
    val scoped = ops.ApproxDedup.jaccardPairsInvertedScoped(
      bg, "doc_id", "blk", "bigrams", 0.05)
    val nPairs = scoped.df.count()
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    scoped.release()
    val cachedAfter = spark.sparkContext.getPersistentRDDs.size
    println(s"inverted pairs=$nPairs cached $cachedBefore->$cachedAfter")
    assert(nPairs > 0 && cachedAfter < cachedBefore)

    // 4) reader default is now uncached: no persistent RDDs appear
    val dir = java.nio.file.Files.createTempDirectory("probe_inv").toString
    TestFixtures.writeS3InventoryGz(dir, "shard-0", TestFixtures.defaultInventoryRows)
    val before = spark.sparkContext.getPersistentRDDs.size
    val raw = sources.InventoryReader.readS3Inventory(spark, s"$dir/*.csv.gz")
    val good = sources.InventoryReader.goodRows(raw).count()
    val after = spark.sparkContext.getPersistentRDDs.size
    println(s"reader rows=$good persisted $before->$after")
    assert(good > 0 && after == before)

    println("PROBE_OK")
    spark.stop()
  }
}
