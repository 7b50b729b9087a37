package graft

import org.apache.spark.sql.functions._

/** Long-session cache hygiene: repeated pipeline/op runs must not
  * accumulate orphaned cached relations (the round-4 ADVICE leak class:
  * every `readS3Inventory` call cached, nothing released).
  *
  * The assertions snapshot `sc.getPersistentRDDs` around each run and
  * require the non-checkpoint delta to drain to zero. Locally
  * CHECKPOINTED rdds (ConnectedComponents' per-round label frames, the
  * survivor lists) are excluded: their blocks free on GC by design, so
  * their ids may linger in the map without being a leak. */
class CacheLifetimeSpec extends SparkSpec {

  /** Ids of persisted, NON-locally-checkpointed rdds. */
  private def cachedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs
      .filter { case (_, rdd) => !rdd.isCheckpointed }
      .keySet.toSet

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("N ListProducerJob runs leave no cached relations behind") {
    val root = tmpDir("cache_lpj")
    val invDir = s"$root/inventory"
    TestFixtures.writeS3InventoryGz(invDir, "shard-0",
      TestFixtures.defaultInventoryRows)
    val manifestPath = TestFixtures.writeManifest(root, Seq(
      ("shard-0.csv.gz", 1L, "x")))
    val before = cachedIds
    for (i <- 1 to 3)
      exec.ListProducerJob.run(spark, manifestPath, s"$invDir/*.csv.gz",
        s"$root/job$i.json", s"$root/queue$i", dstBucket = "dstb",
        queues = 2, batchSize = 3)
    assert((cachedIds -- before).isEmpty,
      "ListProducerJob orphaned cached relations")
  }

  test("N CorpusPipeline.clean runs leave no cached relations behind") {
    val before = cachedIds
    for (_ <- 1 to 2)
      exec.CorpusPipeline.clean(spark, docs, minTokens = 4,
        maxPunctRatio = 0.5, nearDupThreshold = 0.6)
    assert((cachedIds -- before).isEmpty,
      "CorpusPipeline.clean orphaned cached relations")
  }

  test("scoped dedup/curation ops release their internal caches") {
    val d = docs.withColumn("blk", col("lang"))
      .withColumn("grams", ops.ApproxDedup.wordNgrams(col("text"), 2))
    val before = cachedIds

    val jac = ops.ApproxDedup.jaccardPairsInvertedScoped(
      d, "doc_id", "blk", "grams", 0.05)
    jac.df.count(); jac.release()

    val mh = ops.ApproxDedup.minhashLshPairsScoped(
      d, "doc_id", "grams", k = 16, bands = 4, rowsPerBand = 4, 0.5)
    mh.df.count(); mh.release()

    val sig = ops.ApproxDedup.simhash(d, "doc_id", col("text"))
    val sh = ops.ApproxDedup.simhashPairsScoped(
      sig, "doc_id", "simhash", bits = 60, bands = 6, maxHamming = 8)
    sh.df.count(); sh.release()

    val iw = ops.Curation.importanceWeightsScoped(
      d, "doc_id", col("text"), col("lang") === "en")
    iw.df.count(); iw.release()

    val cs = ops.Curation.crossDocSpansScoped(d, "doc_id", col("text"), 3)
    cs.df.count(); cs.release()

    assert((cachedIds -- before).isEmpty,
      "a scoped op failed to release its cache")
  }

  test("N CC / star-contraction runs leave no growing checkpoint footprint") {
    // Per-round localCheckpoint frames (min-label labels, starLoop edge
    // sets) hold block-manager blocks until their RDDs are GC'd and the
    // ContextCleaner unpersists them. A long-lived session running CC in
    // a loop must see that footprint DRAIN, not grow — this is the
    // round-5 item-8 audit as a regression test.
    import spark.implicits._
    def ckptCount: Int = spark.sparkContext.getPersistentRDDs
      .count { case (_, rdd) => rdd.isCheckpointed }
    def edges = (1L until 13L).map(i => (i, i + 1))
      .++(for { i <- 100L to 106L; j <- (i + 1) to 106L } yield (i, j))
      .toDF("a", "b")
    val before = ckptCount
    for (_ <- 1 to 3) {
      ops.ConnectedComponents(edges, "a", "b").count()
      ops.ConnectedComponents.starContraction(edges, "a", "b").count()
    }
    // every loop frame is unreachable now; GC + the async ContextCleaner
    // must return the block manager to (at most) its baseline
    val drained = (1 to 40).exists { _ =>
      System.gc()
      if (ckptCount <= before) true else { Thread.sleep(500); false }
    }
    assert(drained,
      s"checkpoint footprint grew and never drained: $ckptCount vs $before")
  }

  test("scoped results stay usable (cache released, plan re-derivable)") {
    val d = docs.limit(50)
      .withColumn("blk", lit("b"))
      .withColumn("grams", ops.ApproxDedup.wordNgrams(col("text"), 2))
    val jac = ops.ApproxDedup.jaccardPairsInvertedScoped(
      d, "doc_id", "blk", "grams", 0.01)
    val n = jac.df.count()
    jac.release()
    // after release the frame re-derives from source — same result
    assert(jac.df.count() == n)
  }
}
