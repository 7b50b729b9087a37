package graft

import org.apache.spark.sql.functions._

/** Throwaway drive-the-library probe (test scope — NOT library surface;
  * run with `sbt -batch "Test/runMain graft.VerifyProbe"`). Exercises
  * whatever changed most recently through a real session over the
  * driver testdata. */
object VerifyProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    import spark.implicits._
    import graft.ops.{CorpusStats, Distribution, RandomProjection, Similarity}

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sf01 = "/root/testdata/sf0.1"
    val emb = spark.read.parquet(s"$sf01/embeddings.parquet")
    val docs = spark.read.parquet(s"$sf01/documents.parquet")
    val nVec = emb.count()

    // ---- RP compression + compressed-domain serve + recall gate
    val sigs = time("rp signatures") {
      RandomProjection.signatures(emb, "vec_id", "embedding", 32, 64)
        .localCheckpoint()
    }
    require(sigs.count() == nVec, "one signature per vector")
    val plan = RandomProjection.signatures(emb, "vec_id", "embedding", 32, 64)
      .queryExecution.executedPlan.toString
    require(!plan.contains("Exchange"), "compression must be shuffle-free")
    val approx = time("hamming top-10") {
      RandomProjection.hammingTopK(sigs.filter($"vec_id" < 20), sigs,
        "vec_id", "vec_id", "rp_sig", k = 10).localCheckpoint()
    }
    val exact = time("exact top-10") {
      Similarity.bruteForceTopK(emb.filter($"vec_id" < 20), emb,
        "vec_id", "vec_id", "embedding", k = 10).localCheckpoint()
    }
    val recall = Similarity.recallAtK(approx, exact)
      .agg(avg($"recall_ppm")).head.getDouble(0)
    // the sf0.1 embeddings are near-isotropic (same-label vs other-label
    // cosine distributions almost coincide), so absolute recall@10 is
    // DATA-limited; the operator contracts to assert are (a) recall
    // beats the chance baseline k/(n-1), (b) the angular-LSH monotone
    // link: exact-neighbor pairs average LOWER hamming than random pairs
    val chancePpm = 10.0 * 1e6 / (nVec - 1)
    println(s"rp recall@10 (32 bits, n=$nVec): ${recall} ppm " +
      s"(chance ${chancePpm.toLong} ppm)")
    require(recall > 2 * chancePpm,
      s"RP recall must beat chance: $recall vs $chancePpm ppm")
    val hOf = sigs.select($"vec_id", $"rp_sig")
    def ham(pairs: org.apache.spark.sql.DataFrame): Double = pairs
      .join(hOf.withColumnsRenamed(Map("vec_id" -> "query_id", "rp_sig" -> "qs")), Seq("query_id"))
      .join(hOf.withColumnsRenamed(Map("vec_id" -> "corpus_id", "rp_sig" -> "cs")), Seq("corpus_id"))
      .agg(avg(bit_count($"qs".bitwiseXOR($"cs")))).head.getDouble(0)
    val hNear = ham(exact.select($"query_id", $"corpus_id"))
    val hFar = ham(approx.select($"query_id").distinct()
      .crossJoin(sigs.select($"vec_id".as("corpus_id")).filter($"corpus_id" % 37 === 0)))
    println(f"avg hamming: exact-top10 pairs $hNear%.2f vs random pairs $hFar%.2f")
    require(hNear < hFar - 1.0,
      s"angular-LSH monotonicity violated: near=$hNear far=$hFar")

    // ---- corpus analytics over sf0.1 documents
    val pmi = time("pmi w=2") {
      CorpusStats.pmi(docs, col("text"), window = 2, minCount = 5L)
        .localCheckpoint()
    }
    val nPairs = pmi.count()
    val zipf = time("zipf") {
      CorpusStats.zipf(docs, col("text")).localCheckpoint()
    }
    val vocab = zipf.count()
    require(nPairs <= vocab * vocab, "pairs bounded by vocab^2")
    val heaps = time("heaps curve") {
      CorpusStats.heapsCurve(docs, col("doc_id"), col("text"))
        .localCheckpoint()
    }
    val last = heaps.orderBy(col("ord").desc).limit(1)
      .select("vocab", "n_docs").as[(Long, Long)].head()
    require(last._1 == vocab,
      s"heaps curve must end at the full vocab: ${last._1} vs $vocab")
    require(last._2 == docs.count(), "curve spine covers every doc")

    // ---- robust MAD spike gate over sf0.1 events
    val ev = spark.read.parquet(s"$sf01/events.parquet")
    val sec = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000000")
      case _ => col("ts").cast("timestamp").cast("bigint")
    }
    val counts = ev
      .select(col("event_type"), sec.as("sec"))
      .withColumn("minute", expr("sec div 60"))
      .groupBy("event_type", "minute").agg(count(lit(1)).as("n"))
    val mad = time("mad outliers") {
      Distribution.madOutliers(counts, Seq("event_type"), col("n"), 3L)
        .collect()
    }
    mad.foreach(r => println(s"  ${r.mkString(" | ")}"))
    require(mad.nonEmpty && mad.forall(_.getAs[Long]("mad") >= 0))

    // ---- CDC-driven view maintenance at sf0.1 volume
    import graft.ops.MaterializedView
    import graft.sinks.VersionedStore
    val li = spark.read.parquet(s"$sf01/lineitem.parquet")
      .select(col("l_orderkey").as("k1"), col("l_linenumber").as("k2"),
        col("l_returnflag").as("g"),
        floor(col("l_extendedprice")).cast("bigint").as("v"))
      .groupBy("k1", "k2").agg(max("g").as("g"), max("v").as("v"))
    val root = java.nio.file.Files.createTempDirectory("vprobe3").toString + "/store"
    VersionedStore.upsert(li, Seq("k1", "k2"), root, nBuckets = 64)
    VersionedStore.upsert(
      li.filter(col("k1") % 10 === 0).withColumn("v", col("v") + 1L),
      Seq("k1", "k2"), root)
    VersionedStore.delete(
      li.filter(col("k1") % 20 === 0).select("k1", "k2"), root)
    val view1 = time("view@1 build") {
      MaterializedView.sumView(VersionedStore.readAsOf(spark, root, 1),
        Seq("g"), col("v")).localCheckpoint()
    }
    val refreshed = time("cdc view refresh 1->3") {
      MaterializedView.refreshSum(view1,
        VersionedStore.changelog(spark, root, 1, 3, images = true),
        Seq("g"), "v").orderBy("g").collect().toSeq
    }
    val scratch = MaterializedView.sumView(
        VersionedStore.readAsOf(spark, root, 3), Seq("g"), col("v"))
      .orderBy("g").collect().toSeq
    require(refreshed == scratch,
      s"incremental view != from-scratch: $refreshed vs $scratch")

    // ---- streaming epoch ingest: 3 landing files -> 3 epochs
    val work = java.nio.file.Files.createTempDirectory("vprobe3s").toString
    val estore = s"$work/store"
    time("epoch stream 3 batches") {
      graft.streaming.EpochStream.replay(spark,
        Seq(li.filter($"k1" % 3 === 0), li.filter($"k1" % 3 === 1),
          li.filter($"k1" % 3 === 2)),
        Seq("k1", "k2"), work, estore, nBuckets = 64)
    }
    require(VersionedStore.currentEpoch(estore) == 3L, "3 files -> 3 epochs")
    require(VersionedStore.read(spark, estore).count() == li.count(),
      "streamed store must hold the full corpus")

    // ---- mixed CDC apply at sf0.1 volume: one epoch per mixed batch
    val cdcBatch = li.filter($"k1" % 10 === 0).withColumn("v", $"v" + 1L)
      .withColumn("op", lit("upsert"))
      .unionByName(li.filter($"k1" % 10 === 5)
        .withColumn("v", lit(null).cast("long"))
        .withColumn("g", lit(null).cast("string"))
        .withColumn("op", lit("delete")))
    val eApply = time("cdc apply (mixed)") {
      VersionedStore.applyOps(cdcBatch, Seq("k1", "k2"), estore, "op")
    }
    require(eApply == 4L &&
      VersionedStore.commits(estore).last.kind == "apply")
    val nUp = li.filter($"k1" % 10 === 0).count()
    val nDel = li.filter($"k1" % 10 === 5).count()
    require(VersionedStore.read(spark, estore).count() ==
      li.count() - nDel, "apply must remove deletes and keep upserts")
    val cdcOut = VersionedStore.changelog(spark, estore, 3, 4)
      .groupBy("change").count().as[(String, Long)].collect().toMap
    require(cdcOut("update") == nUp && cdcOut("delete") == nDel,
      s"apply changelog: $cdcOut vs up=$nUp del=$nDel")

    // ---- snapshot export at sf0.1 volume + per-source KL drift
    val nFiles = time("export snapshot") {
      VersionedStore.exportSnapshot(spark, estore, 4, s"$work/pub")
    }
    require(spark.read.parquet(s"$work/pub").count() ==
      li.count() - nDel, s"export ($nFiles files) must equal the snapshot")
    val div = time("source divergence") {
      graft.ops.CorpusStats.sourceDivergence(docs, col("source"), col("text"))
        .orderBy(col("kl8_per_mtok").desc).limit(3)
        .as[(String, Long, Long, Long)].collect().toSeq
    }
    println(s"top drifted sources: $div")
    require(div.size == 3 && div.forall(_._2 > 0))

    println(s"PROBE OK  vecs=$nVec vocab=$vocab pmi_pairs=$nPairs " +
      s"recall=${recall.toLong}ppm types=${mad.length} view=$scratch")
    spark.stop()
  }
}
