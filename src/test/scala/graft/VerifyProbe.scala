package graft

import org.apache.spark.sql.functions._

/** Throwaway probe main (test scope) — rewritten per verify wave.
  * Wave: round-14 epoch-commit-tax profile — where do q159/q200/q202
  * actually spend their wall time after the observation-stats +
  * link-fence + broadcast-decomposition changes? Times each phase of
  * the LmStream and EpochStream shapes at sf0.1 so the remaining
  * per-epoch constant is attributable. */
object VerifyProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    import graft.sinks.{Sinks, VersionedStore}
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROBE $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    // warm up session/codegen
    spark.read.parquet(s"$sf/documents.parquet").count()

    // ---------------- q159 shape: LmStream bootstrap + 2 batches
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val isBatch = graft.ops.Curation.hashBucket(col("doc_id"), "drift:", 10) === 0
    val root = java.nio.file.Files.createTempDirectory("probe_q159").toString
    val stream = graft.streaming.LmStream("doc_id", col("text"), 3)
    timed("lm.bootstrap")(stream.bootstrap(docs.filter(!isBatch), root))
    val half = pmod(hash(col("doc_id")), lit(2))
    val b0 = timed("lm.batch0.materialize")(
      docs.filter(isBatch).filter(half === 0).localCheckpoint())
    val b1 = docs.filter(isBatch).filter(half === 1).localCheckpoint()
    timed("lm.processBatch(0)")(stream.processBatch(b0, 0L, root))
    timed("lm.processBatch(1)")(stream.processBatch(b1, 1L, root))
    timed("lm.serve")(graft.ops.CorpusSignals
      .lmCountsFromRaw(stream.counts(spark, root), minCount = 3L).count())

    // the same two batches again through a REAL stream, to price the
    // structured-streaming fixed overhead (checkpoint dirs, triggers)
    val root2 = java.nio.file.Files.createTempDirectory("probe_q159s").toString
    timed("lm.bootstrap2")(stream.bootstrap(docs.filter(!isBatch), root2))
    val landing = s"$root2/landing"
    timed("lm.stream.2batches") {
      docs.filter(isBatch).filter(half === 0)
        .write.mode("append").parquet(landing)
      val q = stream.start(spark, landing, docs.schema, root2)
      try {
        q.processAllAvailable()
        docs.filter(isBatch).filter(half === 1)
          .write.mode("append").parquet(landing)
        q.processAllAvailable()
      } finally q.stop()
    }

    // ---------------- q200 shape: EpochStream, 3 COW epochs
    val sup = spark.read.parquet(s"$sf/supplier.parquet").select(
      col("s_suppkey").cast("bigint").as("k"),
      floor(col("s_acctbal")).cast("bigint").as("v"))
    val root3 = java.nio.file.Files.createTempDirectory("probe_q200").toString
    val phases = Seq(
      sup.filter(col("k") % 3 === 0), sup.filter(col("k") % 3 === 1),
      sup.filter(col("k") % 2 === 0))
    timed("epoch.replay.3cow")(graft.streaming.EpochStream.replay(
      spark, phases, Seq("k"), root3 + "/w", root3 + "/store"))
    timed("epoch.read")(VersionedStore.read(spark, root3 + "/store").count())

    // raw upsert cadence without streaming: 5 epochs back to back
    val root4 = java.nio.file.Files.createTempDirectory("probe_ups").toString + "/store"
    timed("vstore.upsert.seed")(VersionedStore.upsert(sup, Seq("k"), root4))
    (1 to 4).foreach { i =>
      timed(s"vstore.upsert.$i")(VersionedStore.upsert(
        sup.filter(col("k") % 17 === i), Seq("k"), root4))
    }

    // raw Sinks cadence: 5 partitioned upserts back to back
    val root5 = java.nio.file.Files.createTempDirectory("probe_sinks").toString + "/st"
    timed("sinks.upsert.seed")(Sinks.upsertPartitioned(
      sup.withColumn("last_epoch", lit(-1L)), Seq("k"), root5))
    (1 to 4).foreach { i =>
      timed(s"sinks.upsert.$i")(Sinks.upsertPartitioned(
        sup.filter(col("k") % 17 === i).withColumn("last_epoch", lit(i.toLong)),
        Seq("k"), root5))
    }

    // ---- decompose one upsert-shaped write into its phases
    val batch = sup.filter(col("k") % 17 === 9)
      .withColumn("last_epoch", lit(9L))
    val mat = timed("phase.localCheckpoint")(
      batch.withColumn("_bucket", pmod(hash(col("k")), lit(8)))
        .localCheckpoint())
    val touched = timed("phase.touchedCollect")(
      mat.select("_bucket").distinct().collect().map(_.getInt(0)).sorted.toSeq)
    val live = Sinks.listBuckets(root5)
    val cur = spark.read.parquet(live: _*)
      .withColumn("_bucket", pmod(hash(col("k")), lit(8)))
    val merged = cur.join(mat.select(col("k")).distinct(), Seq("k"), "left_anti")
      .unionByName(mat)
    val stag = java.nio.file.Files.createTempDirectory("probe_stage").toString
    timed("phase.stagedWrite")(
      merged.repartition(touched.length, col("_bucket"))
        .write.mode("overwrite").partitionBy("_bucket").parquet(stag))
    timed("phase.stagedWrite2")(
      merged.repartition(touched.length, col("_bucket"))
        .write.mode("overwrite").partitionBy("_bucket").parquet(stag))
    val shaped = merged.repartition(touched.length, col("_bucket"))
    val obs2 = graft.sinks.DataSkipping.observeStats(shaped, touched,
      org.apache.spark.sql.types.StructType(mat.schema.filterNot(_.name == "_bucket")),
      counts = true)
    timed("phase.stagedWrite.observed")(
      obs2.map(_._1).getOrElse(shaped)
        .write.mode("overwrite").partitionBy("_bucket").parquet(stag))
    timed("phase.harvest")(obs2.foreach { o => o._2.harvest(); o._2.harvestRows() })
    timed("phase.recover")(Sinks.recoverPartitioned(root5))
    timed("phase.readInfer")(spark.read.parquet(live: _*).schema)
    timed("phase.readInfer2")(spark.read.parquet(live: _*).schema)
    timed("phase.readExplicit")(
      spark.read.schema(org.apache.spark.sql.types.StructType(
        batch.schema)).parquet(live: _*).count())
    timed("sinks.upsert.9b")(Sinks.upsertPartitioned(
      sup.filter(col("k") % 17 === 10).withColumn("last_epoch", lit(10L)),
      Seq("k"), root5))

    // micro: 16 atomic-replace marker writes vs 16 direct creates
    locally {
      val p0 = new org.apache.hadoop.fs.Path(root5)
      val fsl = p0.getFileSystem(spark.sparkContext.hadoopConfiguration)
      timed("micro.writeMarker.replx16") {
        (1 to 16).foreach(i => graft.sinks.Sinks.writeMarker(fsl,
          new org.apache.hadoop.fs.Path(root5, s"_probe$i"), "x" * 100,
          replace = true))
      }
      timed("micro.writeMarker.norepl16") {
        (1 to 16).foreach(i => graft.sinks.Sinks.writeMarker(fsl,
          new org.apache.hadoop.fs.Path(root5, s"_probeB$i"), "x" * 100,
          replace = false))
      }
      timed("micro.create.directx16") {
        (1 to 16).foreach { i =>
          val o = fsl.create(
            new org.apache.hadoop.fs.Path(root5, s"_probeC$i"), true)
          o.write(("x" * 100).getBytes); o.close()
        }
      }
      timed("micro.renamex16") {
        (1 to 16).foreach { i =>
          fsl.rename(new org.apache.hadoop.fs.Path(root5, s"_probeC$i"),
            new org.apache.hadoop.fs.Path(root5, s"_probeD$i"))
        }
      }
    }
    spark.stop()
  }
}
