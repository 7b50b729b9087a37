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
    import graft.sinks.VersionedStore
    import graft.streaming.FreqStream

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sf01 = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$sf01/documents.parquet")
    val work = "/tmp/verifyprobe_r11c"
    org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(work), true)

    // ---- schema evolution + lookup on a real-sized store
    val root = s"$work/store"
    val base = docs.select($"doc_id", $"source",
      length($"text").cast("long").as("len"))
    VersionedStore.upsert(base, Seq("doc_id"), root, nBuckets = 16)
    val e2 = time("evolve epoch") {
      VersionedStore.upsert(
        base.filter($"doc_id" % 7 === 0)
          .withColumn("quality", ($"len" % 100L).cast("long")),
        Seq("doc_id"), root, evolve = true)
    }
    require(e2 == 2L)
    require(VersionedStore.readAsOf(spark, root, 1L).columns.toSeq ==
      Seq("doc_id", "source", "len"), "epoch 1 must keep the old schema")
    val cur = VersionedStore.read(spark, root)
    require(cur.columns.contains("quality"))
    val nulls = cur.filter($"quality".isNull).count()
    val total = cur.count()
    val sevens = docs.filter($"doc_id" % 7 === 0).count()
    require(nulls == total - sevens,
      s"carried-forward rows must read null quality: $nulls vs $total-$sevens")

    val probeKeys = Seq(0L, 7L, 13L, 999999999L).toDF("doc_id")
    val got = time("lookup") {
      VersionedStore.lookup(spark, root, probeKeys)
        .select($"doc_id", $"quality").as[(Long, Option[Long])]
        .collect().toMap
    }
    require(got.contains(7L) && got(7L).isDefined && got(13L).isEmpty &&
      !got.contains(999999999L), s"lookup rows: $got")
    val bucketsRead = VersionedStore.lookup(spark, root, probeKeys)
      .inputFiles.flatMap(_.split("/").find(_.matches("^b\\d{5}$"))).toSet
    require(bucketsRead.size <= 4, s"lookup pruning: $bucketsRead")

    // ---- versioned MG ledger on the corpus token stream
    val toks = docs.select($"source".as("k"),
      explode(split($"text", "\\s+")).as("v")).filter($"v" =!= "")
    val inDir = s"$work/mg_in"
    val mstore = s"$work/mg_store"
    toks.filter($"k" =!= "src3").coalesce(1).write.parquet(inDir)
    val q = FreqStream.frequentToStore(spark, inDir, k = 8, mstore)
    time("mg stream 2 epochs") {
      try {
        q.processAllAvailable()
        toks.filter($"k" === "src3").coalesce(1)
          .write.mode("append").parquet(inDir)
        q.processAllAvailable()
      } finally q.stop()
    }
    require(VersionedStore.currentEpoch(mstore) == 2L)
    val led = VersionedStore.read(spark, mstore)
    require(led.groupBy("k").count().filter($"count" > 8).count() == 0,
      "every key's ledger holds <= k counters")
    require(VersionedStore.readAsOf(spark, mstore, 1L)
      .filter($"k" === "src3").count() == 0, "src3 lands only at epoch 2")

    println("VERIFYPROBE OK")
    spark.stop()
  }
}
