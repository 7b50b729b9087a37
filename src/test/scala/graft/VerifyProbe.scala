package graft

import org.apache.spark.sql.functions._

/** Throwaway drive-the-library probe (test scope — NOT library surface;
  * run with `sbt -batch "Test/runMain graft.VerifyProbe"`). Exercises
  * whatever changed most recently through a real session over the
  * driver testdata. */
object VerifyProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val sf = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$sf/documents.parquet")

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    docs.count() // warm the scan cache

    // Round-7 LSH ledger: bootstrap → persist → refresh-from-ledger →
    // append → idempotent re-land, the full production lifecycle.
    val root = java.nio.file.Files.createTempDirectory("probe_ledger").toString
    val withSets = docs.withColumn("_sh", ops.ApproxDedup.wordNgrams(col("text"), 2))
    val old = withSets.filter(col("doc_id") % 10 =!= 0)
    val batch = withSets.filter(col("doc_id") % 10 === 0)

    val boot = time("ledger-bootstrap") {
      val l = ops.ApproxDedup.lshLedger(old, "doc_id", "_sh", 16, 4, 4)
      l.buckets.write.parquet(s"$root/buckets")
      l.sets.write.parquet(s"$root/sets")
    }
    val ledger = ops.ApproxDedup.LshLedger(
      spark.read.parquet(s"$root/buckets"),
      spark.read.parquet(s"$root/sets"))

    val novel = time("refresh-from-ledger") {
      ops.ApproxDedup.incrementalLshNovelFromLedger(
        ledger, batch, "doc_id", "_sh", 16, 4, 4, threshold = 0.5)
        .localCheckpoint()
    }
    println(s"novel=${novel.count()} of batch=${batch.count()}")

    val selfContained = time("refresh-self-contained") {
      ops.ApproxDedup.incrementalLshNovel(
        old, batch, "doc_id", "_sh", 16, 4, 4, threshold = 0.5).count()
    }
    assert(novel.count() == selfContained,
      s"ledger form ${novel.count()} != self-contained $selfContained")

    val ledger1 = time("ledger-append") {
      val l = ops.ApproxDedup.updatedLshLedger(
        ledger, novel, "doc_id", "_sh", 16, 4, 4)
      l.buckets.write.parquet(s"$root/buckets2")
      l.sets.write.parquet(s"$root/sets2")
      ops.ApproxDedup.LshLedger(
        spark.read.parquet(s"$root/buckets2"),
        spark.read.parquet(s"$root/sets2"))
    }
    val reland = time("idempotent-reland") {
      ops.ApproxDedup.incrementalLshNovelFromLedger(
        ledger1, batch, "doc_id", "_sh", 16, 4, 4, threshold = 0.5).count()
    }
    assert(reland == 0L, s"re-landing the same batch kept $reland docs")

    println("PROBE_OK")
    spark.stop()
  }
}
