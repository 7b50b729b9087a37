package graft

import org.apache.spark.sql.functions._

/** Throwaway drive-the-library probe (test scope — NOT library surface;
  * run with `sbt -batch "Test/runMain graft.VerifyProbe"`). Exercises
  * whatever changed most recently through a real session over the
  * driver testdata. */
object VerifyProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val sf = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$sf/documents.parquet")

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    docs.count() // warm

    // where does pair mining spend: shingles vs signature vs join
    (1 to 2).foreach { rep =>
      val sets = docs
        .withColumn("_sh", ops.ApproxDedup.wordNgrams(col("text"), 2))
        .select(col("doc_id"), col("_sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time(s"shingle-persist-$rep") { sets.count() }
      val sig = ops.ApproxDedup.minhashSignature(sets, "doc_id", "_sh", 16)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time(s"signature-$rep") { sig.count() }
      val cand = ops.ApproxDedup.lshCandidatePairs(sig, "doc_id", 4, 4)
      time(s"candidates-$rep") { println("cand=" + cand.count()) }
      sets.unpersist(); sig.unpersist()
    }

    // quality-filter half
    (1 to 2).foreach { rep =>
      time(s"quality-filter-$rep") {
        exec.CorpusPipeline.filteredCorpus(docs).count()
      }
    }

    println("PROBE_OK")
    spark.stop()
  }
}
