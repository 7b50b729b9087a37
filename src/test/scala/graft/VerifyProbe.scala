package graft

import org.apache.spark.sql.functions._

/** Throwaway drive-the-library probe (test scope — NOT library surface;
  * run with `sbt -batch "Test/runMain graft.VerifyProbe"`). Exercises
  * whatever changed most recently through a real session over the
  * driver testdata. */
object VerifyProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sf01 = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$sf01/documents.parquet")
    docs.count() // warm scan
    val ShBits = 60

    // OLD shape: plain pairs, no checkpoint, cache left behind
    (1 to 2).foreach { rep =>
      time(s"old-plain-$rep") {
        val sig = ops.ApproxDedup.simhash(docs, "doc_id", col("text"), ShBits)
        ops.ApproxDedup.simhashPairs(sig, "doc_id", "simhash", ShBits, 4, 20)
          .orderBy("id_a", "id_b").count()
      }
    }
    spark.catalog.clearCache()
    // NEW shape: scoped + localCheckpoint + release
    (1 to 2).foreach { rep =>
      time(s"new-ckpt-$rep") {
        val sig = ops.ApproxDedup.simhash(docs, "doc_id", col("text"), ShBits)
        val sc = ops.ApproxDedup.simhashPairsScoped(sig, "doc_id", "simhash", ShBits, 4, 20)
        val pairs = sc.df.localCheckpoint()
        sc.release()
        pairs.orderBy("id_a", "id_b").count()
      }
    }
    // scoped WITHOUT checkpoint: count first, then release
    (1 to 2).foreach { rep =>
      time(s"scoped-count-$rep") {
        val sig = ops.ApproxDedup.simhash(docs, "doc_id", col("text"), ShBits)
        val sc = ops.ApproxDedup.simhashPairsScoped(sig, "doc_id", "simhash", ShBits, 4, 20)
        val n = sc.df.orderBy("id_a", "id_b").count()
        sc.release()
        n
      }
    }
    println(s"cacheManager empty: ${spark.sharedState.cacheManager.isEmpty}")
    println("PROBE_OK")
    spark.stop()
  }
}
