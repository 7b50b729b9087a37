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

    // warm the JIT/scan cache once
    docs.count()

    // q64 stage isolation at sf0.1 (VERDICT r5 item 3):
    // (a) the filter stages + pair mining alone — via the SAME
    //     CorpusPipeline helpers q64 ships, so the probe can't drift
    val filtered = exec.CorpusPipeline.filteredCorpus(docs)
    val scoped = exec.CorpusPipeline.nearDupPairGraph(filtered, 0.6)
    val pairs = time("pair-mining") {
      scoped.df.localCheckpoint()
    }
    println(s"pairs=${pairs.count()}")

    // (b) CC alone on the materialized pairs — 5 reps, noise floor
    (1 to 5).foreach { r =>
      val cc = time(s"cc-survivors-$r") {
        ops.ConnectedComponents.survivors(filtered, "doc_id", pairs,
          "id_a", "id_b").count()
      }
      println(s"survivors=$cc")
    }
    scoped.release()

    // (c) the whole q64 as the bench runs it — 3 reps
    (1 to 3).foreach { r =>
      val full = time(s"q64-full-$r") {
        Queries.all("q64_full_clean")(spark, sf).count()
      }
      println(s"q64 rows=$full")
    }

    println("PROBE_OK")
    spark.stop()
  }
}
