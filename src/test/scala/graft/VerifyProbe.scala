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

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // q60 stage split: kmeans fit/assign vs in-cell pair mining vs CC
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    emb.count() // warm
    (1 to 2).foreach { rep =>
      val assigned = time(s"assign-$rep") {
        val a = ops.SemanticDedup.assignClusters(emb, "vec_id", "embedding",
          k = 8, iters = 2)
        a.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          .count()
        a
      }
      val pairs = time(s"pairs-$rep") {
        val p = ops.Similarity.nearDupPairs(assigned, "vec_id",
          "centroid_id", "cv", 0.3, 0)
        p.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          .count()
        p
      }
      time(s"cc-$rep") {
        ops.ConnectedComponents(pairs, "id_a", "id_b").count()
      }
      println("cc-rounds=" + ops.ConnectedComponents.lastRounds.get)
      assigned.unpersist(); pairs.unpersist()
    }

    println("PROBE_OK")
    spark.stop()
  }
}
