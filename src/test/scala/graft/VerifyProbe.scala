package graft

import org.apache.spark.sql.functions._

/** Throwaway drive-the-library probe (test scope — NOT library surface;
  * run with `sbt -batch "Test/runMain graft.VerifyProbe"`). Exercises
  * whatever changed most recently through a real session over the
  * driver testdata. */
object VerifyProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    import graft.ops._

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sf01 = "/root/testdata/sf0.1"
    val emb = spark.read.parquet(s"$sf01/embeddings.parquet")

    // ---- PageRank over the sf0.1 semantic kNN graph
    val idx = time("ivf build") {
      Similarity.ivfIndexBuild(emb, "vec_id", "embedding", k = 8, iters = 2)
    }
    val edges = time("knn graph") {
      Similarity.knnGraph(idx.assignments, k = 3)
        .select(col("src_id"), col("dst_id")).localCheckpoint()
    }
    val total = 1000000000000L
    val ranks = time("pagerank 5 iters") {
      PageRank.pageRank(edges, "src_id", "dst_id", iters = 5, totalU = total)
        .localCheckpoint()
    }
    val n = ranks.count()
    val nNodes = edges.select(col("src_id").as("id"))
      .union(edges.select(col("dst_id").as("id"))).distinct().count()
    require(n == nNodes, s"one rank row per node: $n vs $nNodes")
    val mass = ranks.agg(sum("rank_u")).head.getLong(0)
    require(mass <= total && mass > total / 2,
      s"mass conserved up to truncation+dangling leak: $mass of $total")
    val base = 15L * (total / nNodes) / 100L
    val mn = ranks.agg(min("rank_u")).head.getLong(0)
    require(mn >= base, s"every node holds at least the teleport base: $mn >= $base")
    val top = ranks.orderBy(col("rank_u").desc, col("id")).limit(3).collect()
    println("top-3 central: " + top.map(r =>
      s"${r.getLong(0)}=${r.getLong(1)}").mkString(", "))
    require(top.head.getLong(1) > total / nNodes,
      "the most central node beats the uniform share")

    println("PROBE OK")
    spark.stop()
  }
}
