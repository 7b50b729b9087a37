package graft

import org.apache.spark.sql.functions._

/** Scale-rehearsal probe (test scope — run with
  * `sbt -batch "Test/runMain graft.ScalingProbe"`): runs the ITERATIVE
  * operators at sf0.01 and sf0.1 and prints SCALING.md's table rows —
  * round counts must stay flat as the data grows 10×, because every
  * round is a full shuffle over the working set and a round count that
  * grew with data would multiply, not add, at 100 TB. */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    import graft.ops._

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    for (sf <- Seq("sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val nDocs = docs.count()

      // the q64 pair graph, via the SAME pipeline q64 ships
      val filtered = exec.CorpusPipeline.filteredCorpus(docs)
      val scoped = exec.CorpusPipeline.nearDupPairGraph(filtered, 0.6)
      val pairs = scoped.df.localCheckpoint()
      val nPairs = pairs.count()

      val (ccN, ccT) = timed {
        ConnectedComponents(pairs, "id_a", "id_b", maxLocalEdges = 0).count()
      }
      val ccRounds = ConnectedComponents.lastRounds.get

      val (scN, scT) = timed {
        ConnectedComponents.starContraction(pairs, "id_a", "id_b").count()
      }
      val scRounds = ConnectedComponents.lastRounds.get
      scoped.release()

      val (sdN, sdT) = timed {
        // maxLocalEdges = 0: this probe measures the DISTRIBUTED
        // loop's round count (the 100 TB multiplier) — the adaptive
        // local path would make the column a constant 1
        SemanticDedup.survivors(emb, "vec_id", "embedding",
          k = 8, iters = 2, threshold = 0.3, maxLocalEdges = 0).count()
      }
      val sdRounds = ConnectedComponents.lastRounds.get // CC inside q60

      val (gcN, gcT) = timed {
        Curation.cappedPerGroup(docs.select(col("doc_id"), col("source")),
          "source", "doc_id", k = 20).count()
      }

      val (ldN, ldT) = timed {
        val lines = CorpusSignals.syntheticLines(docs, "doc_id",
          col("text"), wordsPerLine = 10)
        CorpusSignals.lineDedup(lines, "doc_id", "line_no", "line").count()
      }

      println(f"ROW $sf docs=$nDocs pairs=$nPairs | " +
        f"cc rounds=$ccRounds t=$ccT%.2f n=$ccN | " +
        f"star rounds=$scRounds t=$scT%.2f n=$scN | " +
        f"semdedup ccRounds=$sdRounds kmeansIters=2 t=$sdT%.2f n=$sdN | " +
        f"groupCap stages=2 t=$gcT%.2f n=$gcN | " +
        f"lineDedup t=$ldT%.2f n=$ldN")

      // incremental refresh vs full re-mine. NOT a local wall-time win
      // (at toy scale the refresh runs MORE jobs and is slower — see
      // SCALING.md's honest reading); the claims under measurement are
      // flat refresh wall-time across the 10× and the structural
      // absence of the old×old candidate space.
      val wsAll = docs.withColumn("_sh", ApproxDedup.wordNgrams(col("text"), 2))
      val (incN, incT) = timed {
        val sc1 = ApproxDedup.incrementalLshNovelScoped(
          wsAll.filter(col("doc_id") % 10 =!= 0),
          wsAll.filter(col("doc_id") % 10 === 0),
          "doc_id", "_sh", 16, 4, 4, 0.5)
        val n = sc1.df.count(); sc1.release(); n
      }
      val (fullN, fullT) = timed {
        val sc2 = ApproxDedup.minhashLshPairsScoped(wsAll, "doc_id", "_sh",
          16, 4, 4, 0.5)
        val n = sc2.df.count(); sc2.release(); n
      }
      val (isdN, isdT) = timed {
        SemanticDedup.incrementalSurvivors(
          emb.filter(col("vec_id") % 10 =!= 0),
          emb.filter(col("vec_id") % 10 === 0),
          "vec_id", "embedding", k = 8, iters = 2, threshold = 0.3).count()
      }
      println(f"ROWINC $sf lshRefresh t=$incT%.2f novel=$incN | " +
        f"fullMine t=$fullT%.2f pairs=$fullN | " +
        f"semRefresh t=$isdT%.2f novel=$isdN")
    }
    println("PROBE_OK")
    spark.stop()
  }
}
