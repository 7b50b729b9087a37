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
    val orders = spark.read.parquet(s"$sf01/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf01/lineitem.parquet")

    // ---- KMV sketch: shard-merge == whole, estimator accuracy at sf0.1
    val k = 64
    val src = orders.select(col("o_orderstatus").as("status"),
      col("o_orderkey"), col("o_custkey"))
    val whole = time("kmv sketch whole") {
      ThetaSketch.sketch(src, Seq("status"), col("o_custkey"), k)
        .localCheckpoint()
    }
    val shards = Seq(src.filter(col("o_orderkey") % 2 === 0),
        src.filter(col("o_orderkey") % 2 =!= 0))
      .map(sh => ThetaSketch.sketch(sh, Seq("status"), col("o_custkey"), k))
    val merged = time("kmv shard merge") {
      ThetaSketch.mergeSketches(shards.reduce(_ unionByName _),
        Seq("status"), k).localCheckpoint()
    }
    val w = whole.orderBy("status").collect().map(r =>
      (r.getString(0), r.getSeq[Long](1)))
    val m = merged.orderBy("status").collect().map(r =>
      (r.getString(0), r.getSeq[Long](1)))
    require(w.toSeq == m.toSeq, "shard-merged state must equal whole state")

    val est = time("kmv estimate") {
      ThetaSketch.estimate(whole, Seq("status"), k).orderBy("status")
        .collect()
    }
    val exact = src.groupBy("status")
      .agg(countDistinct("o_custkey").as("n")).orderBy("status").collect()
    est.zip(exact).foreach { case (e, x) =>
      val (s, n, hat) = (e.getString(0), x.getLong(1), e.getLong(2))
      println(s"KMV status=$s exact=$n est=$hat")
      require(math.abs(hat - n).toDouble / n < 0.6,
        s"estimate $hat too far from $n (se ~13% at k=64)")
    }

    // ---- set ops: O vs F customer overlap at sf0.1
    val skA = ThetaSketch.sketch(
      orders.filter(col("o_orderstatus") === "O").withColumn("c", lit("x")),
      Seq("c"), col("o_custkey"), k)
    val skB = ThetaSketch.sketch(
      orders.filter(col("o_orderstatus") === "F").withColumn("c", lit("x")),
      Seq("c"), col("o_custkey"), k)
    val ops = time("kmv setOps") {
      ThetaSketch.setOps(skA, skB, Seq("c"), k).collect().head
    }
    println(s"OVERLAP n_l=${ops.getLong(1)} matched=${ops.getLong(2)} " +
      s"union_est=${ops.getLong(5)} jaccard_ppm=${ops.getLong(6)} " +
      s"inter_est=${ops.getLong(7)}")
    require(ops.getLong(1) == k && ops.getLong(2) > 0,
      "overlapping statuses must share sampled hashes")

    // ---- disjoint corpora → zero overlap, on real keys
    val skL = ThetaSketch.sketch(
      lineitem.withColumn("c", lit("x")),
      Seq("c"), concat(lit("li-"), col("l_orderkey")), k)
    val skO = ThetaSketch.sketch(
      orders.withColumn("c", lit("x")),
      Seq("c"), concat(lit("or-"), col("o_orderkey")), k)
    val dis = ThetaSketch.setOps(skL, skO, Seq("c"), k).collect().head
    require(dis.getLong(2) == 0 && dis.getLong(7) == 0,
      "disjoint key spaces must report zero intersection")

    // ---- CMS: grid build at sf0.1, upper-bound property on real keys
    val li = lineitem.select(col("l_returnflag").as("flag"),
      col("l_suppkey"))
    val grid = time("cms sketch sf0.1") {
      CmSketch.sketch(li, Seq("flag"), col("l_suppkey")).localCheckpoint()
    }
    val gridRows = grid.count()
    require(gridRows <= 3L * CmSketch.DefaultDepth * CmSketch.DefaultWidth,
      s"grid must stay model-sized, got $gridRows rows")
    val probes = li.select("flag").distinct()
      .crossJoin(spark.range(1, 21).select(col("id").as("skey")))
    val ests = time("cms point estimates") {
      CmSketch.pointEstimate(grid, probes, Seq("flag"), col("skey"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    }
    val truth = li.filter(col("l_suppkey").between(1, 20))
      .groupBy("flag", "l_suppkey").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    truth.foreach { case (key, n) =>
      require(ests(key) >= n, s"$key: CMS est ${ests(key)} below true $n")
    }
    println(s"CMS grid=$gridRows probes=${ests.size} " +
      s"maxOvercount=${truth.map { case (key, n) => ests(key) - n }.max}")

    // ---- unigram-LM tokenizer at sf0.1: train, decode, encode
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val vocab = time("unigram train sf0.1") {
      UnigramLm.train(docs, col("text"), maxPieceLen = 4, minCount = 2L,
        vocabSize = 40).localCheckpoint()
    }
    val vSize = vocab.count()
    val enc = time("unigram encode sf0.1") {
      UnigramLm.encode(docs, "lang", col("text"), vocab).orderBy("lang")
        .collect()
    }
    enc.foreach(r => println(s"UNIGRAM lang=${r.getString(0)} " +
      s"words=${r.getLong(1)} pieces=${r.getLong(2)} " +
      s"bits8=${r.getLong(3)}"))
    require(enc.length == 5 && enc.forall(r =>
        r.getLong(2) >= r.getLong(1) && r.getLong(3) > 0),
      "every word decodes to >= 1 piece with positive cost")
    println(s"UNIGRAM vocab=$vSize")

    // ---- kNN graph at sf0.1: cell-blocked build + mutual edges
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val idx = time("ivf index build") {
      Similarity.ivfIndexBuild(emb, "vec_id", "embedding", k = 8, iters = 2)
    }
    val graph = time("knnGraph k=5 sf0.1") {
      Similarity.knnGraph(idx.assignments, k = 5).localCheckpoint()
    }
    val n = emb.count()
    val gEdges = graph.count()
    require(gEdges == 5 * n, s"expected ${5 * n} arcs, got $gEdges")
    val mutual = time("mutualKnnEdges") {
      Similarity.mutualKnnEdges(graph).count()
    }
    println(s"KNNGRAPH nodes=$n arcs=$gEdges mutual=$mutual")
    require(mutual > 0 && mutual * 2 <= gEdges,
      "mutual pairs must be a subset of arcs")

    // ---- unigram hard-EM at sf0.1: refined vocab stays model-sized
    val hist = Bpe.wordHistogram(docs, col("text")).localCheckpoint()
    val v1 = time("unigram emStep sf0.1") {
      UnigramLm.emStep(hist, vocab).localCheckpoint()
    }
    val v1n = v1.count()
    require(v1n <= vSize, s"EM can only shrink the vocab ($vSize -> $v1n)")
    val enc1 = UnigramLm.encode(docs, "lang", col("text"), v1)
      .agg(sum("n_pieces")).collect()(0).getLong(0)
    println(s"UNIGRAM_EM vocab=$vSize->$v1n pieces=$enc1")

    // ---- KMV overlap matrix at sf0.1: 20 sources, ledger-only cost
    val shingled = docs.select(col("source"),
      explode(ApproxDedup.wordNgrams(col("text"), 2)).as("shingle"))
    val srcSk = ThetaSketch.sketch(shingled, Seq("source"),
      col("shingle"), 64).localCheckpoint()
    val matrix = time("kmv pairwise matrix") {
      ThetaSketch.pairwiseSetOps(srcSk, "source", 64).collect()
    }
    require(matrix.length == 190, s"C(20,2) pairs expected, got ${matrix.length}")
    println(s"KMV_MATRIX pairs=${matrix.length} " +
      s"medianJaccardPpm=${matrix.map(_.getLong(5)).sorted.apply(95)}")

    // ---- CMS join-size + skew estimates at sf0.1
    val ordGrid = CmSketch.sketch(
      orders.withColumn("g", lit("x")), Seq("g"), col("o_orderkey"))
    val liGrid = CmSketch.sketch(
      lineitem.withColumn("g", lit("x")), Seq("g"), col("l_orderkey"))
    val jsEst = time("cms joinSizeEstimate") {
      CmSketch.joinSizeEstimate(liGrid, ordGrid)
        .collect()(0).getDecimal(0).longValueExact()
    }
    val liN = lineitem.count()
    require(jsEst >= liN, s"join-size estimate $jsEst below true $liN")
    println(s"CMS_JOINSIZE est=$jsEst true=$liN " +
      s"(upper bound; slack ~ nA*nB/w)")

    spark.stop()
  }
}
