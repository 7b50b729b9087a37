package graft

import org.apache.spark.sql.functions._

import graft.ops.Bpe

/** BPE trainer/encoder correctness, pinned against an independent
  * in-test reference implementation of the Sennrich et al. (2016)
  * greedy algorithm (argmax pair by (weight, then lexicographic
  * (lft,rgt)) and left-to-right non-overlapping merge application). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- local reference implementation (driver-side, test-only) ----
  private def refMergeOnce(syms: List[String], l: String, r: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  private def refTrain(words: Map[String, Long], n: Int)
      : List[(String, String, Long)] = {
    var hist: Map[List[String], Long] =
      words.groupMapReduce { case (w, _) => w.map(_.toString).toList }(_._2)(_ + _)
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
    var step = 0
    var done = false
    while (step < n && !done) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, cnt) <- hist; Seq(a, b) <- syms.sliding(2) if syms.length > 1)
        pairCounts((a, b)) = pairCounts.getOrElse((a, b), 0L) + cnt
      if (pairCounts.isEmpty) done = true
      else {
        val ((l, r), w) = pairCounts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((l, r, w))
        hist = hist.toSeq
          .map { case (syms, cnt) => (refMergeOnce(syms, l, r), cnt) }
          .groupMapReduce(_._1)(_._2)(_ + _)
        step += 1
      }
    }
    merges.toList
  }

  private def refWordCounts(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupMapReduce(identity)(_ => 1L)(_ + _)

  // a corpus with a richer character inventory than the fixture tables
  private val corpus = Seq(
    "low lower lowest low low newer newest new news wide wider widest",
    "low slow slowest newer new knew widen widen widen lowly newly",
    "renew renewed renewal lowland lowdown newline newline slow slow",
    "the lower the slower the wider the newer the better the best")

  test("mergeOnce is the greedy left-to-right non-overlapping scan") {
    val cases = Seq(
      (Seq("a", "a", "a"), ("a", "a"), Seq("aa", "a")),
      (Seq("a", "a", "a", "a"), ("a", "a"), Seq("aa", "aa")),
      (Seq("a", "b", "a", "b"), ("a", "b"), Seq("ab", "ab")),
      (Seq("b", "a", "b", "b"), ("a", "b"), Seq("b", "ab", "b")),
      (Seq("x"), ("a", "b"), Seq("x")),
      (Seq("a", "b", "b"), ("a", "b"), Seq("ab", "b")),
      (Seq("a", "b", "c"), ("b", "c"), Seq("a", "bc")))
    val df = cases.map(_._1).toDF("syms")
    for (((in, (l, r), want), i) <- cases.zipWithIndex) {
      val got = cases.map(c => c._1).toDF("syms")
        .select(Bpe.mergeOnce(col("syms"), l, r).as("m"))
        .collect()(i).getSeq[String](0)
      assert(got == want, s"case $i: $in merge ($l,$r)")
      assert(refMergeOnce(in.toList, l, r) == want.toList,
        s"reference disagrees on case $i")
    }
  }

  test("train matches the reference algorithm merge-for-merge") {
    val df = corpus.toDF("text")
    val got = Bpe.train(df, col("text"), numMerges = 12)
      .orderBy("step").collect()
      .map(r => (r.getAs[String]("lft"), r.getAs[String]("rgt"),
        r.getAs[Long]("weight")))
    val want = refTrain(refWordCounts(corpus), 12)
    assert(got.toList == want, s"got=${got.toList}\nwant=$want")
    assert(got.length == 12)
  }

  test("train is deterministic across runs") {
    val df = corpus.toDF("text")
    val a = Bpe.train(df, col("text"), 6).orderBy("step").collect().toSeq
    val b = Bpe.train(df, col("text"), 6).orderBy("step").collect().toSeq
    assert(a == b)
  }

  test("train stops early when no pairs remain") {
    val df = Seq("a b a b").toDF("text") // 1-char words: zero pairs
    val merges = Bpe.train(df, col("text"), 5).collect()
    assert(merges.isEmpty)
  }

  test("pair exhaustion mid-chain: fewer merges than asked, encode/pack stay exact") {
    // the q139/q140/q150 exhaustion fixture: a corpus whose mergeable
    // pairs run out BEFORE the requested merge budget ("ab" exhausts
    // after 1 merge, "cde" after 2 more) — training must return only
    // the learnable steps and encoding with that short chain must
    // still serve every word (the oracle side's LEFT JOIN fallback is
    // the DuckDB mirror of this; a CROSS JOIN against an empty step
    // would zero the whole histogram)
    val df = Seq((0L, "ab ab ab"), (1L, "cde ab"), (2L, "cde"))
      .toDF("doc_id", "text")
    val trained = Bpe.train(df, col("text"), numMerges = 8)
      .orderBy("step").collect()
    assert(trained.length == 3, s"only 3 merges are learnable, got " +
      trained.map(_.getAs[String]("merged")).mkString(","))
    val chain = Bpe.mergeChain(Bpe.train(df, col("text"), 8))
    val enc = Bpe.encode(df, "doc_id", col("text"), chain)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // every word collapses to ONE symbol once its merges are learned
    assert(enc == Seq((0L, 3L, 3L), (1L, 2L, 2L), (2L, 1L, 1L)))
  }

  test("encode matches reference application of the learned merges") {
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val chain = Bpe.mergeChain(Bpe.train(df, col("text"), 10))
    val got = Bpe.encode(df, "doc_id", col("text"), chain)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    val want = corpus.zipWithIndex.map { case (t, i) =>
      val words = t.split("\\s+").filter(_.nonEmpty)
      val nBpe = words.map { w =>
        var syms = w.map(_.toString).toList
        for ((l, r) <- chain) syms = refMergeOnce(syms, l, r)
        syms.length.toLong
      }.sum
      (i.toLong, words.length.toLong, nBpe)
    }
    assert(got.toList == want.toList)
  }

  test("encode folds merges over DISTINCT words and broadcast-joins back") {
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val chain = Bpe.mergeChain(Bpe.train(df, col("text"), 4))
    val plan = Bpe.encode(df, "doc_id", col("text"), chain)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab->doc join must broadcast the vocab side:\n$plan")
  }

  test("null and empty texts contribute nothing") {
    val df = Seq((1L, "ab ab"), (2L, null), (3L, ""), (4L, "  "))
      .toDF("doc_id", "text")
    val m = Bpe.train(df, col("text"), 1).collect()
    assert(m.length == 1 && m.head.getAs[String]("merged") == "ab")
    val enc = Bpe.encode(df, "doc_id", col("text"),
      Seq(("a", "b"))).orderBy("doc_id").collect()
    assert(enc.map(_.getLong(0)).toSeq == Seq(1L))
    assert(enc.head.getLong(2) == 2L) // two "ab" tokens, one symbol each
  }
}
