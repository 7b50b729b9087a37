package graft

import org.apache.spark.sql.functions._

import graft.ops.{CorpusStats, RandomProjection}

/** Corpus-analytics contracts: RP signatures are exact fixed-point
  * hyperplane signs computed in one shuffle-free pass, Hamming serve
  * ranks deterministically, PMI is the signed sum of eighth-bit
  * quantizations (overflow-free by construction), and the Zipf/Heaps
  * profiles are exact integer curves. */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  // JVM mirror of the eighth-bit log2 idiom: L(x) = bits8(256·x)
  private def l8(x: Long): Long = {
    val q8 = x * 256L
    val l = 63 - java.lang.Long.numberOfLeadingZeros(q8)
    (l - 8L) * 8L + (q8 * 8L) / (1L << l) - 8L
  }

  test("rp signatures: exact fixed-point signs, shuffle-free plan") {
    val vecs = Seq(
      (1L, Seq(0.5f, -0.25f, 0.125f, -1.0f)),
      (2L, Seq(-0.5f, 0.25f, -0.125f, 1.0f)), // antipode of 1
      (3L, Seq(0.0f, 0.0f, 0.0f, 0.0f))       // zero vector: all ties -> 0
    ).toDF("vec_id", "embedding")
    val sigs = RandomProjection.signatures(vecs, "vec_id", "embedding",
      bits = 8, dim = 4)
    val got = sigs.as[(Long, Long)].collect().toMap

    // independent computation: quantize, dot each hyperplane, sign
    def expected(v: Seq[Float]): Long = {
      val q = v.map(x => math.floor(x.toDouble * 1000000).toLong)
      (0 until 8).map { b =>
        val dot = q.indices.map(i => q(i) * RandomProjection.sign(b, i)).sum
        if (dot > 0) 1L << b else 0L
      }.sum
    }
    assert(got(1L) == expected(Seq(0.5f, -0.25f, 0.125f, -1.0f)))
    assert(got(2L) == expected(Seq(-0.5f, 0.25f, -0.125f, 1.0f)))
    assert(got(3L) == 0L, "zero vector must tie every hyperplane to 0")
    // antipodal vectors flip every non-tie bit
    assert((got(1L) ^ got(2L)) == 255L,
      s"antipodes must differ in all 8 bits: ${got(1L)} vs ${got(2L)}")
    // the compress pass is a narrow map: no shuffle anywhere
    val plan = sigs.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"signature compression must be shuffle-free:\n$plan")
  }

  test("hammingTopK ranks by popcount with id tie-break") {
    val sigs = Seq((10L, 0L), (20L, 3L), (30L, 1L), (40L, 7L))
      .toDF("id", "rp_sig")
    val top = RandomProjection.hammingTopK(
        sigs.filter($"id" === 10L), sigs, "id", "id", "rp_sig", k = 3)
      .select($"rank", $"corpus_id", $"hamming")
      .as[(Int, Long, Int)].collect().toSeq
    // vs 0: 30 -> 1 bit, 20 -> 2 bits, 40 -> 3 bits
    assert(top == Seq((1, 30L, 1), (2, 20L, 2), (3, 40L, 3)))
  }

  test("windowPairs: per-position partners, unordered normalization, site count") {
    val docs = Seq("a b c d", "b a").toDF("text")
    val pairs = CorpusStats.windowPairs(docs, col("text"), window = 2)
      .groupBy("a", "b").count()
      .as[(String, String, Long)].collect().toSet
    // doc1 w=2: (a,b)(a,c)(b,c)(b,d)(c,d); doc2: (b,a) -> normalized (a,b)
    assert(pairs == Set(("a", "b", 2L), ("a", "c", 1L), ("b", "c", 1L),
      ("b", "d", 1L), ("c", "d", 1L)))
    // single-token and empty docs emit nothing
    assert(CorpusStats.windowPairs(Seq("x").toDF("text"), col("text"), 3)
      .count() == 0)
  }

  test("pmi: signed sum of eighth-bit quantizations, exact") {
    // corpus: "a b" ×3, "a c" ×1 -> T=8, P=4 sites
    // c_a=4 c_b=3 c_c=1; c_ab=3, c_ac=1
    val docs = (Seq.fill(3)("a b") ++ Seq("a c")).toDF("text")
    val got = CorpusStats.pmi(docs, col("text"), window = 1, minCount = 1L)
      .orderBy("a", "b").as[(String, String, Long, Long)].collect().toSeq
    def pmiB(cab: Long, ca: Long, cb: Long): Long =
      l8(cab) + 2 * l8(8) - l8(4) - l8(ca) - l8(cb)
    assert(got == Seq(
      ("a", "b", 3L, pmiB(3, 4, 3)),
      ("a", "c", 1L, pmiB(1, 4, 1))))
    // the rare-pair collocation (a,c) scores above the common pair? no —
    // sanity: both are positive associations here; just pin exactness
    assert(got.map(_._4) == Seq(pmiB(3, 4, 3), pmiB(1, 4, 1)))
  }

  test("sourceDivergence: additive eighth-bit KL, exact; uniform source scores ~0") {
    // s1 is balanced; s2 collapsed onto 'a' entirely
    val docs = Seq(
      ("s1", "a b"), ("s1", "a b"),
      ("s2", "a a"), ("s2", "a a")
    ).toDF("source", "text")
    val got = CorpusStats.sourceDivergence(docs, col("source"), col("text"))
      .orderBy("source").as[(String, Long, Long, Long)].collect().toSeq
    // counts: corpus a=6 b=2 T=8; s1: a=2 b=2 Ts=4; s2: a=4 Ts=4
    def kl(cs: Map[String, Long], ts: Long): Long =
      Seq(("a", 6L), ("b", 2L)).flatMap { case (t, c) =>
        cs.get(t).map(c_s => c_s * (l8(c_s) + l8(8) - l8(c) - l8(ts)))
      }.sum
    assert(got == Seq(
      ("s1", 4L, kl(Map("a" -> 2L, "b" -> 2L), 4), kl(Map("a" -> 2L, "b" -> 2L), 4) * 1000000 / 4),
      ("s2", 4L, kl(Map("a" -> 4L), 4), kl(Map("a" -> 4L), 4) * 1000000 / 4)))
    // the skewed source must diverge MORE than the representative one
    assert(got(1)._3 > got(0)._3,
      s"skewed source must score higher: ${got.map(r => r._1 -> r._3)}")
  }

  test("count ledgers merge exactly: split ⊕ == whole, under any batching") {
    val docs = Seq("a b a", "b c", "a c a b", "c c").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("i", "text")
    val whole = CorpusStats.pmi(docs, col("text"), window = 2)
      .orderBy("a", "b").collect().toSeq
    // every 2-way split of the 4 docs must reproduce the whole exactly
    for (mask <- 1 until 15) {
      val ids = (0 until 4).filter(i => (mask & (1 << i)) != 0).map(_.toLong)
      val left = docs.filter(col("i").isin(ids: _*))
      val right = docs.filter(!col("i").isin(ids: _*))
      val merged = CorpusStats.pmiFromCounts(
        CorpusStats.mergeCounts(
          CorpusStats.unigramCounts(left, col("text")),
          CorpusStats.unigramCounts(right, col("text")), Seq("t"), "c"),
        CorpusStats.mergeCounts(
          CorpusStats.pairCounts(left, col("text"), 2),
          CorpusStats.pairCounts(right, col("text"), 2), Seq("a", "b"), "c_ab"))
        .orderBy("a", "b").collect().toSeq
      assert(merged == whole, s"split mask $mask diverged")
    }
  }

  test("contrastivePairs: deterministic balanced negatives, no edge collisions") {
    import graft.ops.Curation
    // fixture chosen so all three hash-negatives survive: md5-mod
    // partners are (1,3)->9, (2,4)->6, (4,8)->3 — none an anchor/edge
    val edges = Seq((1L, 3L), (2L, 4L), (4L, 8L)).toDF("id_a", "id_b")
    val out = Curation.contrastivePairs(edges, "id_a", "id_b", nIds = 10L)
      .as[(Long, Long, Long)].collect().toSeq
    val pos = out.filter(_._3 == 1L).map(t => (t._1, t._2)).toSet
    val neg = out.filter(_._3 == 0L)
    assert(pos == Set((1L, 3L), (2L, 4L), (4L, 8L)))
    assert(neg.map(t => (t._1, t._2)).toSet ==
      Set((1L, 9L), (2L, 6L), (4L, 3L)))
    // and a colliding edge DROPS its negative instead of re-drawing:
    // (2,7)'s partner hashes to 7 — its own positive partner
    val dropped = Curation.contrastivePairs(
      Seq((2L, 7L)).toDF("id_a", "id_b"), "id_a", "id_b", nIds = 10L)
      .filter($"label" === 0L).count()
    assert(dropped == 0L)
    neg.foreach { case (a, p, _) =>
      assert(p != a && !pos.contains((a, p)) && !pos.contains((p, a)),
        s"negative ($a,$p) collides with an edge or its anchor")
      assert(p >= 0 && p < 10, s"negative partner $p outside the id range")
    }
    // determinism: a second run emits the identical table
    assert(Curation.contrastivePairs(edges, "id_a", "id_b", nIds = 10L)
      .as[(Long, Long, Long)].collect().toSeq.sorted == out.sorted)
  }

  test("zipf: rank by (freq desc, token), rf product") {
    val docs = Seq("a a a b b c").toDF("text")
    val got = CorpusStats.zipf(docs, col("text"))
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq((1L, "a", 3L, 3L), (2L, "b", 2L, 4L), (3L, "c", 1L, 3L)))
  }

  test("heapsCurve: exact growth, spine bucketing") {
    val docs = Seq(
      (0L, "a b"), (1L, "b c"), (2L, "a"), (3L, "d d")
    ).toDF("doc_id", "text")
    val exact = CorpusStats.heapsCurve(docs, col("doc_id"), col("text"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(exact == Seq(
      (0L, 1L, 2L, 2L), // a,b
      (1L, 2L, 4L, 3L), // +c
      (2L, 3L, 5L, 3L), // nothing new
      (3L, 4L, 7L, 4L)  // +d
    ))
    // bucket=2 coarsens the spine BEFORE the window: 2 points, same totals
    val coarse = CorpusStats.heapsCurve(docs, col("doc_id"), col("text"),
      bucket = 2L).as[(Long, Long, Long, Long)].collect().toSeq
    assert(coarse == Seq((0L, 2L, 4L, 3L), (1L, 4L, 7L, 4L)))
  }
}
