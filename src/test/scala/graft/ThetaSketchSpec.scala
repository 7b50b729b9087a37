package graft

import org.apache.spark.sql.functions._
import graft.ops.{Cardinality, ThetaSketch}

/** KMV/theta sketch: canonical-state invariance (merge order and
  * sharding cannot change the state), estimator accuracy and the
  * exact-below-k short-circuit, and set-operation correctness against
  * driver-computed ground truth on controlled-overlap sets. */
class ThetaSketchSpec extends SparkSpec {
  import spark.implicits._

  private val K = 32

  test("sketch state is the k smallest distinct hashes, sorted") {
    val keys = (1 to 500).map(i => s"key-$i")
    val df = keys.map(("g", _)).toDF("g", "k")
    val state = ThetaSketch.sketch(df, Seq("g"), $"k", K)
      .select("kmv").as[Array[Long]].head()
    val expected = keys.map(Cardinality.hashLong).distinct.sorted.take(K)
    assert(state.toSeq == expected)
  }

  test("merged shard sketches equal the whole-corpus sketch bit-for-bit") {
    val whole = (1 to 4000).map(i => (s"g${i % 3}", s"k-$i")).toDF("g", "k")
    val shards = (0 until 4).map(p =>
      ThetaSketch.sketch(whole.filter(abs(hash($"k")) % 4 === p),
        Seq("g"), $"k", K))
    val merged = ThetaSketch.mergeSketches(
      shards.reduce(_ unionByName _), Seq("g"), K)
    val direct = ThetaSketch.sketch(whole, Seq("g"), $"k", K)
    val m = merged.orderBy("g").select("g", "kmv")
      .as[(String, Array[Long])].collect().map { case (g, a) => (g, a.toSeq) }
    val d = direct.orderBy("g").select("g", "kmv")
      .as[(String, Array[Long])].collect().map { case (g, a) => (g, a.toSeq) }
    assert(m.toSeq == d.toSeq)
  }

  test("below k distinct the estimate is exact; above, within KMV error") {
    val small = (1 to 20).map(i => ("g", s"s-$i")).toDF("g", "k")
    val exact = ThetaSketch.approxDistinct(small, Seq("g"), $"k", K)
      .select("n_kept", "estimate").as[(Long, Long)].head()
    assert(exact == ((20L, 20L)))
    val n = 5000
    val big = (1 to n).map(i => ("g", s"b-$i")).toDF("g", "k")
    val est = ThetaSketch.approxDistinct(big, Seq("g"), $"k", K)
      .select("estimate").as[Long].head()
    // se ≈ 1/sqrt(k-2) ≈ 18% at k=32; allow 4 sigma
    assert(math.abs(est - n).toDouble / n < 0.75, s"estimate $est vs $n")
  }

  test("duplicate keys do not change the sketch") {
    val once = (1 to 300).map(i => ("g", s"d-$i")).toDF("g", "k")
    val thrice = (1 to 3).flatMap(_ => (1 to 300).map(i => ("g", s"d-$i")))
      .toDF("g", "k")
    val a = ThetaSketch.sketch(once, Seq("g"), $"k", K)
      .select("kmv").as[Array[Long]].head()
    val b = ThetaSketch.sketch(thrice, Seq("g"), $"k", K)
      .select("kmv").as[Array[Long]].head()
    assert(a.toSeq == b.toSeq)
  }

  test("set operations recover a controlled overlap") {
    // |A| = 2000, |B| = 2000, |A ∩ B| = 1000 → J = 1/3
    val a = (1 to 2000).map(i => ("g", s"ov-$i")).toDF("g", "k")
    val b = (1001 to 3000).map(i => ("g", s"ov-$i")).toDF("g", "k")
    val k = 64
    val out = ThetaSketch.setOps(
        ThetaSketch.sketch(a, Seq("g"), $"k", k),
        ThetaSketch.sketch(b, Seq("g"), $"k", k),
        Seq("g"), k)
      .select("n_l", "matched", "union_est", "jaccard_ppm", "inter_est",
        "n_a", "n_b")
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    val (nL, matched, unionEst, jacPpm, interEst, nA, nB) = out
    assert(nA + nB - matched == nL,
      "side memberships must tile the combined sample")
    assert(nL == k)
    // ground truth from the same hash space, driver-side
    val ha = (1 to 2000).map(i => Cardinality.hashLong(s"ov-$i")).toSet
    val hb = (1001 to 3000).map(i => Cardinality.hashLong(s"ov-$i")).toSet
    val l = (ha ++ hb).toSeq.sorted.take(k)
    val matchedRef = l.count(h => ha(h) && hb(h))
    assert(matched == matchedRef)
    assert(jacPpm == matched * 1000000L / nL)
    // estimator sanity: J = 1/3 within 4·se, |A∪B| = 3000 within 4·se
    assert(math.abs(jacPpm - 333333L) < 4 * 1000000 / math.sqrt(k.toDouble),
      s"jaccard_ppm $jacPpm")
    assert(math.abs(unionEst - 3000).toDouble / 3000 < 0.5,
      s"union_est $unionEst")
    assert(interEst == matched * unionEst / nL)
  }

  test("disjoint corpora report zero overlap") {
    val a = (1 to 1000).map(i => ("g", s"da-$i")).toDF("g", "k")
    val b = (1 to 1000).map(i => ("g", s"db-$i")).toDF("g", "k")
    val out = ThetaSketch.setOps(
        ThetaSketch.sketch(a, Seq("g"), $"k", K),
        ThetaSketch.sketch(b, Seq("g"), $"k", K),
        Seq("g"), K)
      .select("matched", "jaccard_ppm", "inter_est")
      .as[(Long, Long, Long)].head()
    assert(out == ((0L, 0L, 0L)))
  }

  test("pairwise matrix equals per-pair setOps for every pair") {
    val k = 16
    val df = (1 to 900).map { i =>
      val g = s"s${i % 3}"
      // overlapping key ranges: s0 ~ 1..300, s1 ~ 151..450, s2 ~ 301..600
      (g, s"key-${(i % 300) + 150 * (i % 3) + 1}")
    }.toDF("g", "key")
    val sk = ThetaSketch.sketch(df, Seq("g"), $"key", k)
    val matrix = ThetaSketch.pairwiseSetOps(sk, "g", k)
      .select("g_a", "g_b", "n_l", "matched", "union_est", "jaccard_ppm",
        "inter_est")
      .as[(String, String, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7)))
      .toMap
    val pairs = Seq(("s0", "s1"), ("s0", "s2"), ("s1", "s2"))
    assert(matrix.keySet == pairs.toSet)
    pairs.foreach { case (a, b) =>
      val ref = ThetaSketch.setOps(
          sk.filter($"g" === a).withColumn("g", lit("p")),
          sk.filter($"g" === b).withColumn("g", lit("p")),
          Seq("g"), k)
        .select("n_l", "matched", "union_est", "jaccard_ppm", "inter_est")
        .as[(Long, Long, Long, Long, Long)].head()
      assert(matrix((a, b)) == ref, s"pair ($a,$b)")
    }
  }

  test("null keys are dropped, not hashed") {
    val df = Seq(("g", "x"), ("g", null), ("g", "y"))
      .toDF("g", "k")
    val state = ThetaSketch.sketch(df, Seq("g"), $"k", K)
      .select("kmv").as[Array[Long]].head()
    assert(state.length == 2)
  }

  test("containmentGate fails CLOSED on n_b = 0 (zero batch evidence => shifted)") {
    val k = 8
    // history = many small-hashing keys; batch = keys whose hashes all
    // sit ABOVE history's theta, so the k-smallest union sample can be
    // 100% history-side (n_b = 0) — engineer it directly on setOps
    // output columns instead of fishing for such keys
    val ops = Seq(
      // (g, n_l, matched, n_a, n_b, union_est, jaccard_ppm, inter_est)
      ("allold", 8L, 8L, 8L, 8L, 100L, 1000000L, 100L), // fully contained
      ("noevid", 8L, 0L, 8L, 0L, 100L, 0L, 0L), // zero batch evidence
      ("half", 8L, 2L, 8L, 4L, 100L, 250000L, 25L) // 50% containment
    ).toDF("g", "n_l", "matched", "n_a", "n_b", "union_est",
      "jaccard_ppm", "inter_est")
    val got = ThetaSketch.containmentGate(ops, thresholdPpm = 600000L)
      .select("g", "containment_ppm", "verdict")
      .as[(String, Option[Long], String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("allold") == ((Some(1000000L), "stable")))
    assert(got("half") == ((Some(500000L), "shifted")))
    // the n_b = 0 row must NOT fall through a null comparison to
    // "stable" — that fails the gate open on the most divergent input
    assert(got("noevid") == ((None, "shifted")))
  }
}
