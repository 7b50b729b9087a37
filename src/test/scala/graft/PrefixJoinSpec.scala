package graft

import org.apache.spark.sql.functions._

import graft.ops.ApproxDedup

/** Prefix-filtered set-similarity join: losslessness against the
  * brute-force all-pairs join (the property the whole optimization
  * rests on), exact-threshold arithmetic, and the candidate-space
  * reduction that is its reason to exist. */
class PrefixJoinSpec extends SparkSpec {
  import spark.implicits._

  private def refPairs(sets: Map[Long, Set[String]], t: Double)
      : Set[(Long, Long)] =
    (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq if a < b
      inter = (sa & sb).size
      if inter > 0 && inter.toDouble / (sa.size + sb.size - inter) >= t
    } yield (a, b)).toSet

  test("lossless vs brute force on randomized sets (many shapes)") {
    val rnd = new scala.util.Random(1234)
    // 120 sets over a small universe -> plenty of boundary-threshold
    // pairs, subsets, duplicates and singletons
    val sets: Map[Long, Set[String]] = (1 to 120).map { i =>
      val n = 1 + rnd.nextInt(12)
      i.toLong -> (1 to n).map(_ => s"u${rnd.nextInt(30)}").toSet
    }.toMap
    val df = sets.toSeq.map { case (i, s) => (i, s.toSeq) }.toDF("id", "s")
      .repartition(8)
    for (tPpm <- Seq(300000L, 500000L, 800000L, 1000000L)) {
      val got = ApproxDedup.jaccardPairsPrefix(df, "id", "s", tPpm, maxTokenDf = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = refPairs(sets, tPpm / 1e6)
      assert(got == want,
        s"t=$tPpm: missing=${want -- got} extra=${got -- want}")
    }
  }

  test("integer threshold arithmetic has no FP boundary loss") {
    // |A|=5, J(A,B)=3/5=0.6: an IEEE ceil(0.6*5)=4 would shorten A's
    // prefix and can lose the pair; ppm arithmetic must keep it
    val sets = Map(
      1L -> Set("a", "b", "c", "d", "e"),
      2L -> Set("a", "b", "c", "x", "y")) // inter=3, union=7 -> 3/7
    val sets2 = Map(
      3L -> Set("a", "b", "c", "d"),
      4L -> Set("a", "b", "c", "d", "x", "y")) // inter=4, union=6 -> 2/3
    val df = (sets ++ sets2).toSeq.map { case (i, s) => (i, s.toSeq) }
      .toDF("id", "s")
    val got = ApproxDedup.jaccardPairsPrefix(df, "id", "s", 600000L, maxTokenDf = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // qualifying: (1,3)=4/5, (2,4)=5/6, (3,4)=2/3 (the 0.6-boundary
    // pair an FP-shortened prefix can drop); rejected: (1,2)=3/7,
    // (1,4)=4/7, (2,3)=1/2
    assert(got == Set((1L, 3L), (2L, 4L), (3L, 4L)))
  }

  test("prefix index is smaller than the full inverted index") {
    val docs = SharedSpark.spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
      .withColumn("bigrams", ApproxDedup.wordNgrams(col("text"), 2))
      .select(col("doc_id"), col("bigrams"))
    val full = docs.select(explode(col("bigrams"))).count()
    // reproduce the operator's prefix sizing at t=0.5: ~half the
    // tokens per doc enter the index
    val pref = docs
      .select(size(col("bigrams")).cast("bigint").as("sz"))
      .select(sum(col("sz") - expr(
        "(sz * 500000 + 999999) div 1000000") + 1))
      .collect().head.getLong(0)
    assert(pref < full * 6 / 10,
      s"prefix index $pref should be well under the $full-entry full index")
  }

  test("empty and null sets produce no pairs; t=1.0 finds exact dups") {
    val df = Seq(
      (1L, Seq("a", "b")), (2L, Seq("a", "b")), (3L, Seq.empty[String]),
      (4L, null.asInstanceOf[Seq[String]]), (5L, Seq("b", "a")))
      .toDF("id", "s")
    val got = ApproxDedup.jaccardPairsPrefix(df, "id", "s", 1000000L, maxTokenDf = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 5L), (2L, 5L)))
  }
}
