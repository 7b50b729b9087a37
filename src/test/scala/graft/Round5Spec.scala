package graft

import org.apache.spark.sql.functions._

import graft.ops.{AsOfJoin, CorpusSignals, RangeJoin, TextAnalysis}

/** Round-5 additions: union-window as-of join, bucketed band range
  * join, Bloom-prefiltered decontamination, vocabulary/OOV scan. Each
  * scalable formulation is checked row-for-row against the naive
  * quadratic formulation it replaces. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random fixture WITH ties: times collide both
  // within and across sides (t % 7), keys are hot (k % 3)
  private lazy val left = (1L to 60L)
    .map(i => (i, i % 3, (i * 13 % 7) + 10)).toDF("lid", "k", "t")
  private lazy val right = (1L to 80L)
    .map(i => (i, i % 3, (i * 29 % 7) + 10)).toDF("rid", "k", "t")
    .withColumn("payload", col("rid") * 100)

  test("lastPrior matches the naive argmax theta-join, ties included") {
    val fast = AsOfJoin.lastPrior(left, right, "k", "t", "lid", "rid",
        payload = Seq("payload"))
      .select("lid", "asof_time", "asof_rid", "asof_payload")
      .orderBy("lid")
      .collect()

    // naive oracle: all prior pairs, argmax by (t, rid)
    val naive = left.as("l")
      .join(right.as("r"), col("r.k") === col("l.k") && col("r.t") <= col("l.t"), "left")
      .groupBy(col("l.lid"))
      .agg(max(struct(col("r.t"), col("r.rid"), col("r.payload"))).as("m"))
      .select(col("lid"), col("m.t").as("asof_time"),
        col("m.rid").as("asof_rid"), col("m.payload").as("asof_payload"))
      .orderBy("lid")
      .collect()

    assert(fast.length == naive.length)
    fast.zip(naive).foreach { case (f, n) => assert(f == n) }
  }

  test("lastPrior: a left row with no prior right row keeps nulls") {
    val l = Seq((1L, 1L, 5L)).toDF("lid", "k", "t")
    val r = Seq((9L, 1L, 6L)).toDF("rid", "k", "t") // only AFTER
    val out = AsOfJoin.lastPrior(l, r, "k", "t", "lid", "rid").collect()
    assert(out.length == 1 && out(0).isNullAt(out(0).fieldIndex("asof_rid")))
  }

  test("lastPrior: equal timestamps count as prior (<= semantics)") {
    val l = Seq((1L, 1L, 5L)).toDF("lid", "k", "t")
    val r = Seq((7L, 1L, 5L), (3L, 1L, 5L)).toDF("rid", "k", "t")
    val out = AsOfJoin.lastPrior(l, r, "k", "t", "lid", "rid").collect()
    // tie at t=5 resolves to the larger rid
    assert(out(0).getAs[Long]("asof_rid") == 7L)
  }
}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val left = (1L to 50L)
    .map(i => (i, i % 4, i * 17 % 100)).toDF("lid", "k", "t")
  private lazy val right = (1L to 70L)
    .map(i => (i, i % 4, i * 23 % 100)).toDF("rid", "k", "t")

  test("withinBand matches the naive theta-join exactly once per pair") {
    for (band <- Seq(1L, 7L, 30L)) {
      val fast = RangeJoin.withinBand(left, right, "k", "t", band)
        .select(col("lid"), col("r_rid")).orderBy("lid", "r_rid").collect()
      val naive = left.as("l").join(right.as("r"),
          col("l.k") === col("r.k") &&
            abs(col("l.t") - col("r.t")) <= band)
        .select(col("lid"), col("rid").as("r_rid"))
        .orderBy("lid", "r_rid").collect()
      assert(fast.toSeq == naive.toSeq, s"band=$band")
    }
  }

  test("nearbyStats keeps zero-match left rows at n_nearby = 0") {
    val l = Seq((1L, 9L, 5L), (2L, 1L, 5L)).toDF("lid", "k", "t")
    val r = Seq((7L, 1L, 6L)).toDF("rid", "k", "t")
    val out = RangeJoin.nearbyStats(l, r, "k", "t", band = 2L,
        leftId = "lid", aggs = Seq(sum(col("r_t")).as("tsum")))
      .orderBy("lid").collect()
    assert(out(0).getAs[Long]("n_nearby") == 0L)
    assert(out(1).getAs[Long]("n_nearby") == 1L)
  }
}

class BloomContaminationSpec extends SparkSpec {
  import spark.implicits._

  test("contaminationBloom is bit-identical to the broadcast-join form") {
    val docs = (1L to 120L).map { i =>
      val words = (0 until 12).map(j => s"w${(i * 7 + j * 3) % 40}")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val bench = docs.filter(col("doc_id") % 10 === 0)
    val exact = CorpusSignals.contamination(train, bench, "doc_id",
        col("text"), n = 3).orderBy("doc_id").collect()
    val bloom = CorpusSignals.contaminationBloom(train, bench, "doc_id",
        col("text"), n = 3, expectedItems = 1000L, fpp = 0.05)
      .orderBy("doc_id").collect()
    assert(exact.nonEmpty) // non-vacuous fixture
    assert(bloom.toSeq == exact.toSeq)
  }
}

class VocabOovSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a a a b b c"),
    (2L, "a b rare1 rare2"),
    (3L, "c c c c")
  ).toDF("doc_id", "text")

  test("vocabulary ranks by count desc then token asc, cut at V") {
    val v = TextAnalysis.vocabulary(docs, col("text"), v = 3)
      .orderBy("rank").collect()
    // counts: c=5, a=4, b=3, rare1=1, rare2=1 → c(1), a(2), b(3)
    assert(v.map(r => (r.getAs[String]("token"), r.getAs[Long]("rank"))).toSeq
      == Seq(("c", 1L), ("a", 2L), ("b", 3L)))
  }

  test("oovRate: exact integer ppm against the top-3 vocab") {
    val vocab = TextAnalysis.vocabulary(docs, col("text"), v = 3)
    val r = TextAnalysis.oovRate(docs, "doc_id", col("text"), vocab)
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_oov") == 0L)
    assert(r(1).getAs[Long]("n_oov") == 2L) // rare1, rare2 of 4 tokens
    assert(r(1).getAs[Long]("oov_ppm") == 500000L)
    assert(r(2).getAs[Long]("oov_ppm") == 0L)
  }
}
