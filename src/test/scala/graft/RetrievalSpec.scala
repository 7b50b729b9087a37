package graft

import org.apache.spark.sql.functions._

import graft.ops.Retrieval

/** Integer-exact BM25 retrieval: the ranking properties float BM25
  * guarantees, checked on controlled corpora. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def topk(corpus: Seq[(Long, String)], queries: Seq[(Long, String)],
                   k: Int = 5): Seq[(Long, Long, Long, Long)] =
    Retrieval.bm25TopK(corpus.toDF("doc_id", "text"), "doc_id", col("text"),
        queries.toDF("query_id", "qtext"), "query_id", col("qtext"), k)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Long, Long)].collect().toSeq

  test("tf monotonicity: more query-term occurrences rank higher") {
    val corpus = Seq(
      (1L, "apple pear plum kiwi"),
      (2L, "apple apple apple pear plum kiwi"), // same length class
      (3L, "pear plum kiwi fig"))
    val got = topk(corpus, Seq((10L, "apple")))
    assert(got.map(_._2) == Seq(2L, 1L)) // doc 3 has no term: absent
    assert(got.head._3 > got(1)._3, "tf=3 must out-score tf=1")
  }

  test("idf effect: matching a rare term beats matching a stop term") {
    val stopDocs = (1L to 9L).map(i => (i, "the the common word soup"))
    val corpus = stopDocs :+ (10L, "the zanzibar expedition notes")
    val got = topk(corpus, Seq((1L, "the zanzibar")))
    assert(got.head._2 == 10L,
      s"rare-term doc must rank first, got ${got.map(_._2)}")
  }

  test("known-item search: a unique phrase retrieves its document first") {
    val filler = (1L to 20L).map(i =>
      (i, s"filler text block number common words here item$i"))
    val corpus = filler :+ (99L, "peculiar unrepeated quartz lantern phrase")
    val got = topk(corpus, Seq((1L, "peculiar unrepeated quartz lantern")))
    assert(got.head._2 == 99L)
  }

  test("ties rank deterministically by doc_id; k bounds the output") {
    val corpus = Seq(
      (5L, "same words here"), (3L, "same words here"),
      (8L, "same words here"), (1L, "same words here"))
    val got = topk(corpus, Seq((1L, "same words")), k = 3)
    assert(got.map(_._2) == Seq(1L, 3L, 5L)) // equal scores -> id order
    assert(got.map(_._4) == Seq(1L, 2L, 3L))
    assert(got.map(_._3).distinct.size == 1)
  }

  test("docs sharing no query term never appear") {
    val corpus = Seq((1L, "alpha beta"), (2L, "gamma delta"))
    val got = topk(corpus, Seq((1L, "alpha")))
    assert(got.map(_._2) == Seq(1L))
  }

  // ------------------------------------------- exact phrase search

  private def phrases(corpus: Seq[(Long, String)],
                      ps: Seq[(Long, String)], n: Int = 4)
      : Set[(Long, Long)] =
    Retrieval.phraseMatches(corpus.toDF("doc_id", "text"), "doc_id",
        col("text"), ps.toDF("pid", "ptext"), "pid", col("ptext"), n)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("phraseMatches equals the naive containment on a mixed corpus") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a quick brown fox jumps over anything at all"),
      (3L, "the quick brown dog sleeps"),
      (4L, "entirely unrelated content words here"),
      (5L, "prefix junk the quick brown fox jumps suffix junk"))
    val ps = Seq(
      (10L, "quick brown fox jumps over"), // 5 tokens -> gram probe
      (11L, "quick brown"), // 2 tokens -> short-phrase direct verify
      (12L, "brown fox sleeps quietly tonight")) // unseen gram -> none
    val got = phrases(corpus, ps)
    val want = (for {
      (pid, p) <- ps; (d, t) <- corpus
      if s" ${t.replaceAll("\\s+", " ")} ".contains(s" $p ")
    } yield (pid, d)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(want.contains((10L, 1L)) && want.contains((11L, 3L)) &&
      !want.exists(_._1 == 12L)) // the fixture exercises all 3 paths
  }

  test("phrase matching is whole-token: substrings of words don't match") {
    val corpus = Seq((1L, "showers bring mayflowers in the spring"))
    // "flowers in the spring" appears as a WORD-SUBSTRING only
    val got = phrases(corpus, Seq((1L, "flowers in the spring")))
    assert(got.isEmpty)
  }

  test("whitespace variants normalize before matching") {
    val corpus = Seq((1L, "alpha   beta\tgamma  delta epsilon"))
    val got = phrases(corpus, Seq((1L, "beta gamma delta epsilon")))
    assert(got == Set((1L, 1L)))
  }

  test("edge whitespace on phrases is trimmed, not a false negative") {
    val corpus = Seq((1L, "alpha beta gamma delta epsilon"))
    val got = phrases(corpus, Seq(
      (1L, "  beta gamma delta epsilon"), // leading ws, long path
      (2L, "beta gamma delta epsilon  "), // trailing ws, long path
      (3L, " beta gamma "), // short path with edge ws
      (4L, "   "))) // normalizes empty: matches nothing
    assert(got == Set((1L, 1L), (2L, 1L), (3L, 1L)))
  }
}
