package graft

import org.apache.spark.sql.functions._

import graft.ops.{ConnectedComponents, CorpusSignals, SemanticDedup}

/** Round-4 additions: Gopher repetition signals, C4 global line dedup,
  * benchmark decontamination, TF-IDF salient terms, SemDeDup semantic
  * dedup, and the long-chain connected-components regression. */
class CorpusSignalsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a b a b a b"),          // heavy bigram repetition
    (2L, "x y z w q r"),          // all distinct
    (3L, "one two three one two three one two three") // dup 3-grams
  ).toDF("doc_id", "text")

  test("repetitionSignals: duplicate-word fraction and top bigram") {
    val r = CorpusSignals.repetitionSignals(docs, "doc_id", col("text"), dupN = 3)
      .orderBy("doc_id")
      .collect()
    // doc 1: 6 tokens, 2 distinct -> dup_word_frac 4/6
    assert(math.abs(r(0).getAs[Double]("dup_word_frac") - 4.0 / 6) < 1e-12)
    assert(r(0).getAs[String]("top_bigram") == "a b")
    assert(r(0).getAs[Long]("top_bigram_n") == 3L)
    // doc 2: nothing repeats
    assert(r(1).getAs[Double]("dup_word_frac") == 0.0)
    assert(r(1).getAs[Double]("dup_ngram_frac") == 0.0)
    // doc 3: every 3-gram repeats — "one two three" x3, "two three one"
    // x2, "three one two" x2 = 7 occurrences x 13 chars over 41 chars
    // (overlap pushes the score past 1 by design)
    assert(math.abs(r(2).getAs[Double]("dup_ngram_frac") - 91.0 / 41) < 1e-12)
  }

  test("syntheticLines + lineDedup: later copies of a line drop corpus-wide") {
    val d = Seq(
      (1L, "w1 w2 w3 w4 w5 w6"),  // lines: [w1..w5], [w6]
      (2L, "w1 w2 w3 w4 w5 x"),   // first line identical to doc 1's
      (3L, "w6")                  // equals doc 1's second line
    ).toDF("doc_id", "text")
    val lines = CorpusSignals.syntheticLines(d, "doc_id", col("text"), 5)
    assert(lines.count() == 5)
    val r = CorpusSignals.lineDedup(lines, "doc_id", "line_no", "line")
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_kept") == 2L) // doc 1 keeps both
    assert(r(1).getAs[Long]("n_kept") == 1L) // loses the shared first line
    assert(r(1).getAs[String]("kept_text") == "x")
    assert(r(2).getAs[Long]("n_kept") == 0L) // single line already seen
    assert(r(2).isNullAt(r(2).fieldIndex("kept_text")))
  }

  test("contamination + decontaminate: shared n-grams flag and drop docs") {
    val train = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "totally unrelated training text here")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "the quick brown fox sleeps")).toDF("doc_id", "text")
    val c = CorpusSignals.contamination(train, bench, "doc_id", col("text"), n = 3)
      .collect()
    assert(c.length == 1 && c(0).getLong(0) == 1L)
    // "the quick brown" + "quick brown fox" shared
    assert(c(0).getAs[Long]("n_shared") == 2L)
    val kept = CorpusSignals.decontaminate(train, bench, "doc_id", col("text"), 3)
    assert(kept.select("doc_id").as[Long].collect().toSeq == Seq(2L))
  }

  test("tfidfTopTerms: corpus-wide terms score below unique ones") {
    val d = Seq(
      (1L, "shared shared rare1"),
      (2L, "shared rare2 rare2 rare2")
    ).toDF("doc_id", "text")
    val r = CorpusSignals.tfidfTopTerms(d, "doc_id", col("text"), k = 2)
      .orderBy("doc_id", "rank").collect()
    // doc 1: tf(shared)=2 but df=2 -> score 2; rare1 tf=1 df=1 -> score 2; tie
    // broken by term asc => rank1 "rare1"
    assert(r(0).getAs[String]("term") == "rare1")
    // doc 2: rare2 tf=3 df=1 -> 6 beats shared (1*2/2=1)
    assert(r(2).getAs[String]("term") == "rare2")
    assert(r(2).getAs[Double]("score") == 6.0)
  }
}

class CleanPlanSpec extends SparkSpec {
  import spark.implicits._

  test("cleanPlan composes the gates lazily and matches clean's output") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = exec.CorpusPipeline.cleanPlan(docs,
      minTokens = 30, maxPunctRatio = 0.05, maxDupWordFrac = 0.6,
      nearDupThreshold = 0.6)
    val (framed, summary) = exec.CorpusPipeline.clean(spark, docs,
      minTokens = 30, maxPunctRatio = 0.05, nearDupThreshold = 0.6,
      maxDupWordFrac = 0.6)
    val a = plan.select("doc_id").as[Long].collect().sorted.toSeq
    val b = framed.select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b && summary.afterNearDup == a.length)
    assert(summary.input > summary.afterQuality) // the gates really gate
  }

  test("repetitionGate at 1.0 is a no-op; at 0.0 only all-distinct docs pass") {
    val d = Seq((1L, "a b c"), (2L, "a a b")).toDF("doc_id", "text")
    assert(exec.CorpusPipeline.repetitionGate(d, 1.0).count() == 2)
    val strict = exec.CorpusPipeline.repetitionGate(d, 0.0)
    assert(strict.select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }
}

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  test("survivors: near-identical vectors collapse to the min id per cluster") {
    // two tight groups along different axes + one isolated vector
    def v(base: Array[Double], eps: Double): Seq[Double] =
      base.zipWithIndex.map { case (x, i) => if (i == 63) x + eps else x }.toSeq
    val ax = Array.tabulate(64)(i => if (i == 0) 1.0 else 0.0)
    val ay = Array.tabulate(64)(i => if (i == 1) 1.0 else 0.0)
    val iso = Array.tabulate(64)(i => if (i == 2) 1.0 else 0.0)
    val emb = Seq(
      (10L, v(ax, 0.0)), (11L, v(ax, 1e-4)), (12L, v(ax, 2e-4)),
      (20L, v(ay, 0.0)), (21L, v(ay, 1e-4)),
      (30L, iso.toSeq)
    ).toDF("vec_id", "embedding")
    val out = SemanticDedup.survivors(emb, "vec_id", "embedding",
        k = 3, iters = 2, threshold = 0.99)
      .orderBy("vec_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(10L, 20L, 30L))
  }

  test("connected components survives a long-chain graph (lineage regression)") {
    // a 21-node path converges in ~20 min-label rounds; the
    // un-checkpointed formulation doubled plan depth per round and
    // OOMed the driver in Catalyst canonicalization near round ~15
    val edges = (0L until 20L).map(i => (i, i + 1)).toDF("src", "dst")
    val cc = ConnectedComponents(edges, "src", "dst", maxIters = 30, maxLocalEdges = 0)
    val comps = cc.select("comp").distinct().as[Long].collect()
    assert(comps.toSeq == Seq(0L))
  }
}

class SaltedLineDedupSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.CorpusSignals

  test("salted lineDedup agrees row-for-row with unsalted on a hot-line corpus") {
    // a pathologically hot line: every doc repeats the same boilerplate
    // line, plus unique content — the skew case salting exists for
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        concat(lit("click here to subscribe now "), col("text")).as("text"))
    val lines = CorpusSignals.syntheticLines(docs, "doc_id", col("text"), 4)
    def normalize(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_lines", "n_kept", "kept_text")
        .as[(Long, Long, Long, Option[String])].collect().toSeq.sorted
    val plain = normalize(
      CorpusSignals.lineDedup(lines, "doc_id", "line_no", "line"))
    val salted = normalize(
      CorpusSignals.lineDedup(lines, "doc_id", "line_no", "line", salts = 7))
    assert(plain.nonEmpty && salted == plain)
    // the hot boilerplate line survives exactly once corpus-wide
    val bolt = lines.filter(col("line") === "click here to subscribe")
    assert(bolt.count() == docs.count())
  }
}
