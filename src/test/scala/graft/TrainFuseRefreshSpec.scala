package graft

import org.apache.spark.sql.functions._

import graft.ops.{ConnectedComponents, LinearTrainer, Retrieval}

/** The integer-exact LMS probe trainer: hand-replayable arithmetic,
  * partition independence, and the two fail-fast guards. */
class LinearTrainerSpec extends SparkSpec {
  import spark.implicits._

  private val twoDocFeats =
    Seq((10L, 1L, 1L), (20L, 2L, 1L)).toDF("id", "bucket", "x")
  private val twoDocLabels =
    Seq((10L, 1000000L), (20L, -1000000L)).toDF("id", "y_u")

  test("two-step training replays the hand-computed trajectory") {
    // n=2, lrDenom=1, div=2: step 1 grads ∓1e6 → w=(±500000);
    // step 2 grads ∓500000 → w=(±750000)
    val r = LinearTrainer.lmsTrain(twoDocFeats, twoDocLabels, "id",
      steps = 2, lrDenom = 1L)
    assert(r.nDocs == 2)
    assert(r.metrics.map(m => (m.step, m.nCorrect, m.sumAbsWU)) ==
      Seq((1L, 1L, 0L), (2L, 2L, 1000000L), (3L, 2L, 1500000L)))
    assert(r.weights == Map(1L -> 750000L, 2L -> -750000L))
  }

  test("training is partition-independent") {
    val emb = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(j => (((i * 37 + j * 11) % 19) - 9) / 10.0f),
        i % 3 == 0)
    }.toDF("id", "vec", "pos")
    val feats = LinearTrainer.embeddingFeatures(emb, "id", col("vec"))
    val labels = emb.select(col("id"), LinearTrainer.labelU(col("pos")).as("y_u"))
    def train(f: org.apache.spark.sql.DataFrame) =
      LinearTrainer.lmsTrain(f, labels, "id", steps = 3, lrDenom = 4194304L)
    val a = train(feats)
    val b = train(feats.repartition(13))
    assert(a.weights == b.weights)
    assert(a.metrics == b.metrics)
  }

  test("embeddingFeatures truncates toward zero and drops exact zeros") {
    val df = Seq((1L, Array(0.0015f, -0.0015f, 0.0f, 0.25f)))
      .toDF("id", "vec")
    val got = LinearTrainer.embeddingFeatures(df, "id", col("vec"))
      .as[(Long, Long, Long)].collect().toSet
    // 1.5 → 1, −1.5 → −1 (truncation, not floor), 0 dropped, 250 kept
    assert(got == Set((1L, 1L, 1L), (1L, 2L, -1L), (1L, 4L, 250L)))
  }

  test("stability guard: lrDenom below the measured max row norm² fails fast") {
    // row norm² = 2² + 3² = 13
    val f = Seq((1L, 1L, 2L), (1L, 2L, 3L)).toDF("id", "bucket", "x")
    val y = Seq((1L, 1000000L)).toDF("id", "y_u")
    val e = intercept[IllegalArgumentException](
      LinearTrainer.lmsTrain(f, y, "id", steps = 1, lrDenom = 12L))
    assert(e.getMessage.contains("max row norm"))
    // and exactly the bound passes
    LinearTrainer.lmsTrain(f, y, "id", steps = 1, lrDenom = 13L)
  }

  test("divisor overflow guard: lrDenom * n wrapping Long fails fast") {
    // a huge-but-valid lrDenom times n = 2 wraps the Long step divisor
    // negative, which would silently FLIP the weight update's sign —
    // the guard must trip before any update applies
    val f = Seq((1L, 1L, 1L), (2L, 1L, 1L)).toDF("id", "bucket", "x")
    val y = Seq((1L, 5L), (2L, 5L)).toDF("id", "y_u")
    val e = intercept[IllegalArgumentException](
      LinearTrainer.lmsTrain(f, y, "id", steps = 1,
        lrDenom = Long.MaxValue / 2 + 1))
    assert(e.getMessage.contains("overflows the Long step divisor"))
  }

  test("step budget guard") {
    val e = intercept[IllegalArgumentException](
      LinearTrainer.lmsTrain(twoDocFeats, twoDocLabels, "id",
        steps = 17, lrDenom = 1L))
    assert(e.getMessage.contains("1..16"))
  }

  test("serve scores featureless ids as 0 and thresholds at 0") {
    val ids = Seq(10L, 20L, 30L).toDF("id") // 30 has no features
    val got = LinearTrainer.serve(ids, twoDocFeats, "id",
        Map(1L -> 750000L, 2L -> -750000L))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((10L, 750000L, 1L), (20L, -750000L, 0L),
      (30L, 0L, 1L)))
  }

  test("calibrate counts threshold accuracy exactly, one row per threshold") {
    val scored = Seq(
      (1L, 600000L, 1000000L),  // correct iff thr <= 600000
      (2L, -100000L, -1000000L) // correct iff thr > -100000
    ).toDF("id", "score_u", "y_u")
    val got = LinearTrainer.calibrate(scored, "id",
        Seq(-200000L, 0L, 700000L))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(-200000L -> 1L, 0L -> 2L, 700000L -> 1L))
  }
}

/** Integer reciprocal-rank fusion: exact µ-point arithmetic, doc-id
  * tie-breaks, k bound, and single/multi-list membership counting. */
class RrfFuseSpec extends SparkSpec {
  import spark.implicits._

  test("fused scores are the exact µ-point sums across lists") {
    val l1 = Seq((1L, 100L, 1L), (1L, 200L, 2L)).toDF("q", "d", "rank")
    val l2 = Seq((1L, 200L, 1L), (1L, 300L, 2L)).toDF("q", "d", "rank")
    val got = Retrieval.rrfFuse(Seq(l1, l2), "q", "d", "rank", k = 10)
      .select("q", "d", "rrf_u", "n_lists", "rank")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // 1e6 div 61 = 16393, 1e6 div 62 = 16129
    assert(got == Set(
      (1L, 200L, 16393L + 16129L, 2L, 1L),
      (1L, 100L, 16393L, 1L, 2L),
      (1L, 300L, 16129L, 1L, 3L)))
  }

  test("equal fused scores break ties by document id") {
    val l1 = Seq((1L, 900L, 1L)).toDF("q", "d", "rank")
    val l2 = Seq((1L, 100L, 1L)).toDF("q", "d", "rank")
    val got = Retrieval.rrfFuse(Seq(l1, l2), "q", "d", "rank", k = 10)
      .orderBy("rank").select("d").as[Long].collect().toSeq
    assert(got == Seq(100L, 900L))
  }

  test("k bounds each query's fused list independently") {
    val l1 = (1L to 30L).map(d => (1L, d, d)).toDF("q", "d", "rank")
      .unionByName((1L to 3L).map(d => (2L, d, d)).toDF("q", "d", "rank"))
    val got = Retrieval.rrfFuse(Seq(l1), "q", "d", "rank", k = 5)
    val byQ = got.groupBy("q").count().as[(Long, Long)].collect().toMap
    assert(byQ == Map(1L -> 5L, 2L -> 3L))
  }
}

/** Incremental CC refresh must be byte-identical to a full recompute
  * over old ∪ batch edges — across merges, brand-new nodes, and
  * batches that land entirely inside existing components. */
class CcRefreshSpec extends SparkSpec {
  import spark.implicits._

  private def parity(oldE: Seq[(Long, Long)], batch: Seq[(Long, Long)]): Unit = {
    val ledger = ConnectedComponents(oldE.toDF("src", "dst"), "src", "dst")
    val got = ConnectedComponents.refresh(ledger, "id", "comp",
        batch.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toSet
    val want = ConnectedComponents((oldE ++ batch).toDF("src", "dst"),
        "src", "dst")
      .as[(Long, Long)].collect().toSet
    assert(got == want, s"refresh != full recompute: got $got want $want")
  }

  test("bridges merging existing components relabel to the global minimum") {
    // two stars; the batch bridges them
    parity(Seq((0L, 1L), (0L, 2L), (10L, 11L), (10L, 12L)),
      Seq((2L, 11L)))
  }

  test("brand-new nodes join existing components and form new ones") {
    parity(Seq((0L, 1L), (10L, 11L)),
      Seq((1L, 99L), (200L, 201L), (201L, 202L)))
  }

  test("a batch entirely inside one component is a no-op") {
    parity(Seq((0L, 1L), (1L, 2L), (2L, 3L)), Seq((0L, 3L), (1L, 3L)))
  }

  test("chained refreshes equal one full recompute (random graphs)") {
    val rnd = (1 to 300).map { i =>
      val h = i * 2654435761L
      (math.abs(h % 61), math.abs((h / 61) % 61))
    }.filter { case (a, b) => a != b }
    val (e1, rest) = rnd.splitAt(150)
    val (e2, e3) = rest.splitAt(75)
    val l1 = ConnectedComponents(e1.toDF("src", "dst"), "src", "dst")
    val l2 = ConnectedComponents.refresh(l1, "id", "comp",
      e2.toDF("src", "dst"), "src", "dst")
    val l3 = ConnectedComponents.refresh(l2, "id", "comp",
      e3.toDF("src", "dst"), "src", "dst")
    val want = ConnectedComponents((e1 ++ e2 ++ e3).toDF("src", "dst"),
      "src", "dst").as[(Long, Long)].collect().toSet
    assert(l3.as[(Long, Long)].collect().toSet == want)
  }

  test("refresh labels stay canonical minima (usable as the next ledger)") {
    val ledger = ConnectedComponents(
      Seq((5L, 6L), (20L, 21L)).toDF("src", "dst"), "src", "dst")
    val refreshed = ConnectedComponents.refresh(ledger, "id", "comp",
      Seq((6L, 20L)).toDF("src", "dst"), "src", "dst")
    val m = refreshed.as[(Long, Long)].collect().toMap
    assert(m == Map(5L -> 5L, 6L -> 5L, 20L -> 5L, 21L -> 5L))
  }
}

/** Sequential Poisson weighted sampling: the staged window equals the
  * naive one-window form, weights bias inclusion, and non-positive
  * weights fail fast. */
class WeightedSampleSpec extends SparkSpec {
  import graft.ops.Curation
  import spark.implicits._

  private val docs = (1L to 500L)
    .map(i => (i, s"g${i % 4}", 10L + (i * 7) % 90))
    .toDF("id", "grp", "w")

  test("staged selection equals the naive single-window form") {
    val got = Curation.weightedSample(docs, "grp", "id", col("w"), k = 7)
      .select("id", "grp", "pos").as[(Long, String, Long)].collect().toSet
    val naive = docs
      .withColumn("_key", expr(
        "(CAST(conv(substring(md5(cast(concat('sps:', cast(id as string)) " +
          "as binary)), 1, 8), 16, 10) AS BIGINT) * 1000000L) div w"))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
          .orderBy(col("_key"), col("id"))).cast("bigint"))
      .filter(col("pos") <= 7)
      .select("id", "grp", "pos").as[(Long, String, Long)].collect().toSet
    assert(got == naive)
  }

  test("heavier rows are sampled far more often than light ones") {
    // 200 groups of 20 rows; one row per group carries 50× the weight.
    // Its inclusion odds in a k=1 draw are 50/(50+19) ≈ 72% vs 1.4%
    // for a light row; the hash is fixed so the count is deterministic
    // and any regression to unweighted sampling (expected hits ≈ 10)
    // fails loudly.
    val rows = (0L until 200L).flatMap { g =>
      (0L until 20L).map(i => (g * 100 + i, g, if (i == 7) 5000L else 100L))
    }.toDF("id", "grp", "w")
    val picked = Curation.weightedSample(rows, "grp", "id", col("w"), k = 1)
      .filter(col("id") % 100 === 7).count()
    assert(picked >= 100L && picked <= 190L,
      s"expected the 50x-weighted row to win ~72% of 200 groups, got $picked")
  }

  test("non-positive weights fail fast") {
    val bad = Seq((1L, "g", 0L)).toDF("id", "grp", "w")
    val e = intercept[Exception](
      Curation.weightedSample(bad, "grp", "id", col("w"), k = 1).collect())
    assert(e.getMessage.contains("weights must be positive"))
  }
}

/** The incremental pair feed equals a full re-mine restricted to
  * batch-involved pairs, and composed with refresh it reproduces the
  * from-scratch duplicate clustering. */
class DupGraphRefreshSpec extends SparkSpec {
  import graft.ops.{ApproxDedup, ConnectedComponents}
  import spark.implicits._

  // corpus with planted near-dup clusters: pairs of docs share most
  // bigrams; singletons are distinct
  private val docs = (0L until 60L).map { i =>
    val base = s"alpha bravo charlie delta echo f${i / 2} g${i / 2} h${i / 2}"
    val tail = if (i % 2 == 0) "uniq" + i else "x" + i
    (i, s"$base $tail")
  }.toDF("doc_id", "text")
    .withColumn("_sh", graft.ops.ApproxDedup.wordNgrams(col("text"), 2))

  private val K = 16; private val B = 4; private val R = 4

  test("incremental pairs == full-mine pairs restricted to batch-involved") {
    val old = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val ledger = ApproxDedup.lshLedger(old, "doc_id", "_sh", K, B, R)
    val got = ApproxDedup.incrementalLshPairsFromLedger(ledger, batch,
        "doc_id", "_sh", K, B, R, threshold = 0.5)
      .select(greatest(col("id_new"), col("id_other")).as("a"),
        least(col("id_new"), col("id_other")).as("b"))
      .as[(Long, Long)].collect().toSet
    val full = ApproxDedup.minhashLshPairs(docs, "doc_id", "_sh",
        K, B, R, threshold = 0.5)
      .filter(col("id_a") % 10 === 0 || col("id_b") % 10 === 0)
      .select(greatest(col("id_a"), col("id_b")).as("a"),
        least(col("id_a"), col("id_b")).as("b"))
      .as[(Long, Long)].collect().toSet
    assert(got == full, s"pair feeds diverge: got $got want $full")
  }

  test("point lookup equals full-mine pairs restricted to probe x ledger") {
    val old = docs.filter(col("doc_id") % 10 =!= 0)
    val probes = docs.filter(col("doc_id") % 4 === 0)
    val got = ApproxDedup.lshNeighborsFromLedger(
        ApproxDedup.lshLedger(old, "doc_id", "_sh", K, B, R), probes,
        "doc_id", "_sh", K, B, R, threshold = 0.5)
      .select("probe", "neighbor").as[(Long, Long)].collect().toSet
    val oldIds = old.select("doc_id").as[Long].collect().toSet
    val probeIds = probes.select("doc_id").as[Long].collect().toSet
    val full = ApproxDedup.minhashLshPairs(docs, "doc_id", "_sh",
        K, B, R, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val want = (full.collect {
      case (a, b) if probeIds(a) && oldIds(b) => (a, b)
    } ++ full.collect {
      case (a, b) if probeIds(b) && oldIds(a) => (b, a)
    }).filter { case (p, n) => p != n }.toSet
    assert(got == want, s"lookup diverges: got $got want $want")
  }

  test("pair feed + CC refresh == from-scratch clustering of all pairs") {
    val old = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val oldPairs = ApproxDedup.minhashLshPairs(old, "doc_id", "_sh",
      K, B, R, threshold = 0.5)
    val ledgerCc = ConnectedComponents(oldPairs, "id_a", "id_b")
    val batchPairs = ApproxDedup.incrementalLshPairsFromLedger(
      ApproxDedup.lshLedger(old, "doc_id", "_sh", K, B, R), batch,
      "doc_id", "_sh", K, B, R, threshold = 0.5)
    val got = ConnectedComponents.refresh(ledgerCc, "id", "comp",
        batchPairs, "id_new", "id_other")
      .as[(Long, Long)].collect().toSet
    val want = ConnectedComponents(
        ApproxDedup.minhashLshPairs(docs, "doc_id", "_sh", K, B, R,
          threshold = 0.5), "id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    assert(got == want)
  }
}
