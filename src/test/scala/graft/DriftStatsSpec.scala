package graft

import org.apache.spark.sql.functions._

import graft.ops.{Distribution, DriftStats, FreqItems}

/** The L1 drift gate over count summaries: exact ppm arithmetic,
  * key-union semantics, and the verdict flip on a genuinely shifted
  * batch. */
class DriftStatsSpec extends SparkSpec {
  import spark.implicits._

  private def drift(a: Seq[(String, String, Long)],
                    b: Seq[(String, String, Long)], tPpm: Long) =
    DriftStats.l1Drift(
        a.toDF("g", "k", "n"), b.toDF("g", "k", "n"),
        Seq("g"), "k", tPpm)
      .collect()
      .map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("l1_ppm"), r.getAs[String]("verdict")))).toMap

  test("identical distributions read zero drift at any scale") {
    val a = Seq(("g", "x", 30L), ("g", "y", 70L))
    val b = Seq(("g", "x", 300L), ("g", "y", 700L)) // 10x the counts
    val got = drift(a, b, 1000L)
    assert(got("g") == ((0L, "stable")))
  }

  test("disjoint key sets read ~2e6 ppm (maximal L1)") {
    val a = Seq(("g", "x", 10L))
    val b = Seq(("g", "z", 10L))
    val got = drift(a, b, 500000L)
    assert(got("g")._1 == 2000000L)
    assert(got("g")._2 == "shifted")
  }

  test("hand-computed shares: floor-ppm arithmetic, key union") {
    // a: x=1/3, y=2/3; b: x=2/3, z=1/3
    val a = Seq(("g", "x", 1L), ("g", "y", 2L))
    val b = Seq(("g", "x", 2L), ("g", "z", 1L))
    // shares(ppm, floored): a: x=333333, y=666666; b: x=666666, z=333333
    // L1 = |333333-666666| + 666666 + 333333 = 1333332
    val got = drift(a, b, 1300000L)
    assert(got("g") == ((1333332L, "shifted")))
  }

  test("a shifted synthetic batch flips the histogram-drift verdict") {
    val ledger = (1 to 2000).map(i => ("s", 100L + i % 50)) // ~7-bit sizes
    val okBatch = (1 to 200).map(i => ("s", 100L + i % 50))
    val badBatch = (1 to 200).map(i => ("s", 90000L + i)) // ~17-bit sizes
    def hist(rows: Seq[(String, Long)]) =
      Distribution.logHistogram(rows.toDF("g", "v"), Seq("g"), col("v"))
    val stable = DriftStats.l1Drift(hist(ledger), hist(okBatch),
      Seq("g"), "bucket", 400000L).collect().head
    val shifted = DriftStats.l1Drift(hist(ledger), hist(badBatch),
      Seq("g"), "bucket", 400000L).collect().head
    assert(stable.getAs[String]("verdict") == "stable")
    assert(shifted.getAs[String]("verdict") == "shifted")
    assert(shifted.getAs[Long]("l1_ppm") == 2000000L) // disjoint buckets
  }

  test("composes with MG sketch summaries (vocabulary drift)") {
    val ledger = (1 to 900).map(i => ("g", s"t${i % 9}"))
    val batch = (1 to 100).map(i => ("g", if (i % 2 == 0) "NEW" else s"t${i % 9}"))
    def counts(rows: Seq[(String, String)]) =
      FreqItems.sketch(rows.toDF("g", "tok"), Seq("g"), col("tok"), k = 32)
        .select(col("g"), explode(col("mg")).as("e"))
        .select(col("g"), col("e.item").as("k"), col("e.cnt").as("n"))
    val out = DriftStats.l1Drift(counts(ledger), counts(batch),
      Seq("g"), "k", 400000L).collect().head
    // half the batch mass moved to an unseen token -> ~1e6 ppm L1
    assert(out.getAs[Long]("l1_ppm") >= 900000L)
    assert(out.getAs[String]("verdict") == "shifted")
  }
}
