package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** The native winnow_fps kernel must produce EXACTLY the HOF form's
  * fingerprints — same gram addressing (code points, 1-based,
  * end-clamped), same md5-top-4-bytes hash, same window minima, same
  * first-occurrence dedupe order. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def both(df: org.apache.spark.sql.DataFrame, k: Int, w: Int) =
    df.select(
        TextAnalysis.winnow(col("t"), k, w).as("native"),
        TextAnalysis.winnowHof(col("t"), k, w).as("hof"))
      .collect()
      .map(r => (r.getSeq[Long](0), r.getSeq[Long](1)))

  test("equal to the HOF form on real corpus text (q48 parameters)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(substring(col("text"), 1, 256).as("t"))
    val rows = both(docs, 5, 8)
    assert(rows.nonEmpty)
    rows.foreach { case (n, h) => assert(n == h) }
    // non-vacuous: winnowing actually selected a strict subset
    assert(rows.exists(_._1.length > 1))
  }

  test("edge cases: empty, shorter than k, shorter than w+k-1, unicode") {
    val edge = Seq("", "ab", "abcde", "abcdefgh",
        "héllo wörld ünïcode text",
        "aaaaaaaaaaaaaaaaaaaa")
      .toDF("t")
    both(edge, 5, 8).foreach { case (n, h) => assert(n == h) }
    // degenerate windows too
    both(edge, 1, 1).foreach { case (n, h) => assert(n == h) }
    both(edge, 3, 2).foreach { case (n, h) => assert(n == h) }
  }

  test("winnow_fps stays inside the codegen span") {
    val df = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(TextAnalysis.winnow(substring(col("text"), 1, 64), 5, 8).as("f"))
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[winnow_fps""".r.findFirstIn(plan).isDefined,
      plan.take(1000))
  }
}
