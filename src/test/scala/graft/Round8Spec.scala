package graft

import org.apache.spark.sql.functions._

import graft.ops.{ApproxDedup, Multimodal}

/** The native `simhash_sig` kernel vs the composable explode +
  * conditional-sum groupBy baseline — docs/KERNELS.md's
  * bitwise-equality rule. */
class SimhashKernelSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.01/documents.parquet")

  test("kernel fingerprint == explode-form fingerprint, every doc") {
    val fast = ApproxDedup.simhash(docs, "doc_id", col("text"), 60)
      .orderBy("doc_id").collect()
    val slow = ApproxDedup.simhashHof(docs, "doc_id", col("text"), 60)
      .orderBy("doc_id").collect()
    assert(fast.length == slow.length && fast.nonEmpty)
    fast.zip(slow).foreach { case (f, s) =>
      assert(f == s, s"fingerprint mismatch for doc ${f.getLong(0)}")
    }
  }

  test("narrow bit widths agree too (the bits parameter truncates)") {
    val d = docs.limit(50)
    val fast = ApproxDedup.simhash(d, "doc_id", col("text"), 16)
      .orderBy("doc_id").collect()
    val slow = ApproxDedup.simhashHof(d, "doc_id", col("text"), 16)
      .orderBy("doc_id").collect()
    assert(fast.toSeq == slow.toSeq)
  }

  test("null text drops the document; empty text keeps it (one '' token)") {
    val df = Seq((1L, "a b a"), (2L, null.asInstanceOf[String]), (3L, ""))
      .toDF("doc_id", "text")
    val fast = ApproxDedup.simhash(df, "doc_id", col("text"))
      .select("doc_id").as[Long].collect().toSeq.sorted
    val slow = ApproxDedup.simhashHof(df, "doc_id", col("text"))
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(fast == Seq(1L, 3L) && slow == Seq(1L, 3L))
    // and the empty-token fingerprint itself agrees
    val f3 = ApproxDedup.simhash(df, "doc_id", col("text"))
      .filter(col("doc_id") === 3).select("simhash").as[Long].head()
    val s3 = ApproxDedup.simhashHof(df, "doc_id", col("text"))
      .filter(col("doc_id") === 3).select("simhash").as[Long].head()
    assert(f3 == s3)
  }

  test("simhash_sig runs inside whole-stage codegen, zero exchanges") {
    val sig = ApproxDedup.simhash(docs, "doc_id", col("text"), 60)
    val plan = sig.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[.*simhash_sig""".r.findFirstIn(plan).isDefined,
      plan.take(1500))
    assert(!plan.contains("Exchange"), plan.take(1500))
  }
}

/** The native `dhash_sig` kernel vs the composable 66-cell
  * transform/aggregate HOF baseline. */
class DhashKernelSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.01/documents.parquet")
    .select(col("doc_id").as("img_id"), col("text").as("px"))

  test("kernel dhash == HOF-form dhash, every image (incl. re-encodes)") {
    val all = docs.unionByName(
      docs.select((col("img_id") + 1000000L).as("img_id"),
        Multimodal.fakeReencode(col("px")).as("px")))
    val fast = Multimodal.dhashSignatures(all, "img_id", col("px"))
      .orderBy("img_id").collect()
    val slow = Multimodal.dhashSignaturesHof(all, "img_id", col("px"))
      .orderBy("img_id").collect()
    assert(fast.length == slow.length && fast.nonEmpty)
    fast.zip(slow).foreach { case (f, s) =>
      assert(f == s, s"dhash mismatch for img ${f.getLong(0)}")
    }
  }

  test("short/empty scanlines agree (empty cells, n < 66)") {
    val df = Seq((1L, ""), (2L, "abc"), (3L, "x" * 65), (4L, "y" * 66),
        (5L, (0 until 200).map(i => ('a' + i % 26).toChar).mkString))
      .toDF("img_id", "px")
    val fast = Multimodal.dhashSignatures(df, "img_id", col("px"))
      .orderBy("img_id").collect()
    val slow = Multimodal.dhashSignaturesHof(df, "img_id", col("px"))
      .orderBy("img_id").collect()
    assert(fast.toSeq == slow.toSeq)
  }

  test("non-ASCII scanlines agree (code-point positions and values)") {
    val df = Seq((1L, "héllo wörld ünïcode " * 8), (2L, "日本語テキスト" * 15))
      .toDF("img_id", "px")
    val fast = Multimodal.dhashSignatures(df, "img_id", col("px"))
      .orderBy("img_id").collect()
    val slow = Multimodal.dhashSignaturesHof(df, "img_id", col("px"))
      .orderBy("img_id").collect()
    assert(fast.toSeq == slow.toSeq)
  }

  test("dhash_sig runs inside whole-stage codegen, zero exchanges") {
    val sig = Multimodal.dhashSignatures(docs, "img_id", col("px"))
    val plan = sig.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[.*dhash_sig""".r.findFirstIn(plan).isDefined,
      plan.take(1500))
    assert(!plan.contains("Exchange"), plan.take(1500))
  }
}
