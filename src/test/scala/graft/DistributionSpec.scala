package graft

import org.apache.spark.sql.functions._

import graft.ops.Distribution

/** Log₂-histogram distribution profile: integer-exact bucketing,
  * sum-mergeability, and the factor-2 quantile band. */
class DistributionSpec extends SparkSpec {
  import spark.implicits._

  test("bucket is the bit-length floor(log2), -1 for non-positives") {
    val vals = Seq(-5L, 0L, 1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L, 1025L,
      (1L << 40) - 1, 1L << 40)
    val got = vals.toDF("v")
      .select(Distribution.log2Bucket(col("v")).as("b"))
      .collect().map(_.getLong(0)).toSeq
    val want = vals.map(v => if (v <= 0) -1L
      else (63 - java.lang.Long.numberOfLeadingZeros(v)).toLong)
    assert(got == want, s"got=$got want=$want")
  }

  test("histogram counts partition the input; merge of halves == whole") {
    val vals = (1 to 2000).map(i => (i % 4, (i * i % 5000 + 1).toLong))
    val df = vals.toDF("g", "v").repartition(8)
    val whole = Distribution.logHistogram(df, Seq("g"), col("v"))
    assert(whole.agg(sum("n")).collect().head.getLong(0) == 2000L)
    val h1 = Distribution.logHistogram(df.filter(col("v") % 2 === 0),
      Seq("g"), col("v"))
    val h2 = Distribution.logHistogram(df.filter(col("v") % 2 =!= 0),
      Seq("g"), col("v"))
    val merged = Distribution.mergeHistograms(Seq(h1, h2), Seq("g"))
    val a = merged.orderBy("g", "bucket").collect().toSeq
    val b = whole.orderBy("g", "bucket").collect().toSeq
    assert(a == b, "summed halves must equal the whole-corpus histogram")
  }

  test("quantile estimates band the true quantile within factor 2") {
    val vals = (1 to 5000).map(i => ((i * 2654435761L) % 100000 + 1))
    val df = vals.toDF("v")
    val qs = Seq(500000L, 900000L, 990000L)
    val est = Distribution.quantiles(df, Nil, col("v"), qs)
      .collect().map(r => r.getAs[Long]("q_ppm") -> r.getAs[Long]("est")).toMap
    val sorted = vals.sorted
    for (q <- qs) {
      val rank = ((sorted.size.toLong * q + 999999) / 1000000).toInt
      val truth = sorted(rank - 1)
      val e = est(q)
      // est is the crossed bucket's lower bound: est <= truth < 2*est
      assert(e <= truth && truth < 2 * e,
        s"q=$q: est=$e truth=$truth not within [est, 2*est)")
    }
  }

  test("quantiles from a MERGED ledger equal quantiles over the whole") {
    val vals = (1 to 3000).map(i => (s"s${i % 3}", (i * 7 % 900 + 1).toLong))
    val df = vals.toDF("g", "v").repartition(8)
    val parts = (0 to 2).map(h =>
      Distribution.logHistogram(
        df.filter(abs(hash(col("v"))) % 3 === h), Seq("g"), col("v")))
    val ledger = Distribution.mergeHistograms(parts, Seq("g"))
    val fromLedger = Distribution.quantilesFromHistogram(
      ledger, Seq("g"), Seq(500000L, 990000L))
      .orderBy("g", "q_ppm").collect().toSeq
    val direct = Distribution.quantiles(df, Seq("g"), col("v"),
      Seq(500000L, 990000L)).orderBy("g", "q_ppm").collect().toSeq
    assert(fromLedger == direct)
  }

  test("nulls are excluded from the histogram") {
    val df = Seq(Some(4L), None, Some(4L), Some(9L), None).toDF("v")
    val h = Distribution.logHistogram(df, Nil, col("v"))
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(h.toSeq == Seq((2L, 2L), (3L, 1L)))
  }
}
