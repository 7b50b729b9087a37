package graft

import org.apache.spark.sql.functions._
import graft.ops.Cardinality

/** HLL sketch: merge exactness (the mergeable-state property), parity
  * with a driver-side reference implementation (hash → register → exact
  * integer estimate), and accuracy in both the raw and linear-counting
  * regimes. */
class CardinalitySpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference via the JVM mirror functions — an
    * independent path from the Column expressions the plan compiles. */
  private def referenceEstimate(keys: Seq[String]): (Long, Long) = {
    val regs = new Array[Byte](Cardinality.M)
    keys.foreach { k =>
      val hv = Cardinality.hashLong(k)
      val b = Cardinality.bucketOfLong(hv)
      val r = Cardinality.rhoOfLong(hv).toByte
      if (r > regs(b)) regs(b) = r
    }
    Cardinality.estimateRegisters(regs)
  }

  private def run(n: Int): (Long, Long, Long) = {
    val df = (1 to n).map(i => ("g", s"user-$i")).toDF("g", "k")
    val out = Cardinality.approxDistinct(df, Seq("g"), col("k"))
      .select("zero_regs", "estimate").as[(Long, Long)].head()
    val (zr, er) = referenceEstimate((1 to n).map(i => s"user-$i"))
    assert((out._1, out._2) == (zr, er),
      s"n=$n: spark $out vs reference ($zr, $er)")
    (out._1, out._2, n.toLong)
  }

  test("estimate matches the driver-side reference, both regimes") {
    // linear-counting regime (small n, empty registers)
    val (zSmall, eSmall, nSmall) = run(300)
    assert(zSmall > 0)
    assert(math.abs(eSmall - nSmall).toDouble / nSmall < 0.15,
      s"lc-regime estimate $eSmall vs $nSmall")
    // raw regime (n >> m)
    val (_, eBig, nBig) = run(20000)
    assert(math.abs(eBig - nBig).toDouble / nBig < 0.08,
      s"raw-regime estimate $eBig vs $nBig (se ~3.3%)")
  }

  test("merged shard sketches equal the whole-corpus sketch exactly") {
    val whole = (1 to 5000).map(i => (s"g${i % 3}", s"k-$i")).toDF("g", "k")
    val shards = (0 until 4).map(p =>
      Cardinality.sketch(whole.filter(abs(hash($"k")) % 4 === p),
        Seq("g"), $"k"))
    val merged = Cardinality.estimate(
      Cardinality.merge(shards, Seq("g")), Seq("g"))
    val direct = Cardinality.estimate(
      Cardinality.sketch(whole, Seq("g"), $"k"), Seq("g"))
    assert(merged.orderBy("g").collect().toSeq ==
      direct.orderBy("g").collect().toSeq)
  }

  test("sketch state is bounded by m rows per group") {
    val df = (1 to 50000).map(i => ("g", s"k-$i")).toDF("g", "k")
    val n = Cardinality.sketch(df, Seq("g"), $"k").count()
    assert(n <= Cardinality.M, s"register rows $n exceed m=${Cardinality.M}")
  }

  test("profile: one-pass counts, nulls, exact tiny cardinalities, all-null column") {
    val df = Seq(("a", Some(1L)), ("b", None), ("a", Some(2L))).toDF("s", "v")
    val p = Cardinality.profile(df, Seq("s", "v")).orderBy("colname")
      .select("colname", "n_rows", "n_nulls", "distinct_est")
      .as[(String, Long, Long, Long)].collect().toSeq
    // linear counting is exact at V near m: 2 distinct values profile as 2
    assert(p == Seq(("s", 3L, 0L, 2L), ("v", 3L, 1L, 2L)))
    val z = Cardinality.profile(
        df.withColumn("z", lit(null).cast("string")), Seq("z"))
      .select("colname", "n_rows", "n_nulls", "distinct_est")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(z == Seq(("z", 3L, 3L, 0L)),
      "an all-null column must profile with distinct_est 0, not vanish")
  }
}
