package graft

import org.apache.spark.sql.functions._

import graft.ops.FreqItems

/** Misra-Gries sketch guarantees — the properties that hold under ANY
  * merge order (Agarwal et al. 2012 mergeable-summaries bounds), so
  * the assertions are deterministic even though Spark's partial-merge
  * tree is not. */
class FreqItemsSpec extends SparkSpec {
  import spark.implicits._

  test("exact when k >= distinct items (any merge order)") {
    val items = (1 to 500).flatMap(i => Seq.fill(i % 7 + 1)(s"it${i % 23}"))
    val df = items.toDF("x").repartition(8)
    val got = FreqItems.frequent(df, Nil, col("x"), k = 32, minCount = 1L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == want)
  }

  test("grouped sketch is exact per group at full capacity") {
    val df = (1 to 300)
      .map(i => (s"g${i % 3}", s"it${i % 11}")).toDF("g", "x")
      .repartition(8)
    val got = FreqItems.frequent(df, Seq("g"), col("x"), k = 16, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = (1 to 300).map(i => (s"g${i % 3}", s"it${i % 11}"))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == want)
  }

  test("truncating regime: lower bounds within n/(k+1); heavy items present") {
    // skewed stream: few heavy items over a 200-item tail
    val heavy = Seq.fill(400)("H1") ++ Seq.fill(300)("H2") ++ Seq.fill(250)("H3")
    val tail = (1 to 1000).map(i => s"t${i % 200}")
    // fixed-seed shuffle: the asserted bounds are order-free, the
    // fixture is reproducible
    val items = new scala.util.Random(42).shuffle(heavy ++ tail)
    val n = items.size
    val k = 20
    val df = items.toDF("x").repartition(8)
    val sk = FreqItems.sketch(df, Nil, col("x"), k)
      .select(explode(col("mg")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sk.size <= k, s"sketch kept ${sk.size} > k=$k entries")
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = n.toDouble / (k + 1)
    // every item with true count > n/(k+1) must be present
    for ((it, c) <- truth if c > bound)
      assert(sk.contains(it), s"guaranteed-present item $it (cnt=$c) missing")
    // estimates are lower bounds with error <= n/(k+1)
    for ((it, est) <- sk) {
      val t = truth(it)
      assert(est <= t, s"$it estimate $est exceeds true count $t")
      assert(t - est <= bound, s"$it error ${t - est} > bound $bound")
    }
  }

  test("mergeSketches over shard sketches preserves the bounds") {
    val heavy = Seq.fill(500)("H1") ++ Seq.fill(350)("H2")
    val tail = (1 to 900).map(i => s"t${i % 150}")
    val items = heavy ++ tail
    val n = items.size
    val k = 16
    val df = items.zipWithIndex.map { case (x, i) => (i % 4, x) }
      .toDF("shard", "x").repartition(8)
    val shards = FreqItems.sketch(df, Seq("shard"), col("x"), k)
    val merged = FreqItems.mergeSketches(shards, Nil, k)
      .select(explode(col("mg")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.size <= k)
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = n.toDouble / (k + 1)
    for ((it, c) <- truth if c > bound)
      assert(merged.contains(it), s"heavy item $it (cnt=$c) lost in merge")
    for ((it, est) <- merged)
      assert(est <= truth(it) && truth(it) - est <= bound,
        s"$it: est=$est true=${truth(it)} bound=$bound")
  }

  test("nulls are ignored; empty input yields empty sketch") {
    val df = Seq(Some("a"), None, Some("a"), None).toDF("x")
    val got = FreqItems.frequent(df, Nil, col("x"), k = 4, minCount = 1L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 2L))
    val empty = FreqItems.sketch(spark.emptyDataset[String].toDF("x"),
      Nil, col("x"), k = 4).select(size(col("mg"))).collect()
    assert(empty.head.getInt(0) == 0)
  }

  test("MG aggregation is map-side partial (k rows cross the exchange)") {
    // the operator's scale claim: a partial aggregate runs BEFORE the
    // exchange, so each partition ships <= k counters per group — never
    // the raw token stream
    val df = (1 to 1000).map(i => (s"g${i % 2}", s"t${i % 9}"))
      .toDF("g", "x").repartition(8)
    val plan = FreqItems.sketch(df, Seq("g"), col("x"), 16)
      .queryExecution.executedPlan.toString
    val aggs = "ObjectHashAggregate".r.findAllIn(plan).size
    assert(aggs >= 2 && plan.contains("partial_"),
      s"expected partial+final ObjectHashAggregate around the exchange:\n$plan")
  }

  test("finish order is deterministic: cnt desc, then item") {
    val df = (Seq.fill(5)("b") ++ Seq.fill(5)("a") ++ Seq.fill(3)("c"))
      .toDF("x").repartition(4)
    val mg = FreqItems.sketch(df, Nil, col("x"), k = 8)
      .select(col("mg")).collect().head
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(mg == Seq(("a", 5L), ("b", 5L), ("c", 3L)))
  }
}
