package graft

import org.apache.spark.sql.functions._

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join on a skewed key distribution") {
    // 90% of rows share one hot key
    val big = (1 to 2000).map(i =>
      (if (i % 10 == 0) s"k$i" else "hot", i.toLong)).toDF("key", "v")
    val small = Seq(("hot", "H"), ("k10", "A"), ("k20", "B")).toDF("key", "tag")
    val plain = big.join(small, Seq("key")).select("key", "v", "tag")
      .collect().toSet
    val salted = graft.ops.Salting.saltedJoin(big, small, "key", salts = 8,
      saltSource = Seq($"v")).select("key", "v", "tag").collect().toSet
    assert(salted == plain)
    assert(salted.size == 1802) // 1800 hot + k10 + k20
  }

  test("salt spreads the hot key across sub-partitions") {
    val big = (1 to 1000).map(i => ("hot", i.toLong)).toDF("key", "v")
    val spread = big
      .withColumn("_salt", pmod(hash($"v"), lit(8)))
      .groupBy("_salt").count().select("count").as[Long].collect()
    assert(spread.length == 8)        // every salt bucket used
    assert(spread.max < 1000 * 0.3)   // no bucket holds the whole key
  }

  test("salted count matches plain count per key") {
    val df = (1 to 500).map(i => (if (i % 5 == 0) "b" else "a", i.toLong))
      .toDF("key", "v")
    val got = graft.ops.Salting.saltedCount(df, "key", 4, Seq($"v"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 400L, "b" -> 100L))
  }
}

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    // warehouse dir is a static conf; the default ./spark-warehouse under
    // the build dir is fine for this throwaway catalog table
    val n = 10000
    val (srcT, dstT) = graft.ops.Layout.bucketedPair(
      (1 to n).map(i => (i.toLong, s"etag-$i")).toDF("key", "etag"), "key",
      (1 to n).filter(_ % 2 == 0).map(i => (i.toLong, s"etag-$i"))
        .toDF("key", "etag"), "key",
      buckets = 8, nameA = "src_inv", nameB = "dst_inv")
    // force a non-broadcast join so co-location is what saves the shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = srcT.join(dstT, Seq("key"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free, got:\n$plan")
      assert(joined.count() == n / 2)
      // the q116 shape: per-key aggregate AFTER the bucketed join also
      // plans without an exchange (grouping key == bucket key)
      val agg = srcT.join(dstT.withColumnRenamed("etag", "e2"), Seq("key"))
        .groupBy("key").agg(org.apache.spark.sql.functions.count("*"))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"),
        s"per-key aggregate on bucketed join should be shuffle-free:\n$aggPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS src_inv")
      spark.sql("DROP TABLE IF EXISTS dst_inv")
    }
  }
}
