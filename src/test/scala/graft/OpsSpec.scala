package graft

import org.apache.spark.sql.functions._

import graft.ops._

class SizeHistogramSpec extends SparkSpec {
  import spark.implicits._

  test("buckets are cumulative, >max excluded from buckets but counted in total") {
    // one object per interesting size, reference thresholds
    val sizes = Seq(500000L, 1000000L, 1000001L, 5000000L, 5000001L,
      2000000000L, 5000000000L, 6000000000L)
    val r = SizeHistogram(sizes.toDF("sz"), $"sz").first()
    assert(r.getAs[Long]("total_objects") == 8)
    assert(r.getAs[Long]("sub_1000000") == 2)      // 500k, 1e6
    assert(r.getAs[Long]("sub_5000000") == 4)      // + 1e6+1, 5e6
    assert(r.getAs[Long]("sub_10000000") == 5)     // + 5e6+1
    assert(r.getAs[Long]("sub_1000000000") == 5)
    assert(r.getAs[Long]("sub_5000000000") == 7)   // 2e9 + 5e9; 6e9 excluded
    assert(r.getAs[Long]("total_size") == sizes.sum)
  }

  test("byGroup totals equal global totals") {
    val df = Seq(("a", 10L), ("a", 20L), ("b", 999L)).toDF("g", "sz")
    val per = SizeHistogram.byGroup(df, $"g", $"sz", Seq(100L))
    assert(per.agg(sum("total_objects")).as[Long].head() == 3)
    assert(per.agg(sum("sub_100")).as[Long].head() == 2)
  }
}

class InventoryDiffSpec extends SparkSpec {
  import spark.implicits._

  private val old = Seq(
    ("k-same", 10L, "e1"), ("k-upd", 10L, "e1"),
    ("k-del", 10L, "e1"), ("k-nullv", 10L, null.asInstanceOf[String])
  ).toDF("key", "size", "etag")
  private val curr = Seq(
    ("k-same", 10L, "e1"), ("k-upd", 11L, "e1"),
    ("k-new", 10L, "e1"), ("k-nullv", 10L, null.asInstanceOf[String])
  ).toDF("key", "size", "etag")

  test("classifies New / Delete / Update and drops Same by default") {
    val got = InventoryDiff(old, curr, "key", Seq("size", "etag"))
      .select("key", "variance").as[(String, String)].collect().toMap
    assert(got == Map("k-upd" -> "Update", "k-del" -> "Delete", "k-new" -> "New"))
  }

  test("includeSame partitions the key union exactly") {
    val all = InventoryDiff(old, curr, "key", Seq("size", "etag"), includeSame = true)
    val keys = all.select("key").as[String].collect().toSet
    val expect = Set("k-same", "k-upd", "k-del", "k-new", "k-nullv")
    assert(keys == expect)
    assert(all.count() == expect.size) // one verdict per key, no dup/loss
    // all-null compare columns on both sides are Same, not Update
    val nullv = all.filter($"key" === "k-nullv").select("variance").as[String].head()
    assert(nullv == "Same")
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exact keeps one whole row atomically under tie-break collisions") {
    val df = Seq(
      ("a", 1, "y", 0), ("a", 1, "x", 9), ("a", 2, "z", 5), ("b", 3, "w", 7)
    ).toDF("k", "tie", "c1", "c2")
    val got = Dedup.exact(df, Seq("k"), "tie")
      .as[(String, Int, String, String)].collect().toSet
    // for k=a the tied rows resolve to the full-row minimum (x,9) — never
    // a stitched (x, 0)
    assert(got == Set(("a", 1, "x", "9"), ("b", 3, "w", "7")))
  }

  test("exact is idempotent") {
    val df = Seq(("a", 2, "p"), ("a", 1, "q"), ("b", 1, "r")).toDF("k", "t", "v")
    val once = Dedup.exact(df, Seq("k"), "t")
    val twice = Dedup.exact(once, Seq("k"), "t")
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("antiJoin drops exactly the ledgered ids") {
    val tasks = Seq(("f1", "m1"), ("f1", "m2"), ("f2", "m3")).toDF("fileName", "msgId")
    val ledger = Seq(("f1", "m1")).toDF("fileName", "msgId")
    val got = Dedup.antiJoin(tasks, ledger)
      .as[(String, String)].collect().toSet
    assert(got == Set(("f1", "m2"), ("f2", "m3")))
  }
}

class TaskFanoutSpec extends SparkSpec {
  import spark.implicits._

  private val objs = (1 to 250).map(i => (i.toLong, s"key-$i", i * 10L))
    .toDF("id", "key", "size")

  test("pack/unpack round-trips losslessly") {
    val packed = TaskFanout.pack(objs, $"id", Seq($"id"), queues = 3, batchSize = 40)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("size", org.apache.spark.sql.types.LongType)))
    val back = TaskFanout.unpack(packed, col("body"), schema)
    assert(back.select("id", "key", "size").collect().toSet
      == objs.collect().toSet)
  }

  test("batches respect the size cap and queues the modulus") {
    val packed = TaskFanout.pack(objs, $"id", Seq($"id"), queues = 3, batchSize = 40)
    assert(packed.agg(max("n_objects")).as[Long].head() <= 40)
    assert(packed.select("queue").distinct().as[Int].collect().toSet == Set(0, 1, 2))
    assert(packed.agg(sum("n_objects")).as[Long].head() == 250)
  }

  test("intra-message order follows orderKeys, not payload order") {
    val df = Seq((1L, "zz", 1L), (1L, "aa", 3L), (1L, "mm", 2L))
      .toDF("route", "name", "ord")
    val body = TaskFanout.pack(df, $"route", Seq($"ord"), 2, 10)
      .select("body").as[String].head()
    val names = "\"name\":\"(\\w+)\"".r.findAllMatchIn(body).map(_.group(1)).toSeq
    assert(names == Seq("zz", "mm", "aa"))
  }
}

class TimeBucketStatsSpec extends SparkSpec {
  import spark.implicits._

  // out-of-order rows spanning >1 hour (FIXTURES A6)
  private val log = Seq(
    (3600L, 1, 100L), (60L, 1, 10L), (61L, 0, 5L), (3599L, 1, 7L),
    (7260L, 0, 50L), (59L, 1, 1L)
  ).toDF("ts", "ok", "size")

  test("rollups re-aggregate the 1-minute tier consistently") {
    val stat = TimeBucketStats.statTable(log, $"ts", $"ok", $"size")
    val m1 = stat.filter($"time_unit" === 1)
    val m60 = stat.filter($"time_unit" === 60)
    assert(m1.agg(sum("success_size")).as[Long].head()
      == m60.agg(sum("success_size")).as[Long].head())
    assert(m1.agg(sum("failed_num")).as[Long].head()
      == m60.agg(sum("failed_num")).as[Long].head())
    // hour buckets: 0 and 7200 (row at 3600 belongs to hour 3600)
    assert(m60.select("start_time").as[Long].collect().toSet == Set(0L, 3600L, 7200L))
  }

  test("aggregation is order-insensitive (the T5 semantic upgrade)") {
    val shuffled = log.orderBy(rand(42))
    val a = TimeBucketStats.statTable(log, $"ts", $"ok", $"size").collect().toSet
    val b = TimeBucketStats.statTable(shuffled, $"ts", $"ok", $"size").collect().toSet
    assert(a == b)
  }

  test("minute spine zero-fills gaps") {
    val stat = TimeBucketStats.statTable(log, $"ts", $"ok", $"size")
    val spine = TimeBucketStats.minuteSpine(stat, 0L, 3)
    val rows = spine.orderBy("start_time")
      .select("start_time", "success_num").as[(Long, Long)].collect().toSeq
    // minute 0 holds only ts=59 (1 success); minute 60 holds ts=60 (ok)
    // and ts=61 (failed); minute 120 is a zero-filled gap
    assert(rows == Seq((0L, 1L), (60L, 1L), (120L, 0L)))
  }

  test("watermarks expose min/max per status") {
    val wm = TimeBucketStats.watermarks(log, $"ts", $"ok")
      .orderBy("status").as[(Int, Long, Long, Long)].collect().toSeq
    assert(wm == Seq((0, 61L, 7260L, 2L), (1, 59L, 3600L, 4L)))
  }
}

class VerificationSpec extends SparkSpec {
  import spark.implicits._

  test("verdicts follow the reference check order") {
    val src = Seq(
      ("k-ok", 10L, 100L, "e1"), ("k-missing", 10L, 100L, "e1"),
      ("k-size", 10L, 100L, "e1"), ("k-mtime", 10L, 100L, "e1"),
      ("k-etag", 10L, 100L, "e1"),
      ("k-size-and-etag", 10L, 100L, "e1") // size wins: checked first
    ).toDF("key", "size", "mtime", "etag")
    val dst = Seq(
      ("k-ok", 10L, 100L, "e1"), ("k-size", 11L, 100L, "e1"),
      ("k-mtime", 10L, 999L, "e1"), ("k-etag", 10L, 100L, "e2"),
      ("k-size-and-etag", 99L, 100L, "e9")
    ).toDF("key", "size", "mtime", "etag")
    val got = graft.ops.Verification(src, dst, "key")
      .select("key", "verdict").as[(String, String)].collect().toMap
    assert(got == Map(
      "k-ok" -> "ok", "k-missing" -> "missing_dest",
      "k-size" -> "size_mismatch", "k-mtime" -> "mtime_mismatch",
      "k-etag" -> "etag_mismatch", "k-size-and-etag" -> "size_mismatch"))
    val summ = graft.ops.Verification.summary(graft.ops.Verification(src, dst, "key"))
      .agg(org.apache.spark.sql.functions.sum("n")).as[Long].head()
    assert(summ == 6) // every input row classified exactly once
  }
}
