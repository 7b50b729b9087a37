package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.sinks.VersionedStore

/** The `graft-vstore` DSv2 table (round-14): SQL-addressable MVCC
  * snapshots with the store's read discipline at plan time — key-hash
  * bucket pruning, `_cstats` chain skipping, reader-local
  * merge-on-read resolution, snapshot schemas, time travel. Parity is
  * pinned row-for-row against the Scala read API on every chain
  * shape. */
class VStoreSourceSpec extends SparkSpec {
  import spark.implicits._

  private def vdf(root: String, opts: (String, String)*): DataFrame = {
    val r = spark.read.format("graft-vstore").option("path", root)
    opts.foldLeft(r) { case (x, (k, v)) => x.option(k, v) }.load()
  }

  private def scanParts(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.inputPartitions.size
    }.sum

  test("snapshot parity with readAsOf on plain, MOR and evolved chains") {
    val root = tmpDir("vsrc_parity") + "/store"
    VersionedStore.upsert((1L to 60L).map(k => (k, k * 2L)).toDF("k", "v"),
      Seq("k"), root, nBuckets = 4)
    VersionedStore.deltaApply(
      Seq((5L, 500L, "upsert"), (6L, 0L, "delete"), (999L, 0L, "delete"))
        .toDF("k", "v", "op"), Seq("k"), root, "op")
    VersionedStore.upsert(
      (61L to 70L).map(k => (k, k * 2L, s"s$k")).toDF("k", "v", "tag"),
      Seq("k"), root, evolve = true)

    // current snapshot (delta'd chain + carried-forward old gens under
    // the evolved schema)
    val got = vdf(root).orderBy("k").collect().toSeq
    val want = VersionedStore.read(spark, root).orderBy("k").collect().toSeq
    assert(got == want && got.size == 69, s"parity: ${got.size} rows")

    // time travel by epoch serves THAT epoch's schema and content
    val e1 = vdf(root, "epoch" -> "1")
    assert(e1.columns.toSeq == Seq("k", "v"), "epoch-1 schema predates tag")
    assert(e1.orderBy("k").collect().toSeq ==
      VersionedStore.readAsOf(spark, root, 1L).orderBy("k").collect().toSeq)
    val e2 = vdf(root, "epoch" -> "2").as[(Long, Long)].collect().toMap
    assert(e2(5L) == 500L && !e2.contains(6L) && e2.size == 59,
      "MOR resolution inside the reader: newest wins, tombstones drop")
  }

  test("key pushdown plans only the probe key's chain; filters residual") {
    val root = tmpDir("vsrc_key") + "/store"
    VersionedStore.upsert((1L to 100L).map(k => (k, k)).toDF("k", "v"),
      Seq("k"), root, nBuckets = 8)
    val probe = vdf(root).filter(col("k") === 42L)
    assert(probe.as[(Long, Long)].collect().toSeq == Seq((42L, 42L)))
    assert(scanParts(probe) == 1,
      s"a key probe must plan one chain: ${scanParts(probe)}")
    // residual evaluation: a key ABSENT from the store returns nothing
    // even though its bucket is planned
    assert(vdf(root).filter(col("k") === 101L).count() == 0L)
  }

  test("stats pruning drops untouched chains on a freshness scan") {
    val root = tmpDir("vsrc_stats") + "/store"
    VersionedStore.upsert(
      (1L to 200L).map(k => (k, k, 1L)).toDF("k", "v", "u"),
      Seq("k"), root, nBuckets = 16)
    VersionedStore.upsert(Seq((7L, 77L, 2L)).toDF("k", "v", "u"),
      Seq("k"), root)
    val fresh = vdf(root).filter(col("u") >= 2L)
    assert(fresh.as[(Long, Long, Long)].collect().toSeq == Seq((7L, 77L, 2L)))
    assert(scanParts(fresh) <= 1,
      s"freshness scan must plan only touched chains: ${scanParts(fresh)}")
    // no filter: every chain plans, full snapshot serves
    assert(vdf(root).count() == 200L)
  }

  test("column pruning feeds the reader; time travel guards hold") {
    val root = tmpDir("vsrc_prune") + "/store"
    VersionedStore.upsert((1L to 30L).map(k => (k, k, s"p$k"))
      .toDF("k", "v", "s"), Seq("k"), root, nBuckets = 2)
    VersionedStore.deltaUpsert(Seq((3L, 33L, "x")).toDF("k", "v", "s"),
      Seq("k"), root)
    // project away the key: the MOR reader still resolves on it
    assert(vdf(root).select("v").as[Long].collect().sorted.toSeq ==
      ((1L to 30L).filterNot(_ == 3L).map(identity) :+ 33L).sorted)
    // beyond-current and below-watermark epochs fail fast
    intercept[Exception] { vdf(root, "epoch" -> "9").collect() }
    VersionedStore.vacuum(root, 2L)
    intercept[Exception] { vdf(root, "epoch" -> "1").collect() }
    // timestamp addressing resolves through epochAt
    intercept[Exception] {
      vdf(root, "epoch" -> "2", "timestampMillis" -> "1").collect()
    }
  }
}
