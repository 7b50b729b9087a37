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

  test("runtime filtering: join keys prune chains after the build side runs") {
    val root = tmpDir("vsrc_rt") + "/store"
    // big enough that Spark's dynamic-pruning benefit heuristic fires
    // (a tiny scan side estimates the pruning subquery as not worth it)
    VersionedStore.upsert(
      spark.range(1L, 60001L).select(col("id").as("k"), (col("id") * 7L)
        .as("v"), concat(lit("payload-with-enough-bytes-to-matter-"),
          col("id")).as("s")),
      Seq("k"), root, nBuckets = 16)
    val ds = vdf(root)
    val total = ds.count()
    // the probe side must carry a SELECTIVE FILTER: Spark injects a
    // dynamic-pruning subquery only when the build side looks
    // filtering (PartitionPruning's hasSelectivePredicate)
    val probe = spark.range(1L, 60001L)
      .select(col("id").as("pk"), (col("id") % 7L).as("tag"))
      .filter(col("pk") % 997L === 0L && col("pk") <= 5L * 997L)
    val joined = ds.join(probe, col("k") === col("pk"))
      .select(col("k"), col("v"), col("tag"))
    val before = graft.connectors.StoreReaderMetrics.rowsDecoded.get()
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val decoded = graft.connectors.StoreReaderMetrics.rowsDecoded.get() - before
    assert(got == (1L to 5L).map(k => (k * 997L, k * 997L * 7L)).toSet)
    // the scale contract: the store side decodes only the probed keys'
    // chains, never the whole snapshot
    assert(decoded < total,
      s"runtime pruning must skip chains: decoded $decoded of $total")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan.take(3000))
  }

  test("footer-answered aggregates on plain snapshots; MOR/evolution decline") {
    val root = tmpDir("vsrc_agg") + "/store"
    VersionedStore.upsert((1L to 400L).map(k => (k, k * 3L)).toDF("k", "v"),
      Seq("k"), root, nBuckets = 8)
    val agg = vdf(root).agg(count(lit(1)).as("n"), count(col("v")).as("nv"),
      min(col("v")).as("mn"), max(col("v")).as("mx"))
    val before = graft.connectors.StoreReaderMetrics.rowsDecoded.get()
    val row = agg.collect()(0)
    val decoded = graft.connectors.StoreReaderMetrics.rowsDecoded.get() - before
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ==
      ((400L, 400L, 3L, 1200L)))
    assert(decoded == 0L,
      s"plain-snapshot aggregate must be footer-answered: $decoded decoded")
    assert(agg.queryExecution.executedPlan.toString.contains("pushedAggregates")
      || vdf(root).agg(count(lit(1))).queryExecution.toString
        .contains("pushedAggregates"),
      "the scan must report the pushed aggregation")
    // a DELTA'd snapshot needs the merge — pushdown declines, answer
    // stays exact through the ordinary MOR reader
    VersionedStore.deltaApply(
      Seq((1L, 999L, "upsert"), (2L, 0L, "delete")).toDF("k", "v", "op"),
      Seq("k"), root, "op")
    val morRow = vdf(root).agg(count(lit(1)), max(col("v"))).collect()(0)
    assert((morRow.getLong(0), morRow.getLong(1)) == ((399L, 1200L)),
      s"MOR aggregate must stay exact (merged, not footer-summed): $morRow")
    // an EVOLVED store declines too: pre-evolution generations lack the
    // new column, footer null-counts would miss their implicit nulls
    val root2 = tmpDir("vsrc_agg_evo") + "/store"
    VersionedStore.upsert((1L to 50L).map(k => (k, k)).toDF("k", "v"),
      Seq("k"), root2, nBuckets = 4)
    VersionedStore.upsert(Seq((51L, 51L, 7L)).toDF("k", "v", "extra"),
      Seq("k"), root2, evolve = true)
    val evoRow = vdf(root2).agg(count(col("extra"))).collect()(0)
    assert(evoRow.getLong(0) == 1L,
      s"evolved count(col) must count implicit nulls as absent: $evoRow")
  }

  test("limit pushdown: a peek decodes <= n*chains rows, MOR-sound") {
    val root = tmpDir("vsrc_limit") + "/store"
    VersionedStore.upsert((1L to 4000L).map(k => (k, k * 2L)).toDF("k", "v"),
      Seq("k"), root, nBuckets = 8)
    VersionedStore.deltaApply(
      Seq((5L, 500L, "upsert"), (6L, 0L, "delete")).toDF("k", "v", "op"),
      Seq("k"), root, "op")
    val merged = VersionedStore.read(spark, root).as[(Long, Long)]
      .collect().toMap
    val peek = vdf(root).limit(3)
    val before = graft.connectors.StoreReaderMetrics.rowsDecoded.get()
    val got = peek.as[(Long, Long)].collect()
    val decoded = graft.connectors.StoreReaderMetrics.rowsDecoded.get() - before
    assert(got.length == 3)
    // every peeked row is a POST-MERGE row: never a superseded base
    // value, never a tombstoned key
    got.foreach { case (k, v) =>
      assert(merged.get(k).contains(v), s"peek must serve merged rows: $k=$v")
    }
    // partial pushdown: each of the 8 chains stops after <= 3 rows
    // (plus the MOR chain's delta fold) instead of decoding the store
    assert(decoded <= 3L * 8 + 8,
      s"limit(3) must stop chain readers early: decoded $decoded of 4000")
    assert(peek.queryExecution.toString.contains("pushedLimit") ||
      peek.queryExecution.executedPlan.toString.contains("pushedLimit"),
      "the scan must report the pushed limit")
  }

  test("plan-time metadata budget at 64 buckets (pooled, O(pool) ops)") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.probe.impl", classOf[CountingFs].getName)
    val root = "probe:" + tmpDir("vsrc_planops") + "/store"
    VersionedStore.upsert((1L to 4000L).map(k => (k, k, 1L))
      .toDF("k", "v", "u"), Seq("k"), root, nBuckets = 64)
    VersionedStore.upsert(Seq((7L, 77L, 2L)).toDF("k", "v", "u"),
      Seq("k"), root)
    CountingFs.reset()
    val df = vdf(root).filter(col("u") >= 2L)
    val parts = scanParts(df)
    val planOps = CountingFs.statusCalls.get() + CountingFs.opens.get()
    assert(parts <= 2, s"stats must prune the untouched chains: $parts")
    // BUDGET (regresses loudly): commit log + markers + one listing
    // per bucket (chain resolve) + one _cstats read per generation.
    // 64 buckets / 65 generations measured ~230 ops; 350 leaves
    // headroom without letting a per-bucket metadata pass hide. The
    // round-14 shape was the same COUNT but fully serial — the pool
    // bounds wall, this budget bounds creep.
    println(s"VSTORE_PLAN_OPS parts=$parts ops=$planOps")
    assert(planOps <= 350,
      s"plan-time metadata ops past budget: $planOps (64-bucket store)")
    assert(df.count() == 1L)
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
