package graft

import org.apache.spark.sql.functions._

import graft.sinks.Sinks
import graft.streaming.{LmStream, TrainStream}

/** Per-micro-batch ledger I/O contract (round-15): the streaming
  * maintainers' ledgers grow with the CORPUS while a micro-batch is
  * bounded, so their per-batch probes must read f(batch), never
  * f(ledger). Pinned on the counting `probe://` FS, LookupProbeSpec
  * style: grow the ledger 10× and assert the SAME batch's probe opens
  * stay flat — the discriminating asymptote (a full-ledger scan's
  * opens are flat in rows too, so the spec also pins opens far under
  * the store's bucket count, which only bucket pruning achieves). */
class LedgerProbeSpec extends SparkSpec {
  import spark.implicits._

  private def probeRoot(tag: String): String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.probe.impl", classOf[CountingFs].getName)
    "probe:" + tmpDir(tag)
  }

  private def measured(body: => Unit): (Int, Long) = {
    CountingFs.reset()
    body
    (CountingFs.opens.get(), CountingFs.bytesRead.get())
  }

  private def docs(from: Long, until: Long) =
    spark.range(from, until).select(
      col("id").as("doc_id"),
      concat(lit("alpha beta gamma delta epsilon zeta token"),
        pmod(col("id"), lit(7L))).as("text"))

  test("probePartitioned reads only the probe keys' buckets, exactly") {
    val root = probeRoot("ledger_probe_unit") + "/store"
    Sinks.upsertPartitioned(
      spark.range(0L, 2000L).select(col("id").as("k"), (col("id") * 3).as("v")),
      Seq("k"), root, nBuckets = 64)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, v BIGINT")
    val keys = Seq(17L, 23L, 900L).toDF("k")
    val (opens, _) = measured {
      val got = Sinks.probePartitioned(spark, root, keys, schema)
        .as[(Long, Long)].collect().toSet
      assert(got == Set((17L, 51L), (23L, 69L), (900L, 2700L)),
        s"pushed single-key probe is exact: $got")
    }
    // ≤ 3 key buckets × (footer + pages [+ reopen]) + the marker reads;
    // a full scan would open all 64 bucket files before any markers
    assert(opens <= 16,
      s"3-key probe opened $opens files — must be ≤ its keys' buckets")
    // absent keys: bucket dirs still open (hash says they could be
    // there) but the result is empty and the In push means blooms can
    // skip every data page
    val none = Sinks.probePartitioned(spark, root,
      Seq(999999L).toDF("k"), schema)
    assert(none.count() == 0L)
    // composite-key probe (bucket pruning only) stays a superset that
    // the caller's exact join refines
    val root2 = probeRoot("ledger_probe_pair") + "/store"
    Sinks.upsertPartitioned(
      spark.range(0L, 500L).select(concat(lit("c"), pmod(col("id"), lit(50L)))
        .as("context"), concat(lit("w"), col("id")).as("word"),
        col("id").as("cnt")),
      Seq("context", "word"), root2, nBuckets = 32)
    val pairSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "context STRING, word STRING, cnt BIGINT")
    val pairKeys = Seq(("c1", "w1"), ("c2", "w2")).toDF("context", "word")
    val sup = Sinks.probePartitioned(spark, root2, pairKeys, pairSchema)
    val hit = sup.join(pairKeys, Seq("context", "word"), "left_semi")
      .as[(String, String, Long)].collect().toSet
    assert(hit == Set(("c1", "w1", 1L), ("c2", "w2", 2L)))
    // and the uncreated-store read is empty, never an error
    assert(Sinks.probePartitioned(spark, root + "_nope", keys, schema)
      .count() == 0L)
  }

  test("LmStream: per-batch ledger opens flat when the ledger grows 10x") {
    val root = probeRoot("ledger_probe_lm")
    val lm = LmStream("doc_id", col("text"), 2, nBuckets = 64)
    lm.bootstrap(docs(0L, 200L).localCheckpoint(), root)
    def smallBatch(e: Long) =
      docs(100000L + e * 3, 100000L + e * 3 + 3).localCheckpoint()
    val (opensSmallLedger, bytesSmall) = measured {
      lm.processBatch(smallBatch(1L), 1L, root)
    }
    // grow the ledger ~10×: 2000 more docs' grams and ids land
    lm.processBatch(docs(200L, 2200L).localCheckpoint(), 2L, root)
    val (opensBigLedger, bytesBig) = measured {
      lm.processBatch(smallBatch(3L), 3L, root)
    }
    println(s"LEDGER_IO lm small=($opensSmallLedger opens, $bytesSmall B) " +
      s"big=($opensBigLedger opens, $bytesBig B)")
    // THE asymptote pin: the same-sized batch costs the same opens
    // against a 10× ledger (generous ±8 slack for marker/footer
    // jitter; the pre-round-15 full scan opened every bucket of both
    // ledgers — 128 files — and grew with bucket fill)
    assert(opensBigLedger <= opensSmallLedger + 8,
      s"per-batch opens must be f(batch), not f(ledger): " +
        s"$opensSmallLedger -> $opensBigLedger")
    // and far under the stores' combined bucket count (2 ledgers × 64)
    assert(opensBigLedger < 64,
      s"a 3-doc batch must not touch every bucket: $opensBigLedger")
    // BYTES flat too: the pushed first-key In filter rides the bucket
    // files' key blooms + clustered row groups, so a 10× bigger bucket
    // costs footer + bloom, not data pages (2× headroom for footer
    // growth)
    assert(bytesBig <= bytesSmall * 2 + 65536,
      s"per-batch bytes must track the batch, not the bucket: " +
        s"$bytesSmall -> $bytesBig")
    // exactness unchanged: redelivery of an already-landed id adds 0
    val before = lm.counts(spark, root).agg(sum("cnt_gram")).collect()(0)
      .getLong(0)
    lm.processBatch(smallBatch(1L), 4L, root) // epoch-2 redelivery
    val after = lm.counts(spark, root).agg(sum("cnt_gram")).collect()(0)
      .getLong(0)
    assert(before == after, "redelivered ids must contribute nothing")
  }

  test("TrainStream: novelty opens bounded by batch buckets + fold cap") {
    val root = probeRoot("ledger_probe_train")
    val emb = spark.range(0L, 3000L).select(col("id").as("vec_id"),
      array((0 until 8).map(i => (pmod(col("id") + i, lit(97L)) / 97.0)
        .cast("float")): _*).as("embedding")).localCheckpoint()
    val ts = TrainStream("vec_id",
      b => graft.ops.LinearTrainer.embeddingFeatures(b, "vec_id",
        col("embedding")),
      graft.ops.LinearTrainer.labelU(pmod(col("vec_id"), lit(2)) === 0),
      lrDenom = 1L << 28, docBuckets = 64)
    // land 40 epochs of 50 ids each — crosses the FoldEvery=16 cadence
    // twice, so the bucketed tier holds most of the ledger and the
    // recent tier is capped
    (0 until 40).foreach { i =>
      ts.processBatch(emb.filter(col("vec_id") >= i * 50L &&
        col("vec_id") < (i + 1) * 50L).localCheckpoint(), i + 1L, root)
    }
    val fs = new org.apache.hadoop.fs.Path(s"$root/tr_docs")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val eDirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/tr_docs"))
      .count(_.getPath.getName.matches("^e\\d{9}$"))
    assert(eDirs <= 17, s"fold must cap the recent tier: $eDirs epoch dirs")
    // the probe for a tiny batch against the 2000-id ledger
    def tiny(e: Long) = emb.filter(col("vec_id") >= 2900L + e * 2 &&
      col("vec_id") < 2902L + e * 2).localCheckpoint()
    val (opens1, _) = measured { ts.processBatch(tiny(0L), 41L, root) }
    // grow the folded ledger ~2.5×more and re-measure the same shape
    (0 until 20).foreach { i =>
      ts.processBatch(emb.filter(col("vec_id") >= 2000L + i * 40L &&
        col("vec_id") < 2000L + (i + 1) * 40L).localCheckpoint(),
        42L + i, root)
    }
    val (opens2, _) = measured { ts.processBatch(tiny(1L), 62L, root) }
    println(s"LEDGER_IO train small=$opens1 big=$opens2 opens")
    // growth bounded by the FOLD PHASE, not the ledger: the recent
    // tier holds 0..FoldEvery dirs depending where the cadence sits,
    // so the two measurements may differ by up to FoldEvery opens —
    // but never by ledger growth (the pre-round-15 scan opened every
    // epoch dir: 60+ files here and growing per batch forever)
    assert(opens2 <= opens1 + 16,
      s"novelty opens must be f(batch buckets + fold cap): $opens1 -> $opens2")
    assert(opens2 <= 55,
      s"a 2-id batch must stay far under the 64-bucket tier + fold cap: " +
        s"$opens2")
    // redelivery exactness: replaying landed ids must not move weights
    val w1 = ts.weights(spark, root).as[(Long, Long)].collect().toMap
    ts.processBatch(emb.filter(col("vec_id") < 50L).localCheckpoint(),
      99L, root)
    val w2 = ts.weights(spark, root).as[(Long, Long)].collect().toMap
    assert(w1 == w2, "redelivered ids must not re-train")
  }
}
