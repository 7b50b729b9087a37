package graft

import org.apache.spark.sql.functions._

import graft.ops.{CorpusSignals, Curation}

/** Dataset-curation passes: PII scrubbing, hash split / mixing,
  * sequence packing, cross-document span stats, NFC normalization. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("piiScrub counts and redacts each class, email before phone/ip") {
    val df = Seq(
      (1L, "mail a.b+c@ex-site.org or call 555-123-4567 from 192.168.0.1"),
      (2L, "no pii here at all"),
      (3L, "two mails x@y.io z@w.co one ip 10.0.0.255")
    ).toDF("doc_id", "text")
    val r = Curation.piiScrub(df, "doc_id", col("text")).orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_email") == 1 && r(0).getAs[Long]("n_phone") == 1
      && r(0).getAs[Long]("n_ip") == 1)
    assert(r(0).getAs[String]("scrubbed") ==
      "mail <EMAIL> or call <PHONE> from <IP>")
    assert(!r(1).getAs[Boolean]("has_pii"))
    assert(r(1).getAs[String]("scrubbed") == "no pii here at all")
    assert(r(2).getAs[Long]("n_email") == 2 && r(2).getAs[Long]("n_ip") == 1)
  }

  test("assignSplit is deterministic, exhaustive, and id-stable") {
    val a = Curation.assignSplit(
      spark.range(1000).toDF("id"), "id", 1000, 1000)
    val counts = a.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 1000)
    // roughly a tenth each for val/test (hash uniformity, wide tolerance)
    assert(counts("test") > 50 && counts("test") < 200)
    // stability: the same ids in a bigger frame get the same split
    val b = Curation.assignSplit(spark.range(2000).toDF("id"), "id", 1000, 1000)
      .filter(col("id") < 1000)
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("sampleByRate keeps rate-0 nothing, rate-1 everything") {
    val df = spark.range(500).toDF("id")
    assert(Curation.sampleByRate(df, "id", lit(0.0)).count() == 0)
    assert(Curation.sampleByRate(df, "id", lit(1.0)).count() == 500)
    val n = Curation.sampleByRate(df, "id", lit(0.5)).count()
    assert(n > 150 && n < 350)
  }

  test("packSequences chunks per shard with correct offsets and spans") {
    val df = Seq(
      (1L, "s1", 60L), (2L, "s1", 60L), (3L, "s1", 10L),
      (4L, "s2", 250L)
    ).toDF("id", "shard", "n")
    val r = Curation.packSequences(df, "id", "shard", col("n"), seqTokens = 100)
      .orderBy("id").collect()
    // shard s1: offsets 0, 60, 120 -> docs 1,2 straddle/fit seq 0/1, doc 3 in seq 1
    assert(r(0).getAs[Long]("token_offset") == 0 &&
      r(0).getAs[Long]("first_seq") == 0 && r(0).getAs[Long]("last_seq") == 0)
    assert(r(1).getAs[Long]("token_offset") == 60 &&
      r(1).getAs[Long]("first_seq") == 0 && r(1).getAs[Long]("last_seq") == 1)
    assert(r(2).getAs[Long]("token_offset") == 120 &&
      r(2).getAs[Long]("first_seq") == 1)
    // shard s2 restarts at offset 0 and spans 3 sequences
    assert(r(3).getAs[Long]("token_offset") == 0 &&
      r(3).getAs[Long]("n_seqs") == 3)
  }

  test("crossDocSpans finds only grams shared across documents") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta eta"),
      (3L, "totally unrelated words here now friend")
    ).toDF("doc_id", "text")
    val r = Curation.crossDocSpans(df, "doc_id", col("text"), n = 3)
      .orderBy("doc_id").collect()
    // docs 1/2 share the 4 3-grams of the common 6-token prefix
    assert(r(0).getAs[Long]("n_grams") == 4 && r(0).getAs[Long]("n_shared_grams") == 4)
    assert(r(1).getAs[Long]("n_grams") == 5 && r(1).getAs[Long]("n_shared_grams") == 4)
    assert(r(2).getAs[Long]("n_shared_grams") == 0 &&
      r(2).getAs[Double]("shared_frac") == 0.0)
  }

  test("hashedFeatures has fixed dimensionality and exact counts") {
    val df = Seq((1L, "a b a"), (2L, "zz")).toDF("doc_id", "text")
    val f = Curation.hashedFeatures(df, "doc_id", col("text"), dim = 16)
    val rows = f.collect()
    assert(rows.forall(r => r.getAs[Long]("bucket") >= 0 &&
      r.getAs[Long]("bucket") < 16))
    // doc 1: 'a' twice -> one bucket with cnt 2 plus 'b' (may collide)
    val d1 = f.filter(col("doc_id") === 1).collect()
    assert(d1.map(_.getAs[Long]("cnt")).sum == 3)
    // identical corpus -> identical buckets (pure hash, no RNG)
    val f2 = Curation.hashedFeatures(df, "doc_id", col("text"), dim = 16)
    assert(f.except(f2).count() == 0)
  }

  test("linearScore is the exact integer dot product") {
    val feats = Seq((1L, 3L, 2L), (1L, 7L, 1L), (2L, 3L, 5L))
      .toDF("doc_id", "bucket", "cnt")
    val r = Curation.linearScore(feats, "doc_id", b => b * 10L)
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("score") == 2 * 30 + 1 * 70)
    assert(r(1).getAs[Long]("score") == 5 * 30)
  }

  test("sampleByRate samples are NESTED across rates (hash thresholds)") {
    // a 30% sample is a subset of the 70% sample of the same corpus —
    // the property that makes scaling studies reproducible (grow the
    // sample without resampling what smaller runs already used)
    val df = spark.range(2000).toDF("id")
    val small = Curation.sampleByRate(df, "id", lit(0.3))
    val big = Curation.sampleByRate(df, "id", lit(0.7))
    assert(small.except(big).count() == 0)
    assert(big.count() > small.count())
  }

  test("curation ops pass empty and degenerate inputs through") {
    import org.apache.spark.sql.types._
    val emptyDocs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    assert(Curation.piiScrub(emptyDocs, "doc_id", col("text")).count() == 0)
    assert(Curation.crossDocSpans(emptyDocs, "doc_id", col("text"), 3).count() == 0)
    assert(Curation.importanceWeights(emptyDocs, "doc_id", col("text"),
      lit(true)).count() == 0)
    val emptyPack = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("id", LongType), StructField("shard", StringType),
        StructField("n", LongType))))
    assert(Curation.packSequences(emptyPack, "id", "shard", col("n"), 100).count() == 0)
    // null text propagates as null signals, never throws
    val withNull = Seq((1L, "x@y.io"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val r = Curation.piiScrub(withNull, "doc_id", col("text"))
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_email") == 1L)
    assert(r(1).isNullAt(r(1).fieldIndex("scrubbed")))
    // a document shorter than n grams simply yields no span row,
    // matching the oracle's generate_series replay
    val short = Seq((1L, "a b")).toDF("doc_id", "text")
    assert(Curation.crossDocSpans(short, "doc_id", col("text"), 3).count() == 0)
  }

  test("importanceWeights favor docs resembling the target slice") {
    val df = Seq(
      (1L, "cat dog", true),   // target
      (2L, "cat dog", false),  // same profile as target -> same weight
      (3L, "fish owl", false)  // background-only tokens -> low weight
    ).toDF("doc_id", "text", "tgt")
    val r = Curation.importanceWeights(df, "doc_id", col("text"), col("tgt"))
      .orderBy("doc_id").collect()
    // cat/dog: tf=1, tdf=1, bdf=2 -> (1e6*1*2) div 3 = 666666 per term
    assert(r(0).getAs[Long]("weight") == 2 * 666666L)
    assert(r(1).getAs[Long]("weight") == r(0).getAs[Long]("weight"))
    // fish/owl: tdf=0, bdf=1 -> (1e6*1*1) div 2 = 500000 per term
    assert(r(2).getAs[Long]("weight") == 2 * 500000L)
  }

  test("sessionizeStream finalizes sessions past the watermark (append)") {
    val root = tmpDir("sessions")
    val inDir = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    def writeBatch(name: String, rows: Seq[(Long, Long)]): Unit = {
      // write-then-atomic-rename: the running file source must never
      // list a partially written file
      val tmp = java.nio.file.Paths.get(s"$root/$name.json.tmp")
      java.nio.file.Files.writeString(tmp,
        rows.map { case (u, s) => s"""{"user_id":$u,"sec":$s}""" }.mkString("\n"))
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(s"$inDir/$name.json"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }

    writeBatch("b1", Seq((1L, 100L), (1L, 130L), (2L, 100L)))
    val stream = spark.readStream.schema("user_id LONG, sec LONG").json(inDir)
    val q = graft.ops.TimeBucketStats
      .sessionizeStream(stream, col("user_id"), col("sec"), gapSec = 60, lateSec = 10)
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .outputMode("append")
      .format("memory").queryName("sessions_out")
      .start()
    q.processAllAvailable()
    // a far-future event advances the watermark past the open sessions
    writeBatch("b2", Seq((9L, 1000000L)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessions_out")
      .orderBy("skey").collect()
    // finalized: user 1 merged [100, 190) with 2 events; user 2 [100, 160)
    assert(got.length == 2)
    assert(got(0).getAs[Long]("skey") == 1L &&
      got(0).getAs[Long]("session_start") == 100L &&
      got(0).getAs[Long]("session_end") == 190L &&
      got(0).getAs[Long]("n_events") == 2L)
    assert(got(1).getAs[Long]("skey") == 2L &&
      got(1).getAs[Long]("session_end") == 160L)
  }

  test("sessionize merges events closer than the gap, per key") {
    val ev = Seq(
      (1L, 0L), (1L, 50L), (1L, 120L),  // 50 within 60s of 0; 120 >= 50+60 -> new
      (2L, 0L)
    ).toDF("user_id", "sec")
    val r = graft.ops.TimeBucketStats.sessionize(ev, col("user_id"), col("sec"), 60)
      .orderBy("skey", "session_start").collect()
    assert(r.length == 3)
    assert(r(0).getAs[Long]("session_start") == 0L &&
      r(0).getAs[Long]("session_end") == 110L &&   // last ts 50 + gap 60
      r(0).getAs[Long]("n_events") == 2L)
    assert(r(1).getAs[Long]("session_start") == 120L &&
      r(1).getAs[Long]("session_end") == 180L)
    assert(r(2).getAs[Long]("skey") == 2L && r(2).getAs[Long]("n_events") == 1L)
  }

  test("shardShuffle: dense per-shard positions, deterministic") {
    val a = Curation.shardShuffle(spark.range(200).toDF("id"), "id", 4)
    val b = Curation.shardShuffle(spark.range(200).toDF("id"), "id", 4)
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
    // positions are dense 1..n within every shard
    val perShard = a.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"),
        countDistinct("pos").as("d"))
      .collect()
    assert(perShard.length == 4)
    perShard.foreach { r =>
      assert(r.getAs[Long]("mn") == 1L)
      assert(r.getAs[Long]("mx") == r.getAs[Long]("n"))
      assert(r.getAs[Long]("d") == r.getAs[Long]("n"))
    }
  }

  test("lengthQuantiles interpolates exactly per group") {
    val df = Seq(("a", 10L), ("a", 20L), ("a", 30L), ("a", 40L), ("b", 5L))
      .toDF("g", "v")
    val r = CorpusSignals.lengthQuantiles(df, "g", col("v"))
      .orderBy("g").collect()
    // group a: n=4 -> p50 at index 1.5 -> 25; p90 at 2.7 -> 37; p99 at 2.97 -> 39.7
    assert(r(0).getAs[Double]("p50") == 25.0)
    assert(r(0).getAs[Double]("p90") == 37.0)
    assert(r(0).getAs[Double]("p99") == 39.7)
    assert(r(1).getAs[Double]("p50") == 5.0 && r(1).getAs[Long]("n_docs") == 1L)
  }

  test("nfc_normalize composes decomposed sequences and is ASCII-stable") {
    val r = Seq(
      "Cafe\u0301",   // e + combining acute -> \u00e9
      "\u212B",        // ANGSTROM SIGN -> \u00c5
      "A\u030A",       // A + combining ring -> \u00c5
      "plain ascii"
    ).toDF("s")
      .select(call_function("nfc_normalize", col("s")).as("n"))
      .as[String].collect()
    assert(r(0) == "Caf\u00e9")
    assert(r(1) == "\u00c5" && r(2) == "\u00c5")
    assert(r(3) == "plain ascii")
  }
}

class BudgetMixSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Curation

  test("sampleToBudget: under-budget groups pass whole, over-budget downsample") {
    // srcA: 10 docs x 100 tokens = 1000 total; srcB: 4 docs x 50 = 200
    val docs = ((1L to 10L).map(i => (i, "A", 100L)) ++
      (11L to 14L).map(i => (i, "B", 50L))).toDF("doc_id", "src", "w")
    val out = Curation.sampleToBudget(docs, "doc_id", Seq("src"),
      col("w"), budget = 500L)
    val bySrc = out.groupBy("src").count().as[(String, Long)].collect().toMap
    // B is under budget: rate 10000, all 4 kept
    assert(bySrc.getOrElse("B", 0L) == 4L)
    // A is 2x over budget: rate exactly 5000 per myriad
    val rates = out.select("src", "rate_myriad").distinct()
      .as[(String, Long)].collect().toMap
    assert(rates("A") == 5000L && rates("B") == 10000L)
    // kept A docs are the hash-threshold subset, a strict subset
    assert(bySrc("A") > 0L && bySrc("A") < 10L)
    // decisions replay exactly on a second invocation
    val again = Curation.sampleToBudget(docs, "doc_id", Seq("src"),
      col("w"), budget = 500L).select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
  }

  test("temperatureMix flattens the head: α=1/2 between proportional and uniform") {
    // sizes 90000 and 10000 → proportional shares 90/10; sqrt weights
    // 300:100 → temperature shares 75/25 (exact: w in µ-units)
    val docs = Seq(("hi", 90000L), ("lo", 10000L)).toDF("lang", "n")
    val out = Curation.temperatureMix(docs, Seq("lang"), col("n"),
        budget = 10000L)
      .as[(String, Long, Long, Long)].collect()
      .map { case (l, t, r, b) => l -> ((t, r, b)) }.toMap
    assert(out("hi") == ((90000L, 7500L, 7500L)))
    assert(out("lo") == ((10000L, 2500L, 2500L)))
    // upsampled relative to proportional, order preserved
    assert(out("lo")._2 > 1000L && out("lo")._2 < out("hi")._2)
    // shares exhaust the myriad up to integer floor
    assert(out("hi")._2 + out("lo")._2 <= 10000L &&
      out("hi")._2 + out("lo")._2 >= 9998L)
  }
}
