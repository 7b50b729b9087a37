package graft

import org.apache.spark.sql.functions._

import graft.ops._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("fingerprint collapses case/punct/whitespace jitter") {
    val df = Seq(
      "Hello,   World!", "hello world", "HELLO  WORLD.", "different text"
    ).toDF("text").withColumn("fp", TextAnalysis.fingerprint($"text"))
    val fps = df.select("fp").as[String].collect()
    assert(fps(0) == fps(1) && fps(1) == fps(2))
    assert(fps(3) != fps(0))
  }

  test("langId picks the profile with most stopword hits") {
    val df = Seq(
      "the cat sat on the mat and it is happy",
      "el gato que se sienta en la alfombra de los gatos",
      "le chat et les chiens du jardin sont une famille",
      "der hund und die katze mit dem ball",
      "xyzzy qwerty asdf").toDF("text")
    val got = TextAnalysis.langId(df, $"text")
      .select("lang_pred").as[String].collect().toSeq
    assert(got == Seq("en", "es", "fr", "de", "unknown"))
  }

  test("quality stats are exact") {
    val r = TextAnalysis.qualityStats(Seq("The cat, the hat!").toDF("text"), $"text")
      .select("n_chars_q", "n_tokens", "punct_ratio", "stopword_ratio")
      .as[(Int, Int, Double, Double)].head()
    assert(r._1 == 17)
    assert(r._2 == 4)
    assert(r._3 == 2.0 / 17)  // ',' and '!'
    assert(r._4 == 2.0 / 4)   // 'the' twice (lowercased)
  }
}

class ApproxDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank now"),
    (3L, "completely unrelated text about spark shuffle partitions and codegen"),
    (4L, "another separate document mentioning inventory tables and queues only")
  ).toDF("doc_id", "text")

  test("minhash-LSH surfaces the crafted near-dup pair and only it") {
    val withSets = docs.withColumn("sh", ApproxDedup.wordNgrams($"text", 2))
    val pairs = ApproxDedup.minhashLshPairs(
      withSets, "doc_id", "sh", k = 16, bands = 4, rowsPerBand = 4, threshold = 0.5)
    val got = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
    val jac = pairs.select("jac").as[Double].head()
    assert(jac > 0.8 && jac < 1.0)
  }

  test("blocked-join and inverted-index Jaccard agree") {
    val withSets = docs
      .withColumn("blk", lit("all"))
      .withColumn("sh", ApproxDedup.wordNgrams($"text", 2))
    val a = ApproxDedup.jaccardPairs(withSets, "doc_id", "blk", "sh", 0.01)
      .collect().toSet
    val b = ApproxDedup.jaccardPairsInverted(withSets, "doc_id", "blk", "sh", 0.01)
      .collect().toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("simhash hamming distance separates near-dups from unrelated docs") {
    val fps = ApproxDedup.simhash(docs, "doc_id", $"text")
      .orderBy("doc_id").select("simhash").as[Long].collect()
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fps(0), fps(1)) < ham(fps(0), fps(2)))
    assert(ham(fps(0), fps(1)) < ham(fps(0), fps(3)))
  }

  test("charShingles handles short strings") {
    val got = Seq("ab").toDF("t")
      .select(ApproxDedup.charShingles($"t", 3)).as[Seq[String]].head()
    assert(got == Seq("ab"))
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters around orthogonal axes + their noisy copies
  private val vecs = Seq(
    (0L, 0, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, 0, Array(0.99f, 0.1f, 0.0f, 0.0f)),
    (2L, 0, Array(0.98f, 0.0f, 0.1f, 0.0f)),
    (3L, 1, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (4L, 1, Array(0.1f, 0.99f, 0.0f, 0.0f)),
    (5L, 1, Array(0.0f, 0.98f, 0.1f, 0.0f))
  ).toDF("vec_id", "label", "embedding")

  test("brute-force top-k ranks the same-cluster vectors first") {
    val top = Similarity.bruteForceTopK(
      vecs.filter($"vec_id" === 0), vecs, "vec_id", "vec_id", "embedding", k = 2)
    val got = top.orderBy("rank").select("corpus_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L))
  }

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val r = Seq((Array(1.0, 2.0), Array(1.0, 2.0), Array(-2.0, 1.0)))
      .toDF("a", "b", "c")
      .select(Similarity.cosine($"a", $"b"), Similarity.cosine($"a", $"c"))
      .as[(Double, Double)].head()
    assert(math.abs(r._1 - 1.0) < 1e-12)
    assert(math.abs(r._2) < 1e-12)
  }

  test("IVF with the cluster anchors as centroids matches brute force here") {
    val centroids = vecs.filter($"vec_id" === 0 || $"vec_id" === 3)
    val q = vecs.filter($"vec_id" === 1)
    val ivf = Similarity.ivfTopK(q, vecs, centroids,
      "vec_id", "vec_id", "vec_id", "embedding", k = 2)
      .orderBy("rank").select("corpus_id").as[Long].collect().toSeq
    val brute = Similarity.bruteForceTopK(q, vecs, "vec_id", "vec_id", "embedding", 5)
      .orderBy("rank").select("corpus_id").as[Long].collect().toSeq
    // IVF probes only cluster 0 = {0,1,2}; top-2 of brute force are in it
    assert(ivf == brute.take(2))
  }

  test("nearDupPairs respects blocking and threshold") {
    val pairs = Similarity.nearDupPairs(vecs, "vec_id", "label", "embedding", 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L), (0L, 2L), (1L, 2L), (3L, 4L), (3L, 5L), (4L, 5L)))
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("payload plumbing: binary column + partition-wise decode") {
    val docs = Seq((1L, "hello"), (2L, "a" * 1500)).toDF("doc_id", "text")
    val meta = Multimodal.decodeMeta(
      spark, Multimodal.withPayload(docs, "text"), "doc_id", "payload")
    val rows = meta.orderBy("doc_id").collect()
    assert(rows(0).n_bytes == 5 && rows(0).fake_frames == 1)
    assert(rows(1).n_bytes == 1500 && rows(1).fake_frames == 2
      && rows(1).fake_width == 1500 % 640)
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest("hello".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows(0).content_md5 == expect)
  }
}

class EventJsonSpec extends SparkSpec {
  import spark.implicits._

  test("event struct renders the reference's Event-Grid shape with md5 id") {
    val df = Seq(("sa1", "dir/blob.bin", 1234L, "0xE1")).toDF("sa", "name", "size", "etag")
    val out = graft.ops.EventJson.withEvent(df, $"sa", $"name", $"size", $"etag",
      org.apache.spark.sql.functions.lit("Microsoft.Storage.BlobCreated"),
      org.apache.spark.sql.functions.lit("2021-01-01T00:00:00Z"))
    val row = out.select("event.id", "event.data.url", "event.data.contentLength",
      "event.eventType").as[(String, String, Long, String)].head()
    val expectId = java.security.MessageDigest.getInstance("MD5")
      .digest("https://sa1.blob.core.windows.netdir/blob.binMicrosoft.Storage.BlobCreated"
        .getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(row == (expectId,
      "https://sa1.blob.core.windows.net/dir/blob.bin", 1234L,
      "Microsoft.Storage.BlobCreated"))
    val json = out.select("event_json").as[String].head()
    assert(json.contains("\"contentLength\":1234") && json.contains("\"blobType\":\"BlockBlob\""))
    // round-trips through from_json on the same schema
    val schema = out.select("event").schema("event").dataType
    val back = out.select(org.apache.spark.sql.functions.from_json($"event_json", schema).as("e"))
      .select("e.id").as[String].head()
    assert(back == expectId)
  }
}

class LshAnnSpec extends SparkSpec {
  import spark.implicits._

  test("hyperplanes are deterministic and in [-0.5, 0.5)") {
    val a = graft.ops.Similarity.hyperplanes(4, 8)
    val b = graft.ops.Similarity.hyperplanes(4, 8)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.flatten.forall(x => x >= -0.5 && x < 0.5))
  }

  test("identical vectors land in the same bucket; top hit is the twin") {
    val vecs = Seq(
      (0L, Array.fill(16)(0.7)), (1L, Array.fill(16)(0.7)),
      (2L, Array.tabulate(16)(i => if (i % 2 == 0) 1.0 else -1.0))
    ).toDF("vec_id", "embedding")
    val top = graft.ops.Similarity.lshTopK(
      vecs.filter($"vec_id" === 0), vecs, "vec_id", "vec_id", "embedding",
      bits = 4, dims = 16, k = 3)
    val hits = top.orderBy("rank").select("corpus_id", "cos_sim")
      .as[(Long, Double)].collect().toSeq
    assert(hits.head == ((1L, 1.0))) // the twin, cosine exactly 1
  }
}

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("quality -> exact dedup -> near-dup dedup, with stage accounting") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank now"),   // near-dup of 1
      (3L, "The quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1 (case)
      (4L, "completely different text about spark shuffle partitions and query planning"),
      (5L, "too short"),                                                             // fails min tokens
      (6L, "!!! ??? ***, punctuation soup !!! ??? *** !!! ??? *** !!! ??? ***")      // fails punct ratio
    ).toDF("doc_id", "text")
    val (cleaned, s) = graft.exec.CorpusPipeline.clean(spark, docs,
      minTokens = 5, maxPunctRatio = 0.1, nearDupThreshold = 0.6)
    assert(s.input == 6)
    assert(s.afterQuality == 4)   // 5 and 6 dropped
    assert(s.afterExact == 3)     // 3 collapses into 1
    assert(s.afterNearDup == 2)   // 2 collapses into 1
    assert(cleaned.select("doc_id").as[Long].collect().toSet == Set(1L, 4L))
  }
}

class MultiProbeIvfSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Similarity

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val cents = {
    val trained = Similarity.kmeansFit(emb, "vec_id", "embedding", k = 8, iters = 2)
    trained.zipWithIndex.map { case (c, i) => (i.toLong, c.toSeq) }
      .toSeq.toDF("vec_id", "embedding")
  }
  private def topk(nprobe: Int) = Similarity.ivfTopKProbed(
      emb.filter(col("vec_id") < 10), emb, cents,
      "vec_id", "vec_id", "vec_id", "embedding", k = 5, nprobe = nprobe)
    .select("query_id", "rank", "corpus_id", "cos_sim")
    .as[(Long, Long, Long, Double)].collect().toSet

  test("nprobe=1 equals single-probe ivfTopK row-for-row") {
    val single = Similarity.ivfTopK(
        emb.filter(col("vec_id") < 10), emb, cents,
        "vec_id", "vec_id", "vec_id", "embedding", k = 5)
      .select("query_id", "rank", "corpus_id", "cos_sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(topk(1) == single)
  }

  test("recall against brute force is monotone in nprobe; nprobe=k is exact") {
    val brute = Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 10), emb, "vec_id", "vec_id", "embedding", k = 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    def hits(nprobe: Int): Int =
      topk(nprobe).map(r => (r._1, r._3)).count(brute.contains)
    val (h1, h3, h8) = (hits(1), hits(3), hits(8))
    assert(h1 <= h3 && h3 <= h8)
    // probing every cluster IS brute force — identical pair set
    assert(topk(8).map(r => (r._1, r._3)) == brute)
  }
}
