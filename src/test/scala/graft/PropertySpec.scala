package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.MultipartEtag
import graft.ops._

/** Property tests over the operator algebra (SURVEY §5 test plan).
  * Spark jobs per case are expensive, so successful-case counts are
  * kept small; the properties themselves are the point. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic sampling: run the property over `n` seeded draws.
    * (The scalatest-scalacheck bridge isn't in the offline cache, so
    * generators are sampled directly.) */
  private def forAllSampled[A](gen: Gen[A], n: Int = 8)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  private def forAllSampled2[A, B](ga: Gen[A], gb: Gen[B], n: Int)(body: (A, B) => Unit): Unit =
    (1 to n).foreach { i =>
      for {
        a <- ga.apply(Gen.Parameters.default, Seed(i.toLong))
        b <- gb.apply(Gen.Parameters.default, Seed(i.toLong + 1000))
      } body(a, b)
    }

  private val sizesGen: Gen[List[Long]] =
    Gen.listOfN(40, Gen.chooseNum(0L, 8000000000L))

  test("histogram: buckets are monotone non-decreasing and bounded by total") {
    forAllSampled(sizesGen) { sizes =>
      if (sizes.nonEmpty) {
        val r = SizeHistogram(sizes.toDF("sz"), $"sz").first()
        val buckets = SizeHistogram.ReferenceThresholds.map(t => r.getAs[Long](s"sub_$t"))
        assert(buckets == buckets.sorted)           // cumulative ⇒ monotone
        assert(buckets.last <= r.getAs[Long]("total_objects"))
        // objects over the top threshold are excluded from every bucket
        val over = sizes.count(_ > SizeHistogram.ReferenceThresholds.last)
        assert(buckets.last == sizes.size - over)
      }
    }
  }

  private val snapshotGen: Gen[List[(Int, Long)]] =
    Gen.listOfN(30, Gen.zip(Gen.chooseNum(0, 15), Gen.chooseNum(0L, 3L)))
      .map(_.distinctBy(_._1))

  test("diff: variance classes partition the key union") {
    forAllSampled2(snapshotGen, snapshotGen, 8) { (oldRows, newRows) =>
      val old = oldRows.toDF("key", "v")
      val cur = newRows.toDF("key", "v")
      val all = InventoryDiff(old, cur, "key", Seq("v"), includeSame = true)
        .select("key", "variance").as[(Int, String)].collect()
      val keyUnion = (oldRows.map(_._1) ++ newRows.map(_._1)).toSet
      assert(all.map(_._1).toSet == keyUnion)       // covers the union
      assert(all.length == keyUnion.size)           // exactly one verdict/key
      val oldM = oldRows.toMap
      val newM = newRows.toMap
      all.foreach { case (k, v) =>
        val expect = (oldM.get(k), newM.get(k)) match {
          case (None, Some(_)) => "New"
          case (Some(_), None) => "Delete"
          case (Some(a), Some(b)) if a != b => "Update"
          case _ => "Same"
        }
        assert(v == expect, s"key $k")
      }
    }
  }

  test("dedup: exact is idempotent and keeps one row per key") {
    forAllSampled(Gen.listOfN(25, Gen.zip(Gen.chooseNum(0, 6), Gen.chooseNum(0, 9)))) { rows =>
      if (rows.nonEmpty) {
        val df = rows.toDF("k", "tie")
        val once = Dedup.exact(df, Seq("k"), "tie").collect().toSet
        val twice = Dedup.exact(Dedup.exact(df, Seq("k"), "tie"), Seq("k"), "tie")
          .collect().toSet
        assert(once == twice)
        assert(once.size == rows.map(_._1).distinct.size)
        // the kept tie value is the per-key minimum
        val mins = rows.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
        once.foreach(r => assert(r.getInt(1) == mins(r.getInt(0))))
      }
    }
  }

  test("fanout: pack/unpack round-trips any payload losslessly") {
    forAllSampled(Gen.listOfN(60, Gen.zip(Gen.chooseNum(0L, 500L), Gen.alphaStr.map(_.take(8)))), 5) { rows =>
      if (rows.nonEmpty) {
        val df = rows.zipWithIndex.map { case ((r, s), i) => (i.toLong, r, s) }
          .toDF("id", "route", "payload")
        val packed = TaskFanout.pack(df, $"route", Seq($"id"), queues = 4, batchSize = 7)
        val schema = df.schema
        val back = TaskFanout.unpack(packed, col("body"), schema)
          .select("id", "route", "payload").collect().toSet
        assert(back == df.collect().toSet)
        assert(packed.agg(max("n_objects")).as[Long].head() <= 7)
      }
    }
  }

  test("jaccard: symmetric, in [0,1], and 1 iff equal sets") {
    forAllSampled2(Gen.listOfN(6, Gen.alphaStr.map(_.take(4))),
      Gen.listOfN(6, Gen.alphaStr.map(_.take(4))), 8) {
      (a, b) =>
        if (a.nonEmpty && b.nonEmpty) {
          val df = Seq((a.distinct, b.distinct)).toDF("a", "b")
          val (ab, ba) = df.select(
            ApproxDedup.jaccard($"a", $"b"), ApproxDedup.jaccard($"b", $"a"))
            .as[(Double, Double)].head()
          assert(ab == ba)
          assert(ab >= 0.0 && ab <= 1.0)
          if (a.distinct.toSet == b.distinct.toSet) assert(ab == 1.0)
        }
    }
  }

  test("etag: parts-as-rows aggregation equals the scalar whole-object form") {
    forAllSampled2(Gen.chooseNum(1, 2000), Gen.chooseNum(1, 64), 6) { (len, partSize) =>
      val bytes = Array.tabulate(len)(i => (i % 251).toByte)
      val parts = bytes.grouped(partSize).toArray
      val md = java.security.MessageDigest.getInstance("MD5")
      val df = parts.zipWithIndex.map { case (p, i) =>
        md.reset()
        (i + 1, md.digest(p).map("%02x".format(_)).mkString)
      }.toSeq.toDF("pn", "d")
      val agg = df.agg(
        MultipartEtag.etagFromPartDigestsNative($"pn", $"d", lit(true))).as[String].head()
      assert(agg == MultipartEtag.etagOf(bytes, partSize, isMultipart = true))
    }
  }

  test("similarity: unit-normalized vectors have norm 1; cosine bounded") {
    forAllSampled(Gen.listOfN(16, Gen.chooseNum(-100, 100).map(_ / 10.0)), 6) { xs =>
      if (xs.exists(_ != 0.0)) {
        val df = Seq((xs.toArray, xs.reverse.toArray)).toDF("a", "b")
        val (n, c) = df.select(
          Similarity.dot(Similarity.unitNorm($"a"), Similarity.unitNorm($"a")),
          Similarity.cosine($"a", $"b")).as[(Double, Double)].head()
        assert(math.abs(n - 1.0) < 1e-9)
        assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      }
    }
  }

  private val eventsGen: Gen[List[(Long, Long, Long)]] =
    Gen.listOfN(50, Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(0L, 30L)))
      .map(_.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) })

  test("asof lastPrior: equals naive argmax over random keyed timelines") {
    forAllSampled2(eventsGen, eventsGen, 5) { (ls, rs) =>
      val left = ls.toDF("lid", "k", "t")
      val right = rs.toDF("rid", "k", "t")
      val fast = AsOfJoin.lastPrior(left, right, "k", "t", "lid", "rid")
        .select("lid", "asof_time", "asof_rid").orderBy("lid").collect()
      val naive = left.as("l")
        .join(right.as("r"),
          col("r.k") === col("l.k") && col("r.t") <= col("l.t"), "left")
        .groupBy(col("l.lid"))
        .agg(max(struct(col("r.t"), col("r.rid"))).as("m"))
        .select(col("lid"), col("m.t").as("asof_time"), col("m.rid").as("asof_rid"))
        .orderBy("lid").collect()
      assert(fast.toSeq == naive.toSeq)
    }
  }

  test("range withinBand: equals naive theta-join over random timelines") {
    forAllSampled2(eventsGen, eventsGen, 5) { (ls, rs) =>
      val left = ls.toDF("lid", "k", "t")
      val right = rs.toDF("rid", "k", "t")
      for (band <- Seq(1L, 5L)) {
        val fast = RangeJoin.withinBand(left, right, "k", "t", band)
          .select(col("lid"), col("r_rid")).orderBy("lid", "r_rid").collect()
        val naive = left.as("l").join(right.as("r"),
            col("l.k") === col("r.k") && abs(col("l.t") - col("r.t")) <= band)
          .select(col("lid"), col("rid").as("r_rid"))
          .orderBy("lid", "r_rid").collect()
        assert(fast.toSeq == naive.toSeq, s"band=$band")
      }
    }
  }

  private val docGen: Gen[List[String]] =
    Gen.listOfN(10, Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd", "ee")).map(_.mkString(" "))))

  test("chunkWindows: non-overlapping chunks reconstruct the document") {
    forAllSampled(docGen, 4) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      // stride == window → chunks partition the token stream exactly
      val rebuilt = Curation.chunkWindows(docs, "doc_id", col("text"),
          window = 7, stride = 7)
        .groupBy("doc_id")
        .agg(concat_ws(" ", sort_array(collect_list(
          struct(col("chunk_id"), col("chunk_text"))))
          .getField("chunk_text")).as("rebuilt"))
        .orderBy("doc_id").collect().map(_.getAs[String]("rebuilt"))
      rebuilt.zip(texts).foreach { case (r, t) => assert(r == t) }
    }
  }

  test("vocabulary: the cut is exact — no out-token outranks an in-token") {
    forAllSampled(docGen, 4) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val v = 3
      val vocab = TextAnalysis.vocabulary(docs, col("text"), v).collect()
      val counts = docs.select(explode(split(col("text"), "\\s+")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(vocab.length == math.min(v, counts.size))
      if (counts.size > v) {
        // the boundary is the WEAKEST included element under
        // (cnt desc, token asc): minimum count, then the LARGEST token
        // among the included minimum-count tokens — comparing against
        // the smallest such token would blind the check to tie-break
        // violations at the cut
        val included = vocab.map(r => (counts(r.getAs[String]("token")),
          r.getAs[String]("token")))
        val minCnt = included.map(_._1).min
        val boundaryTok = included.filter(_._1 == minCnt).map(_._2).max
        counts.filterNot(c => vocab.exists(_.getAs[String]("token") == c._1))
          .foreach { case (tok, cnt) =>
            assert(cnt < minCnt || (cnt == minCnt && tok > boundaryTok),
              s"excluded ($tok, $cnt) outranks boundary ($boundaryTok, $minCnt)")
          }
      }
    }
  }

  test("simhash: permutation-invariant over token multisets") {
    forAllSampled(Gen.listOfN(12, Gen.oneOf("alpha", "beta", "gamma", "delta")), 6) { toks =>
      if (toks.nonEmpty) {
        val d1 = Seq((1L, toks.mkString(" "))).toDF("id", "text")
        val d2 = Seq((1L, scala.util.Random.shuffle(toks).mkString(" "))).toDF("id", "text")
        val f1 = ApproxDedup.simhash(d1, "id", $"text").select("simhash").as[Long].head()
        val f2 = ApproxDedup.simhash(d2, "id", $"text").select("simhash").as[Long].head()
        assert(f1 == f2) // bag-of-tokens model: order never matters
      }
    }
  }
}
