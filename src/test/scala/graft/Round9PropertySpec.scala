package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.{ApproxDedup, Bpe, Distribution}

/** Property tests for the round-9 operator families, sampled over
  * seeded generator draws (same offline-cache workaround as
  * PropertySpec). Each property is checked against an independent
  * driver-side reference implementation. */
class Round9PropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAllSampled[A](gen: Gen[A], n: Int = 6)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  // ----------------------------------------------------------- BPE
  private def refMergeOnce(syms: List[String], l: String, r: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  private def refTrain(words: Map[String, Long], n: Int)
      : List[(String, String, Long)] = {
    var hist: Map[List[String], Long] =
      words.groupMapReduce { case (w, _) => w.map(_.toString).toList }(_._2)(_ + _)
    val out = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
    var step = 0
    var done = false
    while (step < n && !done) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, cnt) <- hist; Seq(a, b) <- syms.sliding(2) if syms.length > 1)
        pc((a, b)) = pc.getOrElse((a, b), 0L) + cnt
      if (pc.isEmpty) done = true
      else {
        val ((l, r), w) = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((l, r, w))
        hist = hist.toSeq
          .map { case (syms, cnt) => (refMergeOnce(syms, l, r), cnt) }
          .groupMapReduce(_._1)(_._2)(_ + _)
        step += 1
      }
    }
    out.toList
  }

  private val corpusGen: Gen[List[String]] = for {
    nDocs <- Gen.chooseNum(2, 8)
    docs <- Gen.listOfN(nDocs, for {
      nWords <- Gen.chooseNum(1, 25)
      ws <- Gen.listOfN(nWords,
        Gen.chooseNum(1, 6).flatMap(len =>
          Gen.listOfN(len, Gen.oneOf("abcdef".toSeq)).map(_.mkString)))
    } yield ws.mkString(" "))
  } yield docs

  test("BPE train matches the reference on random corpora") {
    forAllSampled(corpusGen) { corpus =>
      val got = Bpe.train(corpus.toDF("text"), col("text"), numMerges = 6)
        .orderBy("step").collect()
        .map(r => (r.getAs[String]("lft"), r.getAs[String]("rgt"),
          r.getAs[Long]("weight"))).toList
      val words = corpus.flatMap(_.split("\\s+")).filter(_.nonEmpty)
        .groupMapReduce(identity)(_ => 1L)(_ + _)
      assert(got == refTrain(words, 6), s"corpus=$corpus")
    }
  }

  // ------------------------------------------- prefix-filtered join
  private val setsGen: Gen[List[List[String]]] = for {
    n <- Gen.chooseNum(5, 30)
    sets <- Gen.listOfN(n, for {
      sz <- Gen.chooseNum(1, 10)
      els <- Gen.listOfN(sz, Gen.chooseNum(0, 25).map(i => s"u$i"))
    } yield els.distinct)
  } yield sets

  test("prefix join is lossless vs brute force on random sets+thresholds") {
    forAllSampled(setsGen) { rawSets =>
      val sets = rawSets.zipWithIndex
        .map { case (s, i) => (i.toLong, s) }
      val df = sets.toDF("id", "s").repartition(4)
      for (tPpm <- Seq(400000L, 700000L)) {
        val got = ApproxDedup.jaccardPairsPrefix(df, "id", "s", tPpm, maxTokenDf = 0)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val want = (for {
          (a, sa0) <- sets; (b, sb0) <- sets if a < b
          sa = sa0.toSet; sb = sb0.toSet
          inter = (sa & sb).size
          if inter * 1000000L >= (sa.size + sb.size - inter) * tPpm
        } yield (a, b)).toSet
        assert(got == want,
          s"t=$tPpm missing=${want -- got} extra=${got -- want}")
      }
    }
  }

  // ------------------------------------------------ exact quantiles
  private val valsGen: Gen[List[Long]] = for {
    n <- Gen.chooseNum(1, 400)
    vs <- Gen.listOfN(n, Gen.chooseNum(-100000L, 100000L))
  } yield vs

  test("exactQuantiles matches the sorted-rank reference on random data") {
    forAllSampled(valsGen, n = 5) { vals =>
      val df = vals.toDF("v").repartition(4)
      val qs = Seq(1L, 500000L, 1000000L)
      val got = Distribution.exactQuantiles(df, Nil, col("v"), qs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val sorted = vals.sorted
      for (q <- qs) {
        val rank = ((vals.size.toLong * q + 999999L) / 1000000L).toInt
        assert(got(q) == sorted(rank - 1),
          s"q=$q rank=$rank got=${got(q)} want=${sorted(rank - 1)}")
      }
    }
  }
}
