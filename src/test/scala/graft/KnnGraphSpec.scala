package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Cell-blocked kNN graph: parity with a driver-side per-cell brute
  * force, the mutual-edge symmetrization property, and the hot-cell
  * guard. */
class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  // two cells, deterministic vectors
  private def vec(seed: Int): Seq[Double] = {
    val r = new scala.util.Random(seed)
    Seq.fill(8)(r.nextDouble() - 0.5)
  }
  private val assigned = (0 until 40).map(i =>
    (i.toLong, (i % 2).toLong, vec(i)))
    .toDF("corpus_id", "centroid_id", "cv")

  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    BigDecimal(d / (na * nb))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("graph equals the per-cell brute-force reference") {
    val k = 3
    val got = Similarity.knnGraph(assigned, k)
      .select("src_id", "rank", "dst_id")
      .as[(Long, Int, Long)].collect().toSet
    val vecs = (0 until 40).map(i => i.toLong -> vec(i)).toMap
    val ref = (0 until 40).flatMap { i =>
      val cands = (0 until 40)
        .filter(j => j != i && j % 2 == i % 2)
        .map(j => (j.toLong, cos(vecs(i.toLong), vecs(j.toLong))))
        .sortBy { case (j, s) => (-s, j) }
        .take(k)
      cands.zipWithIndex.map { case ((j, _), r) => (i.toLong, r + 1, j) }
    }.toSet
    assert(got == ref)
  }

  test("mutual edges keep exactly the bidirectional top-k pairs") {
    val g = Similarity.knnGraph(assigned, 3)
    val arcs = g.select("src_id", "dst_id").as[(Long, Long)].collect().toSet
    val mutual = Similarity.mutualKnnEdges(g)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = arcs.filter { case (a, b) =>
      a < b && arcs.contains((b, a))
    }
    assert(mutual == expected)
    assert(mutual.nonEmpty) // sanity: dataset has reciprocal pairs
  }

  test("hot-cell guard fails fast with a remedy message") {
    val e = intercept[IllegalArgumentException] {
      Similarity.knnGraph(assigned, 2, maxCellRows = 5)
    }
    assert(e.getMessage.contains("knnGraph"))
  }

  test("incremental refresh equals the from-scratch graph exactly") {
    // old corpus in cells 0..3, batch lands in cells 1 and 3 only
    val old = (0 until 60).map(i => (i.toLong, (i % 4).toLong, vec(i)))
      .toDF("corpus_id", "centroid_id", "cv")
    val batch = (100 until 112).map(i => (i.toLong, (1 + 2 * (i % 2)).toLong,
        vec(i)))
      .toDF("corpus_id", "centroid_id", "cv")
    val ledger = Similarity.knnGraph(old, k = 3)
    val refreshed = Similarity.knnGraphRefresh(old, ledger, batch, k = 3)
      .orderBy("src_id", "rank").collect().toSeq
    val scratch = Similarity.knnGraph(old.unionByName(batch), k = 3)
      .orderBy("src_id", "rank").collect().toSeq
    assert(refreshed == scratch)
    // untouched cells (0, 2) rows came straight from the ledger
    val untouched = ledger.filter($"src_id" % 4 === 0 || $"src_id" % 4 === 2)
      .orderBy("src_id", "rank").collect().toSeq
    val refreshedUntouched = refreshed.filter(r =>
      r.getLong(0) < 100 && (r.getLong(0) % 4 == 0 || r.getLong(0) % 4 == 2))
    assert(refreshedUntouched == untouched)
  }

  test("every node with cell peers appears with rank 1") {
    val g = Similarity.knnGraph(assigned, 1)
    assert(g.count() == 40) // both cells have >= 2 members
    assert(g.select(max("rank")).as[Int].head() == 1)
  }
}
