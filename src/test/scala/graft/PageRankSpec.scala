package graft

import graft.ops.PageRank

/** Integer PageRank: parity with a driver-side replay of the exact
  * µ-unit recurrence, the teleport floor, dangling-node behavior, and
  * the argument guards. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  // a small digraph with a hub (1), a cycle (2↔3) and a dangling sink (4)
  private val edges = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L),
    (2L, 3L), (3L, 2L), (2L, 1L))

  private def reference(iters: Int, totalU: Long): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val init = totalU / nodes.size
    val base = 15L * init / 100L
    var r = nodes.map(_ -> init).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => 85L * (r(s) / out(s)) / 100L }.sum
      }
      r = nodes.map(n => n -> (base + in.getOrElse(n, 0L))).toMap
    }
    r
  }

  test("ranks equal the driver-side integer recurrence, step by step") {
    for (iters <- Seq(1, 3, 5)) {
      val got = PageRank.pageRank(edges.toDF("s", "d"), "s", "d", iters)
        .as[(Long, Long)].collect().toMap
      assert(got == reference(iters, 1000000000000L), s"iters=$iters")
    }
  }

  test("a node with no in-edges holds exactly the teleport base") {
    // node 5 only points outward: after one step its rank is base
    val e = (edges :+ (5L, 1L)).toDF("s", "d")
    val got = PageRank.pageRank(e, "s", "d", iters = 3)
      .as[(Long, Long)].collect().toMap
    val n = 5
    assert(got(5L) == 15L * (1000000000000L / n) / 100L)
  }

  test("a dangling sink accumulates but redistributes nothing") {
    val got = PageRank.pageRank(edges.toDF("s", "d"), "s", "d", iters = 5)
      .as[(Long, Long)].collect().toMap
    val base = 15L * (1000000000000L / 4) / 100L
    assert(got(4L) > base) // fed by the hub
    // total mass never exceeds the initial total (truncation + leak)
    assert(got.values.sum <= 1000000000000L)
  }

  test("guards reject bad arguments") {
    val df = edges.toDF("s", "d")
    intercept[IllegalArgumentException] {
      PageRank.pageRank(df, "s", "d", iters = 0)
    }
    intercept[IllegalArgumentException] {
      PageRank.pageRank(df, "s", "d", iters = 5, totalU = 0L)
    }
  }
}
