package graft

import org.apache.spark.sql.functions._
import graft.ops.ConnectedComponents

/** The adaptive driver-side union-find must be row-identical to the
  * distributed label-propagation loop on every graph shape and on both
  * supported id types — the local path is an execution strategy, not a
  * semantic variant. */
class CcParitySpec extends SparkSpec {
  import spark.implicits._

  private def both(edges: org.apache.spark.sql.DataFrame,
                   src: String, dst: String): Unit = {
    val local = ConnectedComponents(edges, src, dst)
      .as[(Long, Long)].collect().toSet
    val dist = ConnectedComponents(edges, src, dst, maxLocalEdges = 0)
      .as[(Long, Long)].collect().toSet
    assert(local == dist, s"local/distributed CC diverge on $src/$dst")
  }

  test("local union-find equals the distributed loop on mixed graph shapes") {
    // chains, stars, cliques, the shared-leaf review counterexample,
    // and self-loop noise, in one edge list
    val edges = (
      (0L until 30L).map(i => (i, i + 1)) ++                // long chain
      (100L to 110L).map(i => (100L, i)) ++                 // star
      Seq((200L, 201L), (201L, 202L), (200L, 202L)) ++      // triangle
      Seq((1L, 4L), (3L, 4L), (3L, 5L), (2L, 5L)) ++        // shared leaf
      Seq((300L, 300L))                                     // self-loop only
    ).toDF("src", "dst")
    both(edges, "src", "dst")
    // hash-derived pseudo-random pair pile (deterministic)
    val rnd = (1 to 400).map { i =>
      val h = i * 2654435761L
      (math.abs(h % 97), math.abs((h / 97) % 97))
    }.toDF("src", "dst")
    both(rnd, "src", "dst")
  }

  test("string ids take the local path with the same labels as distributed") {
    val edges = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("s", "d")
    val local = ConnectedComponents(edges, "s", "d")
      .as[(String, String)].collect().toSet
    val dist = ConnectedComponents(edges, "s", "d", maxLocalEdges = 0)
      .as[(String, String)].collect().toSet
    assert(local == dist)
    assert(local == Set(("a", "a"), ("b", "a"), ("c", "a"),
      ("x", "x"), ("y", "x")))
  }

  test("supplementary-plane strings get the same minimum on both paths") {
    // U+FFFD vs U+1F600: UTF-16 code units order them one way, UTF-8
    // bytes (what Spark's min on StringType compares) the other — the
    // local ordering must follow the bytes
    val edges = Seq(("�", "😀")).toDF("s", "d")
    val local = ConnectedComponents(edges, "s", "d")
      .as[(String, String)].collect().toSet
    val dist = ConnectedComponents(edges, "s", "d", maxLocalEdges = 0)
      .as[(String, String)].collect().toSet
    assert(local == dist, s"paths diverge: $local vs $dist")
    assert(local.forall(_._2 == "�"),
      "UTF-8 byte order makes U+FFFD the component minimum")
  }
}
