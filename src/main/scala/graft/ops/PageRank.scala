package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer-exact PageRank over an edge list — the graph-centrality
  * member of the graph family (kNN graph → mutual edges → components →
  * rank). Training-data pipelines use it to pick REPRESENTATIVE
  * documents: a node central in the semantic kNN graph summarizes its
  * neighborhood, so rank-ordered selection beats uniform sampling for
  * coverage-per-token (the "graph-based diversity sampling" the kNN
  * graph exists to feed).
  *
  * All arithmetic is integer µ-units (total mass `totalU` split across
  * nodes), with the damping split as 85/100 integer products and every
  * division a truncating `div` — the same portable-integer discipline
  * as the BM25 µ-unit scores and the fixed-point k-means sums, so a
  * DuckDB replay of the iteration chain matches bit for bit. The
  * truncation loss per step is < 1 µ-unit per edge out of 10¹² total —
  * PageRank is used as an ORDERING, and the order is deterministic.
  *
  * Scale shape: one persisted (edge ⋈ outdeg) table; each iteration is
  * one shuffle join of ranks onto edge sources plus one map-side-
  * combined sum onto destinations — edge-table-sized work per
  * iteration, rank state is one row per node, and nothing ever sits on
  * the driver but the node count. Iterations are FIXED (not
  * convergence-polled): rank consumers want a reproducible artifact,
  * and a fixed chain is what an oracle can replay.
  *
  * Dangling nodes (appear only as destinations) receive the teleport
  * base each step and redistribute nothing — their mass share leaks,
  * which biases every node equally and preserves ordering; callers
  * wanting strict stochasticity should close the graph first.
  */
object PageRank {

  /** Rank every node of the directed graph `edges` after `iters`
    * synchronous update steps. Output: (id, rank_u) — µ-units of
    * `totalU` total initial mass.
    *
    * r₀(v) = totalU div N;  each step
    * r'(v) = (15·(totalU div N)) div 100
    *         + Σ over in-edges u→v of (85·(r(u) div outdeg(u))) div 100.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, totalU: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && iters <= 50,
      s"pageRank: iters must be in [1, 50], got $iters")
    require(totalU > 0, s"pageRank: totalU must be positive, got $totalU")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .persist()
    // node count: a driver scalar (the broadcast-total convention) —
    // this is the ONLY driver-resident state the operator holds
    val n = nodes.count()
    require(n > 0, "pageRank: empty graph")
    val init = totalU / n
    val base = (15L * init) / 100L
    // outdeg rides along each edge once; the joined table persists so
    // every iteration re-reads it instead of re-shuffling the join
    val eo = e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")),
      Seq("src")).persist()
    var r = nodes.select(col("id"), lit(init).as("rank_u"))
    for (_ <- 1 to iters) {
      val contrib = eo
        .join(r.select(col("id").as("src"), col("rank_u")), Seq("src"))
        .select(col("dst").as("id"),
          expr("(85 * (rank_u div outdeg)) div 100").as("c"))
        .groupBy(col("id"))
        .agg(sum(col("c")).cast("long").as("in_u"))
      r = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + coalesce(col("in_u"), lit(0L))).cast("long")
            .as("rank_u"))
    }
    r
  }
}
