package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair list — the collapse
  * step after near-dup PAIR mining (MinHash-LSH / SimHash / embedding
  * pairs): each component is one duplicate cluster, its minimum id the
  * canonical document.
  *
  * Algorithm: iterative min-label propagation — every node repeatedly
  * adopts the smallest label in its closed neighborhood until a
  * fixpoint; each iteration is one join + one map-side-combined min per
  * node, and convergence needs O(component diameter) rounds. Dedup
  * graphs are piles of tiny dense clusters (diameter ≤ a few hops), so
  * this converges in 2-4 rounds at any corpus size; a graph with
  * genuinely long chains wants the alternating large-star/small-star
  * formulation (same join shapes, O(log²) rounds) — the published
  * MapReduce-CC trade, noted here so nobody runs this on one.
  *
  * Deterministic: labels are ids, min is total. No driver-side graph:
  * only the per-round convergence check (`isEmpty` on changed labels)
  * touches the driver.
  */
object ConnectedComponents {

  /** @param edges undirected pairs (src, dst); ids any orderable type
    * @return (id, comp) for every node APPEARING IN EDGES — comp is the
    *         component's minimum id. Isolated documents never enter the
    *         pair list and stay implicitly their own component.
    *         The result is locally CHECKPOINTED (materialized, lineage
    *         truncated); its blocks free when the frame is GC'd, so
    *         unpersist is optional. */
  def apply(edges: DataFrame, srcCol: String, dstCol: String,
            maxIters: Int = 25): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // persist the raw edges BEFORE mirroring: the union references them
    // twice, and the upstream plan is typically expensive pair mining
    val e0 = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a") =!= col("b"))
      .persist(lvl)
    val sym = e0.union(e0.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .persist(lvl)
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val nbr = sym.join(
          labels.select(col("id").as("b"), col("comp").as("bcomp")), Seq("b"))
        .groupBy(col("a").as("id"))
        .agg(min("bcomp").as("nmin"))
      // carry the previous label through the projection — the
      // convergence check then needs no extra join per round.
      // localCheckpoint (NOT persist) each round: a persist caches the
      // data but the analyzed plan still nests every earlier round, so
      // plan size doubles per iteration and Catalyst canonicalization
      // OOMs the driver near round ~15 on long-chain graphs; the
      // checkpoint truncates lineage so plans stay one round deep.
      // (On executor loss the checkpoint is unrecoverable — a cluster
      // run wants spark.checkpoint.dir-backed reliable checkpoints.)
      val updated = labels.join(nbr, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"),
          col("comp").as("prev"))
        .localCheckpoint()
      converged = updated.filter(col("comp") =!= col("prev")).isEmpty
      labels = updated.drop("prev")
      i += 1
    }
    e0.unpersist()
    sym.unpersist()
    if (!converged) {
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters rounds" +
          " — long-chain graph; use a star-contraction formulation")
    }
    labels
  }

  /** Collapse duplicate clusters: keep every document that is NOT a
    * non-root member of some component (i.e. cluster minima and
    * untouched documents survive). Releases the propagation caches:
    * the loser set is locally checkpointed (small — one id per dropped
    * document) so the labels cache can be dropped immediately. */
  def survivors(docs: DataFrame, id: String, edges: DataFrame,
                srcCol: String, dstCol: String): DataFrame = {
    val cc = apply(edges, srcCol, dstCol)
    val losers = cc.filter(col("id") =!= col("comp"))
      .select(col("id").as(id))
      .localCheckpoint()
    cc.unpersist()
    docs.join(losers, Seq(id), "left_anti")
  }
}
