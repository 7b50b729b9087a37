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
    *         pair list and stay implicitly their own component. */
  def apply(edges: DataFrame, srcCol: String, dstCol: String,
            maxIters: Int = 25): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
      .persist(lvl)
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
      .persist(lvl)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val nbr = sym.join(
          labels.select(col("id").as("b"), col("comp").as("bcomp")), Seq("b"))
        .groupBy(col("a").as("id"))
        .agg(min("bcomp").as("nmin"))
      val updated = labels.join(nbr, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"))
        .persist(lvl)
      converged = updated
        .join(labels.select(col("id"), col("comp").as("prev")), Seq("id"))
        .filter(col("comp") =!= col("prev"))
        .isEmpty
      labels.unpersist()
      labels = updated
      i += 1
    }
    require(converged, s"connected components did not converge in $maxIters rounds" +
      " — long-chain graph; use a star-contraction formulation")
    sym.unpersist()
    labels
  }

  /** Collapse duplicate clusters: keep every document that is NOT a
    * non-root member of some component (i.e. cluster minima and
    * untouched documents survive). */
  def survivors(docs: DataFrame, id: String, edges: DataFrame,
                srcCol: String, dstCol: String): DataFrame = {
    val losers = apply(edges, srcCol, dstCol)
      .filter(col("id") =!= col("comp"))
      .select(col("id").as(id))
    docs.join(losers, Seq(id), "left_anti")
  }
}
