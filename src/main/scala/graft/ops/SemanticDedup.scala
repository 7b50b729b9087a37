package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
  * cluster the embedding space with k-means, mine cosine near-duplicate
  * pairs WITHIN clusters only, collapse the pair graphs with connected
  * components, and keep each component's minimum id (plus everything
  * that never paired).
  *
  * This is the composition that makes embedding dedup survive 100 TB:
  * the quadratic pair join runs per-cluster (expected cluster size
  * N/k), centroids are broadcast everywhere ([[Similarity.ivfAssign]]),
  * and the collapse is the same min-label propagation as the text-dedup
  * path ([[ConnectedComponents]]). Fully deterministic — k-means init,
  * assignment tie-breaks and rounded cosines are all engine-portable,
  * so a SQL oracle replays the whole pipeline.
  */
object SemanticDedup {

  /** Cluster assignment for every vector: (id, centroid_id, v) with v
    * cast to array<double>. Persisted by the caller if reused. */
  def assignClusters(emb: DataFrame, id: String, vecCol: String,
                     k: Int, iters: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // centroid vectors must arrive under vecCol — ivfAssign reads the
    // same column name from both sides; ids are Long for oracle parity
    val cents = Similarity.kmeansFit(emb, id, vecCol, k, iters)
      .zipWithIndex
      .map { case (c, i) => (i.toLong, c.toSeq) }.toSeq.toDF("centroid_id", vecCol)
    Similarity.ivfAssign(emb, cents, id, "centroid_id", vecCol)
      .select(col("corpus_id").as(id), col("centroid_id"), col("cv"))
  }

  /** Survivors of semantic dedup: one row per surviving vector with its
    * cluster id. `maxBlockRows` guards the per-cluster pair join (see
    * [[Similarity.nearDupPairs]]) — at scale raise k instead of the
    * guard. */
  def survivors(emb: DataFrame, id: String, vecCol: String,
                k: Int, iters: Int, threshold: Double,
                maxBlockRows: Int = 0): DataFrame = {
    val assigned = assignClusters(emb, id, vecCol, k, iters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = Similarity.nearDupPairs(
      assigned, id, "centroid_id", "cv", threshold, maxBlockRows)
    val kept = ConnectedComponents
      .survivors(assigned.select(col(id), col("centroid_id")), id,
        pairs, "id_a", "id_b")
      // lineage below nests the k-means scans + the pair mining; a
      // local checkpoint of the (small) survivor list lets the
      // assignment cache go immediately
      .localCheckpoint()
    assigned.unpersist()
    kept
  }
}
