package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** The persisted state of an incremental semantic near-dup index:
    * `centroids` — the FROZEN k-means index (centroid_id, vector),
    * trained once on the ingested corpus — and `assignments` —
    * (id, centroid_id, unit-vector) for every ingested embedding.
    * Both plain DataFrames, so production stores them as parquet
    * (assignments bucketed by centroid_id for a co-located cell join)
    * and a refresh READS them: the plan never touches the ingested
    * corpus's raw embeddings, the same property
    * [[graft.ops.ApproxDedup.LshLedger]] gives the lexical gate.
    * Unit vectors round-trip parquet bit-exactly (doubles), so ledger
    * cosines equal recomputed cosines. */
  final case class SemLedger(centroids: DataFrame, assignments: DataFrame)

  /** Derive ledger content from the ingested corpus — the one-time
    * bootstrap: train k-means on it, assign it, unit-normalize. */
  def semLedger(oldEmb: DataFrame, id: String, vecCol: String,
                k: Int, iters: Int): SemLedger = {
    val spark = oldEmb.sparkSession
    import spark.implicits._
    val cents = Similarity.kmeansFit(oldEmb, id, vecCol, k, iters)
      .zipWithIndex
      .map { case (c, i) => (i.toLong, c.toSeq) }.toSeq
      .toDF("centroid_id", vecCol)
    SemLedger(cents, assignUnit(oldEmb, cents, id, vecCol))
  }

  /** The ledger after landing a batch: centroids FROZEN (a batch must
    * not move the index — re-training is an explicit offline rebuild,
    * not a refresh side effect), assignments appended with the
    * surviving batch vectors'. Same append-only contract as
    * [[graft.ops.Dedup.updatedLedger]] / `updatedLshLedger`. */
  def updatedSemLedger(ledger: SemLedger, novelEmb: DataFrame,
                       id: String, vecCol: String): SemLedger =
    SemLedger(ledger.centroids,
      ledger.assignments.unionByName(
        assignUnit(novelEmb, ledger.centroids, id, vecCol)))

  /** Unit-normalized centroid assignment of `emb` against a (frozen)
    * centroid table — the ledger row shape ([[SemLedger.assignments]]);
    * public so incremental jobs (streaming refresh) can compute a
    * landed batch's assignment DELTA without rebuilding a ledger. */
  def assignUnit(emb: DataFrame, cents: DataFrame, id: String,
                 vecCol: String): DataFrame =
    Similarity.ivfAssign(emb, cents, id, "centroid_id", vecCol)
      .select(col("corpus_id").as(id), col("centroid_id"),
        Similarity.unitNorm(col("cv")).as("uv"))

  /** Incremental semantic dedup: the NEW batch's survivors against an
    * already-ingested embedding corpus — the semantic sibling of the
    * exact ledger ([[Dedup.incrementalNovel]]) and the lexical refresh
    * ([[ApproxDedup.incrementalLshNovel]]). Two scale commitments:
    *
    *  - **Ledger centroids**: k-means trains on the INGESTED corpus
    *    only — a batch must not move the index (and a production run
    *    stores the centroids with the corpus and skips even that).
    *  - **No old×old pair work**: within each centroid cell the batch
    *    meets the old members and its own smaller ids; the ingested
    *    corpus streams through once and is never self-joined.
    *
    * Drop rule (same family convention as [[ApproxDedup
    * .incrementalLshNovel]]): a batch vector whose rounded unit-vector
    * cosine vs any old cell-mate, or vs any smaller-id batch cell-mate,
    * reaches `threshold` is a duplicate.
    *
    * @return (id, centroid_id) for every surviving batch vector —
    *         [[survivors]]' output shape, locally checkpointed so the
    *         internal caches release before return. */
  def incrementalSurvivors(oldEmb: DataFrame, newEmb: DataFrame,
                           id: String, vecCol: String, k: Int, iters: Int,
                           threshold: Double,
                           maxBlockRows: Int = 0): DataFrame = {
    val sc = incrementalSurvivorsScoped(oldEmb, newEmb, id, vecCol, k,
      iters, threshold, maxBlockRows)
    val out = sc.df.localCheckpoint()
    sc.release()
    out
  }

  /** [[incrementalSurvivors]] as a LAZY plan with an ownable cache
    * lifetime — also what plan audits inspect (the eager form returns a
    * checkpoint scan that hides the join shapes). */
  def incrementalSurvivorsScoped(oldEmb: DataFrame, newEmb: DataFrame,
                                 id: String, vecCol: String, k: Int,
                                 iters: Int, threshold: Double,
                                 maxBlockRows: Int = 0): ApproxDedup.Scoped =
    incrementalSurvivorsFromLedgerScoped(
      semLedger(oldEmb, id, vecCol, k, iters), newEmb, id, vecCol,
      threshold, maxBlockRows)

  /** [[incrementalSurvivorsFromLedgerScoped]], eager + cache-released
    * — the production refresh entry point. */
  def incrementalSurvivorsFromLedger(ledger: SemLedger, newEmb: DataFrame,
                                     id: String, vecCol: String,
                                     threshold: Double,
                                     maxBlockRows: Int = 0): DataFrame = {
    val sc = incrementalSurvivorsFromLedgerScoped(ledger, newEmb, id,
      vecCol, threshold, maxBlockRows)
    val out = sc.df.localCheckpoint()
    sc.release()
    out
  }

  /** The production semantic refresh: the old side arrives as a
    * persisted [[SemLedger]] (frozen centroids + unit-vector
    * assignments), so the refresh plan scans ledger parquet and the
    * landing batch ONLY — no k-means re-train, no re-assignment, no
    * read of the ingested corpus's embeddings. Semantics identical to
    * [[incrementalSurvivorsScoped]] (spec-enforced). */
  def incrementalSurvivorsFromLedgerScoped(ledger: SemLedger,
                                           newEmb: DataFrame, id: String,
                                           vecCol: String,
                                           threshold: Double,
                                           maxBlockRows: Int = 0)
      : ApproxDedup.Scoped = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val oldA = ledger.assignments
    val newA = assignUnit(newEmb, ledger.centroids, id, vecCol).persist(lvl)
    ApproxDedup.requireBoundedBlocks(newA, "centroid_id", maxBlockRows,
      "incrementalSurvivors (batch side)")
    // the new×old per-cell join cost is the PRODUCT of both cell
    // populations, so a hot old-side cell inflates it just as much as a
    // hot batch cell — guard both sides when a bound is requested
    ApproxDedup.requireBoundedBlocks(oldA, "centroid_id", maxBlockRows,
      "incrementalSurvivors (ingested side)")
    val probe = newA.select(col(id).as("id_new"), col("centroid_id"),
      col("uv").as("vn"))
    def dupIds(other: DataFrame, keep: Column): DataFrame =
      probe.join(other, Seq("centroid_id"))
        .filter(keep)
        .filter(round(Similarity.dot(col("vn"), col("vo")), 6) >= threshold)
        .select(col("id_new"))
    // no .distinct() on the dup-id stream: left_anti tolerates
    // duplicate right-side rows (the family convention — see
    // Dedup.incrementalNovel), and the set is consumed exactly once
    val dups = dupIds(
        oldA.select(col("centroid_id"), col("uv").as("vo")), lit(true))
      .unionByName(dupIds(
        newA.select(col(id).as("id_prev"), col("centroid_id"),
          col("uv").as("vo")),
        col("id_prev") < col("id_new")))
      .withColumnRenamed("id_new", id)
    val out = newA.select(col(id), col("centroid_id"))
      .join(dups, Seq(id), "left_anti")
    ApproxDedup.Scoped(out, () => { newA.unpersist(); () })
  }

  /** Survivors of semantic dedup: one row per surviving vector with its
    * cluster id. `maxBlockRows` guards the per-cluster pair join (see
    * [[Similarity.nearDupPairs]]) — at scale raise k instead of the
    * guard. */
  def survivors(emb: DataFrame, id: String, vecCol: String,
                k: Int, iters: Int, threshold: Double,
                maxBlockRows: Int = 0,
                maxLocalEdges: Long = 500000L): DataFrame = {
    val assigned = assignClusters(emb, id, vecCol, k, iters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = Similarity.nearDupPairs(
      assigned, id, "centroid_id", "cv", threshold, maxBlockRows)
    val kept = ConnectedComponents
      .survivors(assigned.select(col(id), col("centroid_id")), id,
        pairs, "id_a", "id_b", maxLocalEdges = maxLocalEdges)
      // lineage below nests the k-means scans + the pair mining; a
      // local checkpoint of the (small) survivor list lets the
      // assignment cache go immediately
      .localCheckpoint()
    assigned.unpersist()
    kept
  }
}
