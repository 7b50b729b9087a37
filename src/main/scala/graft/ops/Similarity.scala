package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search: brute-force cosine top-k as the exact
  * baseline, an IVF (inverted-file) clustered variant as the scale
  * path, and near-duplicate pair mining with blocking.
  *
  * Scale design: the query side of every join is broadcast (queries and
  * centroids are small); the corpus is never collected or replicated.
  * Brute force is O(|Q|·N) — correct but a last resort; IVF probes only
  * the query's cluster, cutting the scanned fraction to ~1/nCentroids
  * per probe, the standard recall/throughput trade.
  *
  * Cosine math runs in double precision via an explicit sequential
  * fold (`aggregate` over `zip_with`), which reproduces bit-for-bit in
  * the DuckDB oracle's list_dot_product — no UDF, stays in codegen.
  */
object Similarity {

  /** Dot product of two double-array columns — the native codegen'd
    * [[graft.plans.VecDot]] expression (registered by
    * [[graft.plans.GraftExtensions]]): one fused loop per pair instead
    * of the HOF form's intermediate array + interpreted lambdas.
    * Bit-identical to [[dotHof]] (same left-to-right IEEE fold —
    * VecDotSpec asserts it), so every oracle stays green. */
  def dot(a: Column, b: Column): Column =
    call_function("vec_dot", a, b)

  /** The composable higher-order-function form of [[dot]] — kept as
    * the portable reference implementation (works without the session
    * extensions) and the spec's equivalence baseline. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity: dot / (|a| * |b|). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Unit-normalize a vector: v / |v|. The norm is LET-BOUND via a
    * singleton-array transform so it computes once per vector, not once
    * per element (a directly-referenced `sqrt(dot(v,v))` inside the
    * division lambda would re-run the O(d) fold d times). Pre-normalizing
    * before a pairwise join turns cosine into a single dot product:
    * norms cost O(N·d) instead of O(N²·d). */
  def unitNorm(v: Column): Column =
    element_at(
      transform(array(sqrt(dot(v, v))), n => transform(v, x => x / n)),
      1)

  /** Brute-force top-k: for each query vector, the k nearest corpus
    * vectors by cosine (query set must be small — it is broadcast).
    * Deterministic rank: (rounded cosine desc, corpus id asc). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     qid: String, cid: String, vecCol: String,
                     k: Int, round6: Boolean = true): DataFrame = {
    val q = queries.select(col(qid).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val c = corpus.select(col(cid).as("corpus_id"), col(vecCol).cast("array<double>").as("cv"))
    val sim0 = cosine(col("qv"), col("cv"))
    val sim = if (round6) round(sim0, 6) else sim0
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("corpus_id"))
    c.join(broadcast(q), col("query_id") =!= col("corpus_id"))
      .withColumn("cos_sim", sim)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cos_sim"))
  }

  /** IVF assignment: each corpus vector is assigned to its nearest
    * centroid (argmax cosine, centroid-id tie-break). Centroids are
    * broadcast; one narrow pass over the corpus.
    *
    * Argmax is a `max_by` AGGREGATION, not a window: the k-replicated
    * rows collapse map-side (broadcast join preserves partitioning, so
    * each vector's k candidate rows combine before any shuffle) —
    * a window would shuffle all k·N rows to rank them. Tie-break:
    * max over (sim, -centroid_id) = smallest centroid id. */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame,
                cid: String, centId: String, vecCol: String): DataFrame = {
    val c = corpus.select(col(cid).as("corpus_id"), col(vecCol).cast("array<double>").as("cv"))
    val cent = centroids.select(col(centId).as("centroid_id"),
      col(vecCol).cast("array<double>").as("centv"))
    c.crossJoin(broadcast(cent))
      .withColumn("cent_sim", round(cosine(col("cv"), col("centv")), 6))
      .groupBy(col("corpus_id"))
      .agg(
        max_by(col("centroid_id"),
          struct(col("cent_sim"),
            (-col("centroid_id").cast("bigint")).as("nid"))).as("centroid_id"),
        // every replicated row carries the same vector — any value works
        first(col("cv")).as("cv"))
      .select(col("corpus_id"), col("centroid_id"), col("cv"))
  }

  /** IVF top-k: probe only the cluster each query is assigned to.
    * Recall < 1 by construction; the scanned fraction drops to
    * ~1/nCentroids. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
              qid: String, cid: String, centId: String, vecCol: String,
              k: Int): DataFrame = {
    val assigned = ivfAssign(corpus, centroids, cid, centId, vecCol)
    val qAssigned = ivfAssign(queries, centroids, qid, centId, vecCol)
      .select(col("corpus_id").as("query_id"), col("centroid_id"), col("cv").as("qv"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("corpus_id"))
    assigned.join(broadcast(qAssigned), Seq("centroid_id"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cos_sim", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cos_sim"))
  }

  /** Multi-probe IVF top-k: probe the `nprobe` NEAREST clusters per
    * query instead of just the assigned one — the standard recall
    * lever (a query near a cluster boundary misses neighbors assigned
    * across it; probing the next-nearest centroids recovers them).
    * Scanned fraction grows to ~nprobe/nCentroids, still never the
    * whole corpus; nprobe = nCentroids degenerates to brute force
    * exactly. The probe ranking replays [[ivfAssign]]'s ordering
    * (rounded cosine desc, centroid id asc), so nprobe=1 equals
    * [[ivfTopK]] row-for-row.
    *
    * Shapes: the probe table is (queries × nprobe) rows — broadcast;
    * the corpus-side assignment is the same single narrow pass as
    * [[ivfTopK]]; the probe window partitions per query (queries are
    * the small side by contract, never the corpus). */
  def ivfTopKProbed(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
                    qid: String, cid: String, centId: String, vecCol: String,
                    k: Int, nprobe: Int): DataFrame = {
    require(nprobe > 0, "nprobe must be positive")
    val assigned = ivfAssign(corpus, centroids, cid, centId, vecCol)
    val q = queries.select(col(qid).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val cent = centroids.select(col(centId).as("centroid_id"),
      col(vecCol).cast("array<double>").as("centv"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cent_sim").desc, col("centroid_id"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("cent_sim", round(cosine(col("qv"), col("centv")), 6))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("centroid_id"), col("qv"))
    // a corpus vector lives in exactly ONE cluster, so (query, corpus)
    // pairs are unique across probes — no dedup needed before ranking
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("corpus_id"))
    assigned.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cos_sim", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cos_sim"))
  }

  /** A trained IVF index as two TABLES — the persisted-ledger form
    * ([[graft.ops.ApproxDedup.LshLedger]] / SemLedger's shape, applied
    * to ANN): `centroids` (centroid_id, centv) is the k·d training
    * result, `assignments` (corpus_id, centroid_id, cv) is the posting
    * list — every corpus vector stored WITH its cluster, which is what
    * a real inverted file is. At 100 TB the index is built once and
    * served many times: a query-path consumer reads these tables
    * (parquet/Delta) and never re-trains, never re-assigns — see
    * [[ivfTopKFromIndex]]. */
  final case class IvfIndex(centroids: DataFrame, assignments: DataFrame)

  /** Trained k-means centroids as the ONE (centroid_id, centv) table
    * shape every index family persists — ids are the training output
    * order, so [[ivfIndexBuild]] and [[ivfPqIndexBuild]] trained on the
    * same corpus produce identical coarse tables (the drift gate and
    * no-retrain specs rely on that). */
  private def centroidTable(spark: org.apache.spark.sql.SparkSession,
                            trained: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    trained.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toSeq) }.toSeq
      .toDF("centroid_id", "centv")
      .select(col("centroid_id"), col("centv").cast("array<double>").as("centv"))
  }

  /** Train + assign once, producing the persistable [[IvfIndex]].
    * Training is [[kmeansFit]] (deterministic, oracle-replayable);
    * assignment is [[ivfAssign]] over the trained centroids. */
  def ivfIndexBuild(corpus: DataFrame, id: String, vecCol: String,
                    k: Int, iters: Int): IvfIndex = {
    val cents = centroidTable(corpus.sparkSession,
      kmeansFit(corpus, id, vecCol, k, iters))
    val asg = ivfAssign(corpus,
      cents.select(col("centroid_id"), col("centv").as(vecCol)),
      id, "centroid_id", vecCol)
    IvfIndex(cents, asg)
  }

  /** Incremental index refresh — the ANN sibling of the LSH/semantic
    * ledger refreshes: a landing batch of vectors is assigned to the
    * index's FROZEN centroids (one broadcast cross-join + argmax — no
    * k-means iteration, no old-corpus re-assignment; a batch must not
    * move the index, [[graft.ops.SemanticDedup]]'s frozen-centroid
    * contract) and its posting-list rows append to `assignments`.
    * Serving continues through [[ivfTopKFromIndex]] unchanged. Re-train
    * cadence is an offline decision (drift on the recall gate, q94);
    * refresh cost here is O(batch · k), never O(corpus). */
  def ivfIndexUpsert(index: IvfIndex, newVectors: DataFrame,
                     id: String, vecCol: String): IvfIndex = {
    // idempotent on replay: an id already in the posting lists is
    // skipped — a duplicated posting would surface the same
    // (query, corpus) pair twice and corrupt the rank window
    // downstream (queue redelivery is the normal case, not the edge)
    val novel = newVectors.join(
      index.assignments.select(col("corpus_id").as(id)), Seq(id), "left_anti")
    val newAsg = ivfAssign(novel,
      index.centroids.select(col("centroid_id"), col("centv").as(vecCol)),
      id, "centroid_id", vecCol)
    IvfIndex(index.centroids, index.assignments
      .select(col("corpus_id"), col("centroid_id"),
        col("cv").cast("array<double>").as("cv"))
      .unionByName(newAsg))
  }

  /** Multi-probe IVF top-k over a PERSISTED index: the query plan
    * touches only the two index tables — no k-means iteration jobs, no
    * corpus re-assignment (NoRetrainSpec pins the plan). Probe ranking
    * replays [[ivfAssign]]'s ordering (rounded cosine desc, centroid id
    * asc), so nprobe=1 over an index built by [[ivfIndexBuild]] equals
    * [[ivfTopK]] row-for-row, and nprobe=n equals [[ivfTopKProbed]]. */
  def ivfTopKFromIndex(queries: DataFrame, index: IvfIndex, qid: String,
                       vecCol: String, k: Int, nprobe: Int): DataFrame = {
    require(nprobe > 0, "nprobe must be positive")
    val q = queries.select(col(qid).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val cent = index.centroids.select(col("centroid_id"),
      col("centv").cast("array<double>").as("centv"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cent_sim").desc, col("centroid_id"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("cent_sim", round(cosine(col("qv"), col("centv")), 6))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("centroid_id"), col("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("corpus_id"))
    index.assignments
      .select(col("corpus_id"), col("centroid_id"),
        col("cv").cast("array<double>").as("cv"))
      .join(broadcast(probes), Seq("centroid_id"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cos_sim", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cos_sim"))
  }

  /** Drift gate for a persisted [[IvfIndex]] — the decision-maker the
    * recall gate ([[recallAtK]], q94) feeds: measures whether a landing
    * batch still fits the index's FROZEN centroids and emits a
    * keep/retrain verdict, closing the loop the frozen-centroid refresh
    * family ([[ivfIndexUpsert]]) deliberately leaves open. Two signals:
    *
    *  1. **assignment shift** — total-variation distance between the
    *     index's posting-list distribution over centroids and the
    *     batch's frozen-centroid assignment distribution, in ppm
    *     (`Σ|p_c − q_c| / 2`). A batch drawn from the indexed
    *     distribution lands near 0; a drifted batch piles onto few
    *     centroids and the TV distance jumps.
    *  2. **serve recall** — recall@k of the index serve path
    *     ([[ivfTopKFromIndex]], `nprobe`) against brute force, on a
    *     DETERMINISTIC probe sample of the batch (portable hash-mod:
    *     md5-bucket of the id == 0 (mod `sampleMod`) — replayable by
    *     any engine, stable under corpus growth).
    *
    * Everything is integer arithmetic (counts, ppm via integer div), so
    * the report is bit-replayable by the DuckDB oracle. Cost shape: the
    * shift is two metadata-sized aggregations (k rows each — the
    * posting count scan never touches vectors... the one corpus-sized
    * term is a count per centroid_id, map-side combined); the recall
    * term searches only the sampled probes (brute cost |sample|·N —
    * size the sample by `sampleMod`, the exact knob q94 already uses).
    *
    * Verdict: `retrain` when shift_ppm > maxShiftPpm OR recall_ppm <
    * minRecallPpm, else `keep`. With an empty probe sample recall has
    * no evidence and defaults to perfect (1e6 ppm) — the shift signal
    * still gates.
    *
    * @return one row: (n_index, n_batch, n_probes, shift_ppm,
    *         recall_ppm, verdict) */
  def driftReport(index: IvfIndex, landing: DataFrame, id: String,
                  vecCol: String, k: Int, nprobe: Int, sampleMod: Int,
                  maxShiftPpm: Long, minRecallPpm: Long): DataFrame = {
    require(sampleMod > 0, "sampleMod must be positive")
    val shift = assignmentShiftPpm(index.centroids,
      index.assignments.select(col("centroid_id")), landing, id, vecCol)
    // deterministic probe sample (portable md5 hash-mod, Curation's
    // idiom) → serve path vs exact, both k-bounded
    val probes = landing.filter(
      Curation.hashBucket(col(id), "drift:", sampleMod) === 0)
    val approx = ivfTopKFromIndex(probes, index, id, vecCol, k, nprobe)
    val exact = bruteForceTopK(probes,
      index.assignments.select(col("corpus_id"), col("cv").as(vecCol)),
      id, "corpus_id", vecCol, k)
    driftVerdict(shift, recallPpm(approx, exact), maxShiftPpm, minRecallPpm)
  }

  /** Total-variation assignment-distribution shift between an index's
    * posting counts and a landing batch's frozen-centroid assignment,
    * in ppm. `baseAssign` is any (centroid_id)-rowed table — IVF
    * posting lists or IVF-PQ code rows. Every centroid participates:
    * an empty posting list on either side IS the drift signal (k rows,
    * metadata-sized). Totals are a 1-row broadcast; all shares are
    * integer arithmetic (ANSI div — an EMPTY index or batch fails
    * loudly rather than reporting a silent zero-drift). */
  private def assignmentShiftPpm(centroids: DataFrame, baseAssign: DataFrame,
                                 landing: DataFrame, id: String,
                                 vecCol: String): DataFrame = {
    val base = baseAssign.groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n_base"))
    val batch = ivfAssign(landing,
        centroids.select(col("centroid_id"), col("centv").as(vecCol)),
        id, "centroid_id", vecCol)
      .groupBy(col("centroid_id")).agg(count(lit(1)).as("n_new"))
    val dist = centroids.select(col("centroid_id"))
      .join(base, Seq("centroid_id"), "left")
      .join(batch, Seq("centroid_id"), "left")
      .na.fill(0L, Seq("n_base", "n_new"))
    val totals = dist.agg(sum(col("n_base")).as("n_index"),
      sum(col("n_new")).as("n_batch"))
    dist.crossJoin(broadcast(totals))
      .select(col("n_index"), col("n_batch"),
        expr("abs(n_base * 1000000 div n_index - " +
          "n_new * 1000000 div n_batch)").as("d"))
      .groupBy(col("n_index"), col("n_batch"))
      .agg(expr("sum(d) div 2").as("shift_ppm"))
  }

  /** Aggregate [[recallAtK]] into one (n_probes, recall_ppm) row. */
  private def recallPpm(approx: DataFrame, exact: DataFrame): DataFrame =
    recallAtK(approx, exact).agg(
        count(lit(1)).as("n_probes"),
        sum(col("n_hit")).as("hits"),
        sum(col("k_exact")).as("kx"))
      .select(col("n_probes"),
        coalesce(expr("hits * 1000000 div kx"), lit(1000000L))
          .as("recall_ppm"))

  private def driftVerdict(shift: DataFrame, rec: DataFrame,
                           maxShiftPpm: Long, minRecallPpm: Long): DataFrame =
    shift.crossJoin(rec)
      .select(col("n_index"), col("n_batch"), col("n_probes"),
        col("shift_ppm"), col("recall_ppm"),
        when(col("shift_ppm") > maxShiftPpm ||
          col("recall_ppm") < minRecallPpm, lit("retrain"))
          .otherwise(lit("keep")).as("verdict"))

  /** [[driftReport]] for the combined [[IvfPqIndex]]: the SAME
    * distribution-shift gate over the code rows' cells, and the recall
    * half measured on the FULL serving path — ADC scores from codes
    * ([[ivfPqTopKFromIndex]]) against exact cosine over the raw
    * `corpus` vector table (PQ codes carry no raw vectors, so the
    * exact baseline needs the table the index was encoded from; the
    * gate therefore scores cell pruning AND quantization loss
    * together, which is what serving actually loses). Same sampled
    * probes, same ppm thresholds, same keep/retrain verdict row. */
  def ivfPqDriftReport(index: IvfPqIndex, corpus: DataFrame,
                       landing: DataFrame, id: String, vecCol: String,
                       m: Int, dsub: Int, k: Int, nprobe: Int,
                       sampleMod: Int, maxShiftPpm: Long,
                       minRecallPpm: Long): DataFrame = {
    require(sampleMod > 0, "sampleMod must be positive")
    // codes carry one row per (vector, subspace) — collapse to one
    // cell assignment per vector before counting the distribution
    val shift = assignmentShiftPpm(index.centroids,
      index.codes.select(col("corpus_id"), col("centroid_id")).distinct()
        .select(col("centroid_id")), landing, id, vecCol)
    val probes = landing.filter(
      Curation.hashBucket(col(id), "drift:", sampleMod) === 0)
    val approx = ivfPqTopKFromIndex(probes, index, id, vecCol,
      m, dsub, k, nprobe)
    val exact = bruteForceTopK(probes, corpus, id, id, vecCol, k)
    driftVerdict(shift, recallPpm(approx, exact), maxShiftPpm, minRecallPpm)
  }

  /** Lloyd's-iteration k-means training for the IVF index (spherical
    * form: cosine assignment, per-dimension mean update).
    *
    * Distributed shape: each iteration is one broadcast cross-join
    * (centroids are k·d doubles — driver-resident by nature, exactly as
    * MLlib holds them) plus one map-side-combined groupBy of k·d cells;
    * the corpus is scanned once per iteration and never collected.
    *
    * Deterministic and engine-portable by construction, so a DuckDB
    * oracle can replay the training bit-for-bit:
    *  - init = the k lowest-id vectors (no RNG);
    *  - assignment uses round(cosine, 6) with centroid-id tie-break;
    *  - dimension sums run in FIXED-POINT (floor(x·1e6) bigint adds,
    *    order-independent — double summation would vary with Spark's
    *    nondeterministic partial-agg merge order);
    *  - centroids round to 6 dp via Spark's own round() (same rounding
    *    the oracle's round() reproduces).
    * Empty clusters keep their previous centroid. */
  def kmeansFit(corpus: DataFrame, id: String, vecCol: String,
                k: Int, iters: Int): Array[Array[Double]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val v = corpus.select(col(id).as("cid"), col(vecCol).cast("array<double>").as("cv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var centroids: Array[Array[Double]] =
      v.orderBy("cid").limit(k).collect().map(_.getSeq[Double](1).toArray)
    require(centroids.length == k,
      s"kmeansFit: corpus has only ${centroids.length} vectors, need k=$k")
    for (_ <- 0 until iters) {
      val centDf = centroids.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("centroid_id", "cv")
      val asg = ivfAssign(v, centDf, "cid", "centroid_id", "cv")
      val cells = asg
        .select(col("centroid_id"), posexplode(col("cv")).as(Seq("dim", "x")))
        .groupBy("centroid_id", "dim")
        .agg(sum(floor(col("x") * 1e6).cast("bigint")).as("sx"),
          count(lit(1)).as("n"))
        .select(col("centroid_id"), col("dim"),
          round(col("sx") / (col("n") * 1e6), 6).as("cval"))
        .collect()
      val updated = cells.groupBy(_.getInt(0)).map { case (cid, rows) =>
        cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2))
      }
      centroids = Array.tabulate(k)(i => updated.getOrElse(i, centroids(i)))
    }
    v.unpersist()
    centroids
  }

  /** Deterministic random-hyperplane LSH: plane p's component d is
    * `hex32(md5("hp<p>:<d>")) / 2^32 - 0.5` — portable pseudo-randomness
    * (the DuckDB oracle reproduces the planes exactly; no JVM RNG). */
  def hyperplanes(bits: Int, dims: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(bits) { p =>
      Array.tabulate(dims) { d =>
        md.reset()
        val hex = md.digest(s"hp$p:$d".getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex, 16) / 4294967296.0 - 0.5
      }
    }
  }

  /** Sign-bit LSH bucket of a double-array column: one bit per plane
    * (dot > 0), rendered as a bit-string. Vectors in the same bucket
    * are ANN candidates — the bucket join replaces the brute-force
    * cross product at scale (expected bucket size N / 2^bits). */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    concat(planes.toIndexedSeq.map(p =>
      when(dot(vec, typedLit(p.toSeq)) > 0, lit("1")).otherwise(lit("0"))): _*)

  /** LSH-bucketed top-k: probe only the query's bucket. */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              qid: String, cid: String, vecCol: String,
              bits: Int, dims: Int, k: Int): DataFrame = {
    val planes = hyperplanes(bits, dims)
    val c = corpus.select(col(cid).as("corpus_id"),
      col(vecCol).cast("array<double>").as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), planes))
    val q = queries.select(col(qid).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
      .withColumn("bucket", lshBucket(col("qv"), planes))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("corpus_id"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cos_sim", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cos_sim"))
  }

  /** Scalar int8 quantization of embedding vectors: codes are
    * floor(x·127/scale + 0.5) with scale = max|x| per vector — 4× the
    * storage density of float32, which at a 100 TB embedding table is
    * the difference between fitting the ANN working set in cluster
    * memory or not. `floor(+0.5)` instead of round(): no rounding-mode
    * ambiguity across engines. Callers must pass non-zero vectors — a
    * zero vector has no direction to quantize (and unit-normalizing one
    * already yields NaN upstream). */
  def quantizeScale(v: Column): Column =
    array_max(transform(v, x => abs(x)))

  def quantizeCodes(v: Column, scale: Column): Column =
    transform(v, x => floor(x * 127.0 / scale + 0.5).cast("int"))

  /** Reconstructed similarity of two quantized vectors (callers pass
    * codes of UNIT-NORMALIZED vectors so this approximates cosine):
    * (sa·sb/127²)·Σ qa·qb. The integer dot is exact in double (codes
    * ≤127, sums ≪2^53), so the score is bit-portable. */
  def quantizedSim(codesA: Column, codesB: Column,
                   scaleA: Column, scaleB: Column): Column =
    (scaleA * scaleB / lit(16129.0)) *
      dot(codesA.cast("array<double>"), codesB.cast("array<double>"))

  /** Top-k by reconstructed int8 similarity — [[bruteForceTopK]] over
    * the quantized representation (same broadcast-queries + per-query
    * window convention as the other top-k variants). */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame,
                    qid: String, cid: String, vecCol: String, k: Int): DataFrame = {
    def q8(df: DataFrame, id: String, outId: String): DataFrame =
      df.select(col(id).as(outId),
          unitNorm(col(vecCol).cast("array<double>")).as("u"))
        .withColumn("scale", quantizeScale(col("u")))
        .withColumn("codes", quantizeCodes(col("u"), col("scale")))
        .drop("u")
    val c = q8(corpus, cid, "corpus_id")
      .select(col("corpus_id"), col("scale").as("cs"), col("codes").as("cc"))
    val q = q8(queries, qid, "query_id")
      .select(col("query_id"), col("scale").as("qs"), col("codes").as("qc"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_q").desc, col("corpus_id"))
    c.join(broadcast(q), col("query_id") =!= col("corpus_id"))
      .withColumn("sim_q", round(
        quantizedSim(col("qc"), col("cc"), col("qs"), col("cs")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("sim_q"))
  }

  /** Embedding near-duplicate pairs within a blocking column (idA < idB,
    * cosine >= threshold). Blocking keeps the self-join from going
    * quadratic: pass a cluster/LSH-bucket column at scale.
    *
    * @param maxBlockRows >0 fails fast when a block exceeds this many
    *        rows (the O(block²) join would blow up — re-block through
    *        [[lshBucket]] or [[kmeansFit]]+[[ivfAssign]] clusters).
    * @param histogram a persisted (blk, n)
    *        [[ApproxDedup.blockHistogram]] covering `df` — the guard
    *        then reads the metadata-sized table instead of re-deriving
    *        the blocking expression over the corpus (refresh callers
    *        merge the landing batch in via
    *        [[ApproxDedup.updatedBlockHistogram]]). */
  def nearDupPairs(df: DataFrame, id: String, block: String, vecCol: String,
                   threshold: Double, maxBlockRows: Int = 0,
                   histogram: Option[DataFrame] = None): DataFrame = {
    histogram match {
      case Some(h) =>
        ApproxDedup.requireBoundedBlocksHist(h, maxBlockRows, "nearDupPairs")
      case None =>
        ApproxDedup.requireBoundedBlocks(df, block, maxBlockRows, "nearDupPairs")
    }
    // Pre-normalize per VECTOR so the per-pair work is one dot product.
    // (A nondeterministic barrier column to avoid the filter's pushdown
    // re-substitution measured SLOWER — it splits whole-stage codegen
    // and materializes both arrays per pair; cheapening the duplicated
    // expression beats preventing the duplication.)
    val v = df.select(col(id), col(block).as("blk"),
      unitNorm(col(vecCol).cast("array<double>")).as("v"))
    val a = v.select(col(id).as("id_a"), col("blk"), col("v").as("va"))
    val b = v.select(col(id).as("id_b"), col("blk"), col("v").as("vb"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", round(dot(col("va"), col("vb")), 6))
      .filter(col("cos_sim") >= threshold)
      .select(col("blk"), col("id_a"), col("id_b"), col("cos_sim"))
  }

  /** Cell-blocked kNN graph: every node's top-k nearest neighbors
    * WITHIN its IVF cell ([[ivfAssign]] output — "the [[nearDupPairs]]
    * block discipline, ranked"). This is the batch graph-construction
    * primitive behind SemDeDup-style cluster dedup, kNN-graph label
    * propagation, and graph-based diversity sampling: both sides are
    * the corpus, so NOTHING broadcasts — the self-join shuffles once
    * on the cell key and every pair stays cell-local, which is the
    * property that holds at 100 TB (candidate pairs scale with
    * Σ cell² rather than N², and the hot-cell guard fails fast when a
    * cell would break that bound). Recall relative to the exact graph
    * is the standard IVF trade: neighbors across a cell boundary are
    * unreachable by construction — raise nCentroids or use multiple
    * assignments for higher recall; the graph is deterministic either
    * way (rounded cosine + id tie-break, the [[bruteForceTopK]]
    * contract).
    *
    * `assigned` is (corpus_id, centroid_id, cv) — [[ivfAssign]] /
    * IvfIndex.assignments. Output: (src_id, rank, dst_id, cos_sim). */
  def knnGraph(assigned: DataFrame, k: Int,
               maxCellRows: Int = 0): DataFrame = {
    require(k >= 1, s"knnGraph needs k >= 1, got $k")
    ApproxDedup.requireBoundedBlocks(assigned, "centroid_id", maxCellRows,
      "knnGraph")
    val a = assigned.select(col("corpus_id").as("src_id"),
      col("centroid_id"), col("cv").as("va"))
    val b = assigned.select(col("corpus_id").as("dst_id"),
      col("centroid_id"), col("cv").as("vb"))
    val w = Window.partitionBy(col("src_id"))
      .orderBy(col("cos_sim").desc, col("dst_id"))
    a.join(b, Seq("centroid_id"))
      .filter(col("src_id") =!= col("dst_id"))
      .withColumn("cos_sim", round(cosine(col("va"), col("vb")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("src_id"), col("rank"), col("dst_id"), col("cos_sim"))
  }

  /** Incremental [[knnGraph]] maintenance — the ledger-refresh pattern
    * (q104/q108/q122/q152) applied to the graph family: a landing
    * batch assigned to the FROZEN centroids touches only its own
    * cells, and cells are independent by construction, so the refresh
    * recomputes the graph for TOUCHED cells only (old ∪ batch members
    * of those cells) and keeps every untouched cell's ledger rows
    * verbatim. Equals rebuilding the whole graph from scratch
    * byte-for-byte (KnnGraphSpec pins it) at the cost of the touched
    * cells — at 100 TB a daily batch touches a sliver of the cell
    * space and the ledger carries the rest. */
  def knnGraphRefresh(oldAssigned: DataFrame, oldGraph: DataFrame,
                      batchAssigned: DataFrame, k: Int,
                      maxCellRows: Int = 0): DataFrame = {
    val touched = batchAssigned.select(col("centroid_id")).distinct()
    val all = oldAssigned.unionByName(batchAssigned)
    val recomputed = knnGraph(
      all.join(broadcast(touched), Seq("centroid_id"), "leftsemi"),
      k, maxCellRows)
    val kept = oldGraph
      .join(oldAssigned.select(col("corpus_id").as("src_id"),
        col("centroid_id")), Seq("src_id"))
      .join(broadcast(touched), Seq("centroid_id"), "left_anti")
      .select(col("src_id"), col("rank"), col("dst_id"), col("cos_sim"))
    kept.unionByName(recomputed)
  }

  /** Mutual-kNN edges from a [[knnGraph]]: undirected (id_a < id_b)
    * edges kept only when EACH endpoint ranks the other in its own
    * top-k — the standard symmetrization that strips hub nodes'
    * one-way arcs before clustering (a near-dup cluster wants mutual
    * affinity; a hub's fans do not). A self-join of the k·N edge list
    * on the reversed pair — edge-table sized, the corpus is never
    * re-read. */
  def mutualKnnEdges(graph: DataFrame): DataFrame =
    graph.select(col("src_id"), col("dst_id"), col("cos_sim"))
      .filter(col("src_id") < col("dst_id"))
      .join(graph.select(col("dst_id").as("src_id"),
        col("src_id").as("dst_id")), Seq("src_id", "dst_id"))
      .select(col("src_id").as("id_a"), col("dst_id").as("id_b"),
        col("cos_sim"))

  /** Per-group mean embeddings (class centroids / cluster prototype
    * export — the read side of every "embed the group" downstream:
    * label prototypes for classification, cluster summaries for
    * drift monitoring). One posexplode + map-side-combined (group,
    * dim) aggregation; sums run in the same fixed-point bigint
    * arithmetic as [[kmeansFit]]'s update step, so the means are
    * order-independent and bit-replayable. Output is LONG (one row
    * per (group, dim), dim 0-based) — array reassembly is a
    * `sort_array(collect_list(...))` away when a consumer wants
    * vectors, but rows keep the oracle surface exact.
    *
    * The mean stays in µ-unit integers via floor(sx/n), NOT round(x,
    * 6): a mean landing exactly on a half-µ boundary splits engines
    * (Spark rounds half-up, DuckDB half-to-even — observed on real
    * data), while floor has no halfway case and the double division
    * of two bounded ints is exact far beyond the 1/n gap to the next
    * integer. */
  def groupCentroids(df: DataFrame, group: String, vecCol: String): DataFrame =
    df.select(col(group).as("g"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "x")))
      .groupBy(col("g"), col("dim"))
      .agg(sum(floor(col("x") * 1e6).cast("bigint")).as("sx"),
        count(lit(1)).as("n"))
      .select(col("g").as(group), col("dim").cast("bigint").as("dim"),
        floor(col("sx") / col("n").cast("double")).cast("bigint").as("centv_u"),
        col("n"))

  /** Recall@k of an approximate top-k result against the exact one —
    * the ANN quality gate (every index deploy decides nprobe/bits by
    * exactly this curve). Both inputs are (query_id, rank, corpus_id)
    * top-k tables; output is per-query hits, the denominator actually
    * returned by the exact scan, and recall in exact ppm. The join is
    * per-(query, corpus) on two k-bounded tables — negligible next to
    * the searches themselves. */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    // both sides are k·|Q|-bounded BY CONTRACT (top-k tables), so the
    // joins broadcast explicitly — post-window size stats are opaque
    // to the planner, which otherwise falls back to sort-merge here
    val hits = exact.select(col("query_id"), col("corpus_id"))
      .join(broadcast(approx.select(col("query_id"), col("corpus_id"))),
        Seq("query_id", "corpus_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
    exact.groupBy(col("query_id")).agg(count(lit(1)).as("k_exact"))
      .join(broadcast(hits), Seq("query_id"), "left")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .withColumn("recall_ppm", expr("n_hit * 1000000 div k_exact"))
  }

  // ------------------------------------------------ product quantization

  /** Product-quantization codebooks (Jégou/Douze/Schmid, TPAMI 2011):
    * split d dims into `m` subspaces of `dsub`, train `ksub` centroids
    * per subspace by the same deterministic Lloyd's as the IVF index
    * ([[kmeansFit]] on the sliced subvectors — cosine assignment,
    * fixed-point mean update, k-lowest-id init; a DuckDB oracle replays
    * each subspace chain exactly). Codes compress a vector to `m`
    * small ints — at 100 TB the difference between scanning raw floats
    * (d·4 bytes/vector) and scanning codes (m bytes): ~d·4/m× less I/O
    * on the ANN read path.
    * @return codebooks(s)(c) = centroid c of subspace s (dsub doubles) */
  def pqFit(corpus: DataFrame, id: String, vecCol: String,
            m: Int, dsub: Int, ksub: Int, iters: Int): Array[Array[Array[Double]]] =
    Array.tabulate(m) { s =>
      kmeansFit(
        corpus.select(col(id).as("sid"),
          slice(col(vecCol).cast("array<double>"), s * dsub + 1, dsub).as("sv")),
        "sid", "sv", ksub, iters)
    }

  /** Codebooks as a (s, centroid_id, centv) DataFrame — m·ksub rows,
    * broadcast by every consumer. */
  def pqCodebookDf(spark: org.apache.spark.sql.SparkSession,
                   codebooks: Array[Array[Array[Double]]]): DataFrame = {
    import spark.implicits._
    codebooks.zipWithIndex.flatMap { case (cents, s) =>
      cents.zipWithIndex.map { case (c, i) => (s, i.toLong, c.toSeq) }
    }.toSeq.toDF("s", "centroid_id", "centv")
  }

  /** Encode the corpus: one row per (id, subspace, code), code = the
    * subspace centroid with max rounded cosine (ties → smallest id,
    * [[ivfAssign]]'s rule). ONE corpus pass regardless of m: slices
    * posexplode to (id, s, subvector), the m·ksub codebook broadcasts,
    * and the argmax is a map-side-combined max_by — two shuffles total
    * (the agg, keyed (id, s)), independent of m. */
  def pqEncode(corpus: DataFrame, id: String, vecCol: String,
               m: Int, dsub: Int, codebook: DataFrame): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val slices = array((0 until m).map(s => slice(v, s * dsub + 1, dsub)): _*)
    corpus.select(col(id).as("corpus_id"), posexplode(slices).as(Seq("s", "sv")))
      .join(broadcast(codebook), Seq("s"))
      .withColumn("sim", round(cosine(col("sv"), col("centv")), 6))
      .groupBy(col("corpus_id"), col("s"))
      .agg(max_by(col("centroid_id"),
        struct(col("sim"),
          (-col("centroid_id").cast("bigint")).as("nid"))).as("code"))
  }

  /** A trained product-quantization index as two TABLES — `codebook`
    * (s, centroid_id, centv): the m·ksub subspace centroids;
    * `codes` (corpus_id, s, code): m small ints per corpus vector, the
    * 4-16× compressed scan representation. Built once
    * ([[pqIndexBuild]]), persisted, served many times
    * ([[pqTopKFromIndex]]) — at 100 TB re-deriving the codebook (m
    * k-means runs) or the codes (a full corpus encode) per query is
    * the difference between an index and a scan. */
  final case class PqIndex(codebook: DataFrame, codes: DataFrame)

  /** Train the codebooks + encode the corpus once, producing the
    * persistable [[PqIndex]]. */
  def pqIndexBuild(corpus: DataFrame, id: String, vecCol: String,
                   m: Int, dsub: Int, ksub: Int, iters: Int): PqIndex = {
    val spark = corpus.sparkSession
    val codebook = pqCodebookDf(spark, pqFit(corpus, id, vecCol, m, dsub, ksub, iters))
    PqIndex(codebook, pqEncode(corpus, id, vecCol, m, dsub, codebook))
  }

  /** Incremental PQ index refresh — [[ivfIndexUpsert]]'s sibling: the
    * landing batch is ENCODED against the index's frozen codebook (one
    * broadcast join + per-subspace argmax — no codebook retraining, no
    * corpus re-encode) and its code rows append to `codes`. Refresh
    * cost is O(batch · m · ksub), never O(corpus). */
  def pqIndexUpsert(index: PqIndex, newVectors: DataFrame,
                    id: String, vecCol: String, m: Int, dsub: Int): PqIndex = {
    // idempotent on replay, [[ivfIndexUpsert]]'s rule
    val novel = newVectors.join(
      index.codes.select(col("corpus_id").as(id)).distinct(),
      Seq(id), "left_anti")
    PqIndex(index.codebook, index.codes.unionByName(
      pqEncode(novel, id, vecCol, m, dsub, index.codebook)))
  }

  /** PQ/ADC top-k over a PERSISTED index: the plan reads the codebook
    * (broadcast, m·ksub rows) and the codes table only — no k-means
    * iteration jobs, no corpus encode, no raw corpus vectors at all
    * (NoRetrainSpec pins the plan). Same ADC arithmetic as [[pqTopK]]
    * (fixed-point LUT, integer-exact sums), so an index built by
    * [[pqIndexBuild]] reproduces it row-for-row. */
  def pqTopKFromIndex(queries: DataFrame, index: PqIndex, qid: String,
                      vecCol: String, m: Int, dsub: Int, k: Int): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val slices = array((0 until m).map(s => slice(v, s * dsub + 1, dsub)): _*)
    val lut = queries
      .select(col(qid).as("query_id"), posexplode(slices).as(Seq("s", "qsv")))
      .join(broadcast(index.codebook), Seq("s"))
      .select(col("query_id"), col("s"), col("centroid_id").as("code"),
        floor(dot(col("qsv"), col("centv")) * 1e6).cast("bigint").as("pd"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_fp").desc, col("corpus_id"))
    index.codes.join(broadcast(lut), Seq("s", "code"))
      .groupBy(col("query_id"), col("corpus_id"))
      .agg(sum(col("pd")).as("score_fp"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("score_fp"))
  }

  // ------------------------------------------- IVF-PQ (cells + codes)

  /** The combined coarse-cell + product-quantization index — IVFADC
    * (Jégou/Douze/Schmid, TPAMI 2011 §IV; the layout FAISS calls
    * IVFPQ), here in its non-residual form: codes quantize the RAW
    * vectors, so the cell table and the codebook stay independently
    * frozen and a landing batch refreshes both in one pass. Three
    * TABLES —
    *  - `centroids` (centroid_id, centv): the k coarse cells;
    *  - `codebook` (s, centroid_id, centv): the m·ksub PQ subspace
    *    centroids;
    *  - `codes` (corpus_id, centroid_id, s, code): the posting lists —
    *    m small ints per vector stored WITH its cell; raw vectors
    *    never appear on the serve path at all.
    * This is the 100 TB serving layout the IVF and PQ families each
    * provide half of: a query reads nprobe/k of the posting lists
    * ([[IvfIndex]]'s pruning) and m bytes per candidate instead of d·4
    * ([[PqIndex]]'s compression) — I/O shrinks by BOTH factors,
    * (nprobe/k)·(m/(4d)) of a brute scan (2/8 · 4/256 = 1/256 at the
    * fixture's parameters). Partition `codes` by centroid_id on write
    * and the cell pruning becomes partition pruning on the scan. */
  final case class IvfPqIndex(centroids: DataFrame, codebook: DataFrame,
                              codes: DataFrame)

  /** Train the coarse cells ([[kmeansFit]]) + the PQ codebooks
    * ([[pqFit]]) + encode-and-cell the corpus once, producing the
    * persistable [[IvfPqIndex]]. Build-time shape: the two trainings
    * scan the corpus iters (resp. pqIters) times; the final pass is
    * one assignment cross-join + one encode (two shuffles) joined on
    * the id — all corpus-sized work happens HERE, never on serve. */
  def ivfPqIndexBuild(corpus: DataFrame, id: String, vecCol: String,
                      k: Int, iters: Int,
                      m: Int, dsub: Int, ksub: Int, pqIters: Int): IvfPqIndex = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = centroidTable(spark, kmeansFit(corpus, id, vecCol, k, iters))
    val codebook = pqCodebookDf(spark, pqFit(corpus, id, vecCol, m, dsub, ksub, pqIters))
    IvfPqIndex(cents, codebook,
      ivfPqCode(corpus, id, vecCol, m, dsub, cents, codebook))
  }

  /** Cell-assign + PQ-encode a batch against FROZEN centroids and
    * codebook → `codes`-shaped rows (corpus_id, centroid_id, s, code).
    * One assignment (broadcast cross-join + argmax) + one encode
    * (broadcast codebook join + per-subspace argmax) + one id-keyed
    * equi-join — O(batch), never O(corpus). Public: the streaming
    * maintainer ([[graft.streaming.IvfPqStream]]) lands exactly these
    * rows per micro-batch. */
  def ivfPqCode(batch: DataFrame, id: String, vecCol: String,
                        m: Int, dsub: Int,
                        centroids: DataFrame, codebook: DataFrame): DataFrame = {
    val cells = ivfAssign(batch,
        centroids.select(col("centroid_id"), col("centv").as(vecCol)),
        id, "centroid_id", vecCol)
      .select(col("corpus_id"), col("centroid_id"))
    pqEncode(batch, id, vecCol, m, dsub, codebook)
      .join(cells, Seq("corpus_id"))
      .select(col("corpus_id"), col("centroid_id"), col("s"), col("code"))
  }

  /** Incremental IVF-PQ refresh — [[ivfIndexUpsert]] and
    * [[pqIndexUpsert]] in one frozen-everything pass: the landing
    * batch is cell-assigned AND encoded against the index's frozen
    * tables, and its code rows append to the posting lists. Idempotent
    * on replay (an id already in `codes` is skipped — queue redelivery
    * is the normal case). Re-train cadence stays an offline decision
    * ([[driftReport]]); refresh cost is O(batch·(k + m·ksub)). */
  def ivfPqIndexUpsert(index: IvfPqIndex, newVectors: DataFrame,
                       id: String, vecCol: String, m: Int, dsub: Int): IvfPqIndex = {
    val novel = newVectors.join(
      index.codes.select(col("corpus_id").as(id)).distinct(), Seq(id), "left_anti")
    IvfPqIndex(index.centroids, index.codebook,
      index.codes
        .select(col("corpus_id"), col("centroid_id"), col("s"), col("code"))
        .unionByName(
          ivfPqCode(novel, id, vecCol, m, dsub, index.centroids, index.codebook)))
  }

  /** IVF-PQ/ADC top-k over a PERSISTED index: probe the `nprobe`
    * nearest cells ([[ivfTopKFromIndex]]'s probe ranking — rounded
    * cosine desc, centroid id asc), then score ONLY those cells'
    * posting lists by the same fixed-point ADC LUT as
    * [[pqTopKFromIndex]]. The plan touches the three index tables
    * only — no k-means jobs, no corpus encode, no raw corpus vectors;
    * with nprobe=k the cell filter admits everything and the result
    * equals [[pqTopKFromIndex]] row-for-row (IvfPqSpec pins both).
    * Output rank: (score_fp desc, corpus_id asc). */
  def ivfPqTopKFromIndex(queries: DataFrame, index: IvfPqIndex, qid: String,
                         vecCol: String, m: Int, dsub: Int,
                         k: Int, nprobe: Int): DataFrame = {
    require(nprobe > 0, "nprobe must be positive")
    val q = queries.select(col(qid).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val cent = index.centroids.select(col("centroid_id"),
      col("centv").cast("array<double>").as("centv"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cent_sim").desc, col("centroid_id"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("cent_sim", round(cosine(col("qv"), col("centv")), 6))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("centroid_id"))
    val v = col("qv")
    val slices = array((0 until m).map(s0 => slice(v, s0 * dsub + 1, dsub)): _*)
    val lut = q.select(col("query_id"), posexplode(slices).as(Seq("s", "qsv")))
      .join(broadcast(index.codebook), Seq("s"))
      .select(col("query_id"), col("s"), col("centroid_id").as("code"),
        floor(dot(col("qsv"), col("centv")) * 1e6).cast("bigint").as("pd"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_fp").desc, col("corpus_id"))
    index.codes
      .join(broadcast(probes), Seq("centroid_id"))
      .join(broadcast(lut), Seq("query_id", "s", "code"))
      .groupBy(col("query_id"), col("corpus_id"))
      .agg(sum(col("pd")).as("score_fp"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("score_fp"))
  }

  /** Two-stage IVF-PQ serve: the compressed ADC pass shortlists
    * `rerank` candidates per query ([[ivfPqTopKFromIndex]] — cells +
    * codes, raw vectors untouched), then ONLY that shortlist is re-scored
    * with exact cosine against the raw vectors — the refinement every
    * production ANN deployment runs, because PQ's quantization error
    * can swap near-tied neighbors. The exact pass joins |Q|·rerank ids
    * against the vector table — a k-bounded point lookup, NOT a scan
    * (at 100 TB: serve it from a key-pruned store, e.g. the DSv2
    * partitioned store with key pushdown, or any id-bucketed table; at
    * fixture scale an equi-join that AQE broadcasts). Output rank:
    * (cos_sim desc, corpus_id asc), [[bruteForceTopK]]'s contract —
    * with rerank >= the corpus this EQUALS brute force row-for-row
    * (IvfPqRerankSpec pins it). */
  def ivfPqTopKRerank(queries: DataFrame, index: IvfPqIndex,
                      vectors: DataFrame, qid: String, cid: String,
                      vecCol: String, m: Int, dsub: Int,
                      k: Int, nprobe: Int, rerank: Int): DataFrame = {
    require(rerank >= k, "the shortlist must be at least k deep")
    val shortlist = ivfPqTopKFromIndex(queries, index, qid, vecCol,
        m, dsub, rerank, nprobe)
      .select(col("query_id"), col("corpus_id"))
    val q = queries.select(col(qid).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("corpus_id"))
    shortlist
      .join(vectors.select(col(cid).as("corpus_id"),
        col(vecCol).cast("array<double>").as("cv")), Seq("corpus_id"))
      .join(q, Seq("query_id"))
      .withColumn("cos_sim", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cos_sim"))
  }

  /** PQ top-k by asymmetric distance computation: the query stays
    * exact, the corpus is its codes. Approximate inner product
    * dot(q, v) ≈ Σ_s dot(q_s, centroid(code_s)) — the per-(query,
    * subspace, centroid) partial dots form a lookup table of
    * |Q|·m·ksub FIXED-POINT entries (floor(dot·1e6) bigint: the
    * per-pair sum is integer-exact, so no double-summation order can
    * split the engines). The corpus side never touches raw vectors:
    * codes join the broadcast LUT and sum — the scan reads m small
    * ints per vector instead of d floats.
    * Output rank: (score_fp desc, corpus_id asc); score_fp = the
    * fixed-point approximate dot (µ units). */
  def pqTopK(queries: DataFrame, corpus: DataFrame, qid: String, cid: String,
             vecCol: String, codebooks: Array[Array[Array[Double]]],
             m: Int, dsub: Int, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    val codebook = pqCodebookDf(spark, codebooks)
    val codes = pqEncode(corpus, cid, vecCol, m, dsub, codebook)
    // one implementation of the ADC arithmetic: the in-query form IS
    // the FromIndex form over an index built in the same plan
    pqTopKFromIndex(queries, PqIndex(codebook, codes), qid, vecCol, m, dsub, k)
  }
}
