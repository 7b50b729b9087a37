package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005), the point-frequency
  * complement to [[FreqItems]]' Misra-Gries: MG answers "which items
  * are frequent" with ≤k counters but cannot answer "how often did THIS
  * key occur" for a key it evicted; the CMS answers point queries for
  * EVERY key with a fixed d×w counter grid whose estimates are upper
  * bounds (true ≤ est ≤ true + ε·n w.h.p., ε = e/w). Grid cells are
  * plain sums, so sketches merge by addition — per-file / per-snapshot
  * grids persist as ledger rows and roll up without rescanning, and
  * the sketch build itself is a map-side-combined aggregation whose
  * shuffle carries at most d·w rows per partition per group no matter
  * how many input rows or distinct keys (the 100 TB posture: the long
  * tail never crosses the wire).
  *
  * Bit-replayable by construction:
  *  - ONE md5-derived 60-bit hash per key ([[Cardinality.hashOf]] —
  *    the engine's one hash definition), split into two 30-bit halves
  *    combined Kirsch–Mitzenmacher style: row i probes column
  *    (h1 + i·h2) mod w — integer ops any SQL engine replays;
  *  - counters are exact BIGINT sums; the point estimate is an exact
  *    MIN over d looked-up counters (missing cell = 0).
  *
  * Determinism contract: the grid is a pure aggregation — independent
  * of partitioning and merge order — so shard-merge equals the
  * whole-corpus sketch bit-for-bit, and estimates are reproducible
  * across engines (CmSketchSpec pins both against a driver-side
  * reference). */
object CmSketch {

  /** Default grid: 4 rows × 1024 columns → ε ≈ e/1024 ≈ 0.27% of the
    * stream total, δ = e⁻⁴ ≈ 1.8%. */
  val DefaultDepth = 4
  val DefaultWidth = 1024

  private val HalfBits = 30
  private val Half = 1L << HalfBits // 2^30 splits the 60-bit hash

  /** The row-i probe column for a key's 60-bit hash value. */
  private def colOf(hv: Column, i: Int, width: Int): Column =
    pmod(pmod(hv, lit(Half)) + lit(i.toLong) * shiftright(hv, HalfBits),
      lit(width.toLong)).cast("int")

  private def requireGrid(depth: Int, width: Int): Unit = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    // keep i·h2 + h1 < 2^34·16 far under 2^63 — always true for the
    // 30-bit halves and bounded depth, recorded here as the contract
  }

  /** Per-group CMS grid of `key` occurrences weighted by `weight`
    * (default 1 per row): (groupCols..., d, c, cnt) with ≤ depth·width
    * rows per group. Null keys are dropped (COUNT semantics); null
    * weights count 0. */
  def sketch(df: DataFrame, groupCols: Seq[String], key: Column,
             weight: Column = lit(1L), depth: Int = DefaultDepth,
             width: Int = DefaultWidth): DataFrame = {
    requireGrid(depth, width)
    val hv = ThetaSketch.hash60(key)
    val rows = array((0 until depth).map(i =>
      struct(lit(i).as("d"), colOf(col("_hv"), i, width).as("c"))): _*)
    df.filter(key.isNotNull)
      .select(groupCols.map(col) :+ hv.as("_hv")
        :+ coalesce(weight.cast("bigint"), lit(0L)).as("_w"): _*)
      .select(groupCols.map(col) :+ explode(rows).as("_rc") :+ col("_w"): _*)
      .groupBy((groupCols :+ "_rc.d" :+ "_rc.c").map(col): _*)
      .agg(sum(col("_w")).as("cnt"))
  }

  /** Merge grids (shape of [[sketch]] output) by cell-wise addition —
    * the ledger-refresh primitive. */
  def mergeSketches(df: DataFrame, groupCols: Seq[String]): DataFrame =
    df.groupBy((groupCols :+ "d" :+ "c").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Point estimates for a probe table (groupCols..., `probeKey`):
    * appends `est` = min over the d probed counters (0 when a cell was
    * never touched). The probe side fans out ×depth and joins the
    * model-sized grid — broadcast-friendly by construction. */
  def pointEstimate(sk: DataFrame, probes: DataFrame, groupCols: Seq[String],
                    probeKey: Column, depth: Int = DefaultDepth,
                    width: Int = DefaultWidth): DataFrame = {
    requireGrid(depth, width)
    val hv = ThetaSketch.hash60(probeKey)
    val rows = array((0 until depth).map(i =>
      struct(lit(i).as("d"), colOf(col("_hv"), i, width).as("c"))): _*)
    val coords = probes.withColumn("_hv", hv)
      .select(probes.columns.map(col) :+ explode(rows).as("_rc"): _*)
      .select(probes.columns.map(col) :+ col("_rc.d").as("d")
        :+ col("_rc.c").as("c"): _*)
    coords.join(sk, (groupCols :+ "d" :+ "c"), "left")
      .groupBy(probes.columns.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Equi-join SIZE estimation from two grids (Cormode & Muthukrishnan
    * 2005 §4.2 — the inner-product estimator): for each row i,
    * Σ_c A_i[c]·B_i[c] upper-bounds the true join cardinality
    * |{(a,b) : key_a = key_b}| (every true match lands in the same
    * cell; collisions only add), and the MIN over rows is the
    * estimate. This is the planner-statistics primitive: "how big
    * would this join be" answered from two d·w-cell ledger rows
    * WITHOUT touching either table — the sketch-world sibling of the
    * DSv2 store's `estimateStatistics`. Exact Decimal arithmetic (the
    * products reach nA·nB — far past a long at fleet row counts);
    * grids must share (depth, width) and the engine-wide hash, which
    * [[sketch]] guarantees by construction.
    *
    * Input grids must be single-group slices (the usual serving
    * shape); output is one row: (est). */
  def joinSizeEstimate(skA: DataFrame, skB: DataFrame,
                       depth: Int = DefaultDepth): DataFrame =
    joinSizeEstimateBy(skA, skB, Nil, depth)

  /** Per-group [[joinSizeEstimate]]: grids carry `groupCols`, the
    * estimate joins them per group (both inputs must share the
    * grouping). With `skA eq skB` per group this is the F2 /
    * SELF-join-size estimate Σ cnt² — the key-concentration statistic
    * that tells a 100 TB planner which groups need salting BEFORE any
    * shuffle is attempted ([[Salting]]'s decision input, from ledger
    * rows alone). */
  def joinSizeEstimateBy(skA: DataFrame, skB: DataFrame,
                         groupCols: Seq[String],
                         depth: Int = DefaultDepth): DataFrame = {
    val spark = skA.sparkSession
    val keys = groupCols :+ "d" :+ "c"
    val a = skA.select(keys.map(col) :+
      col("cnt").cast("decimal(38,0)").as("cnt_a"): _*)
    val b = skB.select(keys.map(col) :+
      col("cnt").cast("decimal(38,0)").as("cnt_b"): _*)
    val perRow = a.join(b, keys)
      .groupBy((groupCols :+ "d").map(col): _*)
      .agg(sum((col("cnt_a") * col("cnt_b")).cast("decimal(38,0)"))
        .as("ip"))
    // a grid row with NO shared cells has inner product 0 — it must
    // drive the min to 0, not vanish from it
    val spine0 = spark.range(depth).select(col("id").cast("int").as("d"))
    val spine =
      if (groupCols.isEmpty) spine0
      else skA.select(groupCols.map(col): _*).distinct().crossJoin(spine0)
    spine.join(perRow, groupCols :+ "d", "left")
      .groupBy(groupCols.map(col): _*)
      .agg(min(coalesce(col("ip"), lit(0).cast("decimal(38,0)")))
        .as("est"))
  }

  // ---------------- driver-side mirror (reference checks / streaming)

  /** The row-i probe column for a key, JVM twin of the plan
    * expressions. */
  def colOfLong(key: String, i: Int, width: Int): Int = {
    val hv = Cardinality.hashLong(key)
    (((hv % Half) + i.toLong * (hv >>> HalfBits)) % width).toInt
  }
}
