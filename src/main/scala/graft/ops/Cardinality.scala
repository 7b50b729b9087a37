package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches — HyperLogLog (Flajolet et al.
  * 2007, with the small-range linear-counting correction from
  * Heule et al. 2013's practical analysis), built so every step is
  * bit-replayable by any SQL engine:
  *
  *  - the hash is the first 15 hex chars of md5 (60 bits — portable,
  *    unlike JVM hashCode);
  *  - rho (leading-zero rank) comes from the exact binary-string
  *    length of the suffix (`bin()` — integer/string ops only, no
  *    floating log2 whose last ulp differs across libm builds);
  *  - the raw estimate alpha·m²/S is evaluated in EXACT integer
  *    arithmetic: S is kept as the integer sum of 2^(51-M[j])
  *    (register max rho ≤ 51 and m = 1024 bound it under 2^61, inside
  *    a long), and the division is a literal-numerator integer
  *    quotient — Decimal remainder/divide on the Spark side, HUGEINT
  *    `//` in a SQL oracle;
  *  - the linear-counting branch m·ln(m/V) is transcendental, so it is
  *    precomputed ONCE into a 1024-entry integer lookup table
  *    ([[lcTable]]) that both the Spark plan and the SQL oracle embed
  *    as literals — no engine re-derives a logarithm.
  *
  * The register table (group, bucket, m) IS the sketch state: merging
  * shards is a union + max — associative, commutative, idempotent —
  * so partial sketches roll up across files, days, or executors
  * without rescanning (the point of a sketch at 100 TB: the
  * per-partition state is 1024 small ints regardless of input size).
  * Spark's own approx_count_distinct carries the same HLL++ idea but
  * its estimate is not replayable outside Spark; this one is.
  */
object Cardinality {

  /** Register count 2^p. p=10 → 1024 registers, standard error
    * 1.04/√m ≈ 3.3%. */
  val P = 10
  val M: Int = 1 << P
  /** Hash width in bits (15 hex chars of md5). */
  val HashBits = 60
  /** Suffix width: rho ranges over 1..SuffixBits+1. */
  val SuffixBits: Int = HashBits - P // 50

  /** alpha_1024 = 0.7213/(1 + 1.079/1024) as the exact rational
    * 72054135 / 1e8 — both engines use the same integer pair. */
  val AlphaNum = 72054135L
  val AlphaDen = 100000000L

  /** The raw-estimate numerator alpha_num · m² · 2^51 as an exact
    * integer (the denominator is alpha_den · S_scaled):
    * estimate_raw = Numerator // (AlphaDen · S). 30 digits — carried
    * as Decimal(38,0) in Spark, HUGEINT in DuckDB. */
  val Numerator: BigInt = BigInt(AlphaNum) * BigInt(M) * BigInt(M) *
    (BigInt(1) << (SuffixBits + 1))

  /** Raw estimate ≤ 5/2·m with empty registers present → the
    * linear-counting regime (standard HLL switch). */
  val LcThreshold: Long = 5L * M / 2

  /** Linear-counting estimates floor(m·ln(m/V)) for V = 1..m, computed
    * once here and embedded as LITERALS in both engines (ln is the one
    * non-algebraic step in HLL — recomputing it per-engine risks a
    * last-ulp split). Index V-1. */
  val lcTable: Array[Long] =
    (1 to M).map(v => math.floor(M * math.log(M.toDouble / v)).toLong).toArray

  /** The mergeable sketch state: one row per (group, occupied bucket)
    * with the register value m = max rho. Size ≤ m rows per group
    * regardless of input rows. `key` is hashed via md5 of its string
    * rendering — pass a canonical rendering for non-string keys. */
  /** The 60-bit md5-derived hash of a key's canonical string form —
    * the composable chain, kept as the executable specification
    * (HllKernelSpec pins the `hll_bucket_rho` kernel to it; the SQL
    * oracles replay exactly this form). */
  private[graft] def hashOf(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 15),
      16, 10).cast("bigint")

  private[graft] def bucketOf(hv: Column): Column = shiftright(hv, SuffixBits)

  private[graft] def rhoOf(hv: Column): Column = {
    val w = hv % (1L << SuffixBits)
    when(w === 0, lit(SuffixBits + 1))
      .otherwise(lit(SuffixBits + 1) - length(bin(w)))
      .cast("int")
  }

  /** The register coordinate via the native kernel
    * ([[graft.plans.HllBucketRho]] — one digest pass, no hex/bin
    * string round-trips), packed bucket·64 + rho. */
  private def packedOf(key: Column): Column =
    call_function("hll_bucket_rho", key.cast("string"))

  def sketch(df: DataFrame, groupCols: Seq[String], key: Column): DataFrame = {
    val packed = packedOf(key)
    // null keys don't count toward a distinct count (SQL
    // COUNT(DISTINCT) semantics) — and the streaming twin
    // (StreamDistinct) skips them per-row, so dropping them here is
    // what keeps stream == batch exact on null-bearing data
    df.filter(key.isNotNull)
      .select(groupCols.map(col) :+ shiftright(packed, 6).as("bucket")
        :+ packed.bitwiseAND(63).cast("int").as("rho"): _*)
      .groupBy(groupCols.head, groupCols.tail :+ "bucket": _*)
      .agg(max("rho").as("m"))
  }

  /** Merge sketch states: union + max per register. Exact — merging
    * per-shard sketches equals sketching the union (max is
    * associative/commutative/idempotent), the property the
    * CardinalitySpec pins bit-for-bit. */
  def merge(sketches: Seq[DataFrame], groupCols: Seq[String]): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy(groupCols.head, groupCols.tail :+ "bucket": _*)
      .agg(max("m").as("m"))

  /** Estimate from sketch state: (group..., zero_regs, estimate).
    * Integer-exact: S = Σ 2^(51-M[j]) over occupied registers plus
    * 2^51 per empty register; raw = Numerator // (AlphaDen·S) via
    * exact Decimal remainder-subtract-divide; the linear-counting
    * branch reads [[lcTable]] through a broadcast 1024-row lookup. */
  def estimate(sk: DataFrame, groupCols: Seq[String]): DataFrame = {
    val spark = sk.sparkSession
    import spark.implicits._
    val shift = SuffixBits + 1 // empty register contributes 2^(shift)
    val grouped = sk.groupBy(groupCols.head, groupCols.tail: _*)
      .agg(
        // shiftleft's bit-count arg is Column-typed only in SQL form
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $shift - m)")).as("s_occ"),
        count(lit(1)).as("occupied"))
      .withColumn("zero_regs", lit(M.toLong) - col("occupied"))
      .withColumn("s_scaled",
        col("s_occ") + col("zero_regs") * (1L << shift))
    // estimate_raw = Numerator // (AlphaDen * s_scaled), exactly:
    // num and den as Decimal(38,0); subtract the remainder before
    // dividing so the quotient is an exact integer (decimal division
    // of an exact-integer ratio rounds to itself at any scale).
    val num = lit(new java.math.BigDecimal(Numerator.bigInteger))
    val den = (col("s_scaled").cast("decimal(38,0)") * lit(AlphaDen))
      .cast("decimal(38,0)")
    val raw = ((num - (num % den)) / den).cast("bigint")
    val lc = lcTable.zipWithIndex
      .map { case (est, i) => (i + 1L, est) }.toSeq
      .toDF("zero_regs", "lc_est")
    grouped.withColumn("estimate_raw", raw)
      .join(broadcast(lc), Seq("zero_regs"), "left")
      .withColumn("estimate",
        when(col("zero_regs") > 0 && col("estimate_raw") <= LcThreshold,
          col("lc_est")).otherwise(col("estimate_raw")))
      .select(groupCols.map(col) :+ col("zero_regs") :+
        col("estimate").cast("bigint").as("estimate"): _*)
  }

  /** sketch → estimate in one call (per-group approximate distinct
    * count of `key`). */
  def approxDistinct(df: DataFrame, groupCols: Seq[String],
                     key: Column): DataFrame =
    estimate(sketch(df, groupCols, key), groupCols)

  // ------------- JVM-side mirror of the plan expressions, for stateful
  // streaming operators that fold events into registers per-row (and
  // for driver-side reference checks). Each function computes the SAME
  // value its Column twin renders in a plan or a SQL oracle.

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue: java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** md5 → first 15 hex chars → 60-bit long, the JVM twin of the
    * plan-side hash. Hot path for the per-event streaming fold AND the
    * batch sketch kernel ([[graft.plans.HllBucketRho]]): reads the
    * first 8 digest bytes big-endian and drops the low nibble (= the
    * 16th hex char) — no hex-string round-trip, thread-local digest
    * instance. */
  def hashLong(key: String): Long = hashLongBytes(key.getBytes("UTF-8"))

  /** [[hashLong]] over pre-encoded UTF-8 bytes (the kernel passes
    * UTF8String bytes straight through — no String allocation). */
  def hashLongBytes(key: Array[Byte]): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(key)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }

  def bucketOfLong(hv: Long): Int = (hv >>> SuffixBits).toInt

  def rhoOfLong(hv: Long): Int = {
    val w = hv & ((1L << SuffixBits) - 1)
    if (w == 0) SuffixBits + 1
    else SuffixBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
  }

  /** (zero_regs, estimate) from a raw register array (index = bucket,
    * value = max rho, 0 = empty) — the same integers [[estimate]]
    * computes in a plan: exact BigInt raw quotient, shared lcTable for
    * the linear-counting branch. */
  def estimateRegisters(regs: Array[Byte]): (Long, Long) = {
    require(regs.length == M, s"expected $M registers, got ${regs.length}")
    var zero = 0L
    var s = BigInt(0)
    var i = 0
    while (i < M) {
      if (regs(i) == 0) zero += 1
      s += BigInt(1) << (SuffixBits + 1 - regs(i))
      i += 1
    }
    val raw = (Numerator / (BigInt(AlphaDen) * s)).toLong
    val est = if (zero > 0 && raw <= LcThreshold) lcTable(zero.toInt - 1)
      else raw
    (zero, est)
  }

  /** The lcTable as a SQL VALUES body `(1, e1), (2, e2), …` — the
    * oracle embeds the SAME precomputed integers the Spark plan uses. */
  def lcTableSql: String =
    lcTable.zipWithIndex
      .map { case (est, i) => s"(${i + 1}, $est)" }.mkString(", ")

  /** One-pass table profile: per column its row count, null count, HLL
    * distinct estimate, min/max (the parquet-footer stats a pruning
    * decision reads) and average value length — the "profile a huge
    * table" job as a SINGLE scan. Columns unpivot through a `stack`
    * generator (a generator, not a union of per-column scans: the
    * input is read once however many columns are profiled), values are
    * hashed in their canonical string rendering, and the per-column
    * register tables aggregate in the same shuffle as the null
    * counters and the min/max/length stats (map-side combine reduces
    * every bucket to one row, so carrying them is free). Linear
    * counting makes tiny-cardinality columns exact (V near m →
    * floor(m·ln(m/V)) = n), so enum-ish columns profile precisely
    * while high-cardinality keys get the ~3.3% HLL estimate.
    *
    * min/max compare in the stringified rendering (byte-wise UTF-8 on
    * both engines); avg_len is the one floating step — a single IEEE
    * division of two exact integers, reproducible anywhere. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    // The register table (≤ m+1 rows per column) is locally
    // checkpointed so the estimate and the counters both read the
    // materialized result, not two re-derivations of the scan.
    val g = profileRegisters(df, cols).localCheckpoint()
    val counts = g.groupBy("colname").agg(
      sum("cnt").as("n_rows"),
      sum(when(col("bucket") === -1L, col("cnt")).otherwise(0L)).as("n_nulls"),
      min("mn").as("min_val"), max("mx").as("max_val"),
      sum("slen").as("_slen"))
    val est = estimate(g.filter(col("bucket") >= 0)
      .select("colname", "bucket", "m"), Seq("colname"))
    // LEFT + coalesce(0): an all-null column has no registers at all
    // and must still profile (distinct 0 == the empty sketch's
    // linear-counting estimate), not vanish from the report — its
    // min/max/avg_len stay null, the SQL aggregation convention
    counts.join(est.select(col("colname"),
        col("estimate").as("distinct_est")), Seq("colname"), "left")
      .withColumn("distinct_est", coalesce(col("distinct_est"), lit(0L)))
      .withColumn("avg_len",
        when(col("n_rows") > col("n_nulls"),
          col("_slen").cast("double") /
            (col("n_rows") - col("n_nulls")).cast("double")))
      .drop("_slen")
  }

  /** The profiler's single-shuffle aggregation stage (everything
    * upstream of the checkpoint): ONE scan, ONE exchange — null rows
    * ride the same aggregation in a sentinel bucket (-1) instead of a
    * second counting branch, and the per-bucket row counts, min/max
    * and length sums share the grouped register table.
    * `private[graft]` so ProfilerPlanSpec can pin the one-Exchange /
    * one-scan shape that [[profile]]'s checkpoint boundary hides. */
  private[graft] def profileRegisters(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(cols.forall(c => !c.contains("'") && !c.contains("`")),
      "profile builds a stack() expression; quote/backtick column names unsupported")
    val stackArgs = cols
      .map(c => s"'$c', CAST(`$c` AS STRING)").mkString(", ")
    val unpiv = df.select(
      expr(s"stack(${cols.length}, $stackArgs) AS (colname, val)"))
    val packed = packedOf(col("val"))
    unpiv.select(col("colname"), col("val"),
        when(col("val").isNull, lit(-1L))
          .otherwise(shiftright(packed, 6)).as("bucket"),
        when(col("val").isNull, lit(null))
          .otherwise(packed.bitwiseAND(63).cast("int")).as("rho"))
      .groupBy("colname", "bucket")
      .agg(max("rho").as("m"), count(lit(1)).as("cnt"),
        min("val").as("mn"), max("val").as("mx"),
        sum(length(col("val"))).as("slen"))
  }
}
