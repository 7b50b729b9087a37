package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: salt the large side's key space
  * and replicate the small side across the salt range, so a hot key's
  * rows spread over `salts` reducers instead of one straggler task.
  *
  * AQE's skew-join handles most cases at runtime (GraftSession enables
  * it); explicit salting remains the tool when one side must ALSO be
  * aggregated per key downstream, when the skew is known up front, or
  * when AQE is unavailable (streaming joins). Deterministic: the salt
  * derives from a hash of the row's salt-source columns, not rand().
  */
object Salting {

  /** Join `big` (skewed) with `small` on `key`, spreading each of
    * big's keys over `salts` sub-partitions. `small` is replicated
    * `salts`× (explode of a literal range — keep it the genuinely
    * smaller side). Result equals the plain inner join, row for row. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
                 saltSource: Seq[Column]): DataFrame = {
    require(salts > 0)
    val b = big.withColumn("_salt",
      pmod(hash(saltSource: _*), lit(salts)))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }

  /** Per-key counts of a salted aggregation: partial per (key, salt),
    * then final per key — two small shuffles instead of one skewed one. */
  def saltedCount(df: DataFrame, key: String, salts: Int,
                  saltSource: Seq[Column]): DataFrame =
    df.withColumn("_salt", pmod(hash(saltSource: _*), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum("_partial").cast("bigint").as("n"))

  /** Skew diagnosis — the "measure before you salt" report: one row of
    * key-space statistics over a prospective shuffle key. `skew_ppm` =
    * heaviest key's count ÷ mean count per key, in exact ppm (1,000,000
    * = perfectly uniform; 20,000,000 = the hot key carries 20× its fair
    * share and the join/agg wants [[saltedJoin]] or AQE skew handling).
    * Integer arithmetic throughout; two map-side-combined aggregations,
    * the second over one row per key. */
  def skewReport(df: DataFrame, key: Column): DataFrame =
    df.select(key.as("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("cnt"))
      .agg(
        sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("cnt")).as("max_key_rows"),
        min(col("cnt")).as("min_key_rows"))
      .withColumn("mean_key_rows", expr("n_rows div n_keys"))
      .withColumn("skew_ppm",
        expr("max_key_rows * 1000000 div greatest(mean_key_rows, 1)"))
}
