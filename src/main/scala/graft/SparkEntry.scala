package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The query suite itself lives in [[Queries]]. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * ListProducer's core dataflow (SURVEY.md §3.1): inventory scan →
    * per-group cumulative size histogram (A1/A2). Avoids events.parquet
    * so it runs under any session's parquet-timestamp settings. */
  def entry(spark: SparkSession): DataFrame =
    ops.SizeHistogram.byGroup(
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"),
      col("l_returnflag"),
      floor(col("l_extendedprice")).cast("bigint"),
      // thresholds scaled to the testdata price range (the reference's
      // byte thresholds would put every row in every bucket)
      Seq(1000L, 5000L, 10000L, 50000L, 100000L, 1000000L, 5000000L))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] = Queries.oracle
}
