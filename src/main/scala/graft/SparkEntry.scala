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
      floor(col("l_extendedprice")).cast("bigint"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] = Queries.oracle
}
