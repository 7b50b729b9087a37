package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Table loaders over the driver testdata (TESTDATA.md), with type
  * normalization so queries are independent of session-level parquet
  * timestamp settings. */
object Tables {

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.parquet stores ts as INT64 TIMESTAMP(NANOS, ntz) which Spark
    * reads either as long nanos (spark.sql.legacy.parquet.nanosAsLong) or
    * as a (sub-second-truncated) timestamp depending on version/config.
    * Normalize to `ts_sec: double` = epoch seconds with fraction. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    val df =
      try spark.read.parquet(path)
      catch {
        case _: Throwable =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          spark.read.parquet(path)
      }
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts_sec", col("ts").cast("double") / 1e9)
      case TimestampNTZType =>
        // Spark forbids numeric casts of TIMESTAMP_NTZ; hop through
        // TimestampType (session tz is UTC, so NTZ wall-clock == epoch)
        df.withColumn("ts_sec",
          col("ts").cast(TimestampType).cast("double"))
      case TimestampType =>
        df.withColumn("ts_sec", col("ts").cast("double"))
      case other =>
        throw new IllegalStateException(s"unexpected ts type $other")
    }
  }
}
