package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Module-V serving queries (UICenter/BackEnd, SURVEY §3.3): the two
  * dashboard payloads as DataFrame programs over the stat table.
  *
  * The reference paginates DynamoDB and sums in Python
  * (ddbModel.py:223-275); here each payload is one aggregation —
  * the stat table is tiny (one row per minute), so these serve from a
  * cached DataFrame or any SQL endpoint at interactive latency.
  */
object Dashboard {

  /** /totalProgress (ddbModel.py:223-250 + common.js:55-65 ETA):
    * success totals, elapsed minutes, bytes/minute speed, percent done
    * and remaining-minutes estimate against the job's declared totals. */
  def totalProgress(stat: DataFrame, totalObjects: Long, totalSize: Long): DataFrame =
    TimeBucketStats.progress(stat)
      .withColumn("total_objects", lit(totalObjects))
      .withColumn("total_size", lit(totalSize))
      .withColumn("pct_objects",
        round(col("total_success_num") * 100.0 / lit(totalObjects), 2))
      .withColumn("eta_minutes",
        when(col("bytes_per_minute") > 0,
          greatest(lit(0L),
            ceil((lit(totalSize) - col("total_success_size"))
              / col("bytes_per_minute")).cast("bigint")))
          .otherwise(lit(null).cast("bigint")))

  /** /tasksGraph (ddbModel.py:252-275): the zero-filled last-hour
    * minute series ending at `nowEpochSec`'s minute. */
  def tasksGraph(stat: DataFrame, nowEpochSec: Long): DataFrame = {
    val endMinute = nowEpochSec / 60 * 60
    TimeBucketStats.minuteSpine(stat, endMinute - 59 * 60, 60)
  }
}
