package graft.streaming

import org.apache.spark.sql.SparkSession

/** Micro-batch-sized session for STREAMING queries (round-17).
  *
  * A stateful stream's state-store partition count is pinned from
  * `spark.sql.shuffle.partitions` when its checkpoint is created, and
  * every micro-batch thereafter reads and writes one state file per
  * partition per batch (plus its maintenance snapshots) — so a count
  * inherited from the host session's corpus-scale parallelism
  * multiplies per-batch FIXED I/O and task count with no data to
  * spread. Round-17 profile: the two-batch stats stream (q49) paid
  * 1144 fs ops and 32 near-empty state tasks per batch at 32 session
  * cores; the identical stream at 8 state partitions pays ~a quarter.
  * The stateless foreachBatch maintainers hit the same wall through
  * their per-batch aggregations ([[SessionConfGate.withMicroBatchConf]]
  * already bounds the ones that adopt it).
  *
  * Every graft stream builder therefore plans against a SESSION CLONE
  * whose shuffle partitioning is sized to micro-batch volume, not to
  * the host session's cores:
  *
  *  - the count comes from `spark.graft.stream.statePartitions`
  *    (default 8, matching the micro-batch shuffle sizing the
  *    maintainers use) — a deployment sizes it to expected keyed-state
  *    cardinality and per-batch volume, NOT to cluster width;
  *  - a RESUMED checkpoint keeps whatever partition count its metadata
  *    pinned (Spark ignores the conf then), so this only shapes new
  *    checkpoints;
  *  - results are partition-count-invariant by construction
  *    (aggregations / keyed state), so this is layout, not semantics;
  *  - the clone shares the SparkContext and extensions; only SQL conf
  *    diverges, so host-session queries keep corpus-scale settings.
  */
object StreamSessions {

  /** Conf key for the state/shuffle partition count streaming plans
    * use; sized to keyed-state cardinality and micro-batch volume. */
  val StatePartitionsKey = "spark.graft.stream.statePartitions"

  def microBatch(spark: SparkSession): SparkSession = {
    val n = spark.conf.get(StatePartitionsKey, "8")
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", n)
    ss
  }
}
