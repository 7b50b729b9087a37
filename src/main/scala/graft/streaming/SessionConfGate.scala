package graft.streaming

import org.apache.spark.sql.SparkSession

/** Process-wide gate for the AQE toggle the micro-batch trainers use
  * ([[TrainStream]]/[[LmStream]] disable AQE around each step so the
  * broadcast-hinted model-sized plans don't pay a scheduler job per
  * materialized query stage). The toggle mutates SESSION-global SQL
  * conf, so two maintainers sharing one session — or a crash-matrix
  * spec driving both — could interleave set/restore and leave AQE off
  * (or re-enable it mid-step). One JVM-wide lock serializes the
  * toggle+step+restore window; steps are sub-second at micro-batch
  * scale, so the serialization is not a throughput concern (each
  * maintainer's batches are already sequential per stream). */
private[streaming] object SessionConfGate {
  private val lock = new Object

  /** Run `body` with AQE off on `spark`, restoring the previous value
    * after — atomically with respect to every other gated caller in
    * this JVM. */
  def withAqeOff[A](spark: SparkSession)(body: => A): A =
    withMicroBatchConf(spark, shufflePartitions = -1)(body)

  /** [[withAqeOff]] plus a micro-batch-sized
    * `spark.sql.shuffle.partitions` (AQE would normally coalesce tiny
    * shuffles; with it off for the step, the session default — sized
    * for corpus-scale queries — would run every batch-sized
    * aggregation as N mostly-empty tasks; round-13 measured the
    * 32-partition micro-shuffles eating the AQE-off job savings).
    * `shufflePartitions = -1` leaves the session value alone. */
  def withMicroBatchConf[A](spark: SparkSession, shufflePartitions: Int = 8)
                           (body: => A): A = lock.synchronized {
    val aqeKey = "spark.sql.adaptive.enabled"
    val spKey = "spark.sql.shuffle.partitions"
    val prevAqe = spark.conf.get(aqeKey, "true")
    val prevSp = spark.conf.get(spKey)
    spark.conf.set(aqeKey, "false")
    if (shufflePartitions > 0) spark.conf.set(spKey, shufflePartitions.toString)
    try body
    finally {
      spark.conf.set(aqeKey, prevAqe)
      spark.conf.set(spKey, prevSp)
    }
  }

  /** Label the jobs `body` submits (the optimization guide's §1.5
    * discipline — a maintainer batch fans into many small actions and
    * an unlabeled UI/bench timeline cannot attribute them). Thread-
    * local, saved and restored, so a maintainer's label never leaks
    * into the host application's own jobs. */
  def labeled[A](spark: SparkSession, desc: String)(body: => A): A = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body finally sc.setJobDescription(prev)
  }

  /** Run independent store writes concurrently on short-lived threads
    * (Spark schedules concurrent jobs from one session fine; the
    * session conf the gate pinned is shared, so both sides plan under
    * the same micro-batch settings). Rethrows the first failure. */
  def inParallel(tasks: (() => Unit)*): Unit = {
    if (tasks.sizeIs <= 1) { tasks.foreach(_.apply()); return }
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val threads = tasks.zipWithIndex.map { case (t, i) =>
      new Thread(() => {
        try t()
        catch { case e: Throwable => failure.compareAndSet(null, e) }
      }, s"graft-batch-writer-$i")
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    if (failure.get() != null) throw failure.get()
  }
}
