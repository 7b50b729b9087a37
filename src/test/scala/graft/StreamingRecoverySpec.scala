package graft

import org.apache.spark.sql.functions._

import graft.streaming.TaskPipeline

/** T2's whole claim, proven: a checkpointed query killed mid-stream and
  * restarted from its checkpoint produces output identical to a query
  * that never died. Each test runs the same two-phase load twice — once
  * interrupted (stop after phase 1, new data while down, resume), once
  * uninterrupted — and compares the FINAL tables row-for-row. */
class StreamingRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def msg(q: Int, b: Long, keys: Seq[String]): (Int, Long, Int, String) =
    (q, b, 1, keys.map(k =>
      s"""{"Bucket":"s","Key":"$k","Size":${k.length * 100},"ETag":"e","dst_bucket":"d"}""")
      .mkString("[", ",", "]"))

  private def sortedLog(dir: String): Seq[(String, Long, Int, Long, Int)] =
    spark.read.parquet(dir)
      .select("Key", "Size", "ok", "replication_time", "receive_count")
      .as[(String, Long, Int, Long, Int)].collect().toSeq.sorted

  test("executor killed between batches resumes from checkpoint; log matches uninterrupted run") {
    def run(root: String, interrupted: Boolean): Seq[(String, Long, Int, Long, Int)] = {
      val (queueDir, logDir, dlqDir, ckpt) =
        (s"$root/queue", s"$root/log", s"$root/dlq", s"$root/ckpt")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(queueDir))
      def start() = TaskPipeline.runExecutor(spark, queueDir, logDir, dlqDir,
        ckpt, failWhen = col("Key") === "poison")
      // phase 1: two messages, one with a poison key (drains through the
      // re-enqueue loop to the DLQ before the "crash")
      Seq(msg(0, 0L, Seq("ok-1", "ok-2")), msg(1, 0L, Seq("ok-3", "poison")))
        .toDF("queue", "batch_id", "receive_count", "body")
        .write.mode("append").json(queueDir)
      val q1 = start()
      q1.processAllAvailable()
      if (interrupted) q1.stop() // kill; queue keeps filling while down
      // phase 2: more work, including a batch_id already seen on queue 0
      Seq(msg(0, 1L, Seq("ok-4")), msg(2, 0L, Seq("ok-5")))
        .toDF("queue", "batch_id", "receive_count", "body")
        .write.mode("append").json(queueDir)
      val q2 = if (interrupted) start() else q1
      q2.processAllAvailable()
      q2.stop()
      sortedLog(logDir)
    }
    val resumed = run(tmpDir("rec_exec_a"), interrupted = true)
    val straight = run(tmpDir("rec_exec_b"), interrupted = false)
    assert(resumed == straight)
    // and the resumed run logged phase-1 work exactly once (no offset
    // replay): 5 ok keys once each + the poison's 3 logged attempts
    assert(resumed.count(_._3 == 1) == 5 && resumed.count(_._3 == 0) == 3)
    assert(resumed.filter(_._3 == 1).map(_._1).distinct.size == 5)
  }

  test("stateful dedup state survives restart: post-resume redelivery still dropped") {
    def run(root: String, interrupted: Boolean): Seq[(String, String)] = {
      val inDir = s"$root/in"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
      def writeBatch(name: String, msgs: Seq[(String, String)]): Unit =
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$inDir/$name.json"),
          msgs.map { case (i, p) => s"""{"msg_id":"$i","payload":"$p"}""" }
            .mkString("\n"))
      def start() = {
        val stream = spark.readStream
          .schema("msg_id STRING, payload STRING").json(inDir).as[Msg]
        graft.streaming.StatefulDedup.firstSighting[Msg](stream, _.msg_id)
          .writeStream
          .option("checkpointLocation", s"$root/ckpt")
          .outputMode("append")
          .format("parquet").option("path", s"$root/out")
          .start()
      }
      writeBatch("b1", Seq(("m1", "a"), ("m2", "b")))
      val q1 = start()
      q1.processAllAvailable()
      if (interrupted) q1.stop()
      // redeliveries of m1/m2 arrive AFTER the crash — only the dedup
      // state in the checkpoint can drop them on resume
      writeBatch("b2", Seq(("m1", "redelivered"), ("m3", "c"), ("m2", "redelivered")))
      val q2 = if (interrupted) start() else q1
      q2.processAllAvailable()
      q2.stop()
      spark.read.parquet(s"$root/out").as[Msg]
        .collect().toSeq.map(m => (m.msg_id, m.payload)).sorted
    }
    val resumed = run(tmpDir("rec_dedup_a"), interrupted = true)
    val straight = run(tmpDir("rec_dedup_b"), interrupted = false)
    assert(resumed == straight)
    assert(resumed == Seq(("m1", "a"), ("m2", "b"), ("m3", "c")))
  }

  test("stats job window state survives restart: same-bucket rows accumulate across the crash") {
    def run(root: String, interrupted: Boolean): Seq[(Long, Long, Long, Long, Long)] = {
      val logDir = s"$root/log"
      def start() = TaskPipeline.runStatsJob(spark, logDir, s"$root/stat", s"$root/ckpt")
      Seq(("k1", 100L, 1, 30L), ("k2", 50L, 0, 45L), ("k3", 10L, 1, 90L))
        .toDF("Key", "Size", "ok", "replication_time")
        .write.mode("append").parquet(logDir)
      val q1 = start()
      q1.processAllAvailable()
      if (interrupted) q1.stop()
      // k4 lands in bucket 0 AFTER the crash: its sums must combine with
      // the pre-crash partials recovered from the checkpointed state
      Seq(("k4", 7L, 1, 40L), ("k5", 3L, 1, 130L))
        .toDF("Key", "Size", "ok", "replication_time")
        .write.mode("append").parquet(logDir)
      val q2 = if (interrupted) start() else q1
      q2.processAllAvailable()
      q2.stop()
      spark.read.parquet(s"$root/stat")
        .select("start_time", "success_size", "success_num", "failed_size", "failed_num")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    }
    val resumed = run(tmpDir("rec_stats_a"), interrupted = true)
    val straight = run(tmpDir("rec_stats_b"), interrupted = false)
    assert(resumed == straight)
    assert(resumed == Seq((0L, 107L, 2L, 50L, 1L), (60L, 10L, 1L, 0L, 0L),
      (120L, 3L, 1L, 0L, 0L)))
  }
}
