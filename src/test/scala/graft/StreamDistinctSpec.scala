package graft

import org.apache.spark.sql.functions._
import graft.ops.Cardinality
import graft.streaming.StreamDistinct

/** Streaming HLL state == batch sketch, across micro-batch boundaries
  * and on replay — the merge-exactness property carried into
  * flatMapGroupsWithState. */
class StreamDistinctSpec extends SparkSpec {
  import spark.implicits._

  private def runStream(phases: Seq[Seq[(String, String)]]): Map[String, (Long, Long)] = {
    val root = tmpDir("sdist")
    val inDir = s"$root/in"
    val updDir = s"$root/upd"
    phases.head.toDF("k", "v").write.parquet(inDir)
    val q = StreamDistinct.estimates(
        spark.readStream.schema("k STRING, v STRING").parquet(inDir)
          .as[(String, String)])
      .toDF()
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, bid: Long) =>
        df.withColumn("_bid", lit(bid)).write.mode("append").parquet(updDir)
        ()
      }
      .start()
    q.processAllAvailable()
    phases.tail.foreach { p =>
      p.toDF("k", "v").write.mode("append").parquet(inDir)
      q.processAllAvailable()
    }
    q.stop()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"k").orderBy($"_bid".desc)
    spark.read.parquet(updDir)
      .withColumn("_rn", row_number().over(w)).filter($"_rn" === 1)
      .select("k", "zero_regs", "estimate")
      .as[(String, Long, Long)].collect()
      .map { case (k, z, e) => k -> ((z, e)) }.toMap
  }

  test("final streamed estimates equal the one-shot batch sketch") {
    // overlapping values across three phases: cross-batch register
    // merging must not double-count or lose state
    val phases = Seq(
      (1 to 400).map(i => ("a", s"u$i")) ++ (1 to 50).map(i => ("b", s"u$i")),
      (200 to 600).map(i => ("a", s"u$i")),
      (1 to 80).map(i => ("b", s"x$i")) ++ Seq(("c", "only")))
    val streamed = runStream(phases)
    val batch = Cardinality.approxDistinct(
        phases.flatten.toDF("k", "v"), Seq("k"), $"v")
      .as[(String, Long, Long)].collect()
      .map { case (k, z, e) => k -> ((z, e)) }.toMap
    assert(streamed == batch,
      s"stream $streamed != batch $batch")
    // and replaying the identical stream reproduces it bit-for-bit
    assert(runStream(phases) == streamed)
  }
}
