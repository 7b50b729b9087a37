package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.LinearTrainer
import graft.streaming.TrainStream

/** The streaming mini-batch trainer must follow the driver-side fold
  * EXACTLY (same integer trajectory), and its previous-value/epoch
  * machinery must converge byte-for-byte through replays, single-store
  * crash windows, and queue redeliveries — the LmStream contract
  * extended to NON-commutative model state. */
class TrainStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val LrDenom = 1048576L

  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")
    .select(col("vec_id"), col("embedding"), col("label"))

  private def stream = TrainStream("vec_id",
    b => LinearTrainer.embeddingFeatures(b, "vec_id", col("embedding")),
    LinearTrainer.labelU(col("label") < 5), LrDenom)

  private def storedWeights(root: String): Map[Long, Long] =
    stream.weights(spark, root).as[(Long, Long)].collect().toMap

  /** Reference: fold the batches through the batch trainer one step at
    * a time (warm-started) — the trajectory the stream must hit. */
  private def foldReference(batches: Seq[DataFrame]): Map[Long, Long] =
    batches.foldLeft(Map.empty[Long, Long]) { (w, b) =>
      LinearTrainer.lmsTrain(
        LinearTrainer.embeddingFeatures(b, "vec_id", col("embedding")),
        b.select(col("vec_id"),
          LinearTrainer.labelU(col("label") < 5).as("y_u")),
        "vec_id", steps = 1, lrDenom = LrDenom, initWeights = w).weights
    }

  private def batch(bt: Int): DataFrame =
    emb.filter(col("vec_id") % 3 === bt).localCheckpoint()

  test("a real stream of three landing files equals the driver-side fold") {
    val root = tmpDir("ts_stream")
    val landing = s"$root/landing"
    def land(bt: Int): Unit =
      emb.filter(col("vec_id") % 3 === bt).coalesce(1)
        .write.mode("append").parquet(landing)
    land(0)
    val q = stream.start(spark, landing, emb.schema, root)
    try {
      q.processAllAvailable()
      land(1); q.processAllAvailable()
      land(2); q.processAllAvailable()
    } finally q.stop()
    val want = foldReference(Seq(batch(0), batch(1), batch(2)))
    assert(storedWeights(root) == want)
    assert(want.nonEmpty)
  }

  test("replay, redelivery, and the crash windows all converge") {
    val b0 = batch(0); val b1 = batch(1)
    // clean two-step run for the target state
    val clean = tmpDir("ts_clean")
    stream.processBatch(b0, 0L, clean)
    stream.processBatch(b1, 1L, clean)
    val want = storedWeights(clean)

    // full replay of an epoch (checkpoint lost after both upserts)
    val r1 = tmpDir("ts_replay")
    stream.processBatch(b0, 0L, r1)
    stream.processBatch(b1, 1L, r1)
    stream.processBatch(b1, 1L, r1) // replay
    assert(storedWeights(r1) == want, "same-epoch replay must be a no-op")

    // crash window: weights upserted, docs ledger lost -> replay must
    // recompute the SAME gradient against w_prev, not the bumped w
    val r2 = tmpDir("ts_crash")
    stream.processBatch(b0, 0L, r2)
    val docsSnap = { // snapshot docs ledger before epoch 1
      val s = java.nio.file.Paths.get(s"$r2/tr_docs")
      val dst = java.nio.file.Files.createTempDirectory("ts_snap")
      java.nio.file.Files.walk(s).forEach { p =>
        val t = dst.resolve(s.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t)
      }
      dst
    }
    stream.processBatch(b1, 1L, r2)
    // restore the docs ledger to its pre-epoch-1 state (simulated crash
    // between the weights upsert and the docs upsert)
    graft.sinks.Sinks.deleteRecursively(java.nio.file.Paths.get(s"$r2/tr_docs"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$r2/tr_docs"))
    java.nio.file.Files.walk(docsSnap).forEach { p =>
      val t = java.nio.file.Paths.get(s"$r2/tr_docs")
        .resolve(docsSnap.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t)
    }
    stream.processBatch(b1, 1L, r2) // replay against half-landed state
    assert(storedWeights(r2) == want,
      "replay after a weights-landed/docs-lost crash must converge")

    // redelivery in a LATER epoch: already-landed ids contribute nothing
    val before = storedWeights(r1)
    stream.processBatch(b0, 2L, r1)
    assert(storedWeights(r1) == before,
      "redelivered examples must not train twice")
  }

  test("per-batch stability guard fails fast") {
    val big = Seq((1L, Array(60.0f, 60.0f), 0))
      .toDF("vec_id", "embedding", "label") // milli row norm² = 7.2e9
    val e = intercept[IllegalArgumentException](
      stream.processBatch(big, 0L, tmpDir("ts_guard")))
    assert(e.getMessage.contains("stability"))
  }
}
