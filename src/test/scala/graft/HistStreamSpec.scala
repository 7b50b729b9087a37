package graft

import org.apache.spark.sql.functions._

import graft.ops.Distribution
import graft.streaming.HistStream

/** Streaming histogram state == batch histogram, across micro-batch
  * boundaries, null values and replay — bucket-count folding is
  * associative+commutative, so the equality is exact (the HLL-class
  * invariance). */
class HistStreamSpec extends SparkSpec {
  import spark.implicits._

  private def runStream(phases: Seq[Seq[(String, Option[Long])]])
      : Seq[(String, Long, Long)] =
    HistStream.replayHistogram(spark,
        phases.map(_.toDF("k", "v")), tmpDir("shist"))
      .as[(String, Long, Long)].collect().toSeq

  test("final streamed histogram equals the one-shot batch histogram") {
    val phases = Seq(
      (1 to 400).map(i => ("a", Some((i * 7L) % 3000 + 1))) ++
        (1 to 50).map(i => ("b", Some(i.toLong))),
      (1 to 300).map(i => ("a", Some((i * 13L) % 900 + 1))) ++
        Seq(("a", None: Option[Long])), // nulls never bucket
      Seq(("b", Some(0L)), ("c", Some(1L)))) // 0 -> bucket -1; singleton
    val streamed = runStream(phases).sorted
    val batch = Distribution.logHistogram(
        phases.flatten.toDF("k", "v"), Seq("k"), $"v")
      .as[(String, Long, Long)].collect().toSeq.sorted
    assert(streamed == batch, s"stream $streamed != batch $batch")
    // replaying the identical stream reproduces it exactly
    assert(runStream(phases).sorted == streamed)
  }

  test("a key with only-null values emits nothing (batch parity)") {
    val phases = Seq(Seq(("a", Some(5L)), ("nul", None: Option[Long])),
      Seq(("nul", None: Option[Long])))
    val got = runStream(phases)
    assert(got.map(_._1).toSet == Set("a"))
  }

  test("streamed buckets serve quantiles via quantilesFromHistogram") {
    val vals = (1 to 500).map(i => ("s", Some((i * 31L) % 2000 + 1)))
    val streamed = runStream(Seq(vals.take(250), vals.drop(250)))
      .toDF("k", "bucket", "n")
    val fromStream = Distribution.quantilesFromHistogram(
        streamed, Seq("k"), Seq(500000L, 990000L))
      .orderBy("q_ppm").collect().toSeq
    val direct = Distribution.quantiles(
        vals.toDF("k", "v"), Seq("k"), $"v", Seq(500000L, 990000L))
      .orderBy("q_ppm").collect().toSeq
    assert(fromStream == direct)
  }

  test("versioned histogram ledger: kill/resume parity and per-phase time travel") {
    import graft.sinks.VersionedStore
    val phase1 = (1 to 300).map(i => ("a", Some((i * 7L) % 900 + 1))) ++
      (1 to 40).map(i => ("b", Some(i * 3L)))
    val phase2 = (1 to 200).map(i => ("a", Some((i * 13L) % 50000 + 1)))

    def run(root: String, interrupted: Boolean): String = {
      val inDir = s"$root/in"
      val store = s"$root/store"
      phase1.toDF("k", "v").coalesce(1).write.parquet(inDir)
      var q = HistStream.histogramToStore(spark, inDir, store)
      q.processAllAvailable()
      if (interrupted) {
        q.stop()
        q = HistStream.histogramToStore(spark, inDir, store)
      }
      phase2.toDF("k", "v").coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
      q.stop()
      store
    }
    def ledger(store: String, asOf: Option[Long]): Seq[(String, Long, Long)] = {
      val df = asOf match {
        case Some(e) => VersionedStore.readAsOf(spark, store, e)
        case None => VersionedStore.read(spark, store)
      }
      df.as[(String, Long, Long)].collect().toSeq.sorted
    }
    def batchOf(rows: Seq[(String, Option[Long])]): Seq[(String, Long, Long)] =
      Distribution.logHistogram(rows.toDF("k", "v"), Seq("k"), $"v")
        .as[(String, Long, Long)].collect().toSeq.sorted

    val clean = run(tmpDir("vhist_clean"), interrupted = false)
    val killed = run(tmpDir("vhist_kill"), interrupted = true)
    assert(ledger(clean, None) == ledger(killed, None),
      "kill/resume must land a byte-identical histogram ledger")
    assert(ledger(clean, None) == batchOf(phase1 ++ phase2))
    // time travel: the distribution exactly as of the first batch
    assert(VersionedStore.currentEpoch(clean) == 2L)
    assert(ledger(clean, Some(1L)) == batchOf(phase1))
  }
}
