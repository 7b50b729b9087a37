package graft

import org.apache.spark.sql.functions._

import graft.sinks.VersionedStore

/** COMMIT-PATH cost on a REMOTE-shaped filesystem (round-15): BenchFs
  * prices the bench suite but deliberately misses the java.nio local
  * fast paths, and RemoteFsWriteSpec proves the `probe://` fallbacks
  * CORRECT without pricing them — so object-store commit cost could
  * creep invisibly. This spec pins it: every create/mkdirs/rename/
  * delete/list/open through the counting FS is one metadata round trip
  * on an object store, and an uncontended commit must fit a budget
  * that regresses loudly. Wall time is never asserted — counts are
  * exact and box-independent. The measured splits are recorded in
  * SCALING.md §commit-cost. */
class CommitCostSpec extends SparkSpec {
  import spark.implicits._

  private def measured(body: => Unit): Int = {
    CountingFs.reset()
    body
    CountingFs.allOps
  }

  test("uncontended upsert+commit and delta commit fit pinned op budgets") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.probe.impl", classOf[CountingFs].getName)
    val root = "probe:" + tmpDir("commit_cost") + "/store"
    // bootstrap OUTSIDE the measurement: store creation pays one-time
    // marker writes every later epoch amortizes away
    VersionedStore.upsert((1L to 200L).map(k => (k, k)).toDF("k", "v"),
      Seq("k"), root, nBuckets = 4)

    // ---- ONE single-bucket upsert epoch: staged write (Spark's own
    // committer: task temp files + renames), promote renames, stats
    // marker, election-path commit fence (no link primitive on
    // probe://), commit-log read
    val upsertOps = measured {
      VersionedStore.upsert(Seq((7L, 77L)).toDF("k", "v"), Seq("k"), root)
    }
    // ---- ONE single-bucket delta epoch: same fence, write-cheap data
    val deltaOps = measured {
      VersionedStore.deltaUpsert(Seq((9L, 99L)).toDF("k", "v"), Seq("k"),
        root)
    }
    println(s"COMMIT_COST upsert=$upsertOps delta=$deltaOps ops " +
      s"(creates=${CountingFs.creates.get()} mkdirs=${CountingFs.mkdirs.get()}" +
      s" renames=${CountingFs.renames.get()} deletes=${CountingFs.deletes.get()}" +
      s" status=${CountingFs.statusCalls.get()} opens=${CountingFs.opens.get()})")
    // budgets: measured 46 / 40 ops (round-15, incl. the fence's
    // retired-epoch watermark probe) with ~30% headroom — a new
    // per-commit metadata pass (a footer re-read loop, a second fence
    // round trip, an exists-before-open probe) blows the budget and
    // names itself in the printed split. Update the number ONLY with a
    // SCALING.md §commit-cost note saying what grew and why it must.
    assert(upsertOps <= 60,
      s"uncontended upsert+commit cost $upsertOps metadata ops — " +
        "past the remote-FS budget (measured 46)")
    assert(deltaOps <= 55,
      s"delta commit cost $deltaOps metadata ops — past the remote-FS " +
        "budget (measured 40)")
    // the fence itself stays loud and correct: both epochs landed
    assert(VersionedStore.currentEpoch(root) == 3L)
    val cur = VersionedStore.read(spark, root).as[(Long, Long)]
      .collect().toMap
    assert(cur(7L) == 77L && cur(9L) == 99L)
  }
}
