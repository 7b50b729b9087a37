package graft

import org.apache.spark.sql.functions._

import graft.sinks.VersionedStore

/** Point-lookup I/O contract on a REMOTE-SHAPED filesystem (round-13):
  * every open and every byte through the counting `probe://` FS is a
  * priced round-trip on an object store, so the spec pins (1) a lookup
  * opens O(key-bucket generations) files — never the store; (2) an
  * ABSENT key (inside every min/max range, so only the parquet BLOOM
  * can save it) reads a small fraction of a present key's bytes —
  * footer + bloom, no data pages; (3) both read a small fraction of a
  * full-store scan. Wall time is never asserted — counts are exact. */
class LookupProbeSpec extends SparkSpec {
  import spark.implicits._

  test("lookup opens O(key-bucket gens); bloom skips absent-key pages") {
    val dir = tmpDir("vstore_lookup_io")
    val root = dir + "/store"
    // EVEN keys only: every ODD probe key sits inside each row group's
    // [min, max] (hash-bucketing scatters keys), so row-group stats
    // can never prune it — the bloom filter is the only page-saver
    val n = 100000L
    VersionedStore.upsert(
      spark.range(1L, n + 1L).select((col("id") * 2L).as("k"),
        concat(lit("payload-string-with-enough-bytes-to-matter-"),
          col("id")).as("v")),
      Seq("k"), root, nBuckets = 16)
    // a second epoch so some key bucket serves >1 generation
    VersionedStore.upsert(Seq((100L, "updated"), (200L, "updated2"))
      .toDF("k", "v"), Seq("k"), root)
    spark.sparkContext.hadoopConfiguration
      .set("fs.probe.impl", classOf[CountingFs].getName)
    val probeRoot = "probe:" + root

    def measured(body: => Unit): (Int, Long) = {
      CountingFs.reset()
      body
      (CountingFs.opens.get(), CountingFs.bytesRead.get())
    }
    // warm nothing: each lookup below resolves metadata from scratch,
    // exactly like a cold serving process
    val (opensPresent, bytesPresent) = measured {
      val got = VersionedStore.lookup(spark, probeRoot, Seq(100L).toDF("k"))
        .collect()
      assert(got.length == 1 && got(0).getString(1) == "updated")
    }
    val (opensAbsent, bytesAbsent) = measured {
      assert(VersionedStore.lookup(spark, probeRoot, Seq(101L).toDF("k"))
        .collect().isEmpty)
    }
    // the scan baseline must DECODE the payload (a bare count() is
    // served from row-group metadata and reads ~no data bytes)
    val (opensScan, bytesScan) = measured {
      assert(VersionedStore.read(spark, probeRoot)
        .agg(sum(length(col("v")))).collect()(0).getLong(0) > 0L)
    }
    println(s"LOOKUP_IO present=($opensPresent opens, $bytesPresent B) " +
      s"absent=($opensAbsent opens, $bytesAbsent B) " +
      s"scan=($opensScan opens, $bytesScan B)")

    // (1) opens: commit log + 5 metadata markers + the key bucket's
    // generations (footer + pages per file; parquet may reopen once).
    // The full store is 16 buckets — a lookup must stay near the
    // metadata floor, far under the scan's open count.
    assert(opensPresent <= 20,
      s"present-key lookup opened $opensPresent files — must be " +
        "metadata + ONE bucket's generations")
    assert(opensPresent < opensScan,
      s"lookup opens ($opensPresent) must stay under a scan's " +
        s"($opensScan) — 2 data files + metadata vs 16 buckets + metadata")
    // (2) bloom effectiveness: the absent key reads footer + bloom
    // only — a small fraction of the present key's page bytes
    assert(bytesAbsent * 2 <= bytesPresent,
      s"absent-key lookup read $bytesAbsent B vs present $bytesPresent B " +
        "— the bloom filter must skip the data pages")
    // (3) and both are a small fraction of scanning the store
    assert(bytesPresent * 4 <= bytesScan,
      s"present-key lookup read $bytesPresent B vs scan $bytesScan B")
  }
}
