package graft

import org.apache.spark.sql.functions._

import graft.ops.{ApproxDedup, ThetaSketch}
import graft.sinks.VersionedStore

/** The data card's lineage closure: each release row records the KMV
  * ledger-store epoch it was served from (`kmv_epoch`) and a content
  * signature of the unigram-count ledger (`counts_sig`) — this spec
  * proves both edges RESOLVE: time-travelling the ledger store to the
  * recorded epoch reproduces the card's distinct-shingle estimates
  * exactly (for BOTH releases, after the refresh moved the ledger),
  * and re-hashing the persisted count ledger reproduces the
  * signature. */
class ManifestLineageSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("kmv_epoch and counts_sig resolve back to the ledgers that made the card") {
    // builds (or reuses) the two-release fixture
    Queries.all("q213_manifest_refresh")(spark, dir).collect()
    val store = Queries.fixPath("mr_store", dir) + "/store"
    val kmvStore = Queries.fixPath("mr_kmvstore", dir) + "/store"
    (1L to 2L).foreach { rel =>
      val relEpoch = VersionedStore.taggedEpoch(store, s"release-$rel").get
      val card = VersionedStore.readAsOf(spark, store, relEpoch).collect()
      assert(card.nonEmpty)
      card.foreach(r => assert(r.getAs[Long]("kmv_epoch") == rel,
        s"release $rel must record ledger epoch $rel"))
      // the recorded epoch REPRODUCES the card's estimates
      val led = VersionedStore.readAsOf(spark, kmvStore, rel)
      val re = ThetaSketch.estimate(led, Seq("source"), Queries.KmvK)
        .collect().map(r => r.getAs[String]("source") ->
          r.getAs[Long]("estimate")).toMap
      card.foreach { r =>
        assert(re(r.getAs[String]("source")) ==
          r.getAs[Long]("distinct_shingles"),
          s"release $rel distinct_shingles must reproduce from ledger@$rel")
      }
    }
    // releases must DIFFER where the delta landed new shingles —
    // otherwise the lineage edge is vacuous
    val c1 = VersionedStore.readAsOf(spark, store,
        VersionedStore.taggedEpoch(store, "release-1").get)
      .select("source", "distinct_shingles").collect().toSeq.sortBy(_.toString)
    val c2 = VersionedStore.read(spark, store)
      .select("source", "distinct_shingles").collect().toSeq.sortBy(_.toString)
    assert(c1 != c2, "the refresh must move at least one estimate")
    // counts_sig: recompute from the persisted release-1 count ledger
    val counts = spark.read.parquet(Queries.fixPath("mr_counts", dir))
    val sig = counts.groupBy("source").agg(
        sum(ApproxDedup.hash60(concat_ws(":", col("source"), col("t"),
          col("c_s").cast("string"))) % lit(1000000000L)).as("s"))
      .as[(String, Long)].collect().toMap
    VersionedStore.readAsOf(spark, store,
        VersionedStore.taggedEpoch(store, "release-1").get)
      .select("source", "counts_sig").as[(String, Long)].collect()
      .foreach { case (src, s) =>
        assert(sig(src) == s,
          s"counts_sig for $src must re-derive from the persisted ledger")
      }
  }
}
