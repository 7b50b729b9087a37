package graft

import org.apache.spark.sql.functions._

import graft.sinks.VersionedStore

/** Generation-level data skipping (round-13): the `_cstats` manifest
  * prunes whole bucket chains at plan time, conservatively — results
  * are exact whatever it skips, untouched buckets never open on a
  * freshness scan, and a delta generation's stats can resurrect a
  * bucket whose base misses the range. */
class DataSkippingSpec extends SparkSpec {
  import spark.implicits._

  private def bucketsOf(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.inputFiles.flatMap(_.split("/").find(_.matches("^b\\d{5}$"))).toSet

  test("freshness scan opens only buckets touched since the epoch") {
    val root = tmpDir("skip_fresh") + "/store"
    // e1 seeds every bucket with u=1; e2/e3 update a few keys
    VersionedStore.upsert(
      spark.range(1L, 201L).select(col("id").as("k"),
        (col("id") * 10).as("v"), lit(1L).as("u")),
      Seq("k"), root, nBuckets = 16)
    VersionedStore.upsert(Seq((7L, 77L, 2L), (53L, 533L, 2L))
      .toDF("k", "v", "u"), Seq("k"), root)
    VersionedStore.upsert(Seq((11L, 111L, 3L)).toDF("k", "v", "u"),
      Seq("k"), root)
    val touched = VersionedStore.commits(root)
      .filter(_.epoch >= 2L).flatMap(_.buckets)
      .map(b => f"b$b%05d").toSet
    val df = VersionedStore.readPruned(spark, root, "u", 2L, 3L)
    val got = df.as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got == Seq((7L, 77L, 2L), (11L, 111L, 3L), (53L, 533L, 2L)),
      s"pruned read must be exact: $got")
    val opened = bucketsOf(df)
    assert(opened.subsetOf(touched) && opened.size < 16,
      s"freshness scan must open only touched buckets: $opened vs $touched")
    // exactness under pruning, cross-checked against the plain read
    val want = VersionedStore.read(spark, root)
      .filter(col("u") >= 2L && col("u") <= 3L)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got == want)
  }

  test("conservative inclusion: a statless generation always reads") {
    val root = tmpDir("skip_legacy") + "/store"
    VersionedStore.upsert(
      spark.range(1L, 51L).select(col("id").as("k"), lit(1L).as("u")),
      Seq("k"), root, nBuckets = 4)
    // simulate a legacy store: delete every stats manifest
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.globStatus(new org.apache.hadoop.fs.Path(root, "b*/g*/_cstats"))
      .foreach(st => fs.delete(st.getPath, false))
    val df = VersionedStore.readPruned(spark, root, "u", 5L, 9L)
    assert(df.count() == 0L) // row filter still exact
    assert(bucketsOf(df).size == 4,
      "without stats every chain must be read, never guessed away")
  }

  test("a delta'd chain reads conservatively; compaction restores pruning") {
    val root = tmpDir("skip_mor") + "/store"
    VersionedStore.upsert(
      spark.range(1L, 101L).select(col("id").as("k"), lit(1L).as("u")),
      Seq("k"), root, nBuckets = 8)
    // MOR: delta generations carry NO stats by the write-cheap
    // contract, so the delta'd chain survives every range (its base
    // alone would have been pruned) — correctness via conservatism
    VersionedStore.deltaUpsert(Seq((42L, 5L)).toDF("k", "u"), Seq("k"), root)
    val df = VersionedStore.readPruned(spark, root, "u", 5L, 9L)
    assert(df.as[(Long, Long)].collect().toSeq == Seq((42L, 5L)))
    val opened = bucketsOf(df)
    val deltaBuckets = VersionedStore.commits(root)
      .filter(_.epoch == 2L).flatMap(_.buckets).map(b => f"b$b%05d").toSet
    assert(opened == deltaBuckets,
      s"only the delta'd chain may open: $opened vs $deltaBuckets")
    // compacting folds the chain into a stats-carrying base: the
    // updated key keeps matching, and a range NOTHING holds now
    // prunes the whole store again
    VersionedStore.compact(spark, root)
    val after = VersionedStore.readPruned(spark, root, "u", 5L, 9L)
    assert(after.as[(Long, Long)].collect().toSeq == Seq((42L, 5L)))
    val none = VersionedStore.readPruned(spark, root, "u", 50L, 90L)
    assert(none.count() == 0L && bucketsOf(none).isEmpty,
      "post-compaction stats must prune the impossible range entirely")
  }

  test("string bounds order by unsigned UTF-8 bytes, not UTF-16 units") {
    val root = tmpDir("skip_utf8") + "/store"
    // the discriminating case: U+1F600 (UTF-8 F0 9F 98 80, UTF-16
    // surrogate D83D DE00) vs U+FFF0 (UTF-8 EF BF B0). Spark and
    // parquet order strings by UNSIGNED UTF-8 BYTES, so 😀 > ￰ and
    // the range [￰, 😀] CONTAINS 😀 — but Java's String.compareTo
    // (UTF-16 code units) says 😀 < ￰, under which the stats test
    // would prune the chain and silently LOSE the row
    VersionedStore.upsert(Seq((1L, "😀")).toDF("k", "s"), Seq("k"),
      root, nBuckets = 1)
    val hit = VersionedStore.readPruned(spark, root, "s", "￰", "😀")
    assert(hit.count() == 1L,
      "UTF-8-ordered range must keep the supplementary-plane row")
    // and the correct prune: a range strictly ABOVE the value
    val miss = VersionedStore.readPruned(spark, root, "s", "🙏", "🙏")
    assert(miss.count() == 0L && bucketsOf(miss).isEmpty,
      "a range above the stored value in UTF-8 order must prune")
  }
}
