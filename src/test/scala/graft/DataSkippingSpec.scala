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

  test("delta generations carry stats too: a delta'd chain prunes exactly") {
    val root = tmpDir("skip_mor") + "/store"
    VersionedStore.upsert(
      spark.range(1L, 101L).select(col("id").as("k"), lit(1L).as("u")),
      Seq("k"), root, nBuckets = 8)
    // round-14: delta stats ride the staged write's own observation
    // (zero extra cost), so MOR no longer trades skipping for
    // write-cheapness — the delta'd chain opens exactly when its
    // delta's range says it can match
    VersionedStore.deltaUpsert(Seq((42L, 5L)).toDF("k", "u"), Seq("k"), root)
    val df = VersionedStore.readPruned(spark, root, "u", 5L, 9L)
    assert(df.as[(Long, Long)].collect().toSeq == Seq((42L, 5L)))
    val opened = bucketsOf(df)
    val deltaBuckets = VersionedStore.commits(root)
      .filter(_.epoch == 2L).flatMap(_.buckets).map(b => f"b$b%05d").toSet
    assert(opened == deltaBuckets,
      s"only the delta'd chain may open: $opened vs $deltaBuckets")
    // a range NOTHING holds prunes the whole store — INCLUDING the
    // delta'd chain (round-13 had to read it conservatively)
    val noneMor = VersionedStore.readPruned(spark, root, "u", 50L, 90L)
    assert(noneMor.count() == 0L && bucketsOf(noneMor).isEmpty,
      "delta stats must prune the impossible range before compaction")
    // compaction still folds the chain into a stats-carrying base with
    // identical pruning behavior
    VersionedStore.compact(spark, root)
    val after = VersionedStore.readPruned(spark, root, "u", 5L, 9L)
    assert(after.as[(Long, Long)].collect().toSeq == Seq((42L, 5L)))
    val none = VersionedStore.readPruned(spark, root, "u", 50L, 90L)
    assert(none.count() == 0L && bucketsOf(none).isEmpty,
      "post-compaction stats must prune the impossible range entirely")
  }

  test("DEFAULT read path data-skips: read(...).filter prunes at plan time") {
    val root = tmpDir("skip_default") + "/store"
    VersionedStore.upsert(
      spark.range(1L, 201L).select(col("id").as("k"),
        (col("id") * 10).as("v"), lit(1L).as("u")),
      Seq("k"), root, nBuckets = 16)
    VersionedStore.upsert(Seq((7L, 77L, 2L), (53L, 533L, 2L))
      .toDF("k", "v", "u"), Seq("k"), root)
    VersionedStore.upsert(Seq((11L, 111L, 3L)).toDF("k", "v", "u"),
      Seq("k"), root)
    // a PLAIN filtered read — no readPruned, no special API: the
    // stats-aware FileIndex receives the filter as a dataFilter and
    // drops untouched generations at plan time
    val df = VersionedStore.read(spark, root)
      .filter(col("u") >= 2L && col("u") <= 3L)
    val scan = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.nonEmpty, "expected a V1 file scan over the store")
    val nFiles = scan.map(_.selectedPartitions.totalNumberOfFiles).sum
    // e1 wrote 16 generation files; only e2's (<=2 buckets) and e3's
    // (1 bucket) generations overlap u in [2,3]
    assert(nFiles <= 3L,
      s"default-path scan must select only stat-overlapping gens: $nFiles")
    // the snapshot serves each bucket's newest generation: 16 files
    val all = scan.map(_.relation.location.inputFiles.length).sum
    assert(all == 16, s"index must expose the full snapshot: $all")
    val got = df.as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got == Seq((7L, 77L, 2L), (11L, 111L, 3L), (53L, 533L, 2L)))
    // and with no filter, the full snapshot serves
    assert(VersionedStore.read(spark, root).count() == 200L)
  }

  test("a corrupt _cstats manifest demotes to a conservative read") {
    val root = tmpDir("skip_corrupt") + "/store"
    VersionedStore.upsert(
      spark.range(1L, 51L).select(col("id").as("k"), lit(1L).as("u")),
      Seq("k"), root, nBuckets = 4)
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // truncate every manifest to garbage — the scan must neither fail
    // nor prune, exactly the legacy/statless posture (round-13 ADVICE)
    fs.globStatus(new org.apache.hadoop.fs.Path(root, "b*/g*/_cstats"))
      .foreach { st =>
        val out = fs.create(st.getPath, true)
        try out.write("zzz;not-a-number".getBytes) finally out.close()
      }
    val df = VersionedStore.readPruned(spark, root, "u", 5L, 9L)
    assert(df.count() == 0L)
    assert(bucketsOf(df).size == 4,
      "corrupt stats must read conservatively, never fail the scan")
    assert(VersionedStore.read(spark, root)
      .filter(col("u") === 1L).count() == 50L)
  }

  test("NaN never poisons FP stats: the column line drops, the row survives") {
    val root = tmpDir("skip_nan") + "/store"
    // ONE bucket, TWO comparable columns → 2 observe pairs, well under
    // the budget: this write takes the round-14 Observation path, where
    // Spark's max aggregate orders NaN GREATEST and would render
    // max="NaN" into _cstats. lt()'s primitive comparison is false both
    // ways against NaN, so survives(GreaterThan 5.0) = lt(5.0, NaN) =
    // false — the generation would be PRUNED even though it holds
    // v=NaN, which Spark's row filter keeps (NaN > 5.0 is TRUE in
    // Spark's ordering). The guard must drop the v line instead.
    VersionedStore.upsert(
      Seq((1L, 1.0), (2L, Double.NaN)).toDF("k", "v"),
      Seq("k"), root, nBuckets = 1)
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.globStatus(new org.apache.hadoop.fs.Path(root, "b*/g*/_cstats"))
      .foreach { st =>
        val in = st.getPath
        val body = scala.io.Source.fromInputStream(fs.open(in)).mkString
        assert(!body.contains("NaN"),
          s"a NaN bound must never reach a _cstats line: $body")
        assert(!body.linesIterator.exists(_.startsWith("v;")),
          s"the NaN-holding column's line must drop entirely: $body")
        assert(body.linesIterator.exists(_.startsWith("k;")),
          s"the clean column keeps its stats: $body")
      }
    // default read path: the filter the ADVICE named, exact
    val got = VersionedStore.read(spark, root).filter(col("v") > 5.0)
      .as[(Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(2L) && got.head._2.isNaN,
      s"NaN row must survive a > filter on the default path: $got")
    // read-side belt for markers written BEFORE the guard: a
    // hand-planted NaN bound must read as "always overlaps"
    import graft.sinks.DataSkipping
    val poisoned = DataSkipping.ColStats(0L, "1.0", "NaN")
    assert(DataSkipping.survives(
      org.apache.spark.sql.types.DoubleType, poisoned,
      org.apache.spark.sql.sources.GreaterThan("v", 5.0)),
      "a legacy NaN-bound entry must never prune")
    assert(DataSkipping.overlaps(
      org.apache.spark.sql.types.DoubleType, poisoned, "7.0", "9.0"),
      "overlaps must treat a NaN bound as always-overlapping")
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
