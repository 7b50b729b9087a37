package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.ops.ApproxDedup

/** Round-7 contracts for the persisted MinHash-LSH ledger
  * ([[ApproxDedup.LshLedger]]): the incremental near-dup refresh must
  * read persisted state — never re-derive the ingested corpus's
  * signatures from raw text — and the ledger's append contract must
  * keep refreshes equivalent to a from-scratch bootstrap. */
class LshLedgerSpec extends SparkSpec {
  import spark.implicits._

  private val K = 16; private val B = 4; private val R = 4

  /** Synthetic corpus with guaranteed cross-split and in-batch
    * near-dups: ids ending in 0 are the landing batch; several batch
    * docs share (near-)identical text with old docs or each other. */
  private def corpus(): DataFrame = {
    val base = (0L until 40L).map { i =>
      (i, s"unique text alpha${i * 7} beta${i * 13} gamma${i * 29} delta${i * 31} epsilon${i * 37} zeta${i * 41} eta${i * 43} theta${i * 47}")
    }
    // batch doc 10 duplicates old doc 3; batch 20 near-dups old 7;
    // batch 30 duplicates batch 0 (in-batch, smaller-id winner)
    val dups = Map(
      10L -> base(3)._2,
      20L -> (base(7)._2 + " tail"),
      30L -> base(0)._2)
    base.map { case (i, t) => (i, dups.getOrElse(i, t)) }
      .toDF("doc_id", "text")
  }

  private def withSets(df: DataFrame): DataFrame =
    df.withColumn("_sh", ApproxDedup.wordNgrams(col("text"), 2))

  /** Root paths of every file scan in the optimized plan. */
  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten

  test("parquet-round-tripped ledger form == self-contained form") {
    val all = withSets(corpus())
    val old = all.filter(col("doc_id") % 10 =!= 0)
    val batch = all.filter(col("doc_id") % 10 === 0)

    val root = tmpDir("lsh_ledger_rt")
    val built = ApproxDedup.lshLedger(old, "doc_id", "_sh", K, B, R)
    built.buckets.write.parquet(s"$root/buckets")
    built.sets.write.parquet(s"$root/sets")
    val ledger = ApproxDedup.LshLedger(
      spark.read.parquet(s"$root/buckets"),
      spark.read.parquet(s"$root/sets"))

    val viaLedger = ApproxDedup.incrementalLshNovelFromLedger(
        ledger, batch, "doc_id", "_sh", K, B, R, threshold = 0.5)
      .select("doc_id").orderBy("doc_id").as[Long].collect().toSeq
    val selfContained = ApproxDedup.incrementalLshNovel(
        old, batch, "doc_id", "_sh", K, B, R, threshold = 0.5)
      .select("doc_id").orderBy("doc_id").as[Long].collect().toSeq

    assert(viaLedger == selfContained)
    // non-vacuous: the fixture must actually drop batch docs
    assert(viaLedger.size < batch.count(),
      "fixture has no near-dups — the equality above proved nothing")
    assert(!viaLedger.contains(10L) && !viaLedger.contains(30L))
  }

  test("refresh plan scans ledger + batch only — never the old corpus") {
    val all = corpus()
    val root = tmpDir("lsh_ledger_plan")
    all.filter(col("doc_id") % 10 =!= 0)
      .write.parquet(s"$root/old_corpus")
    all.filter(col("doc_id") % 10 === 0)
      .write.parquet(s"$root/landing_batch")

    val built = ApproxDedup.lshLedger(
      withSets(spark.read.parquet(s"$root/old_corpus")),
      "doc_id", "_sh", K, B, R)
    built.buckets.write.parquet(s"$root/buckets")
    built.sets.write.parquet(s"$root/sets")

    val refresh = ApproxDedup.incrementalLshNovelFromLedger(
      ApproxDedup.LshLedger(
        spark.read.parquet(s"$root/buckets"),
        spark.read.parquet(s"$root/sets")),
      withSets(spark.read.parquet(s"$root/landing_batch")),
      "doc_id", "_sh", K, B, R, threshold = 0.5)

    val paths = scanPaths(refresh)
    assert(paths.nonEmpty)
    // the property that makes "incremental" real at 100 TB: the old
    // corpus's raw text is never re-read, so no scan points at it
    assert(!paths.exists(_.contains("old_corpus")),
      s"refresh plan re-scans the ingested corpus: $paths")
    assert(paths.exists(_.contains("buckets")) &&
      paths.exists(_.contains("sets")) &&
      paths.exists(_.contains("landing_batch")), paths.toString)
  }

  test("updatedLshLedger append == from-scratch bootstrap over survivors") {
    val all = withSets(corpus())
    val old = all.filter(col("doc_id") % 10 =!= 0)
    val batch = all.filter(col("doc_id") % 10 === 0)

    val ledger0 = ApproxDedup.lshLedger(old, "doc_id", "_sh", K, B, R)
    val novel = ApproxDedup.incrementalLshNovelFromLedger(
      ledger0, batch, "doc_id", "_sh", K, B, R, threshold = 0.5)
    val ledger1 = ApproxDedup.updatedLshLedger(
      ledger0, novel, "doc_id", "_sh", K, B, R)

    val survivors = old.unionByName(novel.select(old.columns.map(col): _*))
    val bootstrap = ApproxDedup.lshLedger(survivors, "doc_id", "_sh", K, B, R)

    def key(df: DataFrame): Seq[String] =
      df.select(concat_ws("|", df.columns.map(c => col(c).cast("string")): _*))
        .as[String].collect().toSeq.sorted
    assert(key(ledger1.buckets) == key(bootstrap.buckets))
    assert(key(ledger1.sets.select("doc_id")) ==
      key(bootstrap.sets.select("doc_id")))

    // a re-landing of the same batch against the updated ledger drops
    // everything — the idempotency that makes at-least-once delivery
    // safe (same contract as Dedup.updatedLedger, Round5Spec)
    val rerun = ApproxDedup.incrementalLshNovelFromLedger(
      ledger1, batch, "doc_id", "_sh", K, B, R, threshold = 0.5)
    assert(rerun.count() == 0L)
  }
}
