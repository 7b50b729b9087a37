package graft

import org.apache.spark.sql.functions._

/** Throwaway drive-the-library probe (test scope — NOT library surface;
  * run with `sbt -batch "Test/runMain graft.VerifyProbe"`). Exercises
  * whatever changed most recently through a real session over the
  * driver testdata. */
object VerifyProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sf01 = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$sf01/documents.parquet")
    val emb = spark.read.parquet(s"$sf01/embeddings.parquet")
    docs.count(); emb.count()
    val old = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val prefixFp = md5(concat_ws(" ",
      slice(split(lower(col("text")), "\\s+"), 1, 8)))
    val sh = ops.ApproxDedup.wordNgrams(col("text"), 2)

    // ledger fixtures as q110 reads them (parquet under /tmp/graft_fixtures)
    def fix(kind: String) =
      s"/tmp/graft_fixtures/${kind}_" + sf01.replaceAll("[^A-Za-z0-9._-]", "_")
    val lsh = ops.ApproxDedup.LshLedger(
      spark.read.parquet(fix("lsh_ledger_buckets")),
      spark.read.parquet(fix("lsh_ledger_sets")))
    val sem = ops.SemanticDedup.SemLedger(
      spark.read.parquet(fix("sem_ledger_cent")),
      spark.read.parquet(fix("sem_ledger_asn")))

    (1 to 2).foreach { rep =>
      val s1 = time(s"s1-exact-$rep") {
        ops.Dedup.incrementalNovel(
          batch.select("doc_id", "source", "text"),
          "doc_id", prefixFp, old.select(prefixFp.as("fp")))
          .localCheckpoint()
      }
      val s2 = time(s"s2-lsh-$rep") {
        val sc = ops.ApproxDedup.incrementalLshNovelFromLedgerScoped(
          lsh, s1.withColumn("_sh", sh),
          "doc_id", "_sh", 16, 4, 4, threshold = 0.5)
        val r = sc.df.select("doc_id", "source").localCheckpoint()
        sc.release()
        r
      }
      time(s"s3-sem-$rep") {
        val batchEmb = emb.join(s2.select(col("doc_id").as("vec_id")), Seq("vec_id"))
        ops.SemanticDedup.incrementalSurvivorsFromLedger(
          sem, batchEmb, "vec_id", "embedding", threshold = 0.3).count()
      }
      spark.catalog.clearCache()
    }
    println("PROBE_OK")
    spark.stop()
  }
}
