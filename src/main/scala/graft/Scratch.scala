package graft
/** Throwaway probe main — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val (cleaned, s) = graft.exec.CorpusPipeline.clean(spark, docs,
      minTokens = 30, maxPunctRatio = 0.05, nearDupThreshold = 0.6)
    println(s"pipeline stages: $s")
    println("cleaned sample:")
    cleaned.select("doc_id", "lang", "source").show(3, false)
    // probe: run on the ALREADY-cleaned corpus — should be a fixpoint
    val (_, s2) = graft.exec.CorpusPipeline.clean(spark, cleaned,
      minTokens = 30, maxPunctRatio = 0.05, nearDupThreshold = 0.6)
    println(s"re-clean (fixpoint probe): $s2")
    spark.stop()
  }
}
