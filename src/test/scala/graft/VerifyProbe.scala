package graft

import org.apache.spark.sql.functions._

/** Throwaway drive-the-library probe (test scope — NOT library surface;
  * run with `sbt -batch "Test/runMain graft.VerifyProbe"`). Exercises
  * whatever changed most recently through a real session over the
  * driver testdata. */
object VerifyProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val sec = expr("ts div 1000000000")
    val base = ev.select(col("event_id"), col("user_id"), sec.as("sec"),
      col("event_type"), col("value"))

    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString

    // 1) as-of join: purchases ← latest prior view; plan must stay
    //    equi/window shaped — no nested-loop or cartesian fallback
    val asof = ops.AsOfJoin.lastPrior(
      base.filter(col("event_type") === "purchase"),
      base.filter(col("event_type") === "view"),
      "user_id", "sec", "event_id", "event_id", payload = Seq("value"))
    val asofPlan = planOf(asof)
    val matched = asof.filter(col("asof_event_id").isNotNull).count()
    val total = asof.count()
    println(s"asof: $matched/$total purchases attributed")
    assert(matched > 0 && matched <= total)
    assert(!asofPlan.contains("CartesianProduct")
      && !asofPlan.contains("BroadcastNestedLoopJoin"), "as-of plan fell back")

    // 2) banded range join: bucketed equi-join, never a theta BNLJ
    val rj = ops.RangeJoin.withinBand(
      base.filter(col("event_type") === "error")
        .select("event_id", "user_id", "sec"),
      base.filter(col("event_type") === "click")
        .select("event_id", "user_id", "sec"),
      "user_id", "sec", band = 86400L)
    val rjPlan = planOf(rj)
    println(s"rangeJoin pairs=${rj.count()}")
    assert(!rjPlan.contains("CartesianProduct")
      && !rjPlan.contains("BroadcastNestedLoopJoin"), "range join fell back:\n" + rjPlan)

    // 3) bloom contamination == exact contamination on real docs
    val train = docs.filter(col("doc_id") % 50 =!= 0)
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val exact = ops.CorpusSignals.contamination(train, bench, "doc_id",
      col("text"), 4).orderBy("doc_id").collect()
    val bloom = ops.CorpusSignals.contaminationBloom(train, bench, "doc_id",
      col("text"), 4, expectedItems = 100000L, fpp = 0.01)
      .orderBy("doc_id").collect()
    println(s"contamination exact=${exact.length} bloom=${bloom.length}")
    assert(exact.nonEmpty && bloom.toSeq == exact.toSeq)

    // 4) vocab/OOV over real docs: vocab join must broadcast
    val vocab = ops.TextAnalysis.vocabulary(docs, col("text"), 200)
    val oov = ops.TextAnalysis.oovRate(docs, "doc_id", col("text"), vocab)
    val oovPlan = planOf(oov)
    val nDocs = oov.count()
    println(s"oov docs=$nDocs")
    assert(nDocs == docs.count())
    assert(oovPlan.contains("BroadcastHashJoin"), "vocab join not broadcast")

    println("PROBE_OK")
    spark.stop()
  }
}
