package graft

/** Suite-wide plan regression guard. PlanProbe prints per-query detail
  * for humans; this spec makes the join-shape invariants failing
  * tests, so a future operator that silently falls back to a quadratic
  * join cannot land green.
  *
  *  - CartesianProduct: forbidden everywhere, no exceptions.
  *  - BroadcastNestedLoopJoin: legitimate ONLY when the broadcast side
  *    is small BY CONTRACT (an ANN query set, a 1-row corpus total) —
  *    those queries are allowlisted BY NAME with the reason, and any
  *    new BNLJ must be consciously added here or the suite fails.
  *
  * Plans are BUILT (analyzed + planned on the sf0.001 tables), not
  * executed — a few queries run bounded driver-side training jobs
  * (k-means, sketches) at construction, which is their documented
  * contract. */
class PlanGuardSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** BNLJ-by-contract: the non-equi join's broadcast side is bounded
    * by construction, so the "nested loop" is linear in the corpus. */
  private val bnljByContract = Set(
    "q24_cosine_topk",    // broadcast(queries) =!= self-match filter
    "q25_ivf_topk",       // broadcast(assigned queries)
    "q57_quantized_topk", // broadcast(quantized queries)
    "q78_ivf_multiprobe", // broadcast(query probe table)
    "q94_ann_recall",     // brute-force ground truth inside
    "q62_tfidf_terms",    // crossJoin(broadcast(1-row corpus count))
    "q96_decayed_sums",   // crossJoin(broadcast(1-row max timestamp))
    "q100_corpus_report") // crossJoin(broadcast(two 1-row aggregates))

  test("no CartesianProduct anywhere; BNLJ only where small-by-contract") {
    val offenders = Queries.all.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      val cart = plan.contains("CartesianProduct")
      val bnlj = plan.contains("BroadcastNestedLoopJoin") &&
        !bnljByContract.contains(name)
      if (cart) Some(s"$name: CartesianProduct")
      else if (bnlj) Some(s"$name: unallowlisted BroadcastNestedLoopJoin")
      else None
    }
    assert(offenders.isEmpty, s"quadratic join shapes:\n${offenders.mkString("\n")}")
  }
}
