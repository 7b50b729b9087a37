package graft
import org.apache.spark.sql.functions._
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val sf = "/root/testdata/sf0.01"
    val interesting = Seq("q01_size_histogram", "q05_dedup_anti", "q08_stat_table",
      "q22_minhash_lsh", "q25_ivf_topk", "q29_verification", "q30_budget_cap",
      "q42_salted_join", "q46_lsh_near_dup",
      "q58_repetition_signals", "q59_line_dedup", "q61_contamination",
      "q62_tfidf_terms", "q63_ranged_parts", "q64_full_clean",
      "q65_pii_scrub", "q66_hash_split", "q67_pack_sequences",
      "q68_cross_doc_spans", "q70_length_quantiles", "q71_shard_shuffle")
    for (name <- interesting) {
      val df = Queries.all(name)(spark, sf)
      df.count() // let AQE finalize
      val plan = df.queryExecution.executedPlan.toString
      def count(p: String) = p.r.findAllIn(plan).size
      println(f"PLAN $name%-22s exchanges=${count("Exchange")}%2d bhj=${count("BroadcastHashJoin")} smj=${count("SortMergeJoin")} cart=${count("CartesianProduct")} window=${count("WindowExec|RunningWindowFunction|Window ")} wsc=${count("WholeStageCodegen")}%2d pushed=${count("PushedFilters: \\[[^\\]]")} noPart=${count("No Partition Defined")}")
    }
    spark.stop()
  }
}
