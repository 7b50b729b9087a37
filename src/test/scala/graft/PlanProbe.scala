package graft
import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
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
      "q68_cross_doc_spans", "q69_nfc_normalize", "q70_length_quantiles",
      "q71_shard_shuffle", "q72_session_windows", "q73_importance_weights",
      "q74_hashed_score", "q75_training_prep", "q26_embed_near_dup",
      "q76_star_contraction", "q77_normalize_inventory", "q78_ivf_multiprobe",
      "q79_budget_mix", "q80_asof_join", "q81_range_join",
      "q82_bloom_contamination", "q83_vocab_oov", "q84_pq_topk",
      "q85_chunk_windows", "q86_group_cap", "q87_heavy_hitters",
      "q88_decontaminate", "q89_zorder_profile", "q90_source_overlap",
      "q91_lm_counts", "q92_label_centroids", "q93_bpe_merge_pairs",
      "q94_ann_recall", "q95_funnel", "q96_decayed_sums",
      "q97_top_per_group", "q98_rollup_profile", "q99_pivot_langs",
      "q100_corpus_report", "q101_snapshot_drift", "q102_skew_report",
      "q103_json_props", "q104_incremental_ingest", "q105_user_similarity",
      "q106_funnel_stream", "q107_clustered_scan",
      "q108_incremental_neardup", "q109_incremental_semdedup",
      "q110_refresh_pipeline", "q111_html_extract",
      "q112_image_phash", "q113_image_neardup",
      "q114_hll_cardinality", "q115_compaction_plan", "q116_bucketed_join",
      "q117_cardinality_ledger", "q118_temperature_mix",
      "q119_table_profile")
    // the AQE final-plan STRING hides codegen stages, so wsc walks the
    // tree (descending through AQE's finalized plan) instead of
    // regexing the rendering
    def countWsc(p: SparkPlan): Int = {
      val self = p match { case _: WholeStageCodegenExec => 1; case _ => 0 }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan) // stages hide their subtree from .children
        case s => s.children
      }
      self + kids.map(countWsc).sum
    }
    for (name <- interesting) {
      val df = Queries.all(name)(spark, sf)
      // execute THIS df (collect, not count — count() builds a different
      // query tree, leaving df's own AQE plan unfinalized and codegen-free)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      def count(p: String) = p.r.findAllIn(plan).size
      val wsc = countWsc(df.queryExecution.executedPlan)
      println(f"PLAN $name%-22s exchanges=${count("Exchange")}%2d bhj=${count("BroadcastHashJoin")} smj=${count("SortMergeJoin")} cart=${count("CartesianProduct")} window=${count("WindowExec|RunningWindowFunction|Window ")} wsc=$wsc%3d pushed=${count("PushedFilters: \\[[^\\]]")} noPart=${count("No Partition Defined")}")
    }
    spark.stop()
  }
}
