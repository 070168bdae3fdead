import org.apache.spark.sql.SparkSession

/** Plan-audit tool: prints a markdown table of physical-plan traits for
  * the headline queries (pushdown, join strategies, exchange counts),
  * used to regenerate PLANS.md after operator changes. */
object ExplainAudit {
  /** Remove every InMemoryRelation's child subtree from a plan string:
    * the cached build runs ONCE at materialization, but the tree printer
    * repeats it under every consuming InMemoryTableScan. Depth = column
    * of the tree connector ("+-"/":-"); deeper lines after an
    * InMemoryRelation line belong to its (already-counted-elsewhere)
    * build plan. */
  private def stripCachedBuilds(plan: String): String = {
    def depth(l: String): Int = {
      val i = l.indexWhere(c => c != ' ' && c != ':' && c != '+' && c != '-')
      if (i < 0) l.length else i
    }
    val out = new StringBuilder
    var skipDeeper = -1
    for (l <- plan.split("\n")) {
      val d = depth(l)
      if (skipDeeper >= 0 && d > skipDeeper) ()
      else {
        skipDeeper = if (l.contains("InMemoryRelation")) d else -1
        out.append(l).append('\n')
      }
    }
    out.toString
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val names = Seq(
      "s1_scan_prune", "q1_flagship", "j1_join_enrich", "j1b_broadcast_dim",
      "a1b_argmax_maxby", "d1_dedup_exact", "d2_dedup_minhash", "d3_simhash",
      "t3_token_topk", "t4_fingerprint", "a5_ann_bruteforce", "a6_ann_lsh",
      "a7_ann_ivf", "w1_window_tumbling", "w3_window_session",
      "x1_asof_join", "x2_rollup", "x5_bucketed_join", "s2s3s4_rest_source",
      "t5_length_percentiles", "t6_length_histogram", "m3_frame_sample",
      "s5_catalog_argmax", "p4_json_flatten", "m1_multimodal_meta",
      "p9_normalize_full", "d5_ngram_jaccard", "s2b_heart_1sec",
      "s2c_thirty_day", "m2_multimodal_decode", "p4b_azm_flatten",
      "p11b_raw_stream_pivot", "d6_decontaminate", "t9_sequence_pack",
      "c2_split_assign", "a8_kmeans_refine", "s9_jsonl_source",
      "x6_interval_join", "t10_tfidf", "e2_activities_snapshot",
      "a7b_ivf_trained", "s6_exists_probe", "t11_nb_langid", "d7_dedup_cc",
      "c3_stratified_sample", "a9_hll_distinct", "t12_countmin_topk",
      "a10_scalar_quant", "t13_repetition", "s10_snapshot_diff",
      "c1b_curate_neardup", "t14_kmv_quantile", "d8_dedup_cc_star",
      "a11_ann_recall", "a12_product_quant", "a13_pq_adc", "t15_lm_score",
      "a14_ivfpq", "a9b_hll_native", "x7_unpivot", "c4_decontaminated_split",
      "c1c_curate_quality", "d4_embed_neardup", "x8_pivot", "x9_scd2",
      "d9_bloom_prefilter", "d4b_neardup_recall", "d10_incremental_dedup",
      "x10_cube", "d3b_simhash_neardup", "d7b_cluster_stats",
      "d11_substring_dedup", "c5_temperature_mix", "t12b_countmin_native",
      "d12_semantic_dedup", "s11_generation_union",
      "a15_incremental_index", "a16_retrain_decision", "k6_compaction",
      "m2b_decode_quarantine", "sql_q1_flagship", "sql_f1f2_date_filter",
      "sql_a5_cosine_topk", "sql_a9b_hll", "sql_w1_tumbling",
      "sql_x2_rollup", "sql_t12b_countmin", "sql_d1_dedup",
      "sql_d7_clusters", "d12b_semantic_recall", "s2e_token_refresh",
      "t16_gopher_rules", "c7_ccnet_buckets", "sql_t16_gopher",
      "c8_shard_shuffle", "sql_c7_ccnet", "a17_nsw_search",
      "sql_e4_pipeline", "t17_novelty", "sql_a17_nsw",
      "k7_retention", "d6b_leak_report", "x11_zorder",
      "d13_cap_report", "sql_a14_ivfpq", "a18_graph_extend",
      "a19_hnsw_layers", "k9_partition_overwrite", "sql_x1_asof",
      "sql_a19_hnsw", "a20_filtered_ann", "a21_nprobe_sweep",
      "m4_media_phash", "e5_media_pipeline", "x12_window_battery",
      "t18_bm25", "sql_t18_bm25", "t19_dsir_weights", "sql_t19_dsir",
      "d14_url_dedup", "sql_d14_url", "d15_line_dedup",
      "sql_d15_line_dedup", "m5_audio_energy", "g1_pagerank",
      "sql_g1_pagerank", "g1b_pagerank_converge", "k8b_hnsw_index_sink",
      "e6_pair_curation", "sql_x12_window",
      "d16_incremental_line_dedup", "g2_hits", "sql_g2_hits",
      "g3_label_prop", "sql_g3_label_prop", "g4_kcore", "sql_g4_kcore",
      "g5_triangle_count", "sql_g5_triangles", "t20_bpe_merges",
      "a22_range_search", "m6_scene_cut", "s12_csv_source",
      "c9_epoch_budget", "a23_mmr_rerank", "c10_curriculum",
      "x13_grouping_sets", "k10_write_audit_publish",
      "s13_binary_source", "e7_keyframe_dedup",
      "sql_x13_grouping_sets", "sql_c10_curriculum",
      "w4_gap_fill", "t21_bpe_encode", "sql_t21_bpe_encode",
      "k8c_incremental_index_sink", "c11_rank_curation",
      "g2b_hits_converge", "g3b_lpa_converge", "g4b_kcore_converge",
      "t9b_pack_bpe", "x14_table_stats", "sql_w4_gap_fill",
      "sql_c11_rank_curation", "k11_targeted_delete",
      "k12_time_travel", "t22_quality_classifier", "sql_t22_classifier",
      "m7_audio_dedup", "a24_hnsw_extend", "k8d_hnsw_incremental_sink",
      "a25_filtered_nsw", "sql_w2_sliding",
      "k13_merge_upsert", "g6_personalized_pagerank", "sql_g6_ppr",
      "a26_hybrid_rrf", "sql_a26_hybrid", "g7_delta_pagerank",
      "k14_index_erasure", "a27_index_health", "k15_vacuum",
      "sql_g7_delta",
      "a28_binary_quant", "a29_matryoshka_recall", "w5_funnel",
      "w6_cohort", "t23_calibration", "x15_histogram_stats",
      "sql_w5_funnel", "sql_w6_cohort", "sql_x15_histogram",
      "x16_data_quality", "c12_importance_resample",
      "k16_expire_snapshots",
      "w7_attribution", "sql_w7_attribution", "x17_incremental_stats",
      "a30_ivf_bq", "g8_random_walks", "g8b_walk_pairs",
      "e8_rag_pipeline", "sql_x16_data_quality",
      "k17_partition_evolution", "x18_incremental_quantiles",
      "sql_c12_resample", "w8_anomaly", "sql_x18_quantiles",
      "sql_m1_meta", "sql_m4_phash", "a31_margin_mining",
      "x19_join_size_sketch", "sql_a31_margin",
      "d17_incremental_neardup", "sql_s10_snapshot_diff",
      "sql_k6_compaction", "x20_bloom_join_prune", "sql_k7_retention",
      "x21_sketch_setops", "sql_x20_bloom_join", "sql_x21_setops",
      "sql_k9_overwrite", "k8c_standing_build", "k8c_append_search",
      "k8d_append_search", "sql_k10_audit", "sql_k12_history",
      "t8b_pii_scrub", "sql_k13_merge")
    // s5 must show TakeOrdered and NO SortAggregate (VERDICT r2 item 2)
    println("| query | exchanges | joins | aggs | other |")
    println("|---|---|---|---|---|")
    // optional argv filter: `runMain ExplainAudit q1 q2` audits a subset
    val selected = if (args.nonEmpty) names.filter(args.toSet) else names
    for (name <- selected) {
      val q = graft.SparkEntry.queries(name)(spark, d)
      // EXECUTE first, audit the FINAL adaptive plan: the un-executed
      // plan repeats the whole subtree under every consumer of a
      // persist()ed or self-joined relation, overcounting exchanges that
      // cache materialization + ReuseExchange collapse at runtime (and
      // AQE's join/skew choices only exist post-run)
      val qe = q.queryExecution
      qe.toRdd.count()
      // audit what actually RAN: drop the "== Initial Plan ==" echo the
      // adaptive plan string appends, and drop the cached-build lineage
      // each InMemoryTableScan re-prints (it materializes once; counting
      // it per consumer would overstate exchanges ~10x for d2)
      val p = stripCachedBuilds(
        qe.executedPlan.toString.split("== Initial Plan ==").head)
      def c(pat: String) = pat.r.findAllIn(p).length
      val ex = c("Exchange hashpartitioning") + c("Exchange rangepartitioning")
      val joins = Seq(
        "BroadcastHashJoin" -> c("BroadcastHashJoin"),
        "SortMergeJoin" -> c("SortMergeJoin"),
        "BNLJ" -> c("BroadcastNestedLoopJoin"))
        .filter(_._2 > 0).map { case (k, v) => s"$k x$v" }.mkString(" ")
      val aggs = c("HashAggregate") / 2 // partial+final pairs
      val other = Seq(
        "pushedFilters" -> (if (p.contains("PushedFilters: [I")) 1 else 0),
        "TakeOrdered" -> c("TakeOrderedAndProject"),
        "WindowGroupLimit" -> c("WindowGroupLimit"),
        "Generate" -> c("Generate explode"),
        "Expand" -> c("Expand"),
        "cached" -> c("InMemoryTableScan"),
        "reusedStage" -> (c("ReusedQueryStage") + c("ReusedExchange")),
        "SortAggregate" -> c("SortAggregate"))
        .filter(_._2 > 0).map { case (k, v) =>
          if (v == 1) k else s"$k x$v" }.mkString(" ")
      println(s"| $name | $ex | $joins | $aggs | $other |")
    }
    spark.stop()
  }
}
