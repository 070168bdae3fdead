import org.apache.spark.sql.SparkSession

/** Plan-audit tool: prints a markdown table of physical-plan traits for
  * the headline queries (pushdown, join strategies, exchange counts),
  * used to regenerate PLANS.md after operator changes. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
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
      "s2c_thirty_day", "m2_multimodal_decode")
    // s5 must show TakeOrdered and NO SortAggregate (VERDICT r2 item 2)
    println("| query | exchanges | joins | aggs | other |")
    println("|---|---|---|---|---|")
    for (name <- names) {
      val q = graft.SparkEntry.queries(name)(spark, d)
      val p = q.queryExecution.executedPlan.toString
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
        "SortAggregate" -> c("SortAggregate"))
        .filter(_._2 > 0).map { case (k, v) =>
          if (v == 1) k else s"$k x$v" }.mkString(" ")
      println(s"| $name | $ex | $joins | $aggs | $other |")
    }
    spark.stop()
  }
}
