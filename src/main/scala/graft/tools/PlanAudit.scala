package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for representative queries and
  * flag the scale-critical properties (pushed filters, pruned schemas,
  * broadcast vs shuffle joins, whole-stage codegen coverage). Run:
  *   runMain graft.tools.PlanAudit /root/testdata/sf0.01 [out.txt]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    graft.RunId.ensure() // per-process fixture-log path before log4j init
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = if (args.length > 1) args(1) else "/tmp/plan_audit.txt"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val audited = Seq(
      "q_scan_project", "q_filter_pred", "q_join_star", "q_join_big",
      "q_agg_pricing", "q_win_topk", "q_sort_limit", "q_dedup_near",
      "q_dedup_ngram", "q_dedup_minhash", "q_dedup_simhash_r1",
      "q_vec_knn", "q_stream_tumbling",
      // round-4 additions
      "q_join_bloom", "q_join_skew_salt", "q_vec_ivf_probe2",
      "q_time_resample", "q_text_ngram_lm", "q_cdc_compact",
      // round-7 additions
      "q_vec_lsh_multi", "q_cdc_scd2", "q_stream_dedup", "q_doc_chunk",
      "q_text_repetition",
      // round-8 additions
      "q_graph_pagerank", "q_events_sessionize", "q_dedup_containment",
      "q_stream_join_left",
      // round-9 additions
      "q_olap_cust_dist", "q_olap_big_orders", "q_olap_disjunct",
      "q_olap_mkt_share", "q_olap_top_supplier", "q_olap_lapsed_rich",
      "q_olap_volume_ship", "q_olap_returned", "q_olap_order_priority",
      "q_dedup_incremental", "q_dedup_recall", "q_sample_weighted",
      "q_profile_numeric",
      // round-10 additions
      "q_dedup_bucket_skew", "q_doc_mix_temperature",
      "q_text_oov", "q_text_zipf", "q_doc_novelty",
      // round-10 late-session additions
      "q_olap_sole_late", "q_olap_supp_variety", "q_olap_dominant_supp",
      "q_olap_min_cost", "q_olap_profit", "q_olap_line_prio",
      "q_doc_shard", "q_text_heavy", "q_dedup_cluster_hist",
      "q_split_leakage",
      // round-10 continuation additions
      "q_text_boilerplate", "q_doc_dup_mass", "q_vec_covariance",
      // round-12 additions
      "q_dedup_winnow", "q_join_fuzzy", "q_source_csv", "q_source_orc",
      "q_vec_index_ivf", "q_dedup_index_probe", "q_sink_bucketed_join")
    val queries = graft.SparkEntry.queries
    val sb = new StringBuilder
    audited.foreach { name =>
      val df = queries(name)(spark, sfDir)
      // execute THIS Dataset's queryExecution (count() would plan a separate
      // aggregate query) so AQE's FINAL plan with codegen ids prints
      df.collect()
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n========== $name ==========\n")
      // headline properties first, full plan after
      def flag(what: String, pred: String => Boolean): Unit =
        sb.append(f"  $what%-28s ${if (pred(plan)) "yes" else "NO"}%s\n")
      flag("WholeStageCodegen", p => p.contains("codegen id"))
      flag("PushedFilters (non-empty)",
        p => p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"))
      flag("BroadcastHashJoin", _.contains("BroadcastHashJoin"))
      flag("SortMergeJoin", _.contains("SortMergeJoin"))
      flag("TakeOrderedAndProject", _.contains("TakeOrderedAndProject"))
      flag("HashAggregate partial",
        p => p.contains("HashAggregate") && p.contains("partial_"))
      sb.append(plan).append("\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(s"[plan-audit] wrote $out (${audited.size} plans)")
    spark.stop()
  }
}
