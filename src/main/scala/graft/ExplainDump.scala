package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dumps formatted physical plans for headline queries to EXPLAINS.md —
  * the pushdown/pruning/broadcast/codegen evidence, regenerable with
  * `sbt "runMain graft.ExplainDump <sfDir> <outFile>"`.
  */
object ExplainDump {
  val Headline = Seq(
    "q1_agg", "j1_join_fk", "p1_get_edge", "g1_bbox", "g4_proximity_join",
    "dedup_embedding_cosine", "w1_row_number", "e1_hourly_agg",
    "e11_scd2", "e10_funnel", "a11_topk_udaf", "v2_vector_quantize",
    "q4_shipping_priority", "q5_region_volume", "q6_revenue_delta",
    "j11_knn_join", "j12_recursive_chain", "g8_zorder_cell",
    "e13_session_window", "t12_chunk_overlap", "a13_bitmap_distinct",
    "ann_pq_topk", "ann_ivf_topk", "g9_knn_classify", "t15_winsorize",
    "a14_heavy_hitters", "e16_interval_left_join", "j13_fuzzy_name_join",
    "t17_bm25", "w8_moving_median", "f20_map_battery", "a15_grouping_id",
    "e18_attribution", "w9_ntile_binning", "tp8_semdedup",
    "q11_nation_volume", "r7_label_prop",
    "q15_top_supplier", "q18_large_volume", "q21_sole_late",
    "q2b_best_supplier", "tp11_token_budget_mix", "e22_transition_matrix",
    "dedup_containment", "v5_power_iteration", "t20_char_entropy",
    "tp13_dup_ngram_spans", "tp14_classifier_inference", "ann_sq8_topk",
    "a20_weighted_median", "e25_max_concurrency", "q23_product_profit",
    "q24_market_share", "a21_mode", "tp16_importance_score",
    "tp17_hard_negatives", "a22_mad", "e24_rfm_segments",
    "tp18_domain_upsample", "a23_gini", "a24_hhi", "j24_skyline",
    "u7_snapshot_diff", "tp19_dataset_card", "v7_knn_label_agreement",
    "t21_readability", "j22_assortativity", "w11_longest_streak",
    "e26_active_users", "e27_robust_outliers", "e28_max_drawdown",
    "e29_cusum_excursion", "j25_link_prediction",
    "ann_ivf_stored_topk", "ann_pq_stored_topk",
    "tp21_bloom_decontaminate", "a26_cms_freq",
    "tp22_uniform_sample_n", "tp23_per_domain_sample",
    "a27_auc", "a28_ks_drift", "a30_spearman", "a31_cramers_v",
    "v8_maxsim", "tp24_curriculum_order", "tp25_kcenter_coreset",
    "t23_vocab_growth", "t24_ngram_novelty", "r12_hits",
    "a32_benford", "u8_cdc_apply", "t26_source_overlap",
    "j9_triangles", "a35_theil_sen", "t27_minhash_calibration",
    "tp30_calibration_bins", "tp31_dedup_threshold_curve",
    "a37_psi_drift", "tp33_length_bucket_batches", "g11_grid_knn",
    "j26_type_cooccurrence_pmi", "a40_hodges_lehmann",
    "v10_lsh_cosine_census", "a41_poisson_bootstrap",
    "u9_incremental_agg", "t28_lang_confusion",
    "v11_ivf_probe_curve", "e32_conversion_lag_quantiles",
    "e33_path_trigrams", "r13_degree_ccdf",
    "tp35_repetition_signals", "e34_cohort_retention", "a44_kendall_tau",
    "a45_changepoint", "tp36_quality_gate", "e35_stickiness",
    "e36_funnel_conversion", "q26_ltv_deciles", "t30_lexical_diversity",
    "r14_ppr_chain", "j27_adamic_adar", "tp37_cross_source_oov",
    "a46_seasonality_strength", "e37_gap_regularity", "q27_ship_sla",
    "a48_mann_whitney", "a49_mutual_info", "e38_hurst", "e39_shewhart",
    "j28_rectangles", "j29_reciprocity", "t31_term_burstiness",
    "t32_entropy_rate", "v13_silhouette", "v14_jl_distortion",
    "a50_jensen_shannon", "a51_durbin_watson", "g12_geohash_cells",
    "a52_grubbs", "tp38_coverage_curve", "a53_theil_decomposition",
    "a54_bh_fdr", "t33_heaps_law", "j30_local_bridges",
    "tp39_mixture_temperature", "a55_ljung_box", "a56_kruskal_wallis",
    "v15_rrf_fusion", "v16_ndcg_mrr", "a57_mcnemar", "a58_cochran_q",
    "tp40_brier_decomposition",
    "t34_bigram_surprisal", "r15_modularity", "mm9_frame_diff",
    "a59_friedman_test", "e40_holt_winters", "a60_brown_forsythe",
    "g13_dbscan_core", "v17_lsh_recall_curve", "v18_pq_distortion",
    "a61_two_proportion", "t35_textrank_keywords", "a62_bradley_terry",
    "mm10_audio_energy", "t36_burrows_delta", "a63_cramer_von_mises",
    "e41_croston", "j31_densest_subgraph", "tp41_maxlen_sweep",
    "t37_lang_trigram_distance")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = if (args.length > 1) args(1) else "EXPLAINS.md"
    val b = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sb = new StringBuilder
    sb.append("# EXPLAINS — formatted physical plans for headline queries\n\n")
    sb.append(s"Generated against `$sfDir` by `graft.ExplainDump`. Shows the\n")
    sb.append("plan shapes the engine is designed around: pushed filters,\n")
    sb.append("pruned scan schemas, broadcast joins, whole-stage codegen\n")
    sb.append("(`[codegen id : N]`), and the native expressions.\n")
    Headline.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // finalize AQE so the printed plan is the executed one
      // giant binary literals (e.g. tp21's ~256 KB embedded Bloom filter)
      // print as megabyte hex strings — elide them; the plan SHAPE is the
      // evidence, not the artifact bytes
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        .replaceAll("0x[0-9A-Fa-f]{257,}", "0x…<large binary literal elided>")
      sb.append(s"\n## $name\n\n```\n$plan```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out (${Headline.size} plans)")
    spark.stop()
  }
}
