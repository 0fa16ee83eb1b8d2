"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship feed query on sf0.001 (SURVEY.md §3.2).
queries()     -> every implemented operator from SURVEY.md §2, keyed by name.
oracle_sql()  -> matching DuckDB SQL for the value-hash correctness gate;
                 keys absent here get the weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: all-users feed top-k (newest 10 activities of followed
    users per follower) on sf0.001."""
    from user_feed_cdc_spark.operators.feed import flagship

    return flagship(spark, SF0001)


def _registry() -> tuple[dict[str, Callable], dict[str, str]]:
    from user_feed_cdc_spark.operators import (
        asof,
        cdc,
        dedup,
        event_windows,
        feed,
        multimodal,
        pipeline,
        relational,
        similarity,
        sketches,
        textanalysis,
        tpch,
    )
    from user_feed_cdc_spark.sources import formats

    merged: dict[str, Callable] = {}
    oracles: dict[str, str] = {}
    for mod in (
        similarity,
        multimodal,
        cdc,
        event_windows,
        asof,
        pipeline,
        sketches,
        dedup,
        textanalysis,
        feed,
        relational,
        tpch,
        formats,
    ):
        merged.update(mod.QUERIES)
        oracles.update(mod.ORACLES)

    # Registration order is the driver's check order, and the driver only
    # certifies a PREFIX of the registry (each round covers the first 50
    # entries). Rotation policy (documented since r08): NEW +
    # DRIVER-FAILED entries first, then never-certified, then
    # CODE-CHANGED-since-last-driver-row, then stalest-certification-
    # first. Backlog has been ZERO since r10 — the union of
    # CORRECTNESS_r01..r13 covers all pre-r14 entries, and the whole
    # list (head AND tail) is now ordered stalest-driver-row-first so
    # future windows pick up rotation debt automatically.
    # Every entry additionally passes the full local oracle gate every
    # round (tools/check_correctness.py, all entries; output committed
    # as CORRECTNESS_LOCAL_r{N}.json so new entries always have recorded
    # certification before their driver row).
    priority = [
        # ---- r17 window (50; tools/preflight_window.py replays
        # exactly this prefix) ----
        # Rotation policy (r08): CODE-CHANGED-since-last-driver-row
        # first. The r17 optimization round touched, in order: the
        # txn-stream family (dv-delta null guard + the empty-delta IVM
        # refresh skip + the driver-resident memory-sink coalesce),
        # the python stream datasource (sink coalesce), the
        # label-propagation clustering consumers (input-derived loop
        # shuffle width), and every run_to_memory live gate (sink
        # coalesce; they also carry the raw-FileContext WAL change and
        # the input-derived state partitioning) —
        "streaming_txn_source_live", "streaming_txn_cdf_live",
        "streaming_txn_cdf_ivm_live", "streaming_txn_source_exec_live",
        "source_python_stream_datasource", "dedup_minhash_lsh",
        "dedup_minhash_md5_clusters", "pipeline_training_funnel",
        "graph_connected_components", "streaming_hourly_rollup_live",
        "streaming_session_stats_live", "streaming_dedup_live",
        "streaming_hourly_users_live", "streaming_sliding_counts_live",
        "streaming_enrich_join_live", "streaming_interval_join_live",
        "streaming_left_outer_join_live", "streaming_two_level_rollup_live",
        "streaming_stateful_totals_live", "streaming_dynamic_session_live",
        "streaming_activity_bitmap_live", "streaming_html_strip_live",
        "streaming_binaryfile_media_live", "streaming_avro_events_live",
        "streaming_avro_nested_live",
        # — then the r16 optimization block this window was queued for
        # (code-changed r16, all re-certified by the r16 AND r17 full
        # local gates):
        "asof_cogrouped_merge", "source_python_stream_writer",
        "text_rake_keywords", "text_pmi_collocations",
        "events_benford_first_digit", "sql_scripting_control_flow",
        "events_median_halfsample_ci", "pipeline_decontaminate",
        "text_dup_ngram_fraction", "dedup_minhash_md5_pairs", "dedup_simhash",
        "text_char_entropy", "source_json_zstd_roundtrip",
        "source_txn_log_identity_columns", "source_parquet_zstd_roundtrip",
        "source_txn_log_optimize_dv", "source_avro_roundtrip",
        "source_txn_log_compact_small_files", "source_partitioned_dpp",
        "cdc_scd2_pointintime_join", "pipeline_observed_metrics",
        "source_txn_log_multipart_checkpoint",
        "source_txn_log_hidden_partitioning", "pipeline_luhn_ccn_filter",
        "source_txn_log_string_stats_pruning",
        # ---- window boundary (first 50 above) ----
        # remainder: stalest driver row first (unchanged policy); the
        # r16 window (certified r16, the freshest rows) closes the list.
        "multimodal_image_png_stats", "multimodal_image_png16_stats",
        "multimodal_image_png_trns_stats",
        "multimodal_image_png_lowdepth_stats", "events_dynamic_session_stats",
        "events_value_histogram", "events_anomaly_zscore",
        "events_markov_transitions", "events_activity_streaks",
        "events_daily_spine", "feed_ranked_personalized",
        "similarity_matryoshka_topk", "text_boilerplate_ngrams",
        "text_edit_distance_pairs", "text_bpe_merge_pairs",
        "text_bigram_surprisal", "text_udtf_sentences",
        "pipeline_boilerplate_filter", "pipeline_quality_mixture",
        "pipeline_reservoir_sample", "pipeline_pii_scrub",
        "pipeline_profile_columns", "pipeline_quality_checks",
        "cdc_timetravel_lookup", "sql_udf_pricing", "json_variant_stats",
        "feed_topk_per_user", "events_dow_seasonality",
        "cdc_lifecycle_violations", "similarity_pq_topk",
        "multimodal_audio_stats", "text_vocab_oov_rate",
        "text_js_divergence_sources", "pipeline_data_card",
        "events_revenue_concentration", "pipeline_shard_skew_report",
        "tpch_q18_large_orders", "tpch_q17_small_quantity_revenue",
        "events_survival_km", "pipeline_temperature_mixture",
        "sketch_heavy_hitters_bounded", "cdc_incremental_agg_maintenance",
        "text_phrase_search", "tpch_q21_waiting_suppliers",
        "events_cuped_adjustment", "pipeline_weighted_sample",
        "events_power_analysis", "source_bucketed_join",
        "events_stickiness_ratio", "events_growth_accounting",
        "text_arrow_byte_stats", "tpch_q4_priority_exists",
        "tpch_q5_local_supplier_volume", "tpch_q7_volume_shipping",
        "tpch_q8_market_share", "tpch_q10_returned_items",
        "tpch_q13_customer_distribution", "tpch_q14_promo_revenue",
        "tpch_q15_top_supplier", "tpch_q19_disjunctive_revenue",
        "tpch_q20_excess_suppliers", "tpch_q22_sales_opportunity",
        "tpch_q2_min_cost_supplier", "tpch_q6_forecast_revenue",
        "tpch_q9_product_type_profit", "tpch_q11_important_parts",
        "tpch_q12_latency_priority", "tpch_q16_supplier_diversity",
        "similarity_lsh_recall", "events_cusum_changepoint",
        "similarity_mmr_topk", "graph_personalized_pagerank",
        "source_txn_log_data_skipping", "events_holt_linear_trend",
        "text_bpe_apply_merges", "pipeline_score_calibration",
        "pipeline_k_anonymity", "dedup_minhash_quality",
        "similarity_hard_negatives", "pipeline_blocklist_filter",
        "dedup_simhash_quality", "events_activity_bitmap",
        "pipeline_token_budget_epochs", "events_psi_drift",
        "events_incident_overlap_join", "events_theil_sen_trend",
        "events_mahalanobis_outliers", "events_sequence_pattern",
        "events_autocorrelation", "source_xml_roundtrip",
        "multimodal_audio_spectrum", "dedup_containment_pairs",
        "dedup_source_signatures", "similarity_range_search",
        "cdc_snapshot_diff", "graph_link_prediction", "similarity_ann_lsh",
        "multimodal_feature_extract", "sketch_distinct_users",
        "sketch_value_quantiles", "dedup_embedding_lsh", "multimodal_resize",
        "graph_triangle_count", "cdc_canonical_activities",
        "events_sliding_counts", "events_session_stats",
        "events_attribution_join", "source_txn_log_snapshot",
        "source_txn_log_deletes", "source_txn_log_time_travel",
        "source_txn_log_bloom_index", "multimodal_video_avi_stats",
        "events_trending_users", "range_join_user_pairs",
        "asof_last_purchase", "asof_last_purchase_tolerance",
        "dedup_exact_latest_event", "cdc_scd2_history",
        "text_unigram_surprisal", "similarity_knn_join",
        "pipeline_decontaminate_fuzzy", "similarity_binary_hamming_topk",
        "similarity_rerank_topk", "similarity_ivf_kmeans_topk",
        "multimodal_binary_stats", "multimodal_frame_sample",
        "cdc_upsert_state", "cdc_metadata_map_stats", "cdc_dead_letter_stats",
        "split_stratified_train", "pipeline_corpus_clean", "dedup_exact_docs",
        "dedup_ngram_jaccard", "dedup_incremental_new_docs",
        "dedup_embedding_cosine", "text_token_counts", "text_doc_stats",
        "text_quality_scores", "text_lang_id", "text_fingerprints",
        "text_regex_tokens", "text_tfidf_top_terms", "text_repetition_scores",
        "pipeline_zorder_stats", "source_txn_log_column_mapping",
        "source_txn_log_partition_values", "dedup_substring_rewrite",
        "source_state_store_read", "text_udtf_polymorphic",
        "events_holt_winters_seasonal", "source_txn_log_delete_rewrite",
        "source_txn_log_optimize_cluster", "source_txn_log_schema_evolution",
        "events_max_concurrent_sessions", "asof_next_purchase",
        "similarity_lsh_md5_buckets", "sketch_distinct_users_bounded",
        "events_daily_retention", "events_cohort_matrix", "pricing_summary",
        "filter_project", "join_inner", "join_left_outer", "join_semi",
        "join_anti", "join_broadcast_dim", "join_multiway_region_revenue",
        "agg_distinct", "text_html_strip", "events_ols_value_hour_dow",
        "events_logistic_purchase_hour", "source_txn_log_row_tracking",
        "events_poisson_daily_purchases", "multimodal_video_mjpeg_stats",
        "multimodal_video_mjpeg_420_stats",
        "multimodal_image_progressive_stats",
        "multimodal_video_rle8_delta_stats", "multimodal_gif_animation_stats",
        "multimodal_audio_adpcm_stats", "pipeline_multimodal_funnel",
        "multimodal_resize_certified", "multimodal_phash_dedup",
        "multimodal_codec_fallback", "source_txn_log_writer_roundtrip",
        "streaming_txn_sink_live", "source_txn_log_cdf",
        "source_txn_log_cdf_ivm", "source_txn_log_optimize_zorder",
        "source_txn_log_timestamp_travel", "agg_percentiles",
        "agg_salted_hot_keys", "rollup_flag_status", "cube_status_priority",
        "grouping_sets_revenue", "case_when_pivot", "unpivot_flag_measures",
        "set_ops", "sort_limit_topk", "window_rank_family",
        "window_running_analytics", "window_range_frame",
        "window_topk_per_customer", "subquery_scalar_and_correlated",
        "string_funcs", "math_funcs", "date_funcs", "date_arithmetic",
        "json_extract", "null_safe_funcs", "array_funcs",
        "events_funnel_conversion", "source_binaryfile_media",
        "source_json_gzip_roundtrip", "text_bpe_learn_iterations",
        "source_json_bzip2_roundtrip", "pipeline_gopher_rules",
        "source_txn_log_check_constraints",
        "source_txn_log_generated_columns", "source_txn_log_restore",
        "source_txn_log_shallow_clone", "source_txn_log_checkpoint",
        "dedup_simhash_md5", "multimodal_rollup", "pipeline_pack_sequences",
        "pipeline_shuffle_shards", "pipeline_source_mixture",
        "pipeline_mixture_weighted", "similarity_cosine_topk",
        "similarity_ivf_topk", "similarity_label_centroid_dist",
        "similarity_quantized_topk", "text_bigram_top_terms",
        "text_chunk_documents", "text_lang_rollup",
        "text_winnow_fingerprints", "sketch_value_quantiles_bounded",
        "sketch_top_users", "sketch_top_users_bounded",
        "sketch_bloom_prefilter", "sketch_distinct_overlap_bounded",
        "sketch_union_daily_to_weekly", "agg_sorted_strings",
        "agg_argmax_funcs", "join_lateral_topk", "join_salted_skew",
        "join_null_aware_anti", "window_value_functions",
        "pivot_event_type_revenue", "graph_two_hop_reach", "graph_pagerank",
        "graph_reachability_recursive", "events_rfm_segments",
        # ---- r16 window (freshest certification; one member,
        # source_python_stream_datasource, moved into the r17 window) ----
        "source_avro_nested_roundtrip", "pipeline_ccnet_buckets",
        "cdc_merge_into_state", "text_tfidf_cosine_pairs",
        "events_moment_profile", "events_corr_value_hour",
        "events_iqr_outliers", "union_by_name_evolution",
        "string_collation_groups", "events_daily_locf",
        "feed_page_parameterized", "source_python_datasource_write",
        "pipeline_linear_quality_score", "window_distribution_ranks",
        "pipeline_contamination_score", "events_ab_test_ztest",
        "tpch_q3_shipping_priority", "events_day_over_day_growth",
        "events_ewma_values", "similarity_pandas_udf_normalize",
        "text_hashed_features", "dedup_substring_windows", "dedup_semantic",
        "pipeline_dsir_weights", "text_zipf_slope", "asof_nearest_purchase",
        "sql_pipe_pricing", "text_inverted_index", "text_bm25_topk",
        "events_groupmap_ranks", "pipeline_curriculum_order",
        "events_conversion_wilson_ci", "events_type_cooccurrence",
        "events_lag_features", "events_multitouch_attribution",
        "source_orc_roundtrip", "source_csv_roundtrip",
        "source_json_roundtrip", "source_partitioned_pruned",
        "source_schema_evolution", "source_json_permissive",
        "source_python_datasource", "events_grouped_agg_mad",
        "feed_single_user_page", "feed_single_user_page_offset",
        "join_full_outer", "events_hourly_rollup",
    ]
    missing = [n for n in priority if n not in merged]
    assert not missing, f"priority list names unknown queries: {missing}"
    dupes = sorted({n for n in priority if priority.count(n) > 1})
    assert not dupes, f"priority list repeats names: {dupes}"
    queries = {n: merged[n] for n in priority}
    queries.update(merged)
    return queries, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
