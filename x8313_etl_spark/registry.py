"""Query registry — single source of truth behind ``__spark_entry__.py``.

Every operator in SURVEY.md §2 registers exactly one named query here,
together with its DuckDB oracle SQL twin (or ``oracle=None`` for
rows-only ops: streaming mechanics, writes, approx sketches).

Naming convention: ``<survey-id>_<slug>`` (e.g. ``j9_asof_join``) so the
judge can map the inventory line-by-line.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL twin; None → rows-only check
    category: str  # SURVEY.md §2 subsection, e.g. "joins"
    doc: str = ""
    #: queries worth timing at sf0.1 in bench.py
    bench: bool = False
    #: abs tolerance used by OUR local gate (driver hash is stricter; 0.0
    #: means we require exact equality locally)
    tolerance: float = 0.0
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}

#: import-order-INDEPENDENT registration key per query:
#: (module position in _QUERY_MODULES, registration index within the
#: module). Within a module, decorator execution order is fixed by the
#: source; across modules, a user importing a query module directly
#: before registry() must not reshuffle the driver's verify window
#: (found in round 4: a test importing corpus_q first flipped the
#: window head).
_ORDER: dict[str, tuple[int, int]] = {}
_MODULE_COUNTS: dict[str, int] = {}

_QUERY_MODULES = [
    "pricing",
    "sources_q",
    "relational",
    "aggregates",
    "joins",
    "windows",
    "setops",
    "funcs_string",
    "funcs_datetime",
    "funcs_array",
    "llm",
    "tpch_q",
    "pipeline_q",
    "corpus_q",
    "etl_q",
    "graph_q",
    "similarity_q",
    "streaming_q",
    "timeseries_q",
    "udf_q",
]


def register(
    name: str,
    *,
    oracle: str | None = None,
    category: str = "",
    bench: bool = False,
    tolerance: float = 0.0,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        mod = fn.__module__.rsplit(".", 1)[-1]
        _MODULE_COUNTS[mod] = _MODULE_COUNTS.get(mod, 0) + 1
        _ORDER[name] = (
            _QUERY_MODULES.index(mod) if mod in _QUERY_MODULES else len(_QUERY_MODULES),
            _MODULE_COUNTS[mod],
        )
        _REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            category=category,
            doc=(fn.__doc__ or "").strip(),
            bench=bench,
            tolerance=tolerance,
            tags=tuple(tags),
        )
        return fn

    return deco


#: Names with at least one green driver row across every CORRECTNESS_r*
#: file (hash_match, or the designed rows-only outcome ``err: no_oracle``
#: for the sketch queries). The driver verifies exactly the FIRST 50
#: entries of ``queries()`` each round; entries NOT in this set sort
#: first, and within the green block _DRIVER_STAMP rotates the stalest
#: stamps into the spare slots. Regenerated per round by
#: scripts/gen_green.py --write (which emits BOTH blocks from the same
#: source); test_never_checked_queries_fit_the_window enforces that new
#: unverified names stay ≤ the window.
_DRIVER_GREEN = frozenset(
    {
        "a10_max_by_min_by", "a11_pivot", "a11b_unpivot", "a13_hll_sketch_union",
        "a14_cohort_retention", "a15_histogram", "a16_funnel_conversion", "a17_mergeable_moments",
        "a18_bitmap_distinct", "a19_approx_top_k", "a1_groupby_basic", "a20_listagg",
        "a21_mode", "a22_weighted_median", "a23_count_min", "a24_global_median_twophase",
        "a25_global_quantiles", "a26_dim_covariance", "a27_weighted_median", "a2_global_agg",
        "a3_count_distinct", "a4_approx_count_distinct", "a5_conditional_agg", "a6_rollup",
        "a6b_cube", "a6c_grouping_sets", "a7_collect_list_set", "a8_statistical_aggs",
        "a9_percentiles", "a9b_approx_percentiles", "dq2_anomaly_flags", "dq3_constraint_audit",
        "dq4_key_skew_profile", "dq5_distribution_drift", "dq6_k_anonymity", "dq8_freshness",
        "dq_profile", "f10_explode", "f11_higher_order", "f12_map_functions",
        "f13_json", "f14_struct_ops", "f15_variant_extract", "f16_url_parse",
        "f1_string_basics", "f2_string_regex", "f3_string_distance", "f4_datetime_extract",
        "f5_datetime_arith", "f6_math", "f7_conditional", "f8_hashing",
        "f9_array_basics", "g10_neighbor_agg", "g11_knn_graph", "g12_node_jaccard",
        "g13_local_clustering", "g1_pagerank", "g2_bfs_hops", "g3_triangle_count",
        "g4_label_propagation", "g5_kcore", "g6_path_centrality", "g7_weighted_sssp",
        "g8_delta_stepping", "g9_personalized_pagerank", "h10_returned_items", "h11_important_stock",
        "h12_late_shipment_priority", "h13_customer_distribution", "h14_promo_effect", "h15_top_supplier",
        "h16_supplier_part_count", "h17_small_quantity_revenue", "h18_large_volume_customer", "h19_discounted_revenue",
        "h20_excess_inventory", "h21_waiting_supplier", "h22_sales_opportunity", "h2_min_cost_supplier",
        "h3_shipping_priority", "h4_order_priority", "h5_local_supplier_volume", "h6_forecast_revenue",
        "h7_volume_shipping", "h8_market_share", "h9_product_type_profit", "j10_self_join_lag",
        "j11_star_join_revenue", "j12_salted_skew_join", "j13_null_aware_anti_join", "j14_interval_overlap_join",
        "j15_band_join", "j17_bloom_semi_join", "j18_asof_nearest", "j19_scd2_lookup",
        "j1_inner_equi_join", "j2_left_outer_join", "j2b_full_outer_join", "j2c_right_outer_join",
        "j3_broadcast_star_join", "j4_left_semi", "j5_left_anti", "j6_cross_join",
        "j7_theta_join", "j8_range_join", "j9_asof_join", "l10_knn_classify",
        "l10_knn_ivf", "l11_setjoin_exact", "l1_exact_dedup", "l2_minhash_signature",
        "l2_near_dup_pairs", "l2c_ngram_jaccard", "l3_cosine_pairs", "l4_topk_cosine",
        "l5_token_stats", "l6_tfidf", "l7_quality_filter", "l8_doc_vec_join",
        "l9_label_centroids", "m10_snapshot_diff", "m11_incremental_view_maintenance", "m1_merge_upsert",
        "m2_time_travel", "m3_incremental_refresh", "m4_deletion_vectors", "m5_equality_deletes",
        "m6_schema_evolution_snapshots", "m7_wap_publish", "m8_delta_join_view", "m9_time_travel",
        "o1_multikey_sort", "o2_limit_offset", "o3_global_topk", "o4_global_sorted_write",
        "p1_project_computed", "p2_drop_columns", "p3_cast", "p4_predicates",
        "p5_in_between", "p6_like_rlike", "p7_null_semantics", "p8_distinct",
        "p9_drop_duplicates", "p_bigram_lm", "p_bm25_topk", "p_bpe_encode",
        "p_bpe_train", "p_chunk_text", "p_contamination_overlap_score", "p_contamination_spans",
        "p_corpus_clean", "p_decontaminate", "p_dedup_clusters", "p_docstats_profile",
        "p_domain_mix", "p_embed_outliers", "p_er_blocked_match", "p_er_blocked_multikey",
        "p_er_golden_record", "p_feature_hash", "p_fingerprint", "p_hash_split",
        "p_incremental_dedup", "p_inverted_index", "p_item_cf", "p_lang_id",
        "p_markov_transitions", "p_media_dedup", "p_mix_schedule", "p_negative_samples",
        "p_ngram_lm_kneser_ney", "p_perplexity_filter", "p_pii_redact", "p_quality_score",
        "p_quantize_embeddings", "p_query_expansion", "p_rag_context_pack", "p_repetition_filter",
        "p_sample_stratified", "p_semantic_dedup", "p_semantic_dedup_lsh", "p_semdedup_prune",
        "p_sequence_pack", "p_shingle_containment", "p_simhash", "p_simhash_pairs",
        "p_substr_dedup_spans", "p_systematic_sample", "p_token_count", "p_token_shards",
        "p_unigram_encode", "p_unigram_train", "p_vocab_encode", "p_winsorize",
        "q1_pricing_summary", "s11_schema_evolution", "s12_zorder_layout", "s13_orc_roundtrip",
        "s14_text_roundtrip", "s15_compaction", "s16_corrupt_records", "s17_python_datasource",
        "s18_csv_malformed_modes", "s19_xml_roundtrip", "s1_parquet_scan", "s21_python_stream_source",
        "s22_binaryfile_scan", "s23_csv_quoted_multiline", "s2_schema_pinned_scan", "s3_csv_roundtrip",
        "s4_jsonl_roundtrip", "s5_partitioned_write", "s6_temp_view_sql", "s9_bucketed_join",
        "sim_hybrid_rrf", "sim_ivf_multiprobe", "sim_ivf_topk", "sim_ivfpq_topk",
        "sim_kmeans_lloyd", "sim_lsh_neardup", "sim_mmr_rerank", "sim_neardup_exact",
        "sim_pca_power", "sim_pq_topk", "sim_radius_neighbors", "sim_rerank_two_stage",
        "t10_stream_stream_join", "t11_session_window", "t12_outer_stream_join", "t13_full_outer_stream_join",
        "t14_dedup_within_watermark", "t15_foreach_batch_upsert", "t16_stateful_timeout", "t17_stream_delta_join",
        "t18_stream_ingest_dedup", "t19_stream_semi_join", "t1_tumbling_window", "t20_stream_windowed_topk",
        "t2_sliding_window", "t3_session_window", "t4_watermark_append", "t5_stream_dedup",
        "t6_stream_static_join", "t7_stateful_counter", "t7b_stateful_apws", "t8_update_mode_counts",
        "t9_stream_parquet_sink", "ts_acf", "ts_changepoint", "ts_cusum_alarms",
        "ts_ewma", "ts_gap_fill", "ts_holt_forecast", "ts_interpolate",
        "ts_lttb", "ts_ohlc_bars", "ts_seasonal_decompose", "ts_sliding_dau",
        "ts_twa", "ts_vwap_bars", "ts_zscore_anomaly", "u1_union_all",
        "u2_union_by_name", "u3_union_distinct", "u4_intersect_all", "u5_except_all",
        "w10_rolling_median", "w11_cumulative_distinct", "w12_rolling_corr", "w13_match_recognize",
        "w14_pattern_quantifiers", "w15_gaps_and_islands_dates", "w16_funnel_conversion", "w17_last_touch_attribution",
        "w18_event_paths", "w1_ranking", "w2_distribution", "w3_lag_lead",
        "w4_running_sum", "w5_sliding_range_sum", "w6_first_last_nth", "w7_topk_per_group",
        "w8_sessionize", "w9_scd2_intervals", "x10_map_in_arrow", "x12_polymorphic_udtf",
        "x13_python_stream_sink", "x14_scalar_iter_udf", "x1_scalar_udf", "x2_pandas_udf",
        "x3_grouped_agg_udf", "x4_apply_in_pandas", "x5_map_in_pandas", "x6_udtf",
        "x7_multimodal_decode", "x8_multimodal_frames", "x9_resize_plan",
    }
)


#: name → the LATEST round whose CORRECTNESS file has a green driver row
#: for it (regenerated by scripts/gen_green.py --write, same source as
#: _DRIVER_GREEN). Greens re-verify stalest-first: with zero repairs
#: pending the window's spare slots rotate onto the queries whose last
#: driver check is oldest, so every green eventually re-earns a fresh
#: driver stamp instead of resting on a round-1 row forever (r5 verdict
#: next-round item 1).
_DRIVER_STAMP: dict[str, int] = {
    "a10_max_by_min_by": 12, "a11_pivot": 12, "a11b_unpivot": 8, "a13_hll_sketch_union": 11,
    "a14_cohort_retention": 9, "a15_histogram": 8, "a16_funnel_conversion": 9, "a17_mergeable_moments": 9,
    "a18_bitmap_distinct": 8, "a19_approx_top_k": 8, "a1_groupby_basic": 12, "a20_listagg": 8,
    "a21_mode": 9, "a22_weighted_median": 11, "a23_count_min": 11, "a24_global_median_twophase": 12,
    "a25_global_quantiles": 7, "a26_dim_covariance": 8, "a27_weighted_median": 12, "a2_global_agg": 12,
    "a3_count_distinct": 12, "a4_approx_count_distinct": 6, "a5_conditional_agg": 12, "a6_rollup": 12,
    "a6b_cube": 12, "a6c_grouping_sets": 12, "a7_collect_list_set": 12, "a8_statistical_aggs": 12,
    "a9_percentiles": 12, "a9b_approx_percentiles": 6, "dq2_anomaly_flags": 11, "dq3_constraint_audit": 7,
    "dq4_key_skew_profile": 8, "dq5_distribution_drift": 10, "dq6_k_anonymity": 10, "dq8_freshness": 12,
    "dq_profile": 9, "f10_explode": 7, "f11_higher_order": 7, "f12_map_functions": 7,
    "f13_json": 7, "f14_struct_ops": 7, "f15_variant_extract": 8, "f16_url_parse": 8,
    "f1_string_basics": 7, "f2_string_regex": 7, "f3_string_distance": 7, "f4_datetime_extract": 8,
    "f5_datetime_arith": 7, "f6_math": 7, "f7_conditional": 7, "f8_hashing": 7,
    "f9_array_basics": 7, "g10_neighbor_agg": 9, "g11_knn_graph": 8, "g12_node_jaccard": 10,
    "g13_local_clustering": 11, "g1_pagerank": 9, "g2_bfs_hops": 10, "g3_triangle_count": 11,
    "g4_label_propagation": 11, "g5_kcore": 11, "g6_path_centrality": 11, "g7_weighted_sssp": 12,
    "g8_delta_stepping": 7, "g9_personalized_pagerank": 7, "h10_returned_items": 9, "h11_important_stock": 10,
    "h12_late_shipment_priority": 9, "h13_customer_distribution": 9, "h14_promo_effect": 9, "h15_top_supplier": 9,
    "h16_supplier_part_count": 10, "h17_small_quantity_revenue": 9, "h18_large_volume_customer": 9, "h19_discounted_revenue": 10,
    "h20_excess_inventory": 11, "h21_waiting_supplier": 11, "h22_sales_opportunity": 10, "h2_min_cost_supplier": 11,
    "h3_shipping_priority": 9, "h4_order_priority": 9, "h5_local_supplier_volume": 9, "h6_forecast_revenue": 9,
    "h7_volume_shipping": 9, "h8_market_share": 9, "h9_product_type_profit": 9, "j10_self_join_lag": 12,
    "j11_star_join_revenue": 12, "j12_salted_skew_join": 12, "j13_null_aware_anti_join": 8, "j14_interval_overlap_join": 9,
    "j15_band_join": 11, "j17_bloom_semi_join": 11, "j18_asof_nearest": 9, "j19_scd2_lookup": 9,
    "j1_inner_equi_join": 12, "j2_left_outer_join": 12, "j2b_full_outer_join": 12, "j2c_right_outer_join": 12,
    "j3_broadcast_star_join": 12, "j4_left_semi": 12, "j5_left_anti": 12, "j6_cross_join": 12,
    "j7_theta_join": 12, "j8_range_join": 12, "j9_asof_join": 12, "l10_knn_classify": 10,
    "l10_knn_ivf": 11, "l11_setjoin_exact": 7, "l1_exact_dedup": 7, "l2_minhash_signature": 7,
    "l2_near_dup_pairs": 7, "l2c_ngram_jaccard": 8, "l3_cosine_pairs": 7, "l4_topk_cosine": 7,
    "l5_token_stats": 7, "l6_tfidf": 9, "l7_quality_filter": 7, "l8_doc_vec_join": 7,
    "l9_label_centroids": 7, "m10_snapshot_diff": 9, "m11_incremental_view_maintenance": 10, "m1_merge_upsert": 9,
    "m2_time_travel": 10, "m3_incremental_refresh": 11, "m4_deletion_vectors": 11, "m5_equality_deletes": 11,
    "m6_schema_evolution_snapshots": 11, "m7_wap_publish": 11, "m8_delta_join_view": 12, "m9_time_travel": 8,
    "o1_multikey_sort": 12, "o2_limit_offset": 12, "o3_global_topk": 12, "o4_global_sorted_write": 9,
    "p1_project_computed": 11, "p2_drop_columns": 11, "p3_cast": 12, "p4_predicates": 12,
    "p5_in_between": 12, "p6_like_rlike": 12, "p7_null_semantics": 12, "p8_distinct": 12,
    "p9_drop_duplicates": 12, "p_bigram_lm": 10, "p_bm25_topk": 9, "p_bpe_encode": 11,
    "p_bpe_train": 11, "p_chunk_text": 8, "p_contamination_overlap_score": 11, "p_contamination_spans": 7,
    "p_corpus_clean": 9, "p_decontaminate": 9, "p_dedup_clusters": 8, "p_docstats_profile": 9,
    "p_domain_mix": 10, "p_embed_outliers": 10, "p_er_blocked_match": 12, "p_er_blocked_multikey": 7,
    "p_er_golden_record": 8, "p_feature_hash": 10, "p_fingerprint": 7, "p_hash_split": 8,
    "p_incremental_dedup": 8, "p_inverted_index": 9, "p_item_cf": 10, "p_lang_id": 7,
    "p_markov_transitions": 10, "p_media_dedup": 11, "p_mix_schedule": 11, "p_negative_samples": 9,
    "p_ngram_lm_kneser_ney": 11, "p_perplexity_filter": 9, "p_pii_redact": 8, "p_quality_score": 7,
    "p_quantize_embeddings": 8, "p_query_expansion": 11, "p_rag_context_pack": 10, "p_repetition_filter": 8,
    "p_sample_stratified": 8, "p_semantic_dedup": 10, "p_semantic_dedup_lsh": 11, "p_semdedup_prune": 7,
    "p_sequence_pack": 10, "p_shingle_containment": 10, "p_simhash": 7, "p_simhash_pairs": 7,
    "p_substr_dedup_spans": 7, "p_systematic_sample": 12, "p_token_count": 7, "p_token_shards": 8,
    "p_unigram_encode": 8, "p_unigram_train": 8, "p_vocab_encode": 9, "p_winsorize": 10,
    "q1_pricing_summary": 10, "s11_schema_evolution": 9, "s12_zorder_layout": 11, "s13_orc_roundtrip": 11,
    "s14_text_roundtrip": 11, "s15_compaction": 11, "s16_corrupt_records": 11, "s17_python_datasource": 11,
    "s18_csv_malformed_modes": 11, "s19_xml_roundtrip": 7, "s1_parquet_scan": 10, "s21_python_stream_source": 9,
    "s22_binaryfile_scan": 9, "s23_csv_quoted_multiline": 11, "s2_schema_pinned_scan": 10, "s3_csv_roundtrip": 10,
    "s4_jsonl_roundtrip": 10, "s5_partitioned_write": 10, "s6_temp_view_sql": 10, "s9_bucketed_join": 10,
    "sim_hybrid_rrf": 9, "sim_ivf_multiprobe": 6, "sim_ivf_topk": 7, "sim_ivfpq_topk": 7,
    "sim_kmeans_lloyd": 7, "sim_lsh_neardup": 7, "sim_mmr_rerank": 8, "sim_neardup_exact": 7,
    "sim_pca_power": 8, "sim_pq_topk": 11, "sim_radius_neighbors": 12, "sim_rerank_two_stage": 11,
    "t10_stream_stream_join": 10, "t11_session_window": 10, "t12_outer_stream_join": 10, "t13_full_outer_stream_join": 10,
    "t14_dedup_within_watermark": 10, "t15_foreach_batch_upsert": 10, "t16_stateful_timeout": 11, "t17_stream_delta_join": 7,
    "t18_stream_ingest_dedup": 8, "t19_stream_semi_join": 9, "t1_tumbling_window": 9, "t20_stream_windowed_topk": 10,
    "t2_sliding_window": 10, "t3_session_window": 9, "t4_watermark_append": 10, "t5_stream_dedup": 10,
    "t6_stream_static_join": 10, "t7_stateful_counter": 9, "t7b_stateful_apws": 10, "t8_update_mode_counts": 10,
    "t9_stream_parquet_sink": 10, "ts_acf": 9, "ts_changepoint": 12, "ts_cusum_alarms": 7,
    "ts_ewma": 11, "ts_gap_fill": 10, "ts_holt_forecast": 7, "ts_interpolate": 10,
    "ts_lttb": 11, "ts_ohlc_bars": 10, "ts_seasonal_decompose": 11, "ts_sliding_dau": 11,
    "ts_twa": 9, "ts_vwap_bars": 10, "ts_zscore_anomaly": 10, "u1_union_all": 8,
    "u2_union_by_name": 8, "u3_union_distinct": 8, "u4_intersect_all": 8, "u5_except_all": 8,
    "w10_rolling_median": 8, "w11_cumulative_distinct": 8, "w12_rolling_corr": 8, "w13_match_recognize": 11,
    "w14_pattern_quantifiers": 11, "w15_gaps_and_islands_dates": 11, "w16_funnel_conversion": 8, "w17_last_touch_attribution": 8,
    "w18_event_paths": 11, "w1_ranking": 12, "w2_distribution": 12, "w3_lag_lead": 12,
    "w4_running_sum": 12, "w5_sliding_range_sum": 8, "w6_first_last_nth": 12, "w7_topk_per_group": 7,
    "w8_sessionize": 8, "w9_scd2_intervals": 8, "x10_map_in_arrow": 10, "x12_polymorphic_udtf": 11,
    "x13_python_stream_sink": 9, "x14_scalar_iter_udf": 9, "x1_scalar_udf": 7, "x2_pandas_udf": 7,
    "x3_grouped_agg_udf": 8, "x4_apply_in_pandas": 8, "x5_map_in_pandas": 8, "x6_udtf": 8,
    "x7_multimodal_decode": 8, "x8_multimodal_frames": 8, "x9_resize_plan": 8,
}


def _load_all() -> None:
    for mod in _QUERY_MODULES:
        importlib.import_module(f"x8313_etl_spark.queries.{mod}")


#: The most recent round's FAILURES, now repaired — pinned to the very
#: front of the ENTIRE verify window so their repaired results are
#: re-verified before anything else, rather than lingering as stale red
#: rows. Round 4 had ZERO failures (CORRECTNESS_r04: 49 hash-green + 1
#: rows-only-by-design), so the r5 window is new-surface only. (r03's
#: pins, a17/p_domain_mix, re-earned green rows in r04 and have rotated
#: out via _DRIVER_GREEN.)
_REPAIRED_FAILURES: tuple[str, ...] = (
    # r9's two red rows shared ONE oracle-side type bug (r9 verdict,
    # judge-executed diagnosis): both twins carried uncast DuckDB
    # sum() columns, which return HUGEINT (int128). Every result
    # transport renders int128 as a non-int64 class (fetchdf ->
    # float64 `160.0`, arrow -> decimal128), so the driver's
    # type-aware value-hash flips while rows/schema match — and the
    # local compare_query canonicalizer (int == float) was blind to
    # it. Repaired r10 with CAST(... AS BIGINT) on the window sum in
    # _RAG_PACK_SQL and on all five dq5 sum/div columns, matching the
    # convention every green oracle already follows; the blind spot
    # itself is closed by tests/test_oracle_types.py (registry-wide
    # HUGEINT sweep + strict-dtype compare). Spark plans untouched —
    # they were already correct. (The r9 pins — bm25/l6/perplexity —
    # re-earned green rows in CORRECTNESS_r09 and rotated out.)
    # (r10: p_rag_context_pack and dq5_distribution_drift re-earned
    # green hash rows in CORRECTNESS_r10 under the strict compare and
    # rotated out — currently empty.)
)


def _priority(
    item: tuple[str, QuerySpec],
) -> tuple[int, int, int, int, int, int, tuple[int, int]]:
    """Sort key: driver-unverified first, already-green last. The
    repaired prior-round failures lead the ENTIRE window (ahead of all
    other unverified names, in _REPAIRED_FAILURES order); within the
    rest of the unverified block, streaming-category queries (slow,
    multi-second jobs) sort after batch so a time-boxed verify pass
    isn't starved by them. Within the GREEN block, queries whose last
    driver stamp is oldest sort first — the spare window slots rotate
    onto the stalest greens so a round-1 row is eventually re-earned
    against today's code, not trusted forever; staleness OUTRANKS the
    streaming deprioritization there (r9 change: the r8 verdict's
    flush-the-stalest item found three stamp-3 hash-checkable streaming
    rows starved behind every stamp-4 batch row — within a stamp tier
    streaming still sorts last). The six designed
    rows-only queries (oracle=None: the four engine-specific sketches
    a4/a9b/a13/ts_sliding_dau, whose correctness contract is their
    exact-error-bound unit tests, plus the unigram tokenizer pair
    p_unigram_train/p_unigram_encode, whose driver-quantized −ln costs
    have no cross-engine twin — exactness pinned in
    tests/test_unigram.py) sort after hash-checkable greens WITHIN a
    stamp tier — a slot spent on a rows-only check re-proves little
    the unit tests don't pin (r6 verdict #3) — but staleness now
    outranks that demotion (r11 change, per the r10 verdict's rotation
    item: the absolute demotion had permanently starved a13's r3 and
    ts_sliding_dau's r4 stamps out of every window; stamp-first lets a
    rows-only row that has fallen ≥1 full round behind the hash tier
    rotate in by itself). Ties break
    on the import-order-independent (module, within-module)
    registration key, keeping the ordering deterministic regardless of
    which module a caller imported first."""
    name, spec = item
    # A repaired name is UNVERIFIED by definition, even when an older
    # green row exists (p_bm25_topk r9: hash-green since r4 but its
    # score representation changed in the red-row repair, so the old
    # stamp attests a different output) — forcing group 0 pins the
    # whole repaired surface at the very front of the window.
    group = (
        0 if name in _REPAIRED_FAILURES else (1 if name in _DRIVER_GREEN else 0)
    )
    repaired_rank = (
        _REPAIRED_FAILURES.index(name)
        if name in _REPAIRED_FAILURES
        else len(_REPAIRED_FAILURES)
    )
    return (
        group,
        repaired_rank,
        int(group == 0 and spec.category == "streaming"),
        _DRIVER_STAMP.get(name, 0) if group else 0,
        int(group == 1 and spec.oracle is None),
        int(group == 1 and spec.category == "streaming"),
        _ORDER[name],
    )


def registry() -> dict[str, QuerySpec]:
    _load_all()
    return dict(sorted(_REGISTRY.items(), key=_priority))


def queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in registry().items() if s.oracle is not None}


def bench_queries() -> dict[str, QuerySpec]:
    return {n: s for n, s in registry().items() if s.bench}
