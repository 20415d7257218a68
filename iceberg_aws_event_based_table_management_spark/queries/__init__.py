"""Query modules; importing them populates the registry.

Import order IS registration order.  The driver grades the first 50
registered queries per round, so the order below is a rotation
schedule: queries that have never produced a green driver row come
first, already-proven ones last.  Round 5's window (the explicit
WINDOW_R5 list below) = the 38 never-driver-graded queries staged as
round5 candidates last round, plus the 3 orphans the r4 verdict
called out: dedup_near_candidates and dedup_simhash_buckets (gained
SQL oracles in round 3 but sat in the unordered tail of every window
since) and dedup_near_clusters (the one r4 red row — locally
oracle-exact, failed only on its array<long> members column, now
emitted as a comma-joined string).  41 names; the remaining 9 slots
are filled by round-4 greens so a regression there would be caught.
Round 4's window (49/50 green) moves to the tail.
"""

from __future__ import annotations

_LOADED = False


def load() -> None:
    global _LOADED
    if _LOADED:
        return
    from . import (  # noqa: F401
        relational,
        relational_ext,
        scalars,
        sorts_sets,
        similarity,
        text,
        udfs,
        streaming_batch,
        pipeline_ext,
        pipeline_ext2,
        pipeline_ext3,
        pipeline_ext4,
        pipeline_ext5,
        aggregates,
        composite,
        control_plane,
        dedup,
        lifecycle,
        maintenance,
        pipeline_ext6,  # LAST three: import sibling modules' oracle fragments
        pipeline_ext7,
        pipeline_ext8,
        pipeline_ext9,
        pipeline_ext10,
        pipeline_ext11,
        pipeline_ext12,
        pipeline_ext13,
        pipeline_ext14,
        pipeline_ext15,
        pipeline_ext16,
        pipeline_ext17,
    )

    from .. import registry

    # Round-5 grading window: exactly the first 50 names below.
    # (a) 38 never-driver-graded queries (staged as round5 last round);
    # (b) 3 orphans from the r4 verdict: two oracle-added-after-grading
    #     dedup queries stuck in the tail, plus the fixed E25;
    # (c) 9 round-4 greens as regression canaries.
    window_r5 = [
        # (a) never graded — pipeline/text/similarity tail
        "shard_assignment_balanced",
        "tfidf_top_terms",
        "corpus_mixture_weights",
        "pack_sequences_token_budget",
        "dedup_cluster_survivors",
        "curriculum_interleave",
        "source_token_budget",
        "corpus_length_histogram",
        "quality_gate_adaptive",
        "split_train_val_test",
        "text_rarity_score",
        "corpus_mixture_apply",
        "audit_k_anonymity",
        "text_repetition_stats",
        "text_heuristic_filter",
        "text_chunk_overlap",
        "pipeline_rag_corpus",
        "embedding_label_outliers",
        "embedding_normalize_quantize",
        "profile_table_stats",
        "audit_referential_integrity",
        "window_forward_fill",
        "window_interpolate_linear",
        # (a) round-4 additions (E50-E63), never graded
        "text_boilerplate_ngrams",
        "vocab_pair_merge_counts",
        "seqlen_bucket_padding",
        "kmeans_assign_step",
        "bloom_membership_audit",
        "wap_publish_gate",
        "sample_quality_deciles",
        "corpus_term_drift",
        "route_quarantine",
        "dedup_token_savings",
        "compaction_benefit_estimate",
        "snapshot_retention_policies",
        "quantile_histogram_sketch",
        "dedup_incremental_neardup",
        "stream_session_real",
        # (b) oracles added round 3, orphaned in the tail ever since
        "dedup_near_candidates",
        "dedup_simhash_buckets",
        # (b) the one r4 red row — members now a comma-joined string
        "dedup_near_clusters",
        # (c) round-4 greens as regression canaries (events/NTZ reader,
        #     streaming, dedup pipeline, control-plane decision)
        "events_scan",
        "should_optimize_decision",
        "stream_tumbling_commits_per_hour",
        "stream_merge_upsert",
        "dedup_near_verified",
        "dedup_incremental_batch",
        "agg_array_collect",
        "window_range_frame",
        "merge_upsert_orders",
    ]
    # ROUND-6 HANDOFF (do not reorder before the round-5 grading run):
    # next round's 50-slot window should lead with the still-never-
    # driver-graded tail — the round-5-built operators
    # (dedup_semantic_semdedup, dedup_segment_windows,
    # text_interdoc_ngram_coverage, stream_join_view_purchase,
    # ann_recall_audit, text_quality_classifier,
    # dedup_cross_source_matrix, event_transition_matrix,
    # event_funnel_conversion, event_cohort_retention,
    # files_skipping_estimate, rolling_active_users,
    # join_key_skew_diagnosis, dedup_containment_pairs,
    # stream_static_enrichment, plus the E79-E85 batch:
    # sample_weighted_reservoir, sketch_heavy_hitters_cms,
    # event_path_signatures, text_char_entropy_filter,
    # source_length_gini, event_cooccurrence_pmi,
    # event_interarrival_stats, the E86-E90 batch:
    # source_lang_mix_entropy, benford_first_digit_audit,
    # source_length_zscore_outliers, vocab_oov_rate,
    # linkage_blocked_nearest_name, the Q7/Q15 composites:
    # composite_nation_trade_volume, composite_top_supplier, the
    # E91-E94 batch: equidepth_histogram, dq_expectations_report,
    # scd2_user_state_intervals, event_disorder_audit, and E95/E96:
    # pagerank_integer_bipartite, twap_user_daily, and E97/E98:
    # robust_mad_outliers, user_longest_streak, and E99/E100:
    # distinct_kmv_estimate, join_cardinality_sampled_estimate, and
    # the E101-E106 batch: split_cluster_holdout,
    # text_winnow_fingerprints, embedding_pq_codes,
    # agg_incremental_maintenance, files_overlap_depth,
    # distinct_hll_neutral, and the E107-E112 batch:
    # file_bloom_pruning_estimate, table_freshness_sla,
    # distinct_kmv_set_ops, source_length_trend,
    # sink_partitioned_pruning, commit_seasonality_profile, and the
    # E113-E118 batch: densify_daily_commits, attribution_multi_touch,
    # basket_part_lift, dedup_prefix_filter_pairs,
    # sort_compaction_zorder_quantile, cdc_apply_tombstones, and the
    # E119-E122 batch: dedup_simhash_hamming, scd2_point_in_time_join,
    # ann_ivfpq_recall_audit, pareto_revenue_concentration, and the
    # E123-E125 batch: graph_triangle_census,
    # session_first_purchase_mrr, files_composite_predicate_skipping —
    # and the post-note batches E126-E170:
    # langid_confusion_matrix, vocab_coverage_curve (ext7);
    # bm25_topk_retrieval, pareto_skyline_customers,
    # tree_split_gini_quantity, bollinger_breakout_days,
    # cusum_changepoint_daily, ewma_daily_smoothing (ext8);
    # apportion_token_budget, drift_chi_square_gate,
    # mannwhitney_u_lengths, salting_plan_skewed_keys,
    # graph_khop_reach, quantile_normalize_lengths (ext9);
    # dedup_edit1_names, ohlc_daily_value, merge_user_intervals,
    # cohort_ltv_weekly, rrf_fuse_retrieval,
    # functional_dependency_audit (ext10);
    # label_noise_knn_consensus, classifier_auc_exact,
    # survival_km_repurchase, ratio_to_parent_revenue,
    # calibration_reliability_bins (ext11);
    # text_lexical_diversity, cumulative_unique_users,
    # rolling_distinct_users_7d, shipping_lag_percentiles,
    # fair_share_allocation, rank_movers_nations (ext12);
    # setop_bag_halves, absence_view_no_purchase,
    # max_concurrent_activity, rolling_median_spikes (ext13);
    # mor_deletes_read, refs_aware_snapshot_expiry,
    # two_tier_manifest_skipping, partition_evolution_scan (ext14);
    # stream_ohlc_daily, business_days_lag (ext15);
    # ks_two_sample_lengths, emd_lengths (ext16);
    # acf_daily_lags, correlation_event_series (ext17))
    # plus whatever round-5 rows (if any) come back red in
    # CORRECTNESS_r05, with round-5 greens as the regression
    # canaries.
    ordered = window_r5
    ordered += [n for n in registry.QUERIES if n not in set(ordered)]
    registry.demote(*ordered)

    _LOADED = True
