"""Query modules; importing them populates the registry.

Import order IS registration order.  The driver grades the first 50
registered queries per round, so the order below is a rotation
schedule: queries that have never produced a green driver row come
first, already-proven ones last.  Round 4's window (the explicit
WINDOW_R4 list) packs (a) the 34 graded-but-never-green queries —
every events-reader that died on the TIMESTAMP(NANOS) read in
rounds 1-3 plus the oracle SUM-type casualties, all since fixed —
and (b) 19 of the 42 never-graded entries (streaming suite, new
control-plane aggregates, dedup extensions).  The remaining
never-graded queries (pipeline_ext tail, round-3 mid-round adds)
are ordered immediately after slot 50 so they form round 5's window.
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
        aggregates,
        composite,
        control_plane,
        dedup,
        lifecycle,
        maintenance,
    )

    from .. import registry

    # Round-4 grading window: exactly the first 50 names below.
    # (a) 31 graded-but-never-green — 7 round-3 errors (events NTZ
    #     read), the round-1 nanos/SUM-type casualties, all fixed;
    # (b) 19 never-graded — streaming suite (oracles added round 3),
    #     new control-plane aggregates, dedup extensions.
    window_r4 = [
        # (a) round-3 driver errors, now fixed
        "join_asof_latest_snapshot",
        "join_self_snapshot_gaps",
        "window_range_frame",
        "scalar_map_suite",
        "scalar_json_extract",
        "setop_union_events",
        "udf_tablename_parse_parity",
        # (a) control plane (round-1 nanos errors)
        "events_scan",
        "commit_filter",
        "table_identifier_parse",
        "table_lookup_join",
        "snapshot_lineage_scan",
        "commits_since_last_replace",
        "time_threshold_trigger",
        "commit_threshold_trigger",
        "should_optimize_decision",
        "config_drop_keys",
        "config_prefix_select",
        "sql_command_render",
        "conf_argv_explode",
        # (a) lifecycle + maintenance (nanos / SUM-type errors)
        "maintenance_expire_snapshots",
        "snapshot_time_travel",
        "maintenance_orphan_files",
        "merge_upsert_orders",
        "changelog_cdc_diff",
        "compaction_rowcount_invariant",
        # (a) aggregates over events (nanos / SUM-type errors)
        "agg_array_collect",
        "window_lag_commit_gap",
        "window_running_filesize_cumsum",
        "window_ntile_value_quartiles",
        # (a) got a SQL oracle in round 3, never hash-graded
        "dedup_near_verified",
        # (b) never graded
        "udtf_binpack_per_table",
        "stream_tumbling_commits_per_hour",
        "stream_sliding_event_rate",
        "stream_session_user_activity",
        "stream_dedup_event_ids",
        "stream_events_ingest",
        "stream_watermark_latedrop",
        "stream_stateful_trigger",
        "stream_should_optimize",
        "stream_merge_upsert",
        "session_commit_bursts",
        "anomaly_commit_rate",
        "rollup_hypertable_cascade",
        "dedup_near_clusters",
        "dedup_incremental_batch",
        "corpus_version_diff",
        "text_contamination_eval_overlap",
        "sample_stratified_by_lang",
        "corpus_token_topk",
    ]
    # Round-5 candidates come right after the window; driver-green
    # queries from rounds 1-3 fill the tail.
    round5 = [
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
        # round-4 additions (E50-E62), never graded
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
    ]
    ordered = window_r4 + round5
    ordered += [n for n in registry.QUERIES if n not in set(ordered)]
    registry.demote(*ordered)

    _LOADED = True
