"""Semantic invariants for the round-5 operators (E64-E78): SemDeDup,
segment-level dedup, inter-doc n-gram coverage, the stream-stream
interval join, the ANN recall audit, the hashed linear classifier,
the cross-source contamination matrix, and the event-analytics trio
(transition matrix, funnel, cohort retention).  Value correctness is
the DuckDB oracle's job (tools/check.py); these lock the contracts."""

from __future__ import annotations

import math

import pytest

import iceberg_aws_event_based_table_management_spark as engine
from iceberg_aws_event_based_table_management_spark import io
from iceberg_aws_event_based_table_management_spark.operators import similarity as S
from iceberg_aws_event_based_table_management_spark.queries.similarity import (
    _SEMDEDUP_TAU,
)


@pytest.fixture(scope="module")
def qmap():
    engine.load_all_queries()
    return engine.query_map()


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return d / (na * nb)


def test_semdedup_kept_set_is_tau_separated(spark, sf_dir, qmap):
    """The defining SemDeDup guarantee: after pruning, no two KEPT
    vectors in the same cluster are within tau of each other; and
    every vector appears exactly once (partition)."""
    flags = qmap["dedup_semantic_semdedup"](spark, sf_dir).collect()
    n_vecs = io.table(spark, sf_dir, "embeddings").count()
    assert len(flags) == n_vecs
    assert len({r.vec_id for r in flags}) == n_vecs

    emb = {
        r.vec_id: list(r.embedding)
        for r in io.table(spark, sf_dir, "embeddings").collect()
    }
    kept_by_cluster: dict[int, list[int]] = {}
    for r in flags:
        if not r.is_pruned:
            kept_by_cluster.setdefault(r.cluster_id, []).append(r.vec_id)
    for vids in kept_by_cluster.values():
        vids.sort()
        for i, a in enumerate(vids):
            for b in vids[i + 1 :]:
                # mirror the operator's rounding before comparing
                assert round(_cos(emb[a], emb[b]), 6) < _SEMDEDUP_TAU, (a, b)


def test_semdedup_pruned_have_smaller_neighbor(spark, sf_dir, qmap):
    """Every pruned vector has a justification: a smaller-vec_id
    vector in the same cluster with cosine >= tau."""
    flags = qmap["dedup_semantic_semdedup"](spark, sf_dir).collect()
    emb = {
        r.vec_id: list(r.embedding)
        for r in io.table(spark, sf_dir, "embeddings").collect()
    }
    by_cluster: dict[int, list] = {}
    for r in flags:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    n_pruned = 0
    for rows in by_cluster.values():
        rows.sort(key=lambda r: r.vec_id)
        for i, r in enumerate(rows):
            if r.is_pruned:
                n_pruned += 1
                assert any(
                    round(_cos(emb[s.vec_id], emb[r.vec_id]), 6) >= _SEMDEDUP_TAU
                    for s in rows[:i]
                ), r.vec_id
    assert n_pruned > 0  # tau is fixture-calibrated to actually prune


def test_segment_dedup_replayed_docs_fully_duplicated(spark, sf_dir, qmap):
    """The replayed copies (doc_id >= 1_000_000) re-ingest existing
    text verbatim, so every one of their segments has an earlier
    occurrence: dup_fraction must be exactly 1.0; and per-doc segment
    counts equal ceil(n_words / 16)."""
    rows = qmap["dedup_segment_windows"](spark, sf_dir).collect()
    replayed = [r for r in rows if r.doc_id >= 1_000_000]
    assert replayed, "fixture should contain replayed duplicates"
    assert all(r.dup_fraction == 1.0 for r in replayed)

    words = {
        r.doc_id: len(r.text.lower().split())
        for r in io.table(spark, sf_dir, "documents").collect()
    }
    for r in rows:
        base = r.doc_id - 1_000_000 if r.doc_id >= 1_000_000 else r.doc_id
        assert r.n_segments == math.ceil(words[base] / 16)
        assert 0 <= r.n_dup_segments <= r.n_segments


def test_interdoc_coverage_bounds_and_self_exclusion(spark, sf_dir, qmap):
    """shared_fraction in [0,1]; a gram counts as shared only with df
    >= 2, i.e. a doc's own occurrence never marks it shared (df of a
    gram unique to one doc is 1)."""
    rows = qmap["text_interdoc_ngram_coverage"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_shared <= r.n_grams
        assert 0.0 <= r.shared_fraction <= 1.0


def test_stream_stream_join_equals_batch_interval_join(spark, sf_dir, qmap):
    """The streaming inner interval join over the time-ordered replay
    must emit exactly the batch interval-join pairs."""
    got = {
        (r.user_id, r.view_id, r.purchase_id)
        for r in qmap["stream_join_view_purchase"](spark, sf_dir).collect()
    }
    ev = io.table(spark, sf_dir, "events")
    from pyspark.sql import functions as F

    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("vts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    want = {
        (r.user_id, r.view_id, r.purchase_id)
        for r in v.join(
            p,
            (F.col("user_id") == F.col("pu"))
            & (F.col("pts") >= F.col("vts"))
            & (F.col("pts") <= F.col("vts") + F.expr("interval 30 minutes")),
        ).collect()
    }
    assert got == want


def test_ann_recall_audit_is_consistent(spark, sf_dir, qmap):
    """recall = n_common/20, bounded, and consistent with directly
    intersecting the two top-k paths."""
    row = qmap["ann_recall_audit"](spark, sf_dir).collect()[0]
    assert row.k == 20
    assert 0 <= row.n_common <= 20
    assert row.recall_at_k == round(row.n_common / 20.0, 6)

    e = io.table(spark, sf_dir, "embeddings")
    qv = [
        float(x)
        for x in e.filter("vec_id = 0").select("embedding").collect()[0][0]
    ]
    bf = {r.vec_id for r in S.topk_bruteforce(e, qv, 20).collect()}
    iv = {r.vec_id for r in S.ann_topk_ivf(e, qv, k=20).collect()}
    assert row.n_common == len(bf & iv)


def test_quality_classifier_is_shuffle_free_and_consistent(spark, sf_dir, qmap):
    """E69 contract: scoring is map-side only (no Exchange in the
    plan), and keep <=> score >= 0."""
    df = qmap["text_quality_classifier"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.n_tokens > 0
        # keep is decided on the UNROUNDED score; clf_score is rounded
        # to 1e-6, so only assert consistency away from the boundary
        if abs(r.clf_score) > 1e-6:
            assert r.keep == (r.clf_score >= 0.0)
        assert -1.0 <= r.clf_score <= 1.0


def test_cross_source_matrix_is_symmetric_free_and_ordered(spark, sf_dir, qmap):
    """E70 contract: pairs are emitted once with source_a < source_b,
    counts are positive, and no source pairs with itself."""
    rows = qmap["dedup_cross_source_matrix"](spark, sf_dir).collect()
    seen = set()
    for r in rows:
        assert r.source_a < r.source_b
        assert r.n_shared_segments >= 1
        key = (r.source_a, r.source_b)
        assert key not in seen
        seen.add(key)


def test_transition_matrix_probabilities_normalize(spark, sf_dir, qmap):
    """E71 contract: outgoing probabilities per prev_type sum to ~1
    and every count is positive."""
    rows = qmap["event_transition_matrix"](spark, sf_dir).collect()
    assert rows
    by_prev: dict[str, float] = {}
    for r in rows:
        assert r.n >= 1
        assert 0.0 < r.p <= 1.0
        by_prev[r.prev_type] = by_prev.get(r.prev_type, 0.0) + r.p
    for prev, total in by_prev.items():
        assert abs(total - 1.0) < 1e-4, (prev, total)


def test_funnel_stages_are_monotone(spark, sf_dir, qmap):
    """E72 contract: each funnel stage can only lose users."""
    r = qmap["event_funnel_conversion"](spark, sf_dir).collect()[0]
    assert r.n_users >= r.n_viewed >= r.n_clicked_after_view >= r.n_purchased_after_click
    assert r.n_viewed > 0


def test_cohort_retention_covers_signup_users(spark, sf_dir, qmap):
    """E73 contract: every cohort's first activity week is <= its
    cohort week's own activity (a cohort is active the week it signs
    up... its signup event IS activity), and user counts are
    positive."""
    rows = qmap["event_cohort_retention"](spark, sf_dir).collect()
    assert rows
    cohorts = {}
    for r in rows:
        assert r.n_active_users >= 1
        cohorts.setdefault(r.cohort_week, []).append(r.activity_week)
    for cw, weeks in cohorts.items():
        # the signup event itself is activity in the cohort week
        assert cw in weeks, (cw, sorted(weeks)[:3])


def test_file_skipping_estimate_partitions_files(spark, sf_dir, qmap):
    """E74 contract: skipped and fully-matched files are disjoint
    subsets of the inventory, and skipping some files is actually
    demonstrated on the fixture (the estimator is not vacuous)."""
    rows = qmap["files_skipping_estimate"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_skipped <= r.n_files
        assert 0 <= r.n_full_match <= r.n_files - r.n_skipped
        assert r.rows_scanned >= 0
        assert abs(r.skip_fraction - r.n_skipped / r.n_files) < 1e-6
    assert any(r.n_skipped > 0 for r in rows)


def test_rolling_actives_wau_bounds_dau(spark, sf_dir, qmap):
    """E75 contract: WAU >= DAU per day, and WAU never exceeds the
    total distinct-user population."""
    rows = qmap["rolling_active_users"](spark, sf_dir).collect()
    assert rows
    n_users = (
        io.table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    for r in rows:
        assert r.dau >= 1  # observation days come FROM activity days
        assert r.wau >= r.dau
        assert r.wau <= n_users


def test_skew_diagnosis_internal_consistency(spark, sf_dir, qmap):
    """E76 contract: max >= avg (so skew_ratio >= 1), n_rows matches
    the table, and every diagnosed key appears once."""
    rows = {r.key_column: r for r in qmap["join_key_skew_diagnosis"](spark, sf_dir).collect()}
    assert set(rows) == {"l_orderkey", "l_suppkey", "o_custkey"}
    n_li = io.table(spark, sf_dir, "lineitem").count()
    assert rows["l_orderkey"].n_rows == n_li == rows["l_suppkey"].n_rows
    for r in rows.values():
        assert r.max_key_rows >= r.avg_key_rows
        assert r.skew_ratio >= 1.0
        assert r.n_keys <= r.n_rows


def test_containment_catches_truncations_jaccard_misses(spark, sf_dir, qmap):
    """E77 contract: every truncated copy (doc_id >= 2_000_000) pairs
    with its source at containment ~1.0, and at least one qualifying
    pair has Jaccard < 0.5 (the case symmetric dedup cannot see)."""
    rows = qmap["dedup_containment_pairs"](spark, sf_dir).collect()
    assert rows
    by_pair = {(r.doc_id_a, r.doc_id_b): r for r in rows}
    trunc_pairs = [
        r for (a, b), r in by_pair.items() if b >= 2_000_000 and a == b - 2_000_000
    ]
    assert trunc_pairs, "truncated copies must surface against their sources"
    for r in trunc_pairs:
        assert r.containment >= 0.99
    assert any(r.jaccard_missed for r in rows)
    for r in rows:
        assert r.containment >= 0.8
        assert r.jaccard <= r.containment


def test_stream_static_enrichment_equals_batch_join(spark, sf_dir, qmap):
    """E78 contract: the per-micro-batch static join's union equals
    the batch join, and the is_first_event flag marks exactly one
    event per user with purchases at their global first-seen ts
    (or zero if their first event wasn't a purchase)."""
    rows = qmap["stream_static_enrichment"](spark, sf_dir).collect()
    assert rows
    ev = io.table(spark, sf_dir, "events")
    n_purchases = ev.filter("event_type = 'purchase'").count()
    assert len(rows) == n_purchases
    firsts = [r for r in rows if r.is_first_event]
    by_user: dict[int, int] = {}
    for r in firsts:
        by_user[r.user_id] = by_user.get(r.user_id, 0) + 1
    assert all(v == 1 for v in by_user.values())


def test_semdedup_footer_fallback_matches_footer_path(spark, sf_dir, qmap, monkeypatch):
    """r11 ADVICE: when the parquet footer is unreadable the corpus
    size must come from an engine-side count, NOT a silent k=8 — the
    fallback k (and therefore the flags) must equal the footer path's."""
    from iceberg_aws_event_based_table_management_spark import io as eio

    normal = sorted(
        tuple(r) for r in qmap["dedup_semantic_semdedup"](spark, sf_dir).collect()
    )
    monkeypatch.setattr(eio, "parquet_num_rows", lambda *a, **k: None)
    fallback = sorted(
        tuple(r) for r in qmap["dedup_semantic_semdedup"](spark, sf_dir).collect()
    )
    assert fallback == normal
