"""Semantic invariants for the E107-E112 operators (value correctness
is the oracle's job; these lock the *guarantees* each operator's
contract promises)."""

from __future__ import annotations

import pytest

import iceberg_aws_event_based_table_management_spark as engine
from iceberg_aws_event_based_table_management_spark import io
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def qmap():
    engine.load_all_queries()
    return engine.query_map()


def test_bloom_candidates_superset_truth(spark, sf_dir, qmap):
    """The Bloom guarantee: no false negatives — candidate count is
    always >= true count, and overhead is exactly the difference."""
    rows = qmap["file_bloom_pruning_estimate"](spark, sf_dir).collect()
    assert len(rows) == 8
    for r in rows:
        assert r.n_true_files >= 1, "probe keys are drawn from the data"
        assert r.n_bloom_candidates >= r.n_true_files, r
        assert r.n_false_positives == r.n_bloom_candidates - r.n_true_files


def test_freshness_breach_is_consistent(spark, sf_dir, qmap):
    """sla_breach must equal the staleness-vs-2x-median comparison on
    the reported columns, and staleness is nonnegative with exactly
    one fleet-freshest table at 0."""
    rows = qmap["table_freshness_sla"](spark, sf_dir).collect()
    assert rows
    assert min(r.staleness_ms for r in rows) == 0
    for r in rows:
        assert r.staleness_ms >= 0
        if r.median_gap_ms is not None:
            assert r.sla_breach == (r.staleness_ms > 2 * r.median_gap_ms), r


def test_kmv_set_ops_estimates_track_exact(spark, sf_dir, qmap):
    """Sketch estimates must track the audit: union within ~4 sigma of
    exact (sd ≈ 1/sqrt(k-2) ≈ 18% at k=32), intersection bounded by
    the union estimate, and exact identities hold."""
    rows = qmap["distinct_kmv_set_ops"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.exact_union == r.exact_a + r.exact_b - r.exact_inter
        assert 0 <= r.inter_est <= r.union_est + 1e-9
        rel = abs(r.union_est - r.exact_union) / r.exact_union
        assert rel < 0.75, r


def test_length_trend_matches_numpy_fit(spark, sf_dir, qmap):
    """The integer-sum OLS must agree with an independent float fit
    to ~1e-6 relative — same line, different arithmetic route."""
    rows = qmap["source_length_trend"](spark, sf_dir).collect()
    docs = (
        io.table(spark, sf_dir, "documents")
        .select("source", "doc_id", "n_chars")
        .collect()
    )
    by_src: dict[str, list] = {}
    for d in docs:
        by_src.setdefault(d.source, []).append((d.doc_id, d.n_chars))
    for r in rows:
        pts = sorted(by_src[r.source])
        xs = list(range(1, len(pts) + 1))
        ys = [y for _, y in pts]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        assert abs(slope - r.slope) < 1e-5, r
        assert abs((sy - slope * sx) / n - r.intercept) < 1e-4, r


def test_partitioned_sink_prunes_at_plan_time(spark, sf_dir, qmap):
    """The read plan must carry the lang predicate as a PARTITION
    filter (directory pruning), not a data filter; and the round-trip
    must reconcile with the source table."""
    df = qmap["sink_partitioned_pruning"](spark, sf_dir)
    # Rebuild the pruned scan the query uses to inspect its plan.
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[.*lang.*\]", plan), plan
    got = {r.source: r.n_docs for r in df.collect()}
    want = {
        r.source: r.n
        for r in io.table(spark, sf_dir, "documents")
        .filter(F.col("lang") == "en")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_seasonality_profile_reconciles(spark, sf_dir, qmap):
    """Weekday totals must sum back to the commit-log total, averages
    must be total/days, and anomalous days can never exceed observed
    days."""
    rows = qmap["commit_seasonality_profile"](spark, sf_dir).collect()
    n_commits = io.snapshots(spark, sf_dir).count()
    assert sum(r.total_commits for r in rows) == n_commits
    for r in rows:
        assert 0 <= r.dow <= 6
        assert 0 <= r.n_anomalous_days <= r.n_days
        assert abs(r.avg_commits - r.total_commits / r.n_days) < 1e-6
