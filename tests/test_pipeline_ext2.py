"""Semantic invariants for the E50-E55 corpus operators (value
correctness is the oracle's job; these lock the *guarantees* each
operator's contract promises)."""

from __future__ import annotations

import pytest

import iceberg_aws_event_based_table_management_spark as engine
from iceberg_aws_event_based_table_management_spark import io
from iceberg_aws_event_based_table_management_spark.queries import pipeline_ext2 as P


@pytest.fixture(scope="module")
def qmap():
    engine.load_all_queries()
    return engine.query_map()


def test_bloom_has_no_false_negatives(spark, qmap):
    """The defining Bloom guarantee: a true member is never screened
    out — the (maybe_member=false, is_member=true) cell must be empty."""
    rows = qmap["bloom_membership_audit"](spark, io.SMOKE_SF_DIR).collect()
    fn = [r for r in rows if (not r.maybe_member) and r.is_member]
    assert fn == [], f"Bloom false negatives: {fn}"


def test_kmeans_partitions_every_vector_once(spark, sf_dir, qmap):
    """Assignment is a partition: cluster sizes sum to the corpus and
    cluster ids stay within [0, k)."""
    from iceberg_aws_event_based_table_management_spark import io

    rows = qmap["kmeans_assign_step"](spark, sf_dir).collect()
    n_vecs = io.table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vectors for r in rows) == n_vecs
    assert all(0 <= r.cluster_id < P._KMEANS_K for r in rows)
    # seed vectors have distance 0 to themselves -> total inertia of
    # the seed clusters can't all be zero unless every vector is a seed
    assert all(r.inertia >= 0 for r in rows)


def test_seqlen_buckets_cover_and_never_overflow(spark, sf_dir, qmap):
    """Every doc lands in exactly one bucket; padded >= actual tokens
    (waste is non-negative) except in the overflow cap bucket."""
    from iceberg_aws_event_based_table_management_spark import io

    rows = qmap["seqlen_bucket_padding"](spark, sf_dir).collect()
    n_docs = io.table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        if r.bucket < P._SEQ_BUCKETS[-1]:
            assert r.padded_tokens >= r.sum_tokens
            assert 0.0 <= r.waste_frac < 1.0


def test_boilerplate_fraction_bounded(spark, sf_dir, qmap):
    rows = qmap["text_boilerplate_ngrams"](spark, sf_dir).collect()
    assert all(0.0 <= r.boiler_frac <= 1.0 for r in rows)
    assert all(r.n_boiler <= r.n_shingles for r in rows)


def test_wap_gate_publish_is_conjunction(spark, sf_dir, qmap):
    rows = {r.audit: r for r in qmap["wap_publish_gate"](spark, sf_dir).collect()}
    audits = [v.passed for k, v in rows.items() if k != "publish"]
    assert rows["publish"].passed == all(audits)
    assert rows["publish"].metric is None


def test_compaction_benefit_bounds(spark, sf_dir, qmap):
    """The estimator can never promise more files than exist or a
    negative saving; small files are a subset of all files."""
    for r in qmap["compaction_benefit_estimate"](spark, sf_dir).collect():
        assert 0 <= r.n_small_files <= r.n_files
        assert 1 <= r.est_files_after <= r.n_files
        assert r.files_saved == r.n_files - r.est_files_after >= 0


def test_retention_policies_partition_the_log(spark, sf_dir, qmap):
    """Every policy partitions the same per-table snapshot count, and
    keep-last-N keeps exactly min(N, n)."""
    rows = qmap["snapshot_retention_policies"](spark, sf_dir).collect()
    by_table = {}
    for r in rows:
        by_table.setdefault(r.table_name, {})[r.policy] = (r.n_keep, r.n_expire)
    for table, pols in by_table.items():
        totals = {k + e for k, e in pols.values()}
        assert len(totals) == 1, f"{table}: policies disagree on log size"
        (n,) = totals
        keep, _ = pols["keep_last_5"]
        assert keep == min(5, n)


def test_quantile_sketch_error_bounded_by_bin(spark, sf_dir, qmap):
    """The histogram estimate can be off by at most one bin width, and
    quantile estimates are monotone in q."""
    from iceberg_aws_event_based_table_management_spark.queries.aggregates import (
        _QSK_WIDTH,
    )

    rows = {r.quantile: r for r in qmap["quantile_histogram_sketch"](spark, sf_dir).collect()}
    assert set(rows) == {"p50", "p95", "p99"}
    for r in rows.values():
        assert abs(r.est_v - r.exact_v) <= _QSK_WIDTH
    assert rows["p50"].est_v <= rows["p95"].est_v <= rows["p99"].est_v
