"""Semantic invariants for the E167-E168 operators (value correctness
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


def _samples(spark, sf_dir):
    rows = (
        io.table(spark, sf_dir, "documents")
        .filter(F.col("source").isin("src0", "src1"))
        .select("source", "n_chars")
        .collect()
    )
    a = sorted(r.n_chars for r in rows if r.source == "src0")
    b = sorted(r.n_chars for r in rows if r.source == "src1")
    return a, b


def test_ks_matches_bruteforce_sup(spark, sf_dir, qmap):
    """D numerator equals the brute-force sup over all observed
    values; the significance flag matches the cross-multiplied
    critical test."""
    r = qmap["ks_two_sample_lengths"](spark, sf_dir).collect()[0]
    a, b = _samples(spark, sf_dir)
    assert (r.n1, r.n2) == (len(a), len(b))
    import bisect

    vals = sorted(set(a) | set(b))
    d = max(
        abs(bisect.bisect_right(a, v) * len(b) - bisect.bisect_right(b, v) * len(a))
        for v in vals
    )
    assert r.d_num == d
    assert r.ks_ppm == d * 1_000_000 // (len(a) * len(b))
    assert r.is_significant == (
        10000 * d * d > 18496 * (len(a) + len(b)) * len(a) * len(b)
    )


def test_emd_matches_scipy_free_wasserstein(spark, sf_dir, qmap):
    """EMD numerator equals a direct Wasserstein-1 computation on the
    empirical CDFs (pure-Python, no scipy)."""
    r = qmap["emd_lengths"](spark, sf_dir).collect()[0]
    a, b = _samples(spark, sf_dir)
    import bisect

    vals = sorted(set(a) | set(b))
    num = 0
    for v, vn in zip(vals, vals[1:]):
        num += (vn - v) * abs(
            bisect.bisect_right(a, v) * len(b) - bisect.bisect_right(b, v) * len(a)
        )
    assert r.emd_num == num
    assert r.emd_milli == num * 1000 // (len(a) * len(b))
    # no general KS/EMD ordering, but both are nonnegative and zero
    # iff the samples coincide
    assert r.emd_num >= 0
    if a == b:
        assert r.emd_num == 0
