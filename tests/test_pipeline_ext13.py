"""Semantic invariants for the E157-E160 operators (value correctness
is the oracle's job; these lock the *guarantees* each operator's
contract promises)."""

from __future__ import annotations

from collections import Counter

import pytest

import iceberg_aws_event_based_table_management_spark as engine
from iceberg_aws_event_based_table_management_spark import io
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def qmap():
    engine.load_all_queries()
    return engine.query_map()


def _halves(spark, sf_dir):
    ev = (
        io.table(spark, sf_dir, "events")
        .select("user_id", "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .collect()
    )
    d0 = min(e.day for e in ev)
    d1 = max(e.day for e in ev)
    a, b = Counter(), Counter()
    for e in ev:
        tgt = a if 2 * (e.day - d0).days <= (d1 - d0).days else b
        tgt[(e.user_id, e.event_type)] += 1
    return a, b


def test_bag_setops_match_multiset_math(spark, sf_dir, qmap):
    """intersect-all = sum of min multiplicities; except-all = sum of
    truncated differences — recomputed from Counters."""
    rows = {r.event_type: r for r in qmap["setop_bag_halves"](spark, sf_dir).collect()}
    a, b = _halves(spark, sf_dir)
    inter, exc = Counter(), Counter()
    for k in set(a) | set(b):
        et = k[1]
        inter[et] += min(a[k], b[k])
        exc[et] += max(a[k] - b[k], 0)
    for et, r in rows.items():
        assert r.n_intersect_all == inter[et], et
        assert r.n_except_all == exc[et], et


def test_absence_counts_bounded_and_replayed(spark, sf_dir, qmap):
    """Abandoned <= views per user; one user replayed in Python."""
    rows = qmap["absence_view_no_purchase"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_abandoned <= r.n_views
        assert r.abandon_ppm == r.n_abandoned * 1_000_000 // r.n_views
    probe = max(rows, key=lambda r: r.n_views)
    ev = (
        io.table(spark, sf_dir, "events")
        .filter(F.col("user_id") == probe.user_id)
        .select("event_type", io.epoch_us(F.col("ts")).alias("t"))
        .collect()
    )
    views = sorted(e.t for e in ev if e.event_type == "view")
    purch = sorted(e.t for e in ev if e.event_type == "purchase")
    aband = sum(
        1
        for v in views
        if not any(v < p <= v + 3_600_000_000 for p in purch)
    )
    assert (probe.n_views, probe.n_abandoned) == (len(views), aband)


def test_max_concurrency_matches_python_sweep(spark, sf_dir, qmap):
    """Peak and earliest-peak instant replayed per type."""
    rows = {r.event_type: r for r in qmap["max_concurrent_activity"](spark, sf_dir).collect()}
    ev = (
        io.table(spark, sf_dir, "events")
        .select("event_type", io.epoch_us(F.col("ts")).alias("s"))
        .collect()
    )
    by_type = {}
    for e in ev:
        by_type.setdefault(e.event_type, []).append(e.s)
    for et, starts in by_type.items():
        pts = [(s, 1) for s in starts] + [(s + 300_000_000, -1) for s in starts]
        pts.sort()  # (-1 sorts before +1 at equal t)
        live = best = 0
        best_t = None
        for t, d in pts:
            live += d
            if live > best:
                best, best_t = live, t
        assert (rows[et].max_concurrent, rows[et].at_us) == (best, best_t), et


def test_rolling_median_robust_to_one_spike(spark, sf_dir, qmap):
    """med_x2 is twice the window median (Python recompute); window
    length tracks position; spike flag is the pure predicate."""
    rows = qmap["rolling_median_spikes"](spark, sf_dir).collect()
    series = {}
    for r in rows:
        series.setdefault(r.event_type, []).append(r)
    import statistics

    for rs in series.values():
        rs.sort(key=lambda r: r.day)
        for i, r in enumerate(rs):
            assert r.wlen == min(i + 1, 14)
            window = [s.n for s in rs[max(0, i - 13) : i + 1]]
            assert r.med_x2 == int(statistics.median(window) * 2)
            assert r.is_spike == (r.n > r.med_x2)
