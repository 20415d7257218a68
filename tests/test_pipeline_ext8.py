"""Semantic invariants for the E128-E133 operators (value correctness
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


def test_bm25_ranking_properties(spark, sf_dir, qmap):
    """Top-k is sorted, scores positive, every hit really contains a
    query term, and n_terms is bounded by the query length."""
    from iceberg_aws_event_based_table_management_spark.queries.pipeline_ext8 import (
        _BM25_TERMS,
        _BM25_TOPK,
    )

    rows = qmap["bm25_topk_retrieval"](spark, sf_dir).collect()
    assert 0 < len(rows) <= _BM25_TOPK
    scores = [r.score_ppm for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r.score_ppm > 0 for r in rows)
    assert all(1 <= r.n_terms <= len(_BM25_TERMS) for r in rows)
    texts = {
        r.doc_id: r.text
        for r in io.table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isin([r.doc_id for r in rows]))
        .collect()
    }
    for r in rows:
        words = set(texts[r.doc_id].lower().split())
        assert words & set(_BM25_TERMS), r.doc_id


def test_skyline_is_exactly_the_undominated_set(spark, sf_dir, qmap):
    """Brute-force dominance over all customers: the skyline holds
    every undominated point and nothing else."""
    got = {
        r.o_custkey: (round(r.revenue * 100), r.n_orders)
        for r in qmap["pareto_skyline_customers"](spark, sf_dir).collect()
    }
    cust = {
        r.o_custkey: (r.rev, r.cnt)
        for r in io.table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("rev"),
            F.count("*").alias("cnt"),
        )
        .collect()
    }
    pts = list(cust.values())

    def dominated(p):
        return any(
            q[0] >= p[0] and q[1] >= p[1] and (q[0] > p[0] or q[1] > p[1])
            for q in pts
        )

    expect = {k for k, p in cust.items() if not dominated(p)}
    assert set(got) == expect
    for k in got:
        assert got[k] == cust[k]


def test_tree_split_partitions_and_best_rank(spark, sf_dir, qmap):
    """Left+right = n everywhere; gini in [0, 2/3] ppm for 3 classes;
    rk=1 is the unique minimum under the (gini, value) order."""
    rows = qmap["tree_split_gini_quantity"](spark, sf_dir).collect()
    n = io.table(spark, sf_dir, "lineitem").count()
    assert all(r.n_left + r.n_right == n for r in rows)
    assert all(0 <= r.gini_ppm <= 666_667 for r in rows)
    best = min(rows, key=lambda r: (r.gini_ppm, r.split_value))
    assert next(r for r in rows if r.rk == 1) == best
    assert sorted(r.rk for r in rows) == list(range(1, len(rows) + 1))


def test_bollinger_flags_match_float_recompute(spark, sf_dir, qmap):
    """The integer predicate must agree with the float form
    |x - mean| > 2*stddev_pop on every full-window day."""
    rows = qmap["bollinger_breakout_days"](spark, sf_dir).collect()
    assert rows
    daily = {}
    for r in (
        io.table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .count()
        .collect()
    ):
        daily.setdefault(r.event_type, {})[r.day] = r["count"]
    for r in rows:
        days = sorted(d for d in daily[r.event_type] if d <= r.day)[-7:]
        xs = [daily[r.event_type][d] for d in days]
        assert len(xs) == 7 and xs[-1] == r.n
        mean = sum(xs) / 7
        var = sum((x - mean) ** 2 for x in xs) / 7
        assert r.is_breakout == ((r.n - mean) ** 2 > 4 * var), (r.event_type, r.day)


def test_cusum_matches_python_argmax(spark, sf_dir, qmap):
    """Per type, the reported day maximizes |n_days*prefix - t*total|
    with earliest-day tie-break."""
    rows = {r.event_type: r for r in qmap["cusum_changepoint_daily"](spark, sf_dir).collect()}
    daily = {}
    for r in (
        io.table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .count()
        .collect()
    ):
        daily.setdefault(r.event_type, []).append((r.day, r["count"]))
    for et, series in daily.items():
        series.sort()
        total = sum(n for _, n in series)
        nd = len(series)
        prefix, best = 0, None
        for t, (day, n) in enumerate(series, start=1):
            prefix += n
            dev = abs(nd * prefix - t * total)
            if best is None or dev > best[0]:
                best = (dev, day)
        r = rows[et]
        assert (r.abs_dev_scaled, r.change_day) == best
        assert (r.n_days, r.total) == (nd, total)


def test_ewma_bounds_and_first_day_identity(spark, sf_dir, qmap):
    """EWMA stays inside the window's [min, max]*1e6 band; a
    length-1 window reproduces the raw value exactly; window length
    never exceeds the horizon."""
    rows = qmap["ewma_daily_smoothing"](spark, sf_dir).collect()
    daily = {}
    for r in rows:
        daily.setdefault(r.event_type, []).append(r)
    for series in daily.values():
        series.sort(key=lambda r: r.day)
        for i, r in enumerate(series):
            assert 1 <= r.wlen <= 16
            assert r.wlen == min(i + 1, 16)
            xs = [s.n for s in series[max(0, i - 15) : i + 1]]
            assert min(xs) * 1_000_000 <= r.ewma_ppm + 1
            assert r.ewma_ppm <= max(xs) * 1_000_000
        assert series[0].ewma_ppm == series[0].n * 1_000_000
