"""Semantic invariants for the E151-E156 operators (value correctness
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


def test_lexical_diversity_bounds_and_python_parity(spark, sf_dir, qmap):
    """types <= tokens, hapax <= types; one doc replayed in Python."""
    rows = qmap["text_lexical_diversity"](spark, sf_dir).collect()
    n_docs = io.table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    for r in rows:
        assert 1 <= r.n_types <= r.n_tokens
        assert 0 <= r.n_hapax <= r.n_types
        assert r.ttr_ppm == r.n_types * 1_000_000 // r.n_tokens
    probe = rows[0]
    text = (
        io.table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") == probe.doc_id)
        .collect()[0]
        .text
    )
    toks = [w for w in text.lower().split() if w]
    from collections import Counter

    c = Counter(toks)
    assert (probe.n_tokens, probe.n_types) == (len(toks), len(c))
    assert probe.n_hapax == sum(1 for v in c.values() if v == 1)


def test_cumulative_uniques_monotone_and_total(spark, sf_dir, qmap):
    """Curve is nondecreasing, new-user counts sum to the distinct
    user total, and the last point equals it."""
    rows = sorted(
        qmap["cumulative_unique_users"](spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    total = (
        io.table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert sum(r.n_new_users for r in rows) == total
    assert rows[-1].cum_unique_users == total
    cum = 0
    for r in rows:
        cum += r.n_new_users
        assert r.cum_unique_users == cum


def test_rolling_distinct_bounds(spark, sf_dir, qmap):
    """7d actives >= 1d actives, nondecreasing vs any single day in
    the window, bounded by the user universe; first day 7d == 1d."""
    rows = sorted(
        qmap["rolling_distinct_users_7d"](spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    total = (
        io.table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    by_day = {r.day: r for r in rows}
    for r in rows:
        assert r.n_active_1d <= r.n_active_7d <= total
    assert rows[0].n_active_7d == rows[0].n_active_1d


def test_shipping_lag_quartiles_ordered(spark, sf_dir, qmap):
    """Quartiles are ordered and within [min, max]; counts sum to the
    join cardinality."""
    rows = qmap["shipping_lag_percentiles"](spark, sf_dir).collect()
    n = (
        io.table(spark, sf_dir, "orders")
        .join(
            io.table(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert sum(r.n for r in rows) == n
    for r in rows:
        assert r.q25 <= r.q50 <= r.q75 <= r.max_lag


def test_fair_share_is_max_min(spark, sf_dir, qmap):
    """Allocations sum exactly to the 40% budget; nobody exceeds
    demand; every unserved allocation >= every served demand (the
    max-min property); unserved allocations differ by at most 1."""
    rows = qmap["fair_share_allocation"](spark, sf_dir).collect()
    total = sum(r.demand for r in rows)
    cap = total * 2 // 5
    assert sum(r.allocation for r in rows) == cap
    for r in rows:
        assert 0 <= r.allocation <= r.demand
        assert r.fully_served == (r.allocation == r.demand)
    served = [r for r in rows if r.fully_served]
    unserved = [r for r in rows if not r.fully_served]
    if served and unserved:
        assert min(u.allocation for u in unserved) >= max(
            s.demand for s in served
        )
    if unserved:
        allocs = [u.allocation for u in unserved]
        assert max(allocs) - min(allocs) <= 1


def test_rank_movers_deltas_consistent(spark, sf_dir, qmap):
    """Ranks are dense permutations over nations; delta = base − cur;
    revenue reconciles to the full order book."""
    rows = qmap["rank_movers_nations"](spark, sf_dir).collect()
    assert len(rows) == io.table(spark, sf_dir, "nation").count()
    for r in rows:
        assert r.rank_delta == r.rank_base - r.rank_cur
    assert sorted(r.rank_base for r in rows) == sorted(
        set(r.rank_base for r in rows)
    )
    total_cents = sum(
        round(r.base_revenue * 100) + round(r.cur_revenue * 100) for r in rows
    )
    expect = (
        io.table(spark, sf_dir, "orders")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")))
        .collect()[0][0]
    )
    assert total_cents == expect
