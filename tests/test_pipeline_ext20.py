"""Semantic tests for the third round-8 batch (E184-E187): Q10
composite, Markov backtest, funnel latency, trigram mining."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import iceberg_aws_event_based_table_management_spark.queries as q
from iceberg_aws_event_based_table_management_spark import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def loaded():
    q.load()


def _fn(name):
    return registry.QUERIES[name].fn


def test_q10_top20_ordering_and_revenue(spark):
    """Top-20 is revenue-descending with custkey tiebreak, revenues are
    positive, and every row's revenue matches a direct recompute for
    that customer."""
    rows = _fn("composite_returned_item_revenue")(spark, SF).collect()
    assert 0 < len(rows) <= 20
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    from iceberg_aws_event_based_table_management_spark import io

    li = io.table(spark, SF, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = io.table(spark, SF, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    check = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("o_custkey") == rows[0].c_custkey)
        .select(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("r")
        )
        .collect()
    )
    want = round(sum(round(r.r * 10000) for r in check) / 10000.0, 4)
    assert abs(rows[0].revenue - want) < 1e-9


def test_markov_no_leakage_and_accuracy_math(spark):
    """The trained prediction uses only pre-split transitions; the
    accuracy recomputed in python from raw events matches ppm-exactly."""
    from iceberg_aws_event_based_table_management_spark import io
    from iceberg_aws_event_based_table_management_spark.queries.pipeline_ext20 import (
        _MARKOV_SPLIT,
    )
    import datetime

    split = datetime.datetime.fromisoformat(_MARKOV_SPLIT)
    ev = sorted(
        io.table(spark, SF, "events").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    from collections import Counter, defaultdict

    train, test = Counter(), []
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)
    for rows in by_user.values():
        for a, b in zip(rows, rows[1:]):
            if b.ts < split:
                train[(a.event_type, b.event_type)] += 1
            elif a.ts >= split:
                test.append((a.event_type, b.event_type))
    pred = {}
    for (cur, nxt), c in train.items():
        best = pred.get(cur)
        if best is None or c > best[1] or (c == best[1] and nxt < best[0]):
            pred[cur] = (nxt, c)
    got = {r.cur: r for r in _fn("markov_next_event_accuracy")(spark, SF).collect()}
    for cur, r in got.items():
        assert r.predicted == pred[cur][0]
        n = sum(1 for c, _ in test if c == cur)
        h = sum(1 for c, nx in test if c == cur and nx == pred[cur][0])
        assert (r.n_test, r.n_hits) == (n, h)
        assert r.acc_ppm == math.floor(h / n * 1_000_000)


def test_funnel_ttc_percentile_definition(spark):
    """Percentiles are nearest-rank picks from the per-view first-
    conversion delays (python recompute), monotone p25<=p50<=p75<=p90."""
    from iceberg_aws_event_based_table_management_spark import io

    ev = io.table(spark, SF, "events").collect()
    views = [(r.event_id, r.user_id, r.ts) for r in ev if r.event_type == "view"]
    purchases = [(r.user_id, r.ts) for r in ev if r.event_type == "purchase"]
    import datetime

    delays = {}
    for vid, u, ts in views:
        best = None
        for pu, pts in purchases:
            if pu == u and pts > ts and (pts - ts) <= datetime.timedelta(hours=24):
                d = pts - ts
                if best is None or d < best:
                    best = d
        if best is not None:
            delays.setdefault(u % 2, []).append(int(best.total_seconds()))
    got = {r.cohort: r for r in _fn("funnel_time_to_convert")(spark, SF).collect()}
    for coh, ds in delays.items():
        ds.sort()
        n = len(ds)
        r = got[coh]
        assert r.n_converted == n
        for qv, col in ((0.25, "p25_s"), (0.5, "p50_s"), (0.75, "p75_s"), (0.9, "p90_s")):
            assert getattr(r, col) == ds[math.ceil(qv * n) - 1], (coh, col)
        assert r.p25_s <= r.p50_s <= r.p75_s <= r.p90_s


def test_trigram_session_gaps_respected(spark):
    """Trigram counts match a python pass that enforces the per-step
    30-minute gap; the output is count-desc with lexicographic ties."""
    from iceberg_aws_event_based_table_management_spark import io
    import datetime

    gap = datetime.timedelta(minutes=30)
    ev = sorted(
        io.table(spark, SF, "events").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    from collections import Counter, defaultdict

    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)
    cnt = Counter()
    for rows in by_user.values():
        for a, b, c in zip(rows, rows[1:], rows[2:]):
            if (b.ts - a.ts) <= gap and (c.ts - b.ts) <= gap:
                cnt[(a.event_type, b.event_type, c.event_type)] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [((r.e1, r.e2, r.e3), r.n) for r in _fn("event_trigram_topk")(spark, SF).collect()]
    assert got == want
