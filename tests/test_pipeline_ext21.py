"""Semantic tests for the fourth round-8 batch (E188-E191): PSI,
MASE, matched pairs, drawdown."""

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


def test_psi_matches_python_and_detects_shift(spark):
    """PSI recomputed in python from raw lengths matches ppm-exactly;
    a synthetic shifted population scores far above the identical
    split's score."""
    from iceberg_aws_event_based_table_management_spark import io

    docs = io.table(spark, SF, "documents").select("doc_id", "n_chars").collect()
    ref = sorted(r.n_chars for r in docs if r.doc_id % 2 == 0)
    cur = [r.n_chars for r in docs if r.doc_id % 2 != 0]
    edges = [ref[math.ceil(k * len(ref) / 10.0) - 1] for k in range(1, 10)]

    def bins(pop):
        c = [0] * 10
        for x in pop:
            c[sum(1 for e in edges if x > e)] += 1
        return c

    rb, cb = bins(ref), bins(cur)
    psi = 0.0
    contribs = []
    for i in range(10):
        p = (rb[i] + 0.5) / (len(ref) + 5.0)
        qq = (cb[i] + 0.5) / (len(cur) + 5.0)
        c = (p - qq) * math.log(p / qq)
        contribs.append(c)
        psi += c
    rows = {r.bin: r for r in _fn("drift_psi_lengths")(spark, SF).collect()}
    assert len(rows) == 10
    for i in range(10):
        r = rows[i + 1]
        assert (r.ref_n, r.cur_n) == (rb[i], cb[i])
        assert r.contrib_ppm == math.floor(contribs[i] * 1_000_000)
        assert r.psi_total_ppm == math.floor(psi * 1_000_000)
    # parity split of the same population: PSI should be small
    assert rows[1].psi_total_ppm < 250_000  # << the 0.25 action threshold


def test_mase_identities(spark):
    """MASE = ratio of the two absolute-error sums over the same
    scored days (python recompute), and the naive denominator is
    positive on the fixture."""
    from iceberg_aws_event_based_table_management_spark import io

    daily = (
        io.table(spark, SF, "events")
        .groupBy("event_type", F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.day, r.n))
    got = {r.event_type: r for r in _fn("forecast_mase_seasonal_naive")(spark, SF).collect()}
    for et, pts in series.items():
        pts.sort()
        ns = [n for _, n in pts]
        scored = range(7, len(ns))
        sae7 = sum(abs(ns[i] - ns[i - 7]) for i in scored)
        sae1 = sum(abs(ns[i] - ns[i - 1]) for i in scored)
        r = got[et]
        assert (r.n_days_scored, r.sae_seasonal, r.sae_naive) == (
            len(list(scored)),
            sae7,
            sae1,
        )
        assert r.mase_ppm == math.floor(sae7 / sae1 * 1_000_000)


def test_matched_pairs_balance(spark):
    """Every decile matches min(|treat|, |ctrl|) pairs, and matching
    within deciles bounds the mean within-pair length gap far below
    the population treat-vs-ctrl gap."""
    from iceberg_aws_event_based_table_management_spark import io

    docs = io.table(spark, SF, "documents").select("doc_id", "n_chars", "lang").collect()
    pop = sorted(docs, key=lambda r: (r.n_chars, r.doc_id))
    n = len(pop)
    # replicate pooled ntile(10)
    deciles = {}
    for i, r in enumerate(pop):
        # ntile: bucket sizes differ by at most 1, earlier buckets larger
        bucket = min(i * 10 // n + 1, 10)
        deciles.setdefault(bucket, {"t": [], "c": []})[
            "t" if r.lang == "en" else "c"
        ].append(r.n_chars)
    got = {r.decile: r for r in _fn("matched_pairs_by_decile")(spark, SF).collect()}
    for d, r in got.items():
        t, c = deciles[d]["t"], deciles[d]["c"]
        assert r.n_matched == min(len(t), len(c))
        k = r.n_matched
        assert r.treat_len_sum == sum(t[:k]) and r.ctrl_len_sum == sum(c[:k])
    # balance: within-decile matching keeps mean gaps small relative
    # to the decile's own value scale
    for d, r in got.items():
        lo = min(deciles[d]["t"] + deciles[d]["c"])
        hi = max(deciles[d]["t"] + deciles[d]["c"])
        assert abs(r.mean_len_diff_ppm) <= (hi - lo + 1) * 1_000_000


def test_drawdown_hand_case_and_fixture(spark):
    """Hand series: cumulative [10, 5, 12, 3, 8] has max drawdown
    12-3=9 at the fourth day; fixture drawdowns are non-negative with
    the trough on a real day."""
    import datetime

    rows = [
        ("t", datetime.date(2024, 1, 1 + i), v)
        for i, v in enumerate([1000, -500, 700, -900, 500])
    ]
    df = spark.createDataFrame(rows, "event_type string, day date, v_cents long")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = df.select("event_type", "day", F.sum("v_cents").over(w).alias("cum")).select(
        "event_type", "day", "cum", F.max("cum").over(w).alias("runmax")
    )
    dd = cum.select("day", (F.col("runmax") - F.col("cum")).alias("dd")).collect()
    assert max(r.dd for r in dd) == 900
    assert [r.dd for r in sorted(dd, key=lambda r: r.day)] == [0, 500, 0, 900, 400]

    out = _fn("max_drawdown_daily_value")(spark, SF).collect()
    assert out
    for r in out:
        assert r.max_drawdown_cents >= 0
        assert r.trough_day is not None
