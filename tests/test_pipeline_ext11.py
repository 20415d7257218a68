"""Semantic invariants for the E146-E150 operators (value correctness
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


def test_label_noise_consensus_counts(spark, sf_dir, qmap):
    """One row per embedding; agreement bounded by k; majority label
    actually achieves the max neighborhood count; suspects are
    exactly the <=1-agreement rows."""
    rows = qmap["label_noise_knn_consensus"](spark, sf_dir).collect()
    n_emb = io.table(spark, sf_dir, "embeddings").count()
    assert len(rows) == n_emb
    for r in rows:
        assert 0 <= r.n_agree <= 5
        assert r.is_suspect == (r.n_agree <= 1)
    # majority of a 5-neighborhood has count >= 1 and >= n_agree when
    # the labels differ
    for r in rows:
        if r.majority_label == r.label:
            assert r.n_agree >= 1


def test_auc_matches_sklearn_free_bruteforce(spark, sf_dir, qmap):
    """u2 equals the brute-force pairwise statistic over collected
    (score, label) rows; AUC is its normalization."""
    from iceberg_aws_event_based_table_management_spark.queries.pipeline_ext11 import (
        _clf_eval,
    )

    r = qmap["classifier_auc_exact"](spark, sf_dir).collect()[0]
    ev = _clf_eval(spark, sf_dir).collect()
    pos = [e.score_ppm for e in ev if e.is_pos]
    neg = [e.score_ppm for e in ev if not e.is_pos]
    assert (r.n_pos, r.n_neg) == (len(pos), len(neg))
    u2 = sum(2 * (p > n) + (p == n) for p in pos for n in neg)
    assert r.u2 == u2
    assert r.auc_ppm == int((u2 / (2 * len(pos) * len(neg))) * 1e6 // 1)
    assert 0 <= r.auc_ppm <= 1_000_000


def test_km_curve_is_valid_survival_function(spark, sf_dir, qmap):
    """S is nonincreasing in [0, 1e6]; at-risk counts are
    nonincreasing over time; the curve matches a Python KM replay
    with the same stepwise flooring."""
    rows = sorted(
        qmap["survival_km_repurchase"](spark, sf_dir).collect(),
        key=lambda r: r.t_days,
    )
    assert rows
    s_prev, n_prev = 1_000_000, None
    for r in rows:
        assert 0 <= r.s_ppm <= s_prev
        if n_prev is not None:
            assert r.n_risk <= n_prev
        s_prev, n_prev = r.s_ppm, r.n_risk
        assert 0 < r.n_events <= r.n_risk
    # Python replay from raw events
    ev = (
        io.table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.to_date(F.date_trunc("day", "ts")).alias("day"),
                "ts", "event_id")
        .collect()
    )
    dmax = (
        io.table(spark, sf_dir, "events")
        .agg(F.max(F.to_date(F.date_trunc("day", "ts"))))
        .collect()[0][0]
    )
    byu = {}
    for e in ev:
        byu.setdefault(e.user_id, []).append((e.ts, e.event_id, e.day))
    obs = []
    for u, es in byu.items():
        es.sort()
        if len(es) >= 2:
            obs.append(((es[1][2] - es[0][2]).days, True))
        else:
            obs.append(((dmax - es[0][2]).days, False))
    grid = {}
    for t, event in obs:
        c, d = grid.get(t, (0, 0))
        grid[t] = (c + 1, d + event)
    s, out = 1_000_000, {}
    at_risk = len(obs)
    for t in sorted(grid):
        c, d = grid[t]
        if d > 0:
            s = s * (at_risk - d) // at_risk
            out[t] = (d, at_risk, s)
        at_risk -= c
    assert {r.t_days: (r.n_events, r.n_risk, r.s_ppm) for r in rows} == out


def test_ratio_to_parent_shares_sum(spark, sf_dir, qmap):
    """Nation shares within each region sum to ~1e6 (floor slack);
    region shares sum to ~1e6; revenue reconciles to region totals."""
    rows = qmap["ratio_to_parent_revenue"](spark, sf_dir).collect()
    per_region = {}
    for r in rows:
        per_region.setdefault(r.region, []).append(r)
    region_share = {}
    for region, rs in per_region.items():
        tot = sum(r.nation_share_ppm for r in rs)
        assert 1_000_000 - len(rs) <= tot <= 1_000_000
        assert abs(sum(round(r.revenue * 100) for r in rs) -
                   round(rs[0].region_revenue * 100)) == 0
        region_share[region] = rs[0].region_share_ppm
        assert all(r.region_share_ppm == rs[0].region_share_ppm for r in rs)
    tot = sum(region_share.values())
    assert 1_000_000 - len(region_share) <= tot <= 1_000_000


def test_calibration_bins_partition_the_corpus(spark, sf_dir, qmap):
    """Bin counts sum to the corpus; rates are consistent; mean
    scores sit inside their bin's ppm range."""
    rows = sorted(
        qmap["calibration_reliability_bins"](spark, sf_dir).collect(),
        key=lambda r: r.bin,
    )
    n_docs = io.table(spark, sf_dir, "documents").count()
    assert sum(r.n for r in rows) == n_docs
    for r in rows:
        assert 0 <= r.bin <= 9
        assert 0 <= r.n_pos <= r.n
        assert r.pos_rate_ppm == r.n_pos * 1_000_000 // r.n
        lo = r.bin * 200_000 - 1_000_000
        hi = lo + 200_000 if r.bin < 9 else 1_000_001
        assert lo <= r.mean_score_ppm <= hi
