"""Semantic invariants for the E134-E139 operators (value correctness
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


def test_apportionment_sums_exactly_to_budget(spark, sf_dir, qmap):
    """Final quotas sum to the budget EXACTLY; every quota is within
    1 of the real-valued proportional share; extras go to the largest
    remainders."""
    from iceberg_aws_event_based_table_management_spark.queries.pipeline_ext9 import (
        _APPORTION_BUDGET,
    )

    rows = qmap["apportion_token_budget"](spark, sf_dir).collect()
    assert sum(r.final_quota for r in rows) == _APPORTION_BUDGET
    total = sum(r.n_tokens for r in rows)
    for r in rows:
        share = _APPORTION_BUDGET * r.n_tokens / total
        assert r.base_quota == int(share // 1)
        assert r.base_quota <= r.final_quota <= r.base_quota + 1
        assert r.got_extra == (r.final_quota == r.base_quota + 1)
    # largest-remainder rule: every winner's remainder >= every loser's
    rem = {
        r.source: _APPORTION_BUDGET * r.n_tokens % total for r in rows
    }
    winners = [rem[r.source] for r in rows if r.got_extra]
    losers = [rem[r.source] for r in rows if not r.got_extra]
    if winners and losers:
        assert min(winners) >= max(losers)


def test_chi_square_matches_float_recompute(spark, sf_dir, qmap):
    """Integer-ppm contributions track the textbook float statistic
    to within ppm truncation error."""
    rows = qmap["drift_chi_square_gate"](spark, sf_dir).collect()
    assert rows
    tb = sum(r.n_base for r in rows)
    tc = sum(r.n_cur for r in rows)
    total_ppm = rows[0].chi2_total_ppm
    acc = 0.0
    for r in rows:
        e = tc * r.n_base / tb
        acc += (r.n_cur - e) ** 2 / e
        float_contrib = (r.n_cur * tb - r.n_base * tc) ** 2 / (tb * tc * r.n_base)
        assert abs(r.contrib_ppm - float_contrib * 1e6) <= 1.0
    assert abs(total_ppm - acc * 1e6) <= len(rows) + 1
    assert all(r.chi2_total_ppm == total_ppm for r in rows)
    assert all(r.is_drift == (total_ppm > 9_487_700) for r in rows)


def test_mannwhitney_matches_bruteforce_u(spark, sf_dir, qmap):
    """2U equals the brute-force pairwise count 2*#(a>b) + #(a=b)."""
    r = qmap["mannwhitney_u_lengths"](spark, sf_dir).collect()[0]
    docs = (
        io.table(spark, sf_dir, "documents")
        .filter(F.col("source").isin("src0", "src1"))
        .select("source", "n_chars")
        .collect()
    )
    a = [d.n_chars for d in docs if d.source == "src0"]
    b = [d.n_chars for d in docs if d.source == "src1"]
    u2 = sum(2 * (x > y) + (x == y) for x in a for y in b)
    assert (r.n1, r.n2, r.u2) == (len(a), len(b), u2)
    d = u2 - len(a) * len(b)
    assert r.diff2 == d
    assert r.is_shifted == (3 * d * d > 4 * len(a) * len(b) * (len(a) + len(b) + 1))


def test_salting_plan_bounds_partition_size(spark, sf_dir, qmap):
    """Each plan row caps the post-salt partition at the target and
    never over-salts (factor-1 would overflow the target)."""
    from iceberg_aws_event_based_table_management_spark.queries.pipeline_ext9 import (
        _SALT_TARGET,
    )

    rows = qmap["salting_plan_skewed_keys"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n > _SALT_TARGET
        assert r.salt_factor == -(-r.n // _SALT_TARGET)
        assert r.max_rows_after == -(-r.n // r.salt_factor)
        assert r.max_rows_after <= _SALT_TARGET
        assert -(-r.n // (r.salt_factor - 1)) > _SALT_TARGET or r.salt_factor == 1


def test_khop_levels_are_minimal_and_disjoint(spark, sf_dir, qmap):
    """Every node appears once, at its true BFS distance (checked
    against a Python BFS over the collected edge list)."""
    rows = qmap["graph_khop_reach"](spark, sf_dir).collect()
    edges = (
        io.table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
        .collect()
    )
    from collections import defaultdict

    p2s, s2p = defaultdict(set), defaultdict(set)
    for e in edges:
        p2s[e.l_partkey].add(e.l_suppkey)
        s2p[e.l_suppkey].add(e.l_partkey)
    seed = min(s2p)
    dist = {("supplier", seed): 0}
    frontier = [("supplier", seed)]
    for hop in (1, 2, 3):
        nxt = []
        for t, nid in frontier:
            neigh = s2p[nid] if t == "supplier" else p2s[nid]
            ot = "part" if t == "supplier" else "supplier"
            for m in neigh:
                if (ot, m) not in dist:
                    dist[(ot, m)] = hop
                    nxt.append((ot, m))
        frontier = nxt
    got = {(r.node_type, r.node_id): r.hop for r in rows}
    assert len(got) == len(rows)  # no duplicates
    assert got == dist


def test_quantile_normalization_properties(spark, sf_dir, qmap):
    """Mapping is monotone within source, lands on real global
    values, and maps the per-source maximum to the global maximum's
    CDF neighborhood."""
    rows = qmap["quantile_normalize_lengths"](spark, sf_dir).collect()
    gvals = sorted(
        r.n_chars
        for r in io.table(spark, sf_dir, "documents").select("n_chars").collect()
    )
    gset = set(gvals)
    per_src = {}
    for r in rows:
        per_src.setdefault(r.source, []).append((r.n_chars, r.mapped_chars))
        assert r.mapped_chars in gset
    for source, pairs in per_src.items():
        pairs.sort()
        mapped = [m for _, m in pairs]
        assert mapped == sorted(mapped), source  # monotone
        assert pairs[-1][1] == gvals[-1]  # CDF=1 maps to global max
