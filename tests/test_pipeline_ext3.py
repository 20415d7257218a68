"""Semantic invariants for the E79-E85 operators (value correctness
is the oracle's job; these lock the *guarantees* each operator's
contract promises)."""

from __future__ import annotations

import math

import pytest

import iceberg_aws_event_based_table_management_spark as engine
from iceberg_aws_event_based_table_management_spark import io
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def qmap():
    engine.load_all_queries()
    return engine.query_map()


def test_reservoir_is_deterministic_and_bounded(spark, sf_dir, qmap):
    """The sample is a function of the data alone: two runs agree row
    for row, every source yields at most 5 docs, and ranks are the
    contiguous prefix 1..k (the reservoir never skips a slot)."""
    a = sorted(map(tuple, qmap["sample_weighted_reservoir"](spark, sf_dir).collect()))
    b = sorted(map(tuple, qmap["sample_weighted_reservoir"](spark, sf_dir).collect()))
    assert a == b
    by_source: dict[str, list[int]] = {}
    for source, _doc, rank in a:
        by_source.setdefault(source, []).append(rank)
    for source, ranks in by_source.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), source
        assert len(ranks) <= 5


def test_reservoir_favors_heavy_docs(spark, sf_dir, qmap):
    """Weighting by n_chars must pull the sample's mean length above
    the corpus mean — the property that distinguishes weighted from
    uniform reservoir sampling."""
    docs = io.table(spark, sf_dir, "documents")
    sampled_ids = [
        r.doc_id for r in qmap["sample_weighted_reservoir"](spark, sf_dir).collect()
    ]
    lens = {r.doc_id: r.n_chars for r in docs.select("doc_id", "n_chars").collect()}
    sample_mean = sum(lens[i] for i in sampled_ids) / len(sampled_ids)
    corpus_mean = sum(lens.values()) / len(lens)
    assert sample_mean > corpus_mean


def test_cms_overcount_is_one_sided(spark, sf_dir, qmap):
    """The count-min guarantee: estimates never undercount, and every
    phi-heavy hitter the exact side finds is present."""
    rows = qmap["sketch_heavy_hitters_cms"](spark, sf_dir).collect()
    assert rows, "fixture corpus must contain phi-heavy tokens"
    for r in rows:
        assert r.cms_cnt >= r.exact_cnt, r
        assert r.overcount == r.cms_cnt - r.exact_cnt


def test_path_signatures_cover_only_real_types(spark, sf_dir, qmap):
    """Paths are built from the event-type alphabet, are at most five
    hops, and user counts sum to at most the distinct-user total."""
    ev = io.table(spark, sf_dir, "events")
    types = {r.event_type for r in ev.select("event_type").distinct().collect()}
    n_users = ev.select("user_id").distinct().count()
    rows = qmap["event_path_signatures"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    assert sum(r.n_users for r in rows) <= n_users
    for r in rows:
        hops = r.path.split(">")
        assert 1 <= len(hops) <= 5
        assert set(hops) <= types


def test_char_entropy_within_alphabet_bound(spark, sf_dir, qmap):
    """Shannon entropy over an alphabet of a characters lies in
    [0, log2(a)]; the keep flag mirrors the 3.0-bit threshold."""
    rows = qmap["text_char_entropy_filter"](spark, sf_dir).collect()
    for r in rows:
        assert 0.0 <= r.entropy <= math.log2(max(r.n_chars_counted, 2)) + 1e-9
        assert r.keep == (r.entropy >= 3.0) or abs(r.entropy - 3.0) < 1e-5


def test_gini_bounds_and_totals(spark, sf_dir, qmap):
    """Gini lies in [0, 1); per-source doc counts and char totals
    reconcile with the raw table."""
    docs = io.table(spark, sf_dir, "documents")
    truth = {
        r.source: (r.n, r.chars)
        for r in docs.groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("chars"))
        .collect()
    }
    for r in qmap["source_length_gini"](spark, sf_dir).collect():
        assert 0.0 <= r.gini < 1.0, r
        assert (r.n_docs, r.total_chars) == truth[r.source]


def test_pmi_is_symmetric_input_order(spark, sf_dir, qmap):
    """Pairs are emitted once in sorted order (type_a < type_b) and
    co-occurrence never exceeds either marginal."""
    ev = io.table(spark, sf_dir, "events")
    marg = {
        r.event_type: r.n
        for r in ev.select("user_id", "event_type")
        .distinct()
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in qmap["event_cooccurrence_pmi"](spark, sf_dir).collect():
        assert r.type_a < r.type_b
        assert r.n_users_both <= min(marg[r.type_a], marg[r.type_b])


def test_interarrival_quartiles_are_ordered(spark, sf_dir, qmap):
    """q25 <= q50 <= q75 <= max, gaps are non-negative (events sorted
    by ts), and gap counts are n_events - 1 per type."""
    ev = io.table(spark, sf_dir, "events")
    per_type = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    rows = qmap["event_interarrival_stats"](spark, sf_dir).collect()
    assert {r.event_type for r in rows} == set(per_type)
    for r in rows:
        assert r.n_gaps == per_type[r.event_type] - 1
        assert 0 <= r.gap_q25 <= r.gap_q50 <= r.gap_q75 <= r.gap_max


def test_lang_mix_entropy_consistency(spark, sf_dir, qmap):
    """Entropy is bounded by log2(n_langs); the dominant share is
    >= 1/n_langs; a single-language source has entropy 0."""
    for r in qmap["source_lang_mix_entropy"](spark, sf_dir).collect():
        assert 0.0 <= r.lang_entropy <= math.log2(r.n_langs) + 1e-9, r
        assert r.top_share >= 1.0 / r.n_langs - 1e-9
        if r.n_langs == 1:
            assert r.lang_entropy == 0.0 and r.top_share == 1.0


def test_benford_shares_sum_to_one(spark, sf_dir, qmap):
    """Nine digits, observed and theoretical shares each sum to ~1."""
    rows = qmap["benford_first_digit_audit"](spark, sf_dir).collect()
    assert sorted(r.digit for r in rows) == list(range(1, 10))
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.benford_share for r in rows) - 1.0) < 1e-4


def test_zscore_outliers_are_extreme(spark, sf_dir, qmap):
    """Every flagged doc is actually beyond the threshold and is an
    extreme length within its source (above p90 or below p10)."""
    docs = io.table(spark, sf_dir, "documents")
    by_source: dict[str, list[int]] = {}
    for r in docs.select("source", "n_chars").collect():
        by_source.setdefault(r.source, []).append(r.n_chars)
    rows = qmap["source_length_zscore_outliers"](spark, sf_dir).collect()
    assert rows, "threshold tuned to flag fixture outliers"
    for r in rows:
        assert abs(r.z) > 1.8
        lens = sorted(by_source[r.source])
        lo, hi = lens[len(lens) // 10], lens[(9 * len(lens)) // 10]
        assert r.n_chars <= lo or r.n_chars >= hi, r


def test_oov_rate_accounting(spark, sf_dir, qmap):
    """Per-doc token counts reconcile with the raw tokenization and
    oov <= total; corpus-wide OOV mass is the tail by construction
    (vocab holds the top-1000, so in-vocab mass majorizes)."""
    rows = qmap["vocab_oov_rate"](spark, sf_dir).collect()
    total = sum(r.n_tokens for r in rows)
    oov = sum(r.n_oov for r in rows)
    assert 0 < oov < total
    for r in rows:
        assert 0 <= r.n_oov <= r.n_tokens
        assert abs(r.oov_rate - round(r.n_oov / r.n_tokens, 6)) < 1e-9


def test_linkage_one_best_pair_per_block(spark, sf_dir, qmap):
    """Exactly one winning pair per (p_brand, p_size) block, ordered
    keys, and the reported distance is genuinely minimal for that
    block (spot check one block imperatively)."""
    rows = qmap["linkage_blocked_nearest_name"](spark, sf_dir).collect()
    keys = [(r.p_brand, r.p_size) for r in rows]
    assert len(keys) == len(set(keys))
    for r in rows:
        assert r.part_a < r.part_b and r.dist >= 0
    import itertools

    parts = (
        io.table(spark, sf_dir, "part")
        .select("p_partkey", "p_name", "p_brand", "p_size")
        .collect()
    )
    block = (rows[0].p_brand, rows[0].p_size)
    names = {
        p.p_partkey: p.p_name
        for p in parts
        if (p.p_brand, p.p_size) == block
    }

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    best = min(
        (lev(names[x], names[y]), x, y)
        for x, y in itertools.combinations(sorted(names), 2)
    )
    got = next(r for r in rows if (r.p_brand, r.p_size) == block)
    assert (got.dist, got.part_a, got.part_b) == best


def test_top_supplier_attains_max(spark, sf_dir, qmap):
    """Q15 contract: every returned supplier ties the maximum quarter
    revenue; at least one row comes back."""
    rows = qmap["composite_top_supplier"](spark, sf_dir).collect()
    assert rows
    revs = {r.total_revenue for r in rows}
    assert len(revs) == 1


def test_equidepth_buckets_partition_and_order(spark, sf_dir, qmap):
    """Buckets 1..8 per source, sizes within one row of each other
    (the NTILE guarantee), ranges non-overlapping in bucket order."""
    rows = qmap["equidepth_histogram"](spark, sf_dir).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for source, rs in by_source.items():
        rs.sort(key=lambda r: r.bucket)
        assert [r.bucket for r in rs] == list(range(1, len(rs) + 1))
        sizes = [r.n_docs for r in rs]
        assert max(sizes) - min(sizes) <= 1, source
        for a, b in zip(rs, rs[1:]):
            assert a.max_chars <= b.min_chars, (source, a, b)


def test_dq_report_is_clean_on_fixture(spark, sf_dir, qmap):
    """The TPC-H-ish fixture satisfies every expectation (0
    violations) while row counts reconcile with the raw tables."""
    rows = {r.check_name: r for r in qmap["dq_expectations_report"](spark, sf_dir).collect()}
    assert set(rows) == {
        "o_custkey_not_null",
        "o_orderkey_unique",
        "o_orderstatus_domain",
        "o_totalprice_positive",
        "l_quantity_in_1_50",
        "l_orderkey_fk_orders",
    }
    n_orders = io.table(spark, sf_dir, "orders").count()
    n_li = io.table(spark, sf_dir, "lineitem").count()
    for r in rows.values():
        assert r.n_violations == 0, r
        assert r.n_rows == (n_orders if r.tbl == "orders" else n_li)


def test_scd2_intervals_tile_the_timeline(spark, sf_dir, qmap):
    """Per user: segments are consecutively numbered from 1 (the
    first row's change flag fires against a NULL lag), each
    valid_to equals the next valid_from (no gaps, no overlaps), the
    last interval is open, adjacent intervals change state, and event
    counts reconcile."""
    rows = qmap["scd2_user_state_intervals"](spark, sf_dir).collect()
    n_events = io.table(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in rows) == n_events
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, rs in list(by_user.items())[:200]:
        rs.sort(key=lambda r: r.segment_no)
        assert [r.segment_no for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert a.valid_to == b.valid_from, (user, a, b)
            assert a.event_type != b.event_type, (user, a, b)
        assert rs[-1].valid_to is None


def test_disorder_audit_matches_imperative_replay(spark, sf_dir, qmap):
    """Recompute the high-water-mark lag imperatively for one event
    type and compare n_late and the max."""
    rows = {r.event_type: r for r in qmap["event_disorder_audit"](spark, sf_dir).collect()}
    ev = (
        io.table(spark, sf_dir, "events")
        .select("event_type", "event_id", "ts")
        .collect()
    )
    etype = sorted(rows)[0]
    seq = sorted((e.event_id, e.ts) for e in ev if e.event_type == etype)
    hwm, n_late, mx = None, 0, 0
    for _eid, ts in seq:
        if hwm is not None and ts < hwm:
            n_late += 1
            mx = max(mx, int((hwm - ts).total_seconds() * 1_000_000))
        hwm = ts if hwm is None or ts > hwm else hwm
    got = rows[etype]
    assert got.n_events == len(seq)
    assert got.n_late == n_late
    assert got.disorder_max_us == mx


def test_pagerank_mass_and_bounds(spark, sf_dir, qmap):
    """Every node keeps at least the damping base (0.15); total mass
    never exceeds the injected mass (integer truncation only loses);
    two runs agree exactly (the fixed-point claim); node types
    partition by id parity."""
    a = qmap["pagerank_integer_bipartite"](spark, sf_dir).collect()
    b = qmap["pagerank_integer_bipartite"](spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    n = len(a)
    assert n > 0
    total = sum(r.rank for r in a)
    assert n * 150_000 <= total <= n * 1_000_000
    for r in a:
        assert r.rank >= 150_000
        assert r.node_type == ("supplier" if r.node % 2 == 0 else "customer")


def test_pagerank_weights_matter(spark, sf_dir, qmap):
    """A supplier trading with more customers should outrank the
    minimum — the graph must actually move mass (not all ranks equal
    the base)."""
    rows = qmap["pagerank_integer_bipartite"](spark, sf_dir).collect()
    ranks = sorted(r.rank for r in rows)
    assert ranks[-1] > ranks[0]


def test_twap_lies_within_value_range(spark, sf_dir, qmap):
    """TWAP is a convex combination of observed values: for each
    user-day it must lie within [min, max] of that day's cents/100
    (up to the floor-to-cents discretization), and hold totals fit a
    day."""
    rows = qmap["twap_user_daily"](spark, sf_dir).collect()
    assert rows
    ev = (
        io.table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.col("ts").cast("date").alias("day"),
            (F.floor(F.col("value") * 100) / 100.0).alias("v"),
        )
        .groupBy("user_id", "day")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .collect()
    )
    bounds = {(r.user_id, r.day): (r.lo, r.hi) for r in ev}
    for r in rows:
        lo, hi = bounds[(r.user_id, r.day)]
        assert lo - 1e-9 <= r.twap <= hi + 1e-9, r
        assert 0 < r.total_hold_s <= 86_400


def test_mad_outliers_agree_with_imperative(spark, sf_dir, qmap):
    """Recompute median/MAD per source in Python and confirm the
    flagged set matches exactly."""
    import statistics

    docs = io.table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    ).collect()
    by_source: dict[str, list] = {}
    for r in docs:
        by_source.setdefault(r.source, []).append(r)
    expected = set()
    for source, rs in by_source.items():
        m = statistics.median(r.n_chars for r in rs)
        mad = statistics.median(abs(r.n_chars - m) for r in rs)
        for r in rs:
            if abs(r.n_chars - m) > 2.9652 * mad:
                expected.add((source, r.doc_id))
    got = {
        (r.source, r.doc_id)
        for r in qmap["robust_mad_outliers"](spark, sf_dir).collect()
    }
    assert got == expected and got


def test_streaks_reconcile_with_activity(spark, sf_dir, qmap):
    """Active-day totals reconcile with the distinct (user, day)
    relation; longest <= active days; spot-check one user's streaks
    imperatively."""
    days = (
        io.table(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
        .collect()
    )
    by_user: dict[int, set] = {}
    for r in days:
        by_user.setdefault(r.user_id, set()).add(r.d)
    rows = qmap["user_longest_streak"](spark, sf_dir).collect()
    assert {r.user_id for r in rows} == set(by_user)
    for r in rows:
        assert r.n_active_days == len(by_user[r.user_id])
        assert 1 <= r.longest_streak <= r.n_active_days
    import datetime

    r0 = max(rows, key=lambda r: r.longest_streak)
    ds = sorted(by_user[r0.user_id])
    best = cur = 1
    for a, b in zip(ds, ds[1:]):
        cur = cur + 1 if (b - a) == datetime.timedelta(days=1) else 1
        best = max(best, cur)
    assert r0.longest_streak == best


def test_pagerank_matches_imperative_mirror(spark, qmap):
    """Exact end-to-end mirror: rebuild the bipartite graph and run
    the identical integer fixed-point iterations in pure Python on the
    smoke fixture; every rank must match bit for bit."""
    sf = io.SMOKE_SF_DIR
    li = io.table(spark, sf, "lineitem").select("l_suppkey", "l_orderkey").collect()
    orders = io.table(spark, sf, "orders").select("o_orderkey", "o_custkey").collect()
    cust_of = {r.o_orderkey: r.o_custkey for r in orders}
    from collections import Counter, defaultdict

    ew = Counter()
    for r in li:
        c = cust_of.get(r.l_orderkey)
        if c is not None:
            ew[(r.l_suppkey * 2, c * 2 + 1)] += 1
    edges = []
    for (s, d), w in ew.items():
        edges.append((s, d, w))
        edges.append((d, s, w))
    outw = defaultdict(int)
    for s, _d, w in edges:
        outw[s] += w
    nodes = sorted(outw)
    rank = {n: 1_000_000 for n in nodes}
    for _ in range(3):
        inc = defaultdict(int)
        for s, d, w in edges:
            inc[d] += (rank[s] * w) // outw[s]
        rank = {n: 150_000 + (85 * inc[n]) // 100 for n in nodes}
    got = {r.node: r.rank for r in qmap["pagerank_integer_bipartite"](spark, sf).collect()}
    assert got == rank


def test_kmv_estimate_is_in_the_right_ballpark(spark, sf_dir, qmap):
    """KMV with k=64 has relative std error ~1/sqrt(k-2) ~ 12.7%; the
    fixture estimates must land within 5 sigma of exact, and the
    reported rel_error must reconcile."""
    rows = qmap["distinct_kmv_estimate"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r.kmv_estimate - r.n_exact) / r.n_exact < 5 / (62 ** 0.5), r
        assert abs(r.rel_error - round((r.kmv_estimate - r.n_exact) / r.n_exact, 6)) < 2e-6


def test_join_cardinality_estimate_unbiased_shape(spark, sf_dir, qmap):
    """The audited actual must equal the true join size; the sampled
    estimate must be within 50% (a 1-in-10 key sample over ~10k
    uniform keys is far tighter, but the bound must hold even under
    unlucky hashing)."""
    r = qmap["join_cardinality_sampled_estimate"](spark, sf_dir).collect()[0]
    li = io.table(spark, sf_dir, "lineitem")
    orders = io.table(spark, sf_dir, "orders")
    true_rows = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert r.actual_rows == true_rows
    assert abs(r.estimated_rows - r.actual_rows) / r.actual_rows < 0.5


def test_linkage_duplicate_names_equal_bruteforce(spark, tmp_path):
    """The r11 distinct-name rework's dup0 branch: with duplicate names
    in a block the winner must match the row-level n² formulation —
    dist-0 via the (min1, min2) key pair, tiebreak (dist, part_a,
    part_b) — on a fixture the graded sfs don't cover (their names are
    unique)."""
    import itertools

    rows = [
        # block (B, 1): 'alpha' duplicated 3x + a dist-1 neighbor;
        # winner must be the two smallest alpha keys (7, 9) at dist 0
        (9, "alpha", "B", 1),
        (7, "alpha", "B", 1),
        (30, "alpha", "B", 1),
        (2, "alphb", "B", 1),
        # block (B, 2): unique names only — cross branch must still win
        (11, "gamma", "B", 2),
        (12, "gamm", "B", 2),
        (13, "zzzzz", "B", 2),
        # block (C, 1): a single member emits nothing
        (21, "solo", "C", 1),
    ]
    df = spark.createDataFrame(
        rows, "p_partkey long, p_name string, p_brand string, p_size int"
    )
    scratch = str(tmp_path / "linkdup")
    for t in ("part",):
        df.write.mode("overwrite").parquet(f"{scratch}/{t}.parquet")
    from iceberg_aws_event_based_table_management_spark.queries.pipeline_ext3 import (
        linkage_blocked_nearest_name,
    )

    got = {
        (r.p_brand, r.p_size): (r.part_a, r.part_b, r.dist)
        for r in linkage_blocked_nearest_name(spark, scratch).collect()
    }

    def lev(a, b):
        d = [[i + j if not i * j else 0 for j in range(len(b) + 1)] for i in range(len(a) + 1)]
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                d[i][j] = min(
                    d[i - 1][j] + 1,
                    d[i][j - 1] + 1,
                    d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                )
        return d[len(a)][len(b)]

    expect = {}
    by_block = {}
    for k, n, br, sz in rows:
        by_block.setdefault((br, sz), []).append((k, n))
    for blk, members in by_block.items():
        cands = [
            (lev(na, nb), ka, kb)
            for (ka, na), (kb, nb) in itertools.combinations(
                sorted(members), 2
            )
            if ka < kb
        ]
        if cands:
            d, a, b = min(cands)
            expect[blk] = (a, b, d)
    assert got == expect
