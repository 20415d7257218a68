"""Semantic invariants for the E140-E145 operators (value correctness
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


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit1_blocking_is_complete(spark, sf_dir, qmap):
    """Deletion-neighborhood candidates must equal the brute-force
    Levenshtein-1 pair set (100% recall AND precision after verify)."""
    got = {
        (r.custkey_a, r.custkey_b)
        for r in qmap["dedup_edit1_names"](spark, sf_dir).collect()
    }
    names = {
        r.c_custkey: r.c_name
        for r in io.table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name")
        .collect()
    }
    keys = sorted(names)
    brute = {
        (a, b)
        for i, a in enumerate(keys)
        for b in keys[i + 1 :]
        if abs(len(names[a]) - len(names[b])) <= 1
        and _lev(names[a], names[b]) == 1
    }
    assert got == brute


def test_ohlc_endpoints_are_order_statistics(spark, sf_dir, qmap):
    """low <= open/close <= high everywhere; n sums to the event
    count; open/close match a Python replay for one (type, day)."""
    rows = qmap["ohlc_daily_value"](spark, sf_dir).collect()
    assert sum(r.n for r in rows) == io.table(spark, sf_dir, "events").count()
    for r in rows:
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
    probe = rows[0]
    ev = sorted(
        (
            (e.ts, e.event_id, e.value)
            for e in io.table(spark, sf_dir, "events")
            .filter(F.col("event_type") == probe.event_type)
            .filter(F.to_date(F.date_trunc("day", "ts")) == probe.day)
            .collect()
        )
    )
    assert ev[0][2] == probe.open and ev[-1][2] == probe.close
    assert len(ev) == probe.n


def test_interval_merge_conservation(spark, sf_dir, qmap):
    """Covered time is bounded by [span, n_events*span]; interval
    count bounded by event count; a Python sweep reproduces one
    user exactly."""
    from iceberg_aws_event_based_table_management_spark.queries.pipeline_ext10 import (
        _IV_SPAN_US,
    )

    rows = qmap["merge_user_intervals"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_intervals <= r.n_events
        assert _IV_SPAN_US <= r.covered_us <= r.n_events * _IV_SPAN_US
    probe = max(rows, key=lambda r: r.n_events)
    ts = sorted(
        r[0]
        for r in io.table(spark, sf_dir, "events")
        .filter(F.col("user_id") == probe.user_id)
        .select(io.epoch_us(F.col("ts")))
        .collect()
    )
    islands, end = 0, None
    covered = 0
    for s in ts:
        e = s + _IV_SPAN_US
        if end is None or s > end:
            islands += 1
            covered += _IV_SPAN_US
            end = e
        else:
            covered += e - end
            end = e
    assert (probe.n_intervals, probe.covered_us) == (islands, covered)


def test_cohort_ltv_is_cumulative_and_conserves_revenue(spark, sf_dir, qmap):
    """cum_revenue is nondecreasing per cohort and ends at the cohort
    total; summed revenue equals total purchase revenue."""
    rows = qmap["cohort_ltv_weekly"](spark, sf_dir).collect()
    total = sum(round(r.revenue * 100) for r in rows)
    expect = (
        io.table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")))
        .collect()[0][0]
    )
    assert total == expect
    per = {}
    for r in rows:
        per.setdefault(r.cohort_week, []).append(r)
    for cohort, rs in per.items():
        rs.sort(key=lambda r: r.week_idx)
        cum = 0
        for r in rs:
            cum += round(r.revenue * 100)
            assert round(r.cum_revenue * 100) == cum, cohort
        assert all(r.n_users == rs[0].n_users for r in rs)


def test_rrf_fusion_respects_both_rankings(spark, sf_dir, qmap):
    """Fused scores decompose into the two floored reciprocals; a doc
    in both lists outranks the same ranks seen singly; output sorted."""
    rows = qmap["rrf_fuse_retrieval"](spark, sf_dir).collect()
    assert len(rows) == 10
    scores = [r.rrf_ppm for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        expect = 0
        if r.bm25_rank is not None:
            expect += 1_000_000 // (60 + r.bm25_rank)
        if r.embed_rank is not None:
            expect += 1_000_000 // (60 + r.embed_rank)
        assert r.rrf_ppm == expect
        assert r.bm25_rank is not None or r.embed_rank is not None


def test_fd_audit_verdicts(spark, sf_dir, qmap):
    """Key-like lhs columns hold; known-violating candidates report
    violations consistently with a direct recount."""
    rows = {(r.table_name, r.lhs, r.rhs): r for r in
            qmap["functional_dependency_audit"](spark, sf_dir).collect()}
    assert rows[("customer", "c_name", "c_mktsegment")].holds
    li = rows[("lineitem", "l_orderkey", "l_returnflag")]
    recount = (
        io.table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.countDistinct("l_returnflag").alias("d"))
        .filter(F.col("d") > 1)
        .count()
    )
    assert li.n_violating == recount
    assert li.holds == (recount == 0)
    for r in rows.values():
        assert r.holds == (r.n_violating == 0)
        assert 0 <= r.n_violating <= r.n_groups


def test_edit1_duplicate_names_equal_bruteforce(spark, tmp_path):
    """The r11 distinct-name rework under name multiplicity (the
    graded fixtures' names are unique): with 'anna' twice and 'ann'
    twice, output must equal the n² Levenshtein==1 scan — every
    cross-multiplicity custkey pair exactly once, equal-name pairs
    (dist 0) excluded."""
    import itertools

    rows = [
        (1, "anna"),
        (2, "anna"),
        (3, "ann"),
        (4, "ann"),
        (5, "anXa"),
        (6, "zzz"),
    ]
    df = spark.createDataFrame(rows, "c_custkey long, c_name string")
    scratch = str(tmp_path / "edit1dup")
    df.write.mode("overwrite").parquet(f"{scratch}/customer.parquet")
    from iceberg_aws_event_based_table_management_spark.queries.pipeline_ext10 import (
        dedup_edit1_names,
    )

    got = {
        (r.custkey_a, r.custkey_b, r.name_a, r.name_b)
        for r in dedup_edit1_names(spark, scratch).collect()
    }

    def lev(a, b):
        d = [[max(i, j) if not i * j else 0 for j in range(len(b) + 1)] for i in range(len(a) + 1)]
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                d[i][j] = min(
                    d[i - 1][j] + 1,
                    d[i][j - 1] + 1,
                    d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                )
        return d[len(a)][len(b)]

    expect = {
        (ka, kb, na, nb)
        for (ka, na), (kb, nb) in itertools.combinations(rows, 2)
        if lev(na, nb) == 1
    }
    assert got == expect
    # sanity: multiplicity expanded (anna x ann = 2x2 pairs) and the
    # dist-0 anna/anna, ann/ann pairs are absent
    assert sum(1 for t in expect if {t[2], t[3]} == {"anna", "ann"}) == 4
