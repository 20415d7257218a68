"""Semantic invariants for the E169-E170 operators (value correctness
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


def _daily_series(spark, sf_dir):
    rows = (
        io.table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .count()
        .collect()
    )
    series = {}
    for r in rows:
        series.setdefault(r.event_type, []).append((r.day, r["count"]))
    for v in series.values():
        v.sort()
    return {k: [n for _, n in v] for k, v in series.items()}


def test_acf_matches_python_and_is_bounded(spark, sf_dir, qmap):
    """ACF ppm in [-1e6, 1e6]; exact Python recompute with the same
    n-scaled deviations."""
    rows = {r.event_type: r for r in qmap["acf_daily_lags"](spark, sf_dir).collect()}
    series = _daily_series(spark, sf_dir)
    import math

    for et, xs in series.items():
        n, s = len(xs), sum(xs)
        dev = [n * x - s for x in xs]
        den = sum(d * d for d in dev)
        for k, field in ((1, "acf1_ppm"), (7, "acf7_ppm")):
            num = sum(dev[i] * dev[i - k] for i in range(k, n))
            expect = math.floor(num / den * 1_000_000)
            got = getattr(rows[et], field)
            assert got == expect, (et, k)
            assert -1_000_000 <= got <= 1_000_000


def test_correlation_symmetric_bounds_and_python_parity(spark, sf_dir, qmap):
    """|r| <= 1e6 ppm; all 10 unordered type pairs present; exact
    Python recompute including the correctly-rounded sqrt path."""
    rows = qmap["correlation_event_series"](spark, sf_dir).collect()
    series = _daily_series(spark, sf_dir)
    types = sorted(series)
    assert len(rows) == len(types) * (len(types) - 1) // 2
    import math

    by_pair = {(r.type_a, r.type_b): r for r in rows}
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            xs, ys = series[ta], series[tb]
            assert len(xs) == len(ys)  # same day spine in the fixture
            n = len(xs)
            sx, sy = sum(xs), sum(ys)
            sxx = sum(x * x for x in xs)
            syy = sum(y * y for y in ys)
            sxy = sum(x * y for x, y in zip(xs, ys))
            cov = n * sxy - sx * sy
            r = by_pair[(ta, tb)]
            assert r.cov_scaled == cov
            expect = math.floor(
                cov
                / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
                * 1_000_000
            )
            assert r.pearson_ppm == expect
            assert -1_000_000 <= r.pearson_ppm <= 1_000_000


def test_overflow_guard_fail_stops(spark):
    """The decimal(38,0) combinations must fail LOUDLY on overflow
    (matching the DuckDB oracle's HUGEINT throw), never silently NULL
    a row (round-7 ADVICE): a NULL reaching the guard — only possible
    via overflow in these queries — raises, a real value passes
    through untouched."""
    import pytest
    from pyspark.sql import functions as F

    from iceberg_aws_event_based_table_management_spark.queries.pipeline_ext17 import (
        _no_silent_overflow,
    )

    ok = spark.range(1).select(
        _no_silent_overflow(F.lit(7).cast("decimal(38,0)"), "t").alias("c")
    )
    assert ok.collect()[0].c == 7

    bad = spark.range(1).select(
        _no_silent_overflow(F.lit(None).cast("decimal(38,0)"), "t").alias("c")
    )
    with pytest.raises(Exception, match="overflow"):
        bad.collect()
