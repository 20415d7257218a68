"""Semantic invariants for the E165-E166 operators (value correctness
is the oracle's job; these lock the *guarantees* each operator's
contract promises)."""

from __future__ import annotations

import datetime

import pytest

import iceberg_aws_event_based_table_management_spark as engine
from iceberg_aws_event_based_table_management_spark import io
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def qmap():
    engine.load_all_queries()
    return engine.query_map()


def test_stream_ohlc_equals_batch_ohlc(spark, sf_dir, qmap):
    """The incremental streaming candles must equal the batch E141
    operator row-for-row — the arrival-order-insensitivity claim."""
    stream = {
        (r.event_type, r.day): (r.open, r.high, r.low, r.close, r.n, r.volume)
        for r in qmap["stream_ohlc_daily"](spark, sf_dir).collect()
    }
    batch = {
        (r.event_type, r.day): (r.open, r.high, r.low, r.close, r.n, r.volume)
        for r in qmap["ohlc_daily_value"](spark, sf_dir).collect()
    }
    assert stream == batch


def test_business_days_never_exceed_calendar_days(spark, sf_dir, qmap):
    """Per priority: 0 <= total business days <= total calendar days;
    Python-replay parity on a sample of orders."""
    rows = qmap["business_days_lag"](spark, sf_dir).collect()
    cal = {
        r.priority: r
        for r in qmap["shipping_lag_percentiles"](spark, sf_dir).collect()
    }
    for r in rows:
        assert r.n == cal[r.priority].n
        assert 0 <= r.total_bdays
        assert r.avg_bdays_ppm == r.total_bdays * 1_000_000 // r.n
        assert r.max_bdays <= cal[r.priority].max_lag
    # Python replay over one priority class
    probe = rows[0].priority
    sample = (
        io.table(spark, sf_dir, "orders")
        .join(
            io.table(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .filter(F.col("o_orderpriority") == probe)
        .select(
            F.to_date(F.date_trunc("day", "o_orderdate")).alias("d0"),
            F.to_date(F.date_trunc("day", "l_shipdate")).alias("d1"),
        )
        .collect()
    )

    def bdays(d0: datetime.date, d1: datetime.date) -> int:
        return sum(
            1
            for k in range(1, max((d1 - d0).days, 0) + 1)
            if (d0 + datetime.timedelta(days=k)).weekday() < 5
        )

    expect = sum(bdays(s.d0, s.d1) for s in sample)
    got = next(r for r in rows if r.priority == probe)
    assert got.total_bdays == expect
