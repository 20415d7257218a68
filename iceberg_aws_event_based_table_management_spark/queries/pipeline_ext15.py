"""Tier C/D (part 16) — streaming OHLC and business-calendar lags
(SURVEY.md §2-E E165-E166).

Fifteenth batch: the E141 OHLC candle as a REAL Structured Streaming
query (replayed micro-batches → event-time daily windows → min_by/
max_by order-statistic state in the streaming aggregation — a second
genuinely incremental operator family next to C44's trigger state,
with an exact batch oracle because order statistics are arrival-order
insensitive), and shipping lag measured in BUSINESS days via the
closed-form weekday formula (5 per full week + an unrolled partial-
week weekday count — the calendar arithmetic every SLA report needs
and naive datediff gets wrong).

All integer/order-statistic math; exact DuckDB oracles.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import io
from ..registry import register
from ..streaming import replay
from .aggregates import dec_sum, _dec_sum_sql

# ---------------------------------------------------------------------------
# E165: streaming daily OHLC
# ---------------------------------------------------------------------------


@register(
    "stream_ohlc_daily",
    tier="C",
    oracle=f"""
    WITH base AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             ts, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                ORDER BY ts, event_id) AS rn,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                ORDER BY ts DESC, event_id DESC) AS rnd
      FROM events
    )
    SELECT event_type, day,
           MAX(CASE WHEN rn = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rnd = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n,
           {_dec_sum_sql("value")} AS volume
    FROM base GROUP BY event_type, day
    """,
)
def stream_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E165: daily OHLC candles computed by a REAL Structured
    Streaming query — the event log replays as time-ordered
    micro-batches; a streaming groupBy((type, 1-day window))
    maintains open/close via min_by/max_by over (ts, event_id) plus
    high/low/count/cents-volume in the state store.  Order statistics
    are ARRIVAL-ORDER INSENSITIVE (min_by over a set doesn't care
    which micro-batch delivered the row), so the final state equals
    the batch E141 result exactly and the E141 SQL is a full oracle —
    the C44 property, here for a numeric-state aggregation.

    Scale shape: state is one (type, day) row of 6 scalars per open
    window; with a watermark, closed windows evict — the production
    telemetry-rollup shape (this bounded replay runs complete mode
    for the memory-sink harness)."""
    with tempfile.TemporaryDirectory() as tmp:
        path = replay.replay_dir(spark, sf_dir, tmp)
        ev = replay.read_stream(spark, path, 2).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        agg = (
            ev.groupBy("event_type", F.window("ts", "1 day").alias("w"))
            .agg(
                F.min_by("value", F.struct("ts", "event_id")).alias("open"),
                F.max("value").alias("high"),
                F.min("value").alias("low"),
                F.max_by("value", F.struct("ts", "event_id")).alias("close"),
                F.count("*").cast("long").alias("n"),
                dec_sum("value").alias("volume"),
            )
            .select(
                "event_type",
                F.to_date(F.col("w.start").cast("timestamp_ntz")).alias("day"),
                "open",
                "high",
                "low",
                "close",
                "n",
                "volume",
            )
        )
        sink = replay.run_to_memory(
            agg, f"ohlc_{uuid.uuid4().hex[:8]}", output_mode="complete"
        )
        rows = sink.collect()
        return spark.createDataFrame(rows, sink.schema)


# ---------------------------------------------------------------------------
# E166: business-day shipping lag
# ---------------------------------------------------------------------------


@register(
    "business_days_lag",
    tier="D",
    oracle="""
    WITH lag AS (
      SELECT o.o_orderpriority AS priority,
             CAST(date_trunc('day', o.o_orderdate) AS DATE) AS d0,
             GREATEST(CAST(date_trunc('day', l.l_shipdate) AS DATE)
                      - CAST(date_trunc('day', o.o_orderdate) AS DATE), 0) AS n
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    bd AS (
      SELECT priority,
             (n // 7) * 5
             + len(list_filter(generate_series(1, n % 7),
                               i -> ((dayofweek(d0) + 6 + i) % 7) < 5))
               AS bdays
      FROM lag
    )
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(bdays) AS BIGINT) AS total_bdays,
           CAST(FLOOR((CAST(SUM(bdays) AS DOUBLE) / COUNT(*)) * 1000000)
                AS BIGINT) AS avg_bdays_ppm,
           CAST(MAX(bdays) AS BIGINT) AS max_bdays
    FROM bd GROUP BY priority
    """,
)
def business_days_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E166: shipping lag in BUSINESS days per order priority — the
    closed-form weekday count (5 per full week + the partial week's
    weekdays, unrolled over ≤6 offsets from the order date's
    weekday): the calendar arithmetic every SLA/logistics report
    needs, where plain datediff (E154) overstates lag by weekends.
    Both engines normalize to Monday=0 from their different
    dayofweek conventions (Spark Sun=1, DuckDB Sun=0) — locked by
    the oracle equality.  Negative fixture lags (synthetic early
    ships) clamp to 0 — "business days elapsed", never a credit.

    Scale shape: identical to E154 — one bucketable fact-fact join,
    map-side integer calendar math (the ≤6-element filter is the
    E133 in-row device), one per-priority rollup."""
    o = io.table(spark, sf_dir, "orders")
    li = io.table(spark, sf_dir, "lineitem")
    lag = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.to_date(F.date_trunc("day", "o_orderdate")).alias("d0"),
        F.greatest(
            F.datediff(
                F.to_date(F.date_trunc("day", "l_shipdate")),
                F.to_date(F.date_trunc("day", "o_orderdate")),
            ),
            F.lit(0),
        ).alias("n"),
    )
    mon0 = (F.dayofweek("d0") + 5) % 7
    rem = F.col("n") % 7
    partial = F.when(
        rem > 0,
        F.size(
            F.filter(
                F.sequence(F.lit(1), rem),
                lambda i: ((mon0 + i) % 7) < 5,
            )
        ),
    ).otherwise(0)
    bd = lag.select(
        "priority",
        ((F.col("n") / 7).cast("long") * 5 + partial).alias("bdays"),
    )
    return bd.groupBy("priority").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("bdays").cast("long").alias("total_bdays"),
        F.floor((F.sum("bdays").cast("double") / F.count("*")) * 1000000)
        .cast("long")
        .alias("avg_bdays_ppm"),
        F.max("bdays").cast("long").alias("max_bdays"),
    )
