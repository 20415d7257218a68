"""Tier D (part 21) — composite joins, sequence models, funnel
latency (SURVEY.md §2-E E184-E187).

Twentieth batch, registered in round 8 and STAGED with E171-E183 for
the round-9 grading window: a TPC-H Q10-shape returned-item revenue
composite (the 4-way join headline the composite family lacked), a
Markov next-event backtest (train a transition model on the
pre-split stream, measure hit-rate after it — in-engine model eval,
the E147/E150 family applied to E71's transition matrix), funnel
time-to-convert percentiles (E67/E176 tell you IF views convert; this
says HOW FAST), and session trigram mining (E71's bigrams one order
deeper, with the consecutive-window device instead of a basket join).

Same exactness discipline: integer sufficient statistics, nearest-rank
integer percentiles, dec_sum for money, one IEEE crossing per output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import io
from ..registry import register
from .aggregates import _dec_sum_sql, dec_sum

# ---------------------------------------------------------------------------
# E184: TPC-H Q10 shape — returned-item revenue per customer
# ---------------------------------------------------------------------------

_Q10_REV = "ROUND(l_extendedprice * (1 - l_discount), 4)"


@register(
    "composite_returned_item_revenue",
    tier="C",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {_dec_sum_sql(_Q10_REV, 4)} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def composite_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: which customers returned the most revenue in a
    year — the lost-revenue triage list.  4-way join (lineitem ⋈
    orders ⋈ customer ⋈ nation) with fact-side (returnflag) and
    time-range predicates, aggregated cent-exact revenue, top-20.
    Completes the composite family (Q3/Q5/Q15/Q18 shapes already
    registered) with the canonical customer-attribution join.

    Scale shape: both filters push to the scans (returnflag + the
    orderdate range prune partitions on a date-partitioned layout);
    nation broadcasts; the customer join runs on the post-aggregation
    side at warehouse scale; final top-20 is TakeOrderedAndProject,
    never a global sort."""
    li = io.table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = io.table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = io.table(spark, sf_dir, "customer")
    nation = io.table(spark, sf_dir, "nation")
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dec_sum(rev, 4).alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# E185: Markov next-event backtest
# ---------------------------------------------------------------------------

_MARKOV_SPLIT = "2024-01-16"


@register(
    "markov_next_event_accuracy",
    tier="D",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type,
             LEAD(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS next_ts
      FROM events
    ),
    train AS (
      SELECT event_type AS cur, next_type,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM seq
      WHERE next_type IS NOT NULL AND next_ts < TIMESTAMP '{_MARKOV_SPLIT}'
      GROUP BY 1, 2
    ),
    model AS (
      SELECT cur, next_type AS predicted,
             ROW_NUMBER() OVER (PARTITION BY cur
                                ORDER BY c DESC, next_type) AS rk
      FROM train
    ),
    test AS (
      SELECT event_type AS cur, next_type
      FROM seq
      WHERE next_type IS NOT NULL AND ts >= TIMESTAMP '{_MARKOV_SPLIT}'
    )
    SELECT t.cur, m.predicted,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN t.next_type = m.predicted THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hits,
           CAST(FLOOR((CAST(SUM(CASE WHEN t.next_type = m.predicted
                                     THEN 1 ELSE 0 END) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE)) * 1000000) AS BIGINT)
             AS acc_ppm
    FROM test t JOIN model m ON t.cur = m.cur AND m.rk = 1
    GROUP BY t.cur, m.predicted
    """,
)
def markov_next_event_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E185: Markov next-event backtest — train a first-order
    transition model (predict the most frequent successor of each
    event type) on transitions COMPLETED before the split date, then
    measure its hit-rate on transitions STARTING after it.  E71
    builds the transition matrix; this closes the loop by evaluating
    it out-of-sample in-engine — the E147 (AUC) / E150 (calibration)
    discipline applied to sequence models, and the baseline any
    fancier next-action model must beat.

    Temporal hygiene: a transition trains only if its SUCCESSOR
    precedes the split (no leakage of post-split outcomes) and tests
    only if its predecessor follows it — straddling transitions are in
    neither set.  Prediction ties break on event_type ascending (total
    order, both engines).

    Exactness: pure integer counting; accuracy crosses IEEE once.

    Scale shape: one per-user lead window (the E71 exchange), a
    5×5-bounded model broadcast into the test stream, one rollup."""
    seq = io.table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("next_type"),
        F.lead("ts")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("next_ts"),
    )
    split = F.lit(_MARKOV_SPLIT).cast("timestamp_ntz")
    train = (
        seq.filter(F.col("next_type").isNotNull() & (F.col("next_ts") < split))
        .groupBy(F.col("event_type").alias("cur"), "next_type")
        .agg(F.count("*").alias("c"))
    )
    model = (
        train.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("cur").orderBy(F.desc("c"), "next_type")
            ),
        )
        .filter(F.col("rk") == 1)
        .select("cur", F.col("next_type").alias("predicted"))
    )
    test = seq.filter(F.col("next_type").isNotNull() & (F.col("ts") >= split)).select(
        F.col("event_type").alias("cur"), "next_type"
    )
    hits = F.sum(F.when(F.col("next_type") == F.col("predicted"), 1).otherwise(0)).cast(
        "long"
    )
    return (
        test.join(F.broadcast(model), "cur")
        .groupBy("cur", "predicted")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            hits.alias("n_hits"),
        )
        .select(
            "cur",
            "predicted",
            "n_test",
            "n_hits",
            F.floor(
                (F.col("n_hits").cast("double") / F.col("n_test").cast("double"))
                * 1000000
            )
            .cast("long")
            .alias("acc_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# E186: funnel time-to-convert percentiles
# ---------------------------------------------------------------------------

_TTC_WINDOW_H = 24


@register(
    "funnel_time_to_convert",
    tier="D",
    oracle=f"""
    WITH v AS (
      SELECT event_id, user_id, ts, user_id % 2 AS cohort
      FROM events WHERE event_type = 'view'
    ),
    d AS (
      SELECT v.cohort,
             CAST(MIN(epoch_us(p.ts) - epoch_us(v.ts)) // 1000000 AS BIGINT)
               AS delay_s
      FROM v JOIN events p
        ON p.event_type = 'purchase' AND p.user_id = v.user_id
       AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL {_TTC_WINDOW_H} HOUR
      GROUP BY v.cohort, v.event_id
    ),
    srt AS (
      SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_converted,
             list_sort(list(delay_s)) AS s
      FROM d GROUP BY cohort
    )
    SELECT CAST(cohort AS BIGINT) AS cohort, n_converted,
           CAST(s[CAST(ceil(0.25 * len(s)) AS INTEGER)] AS BIGINT) AS p25_s,
           CAST(s[CAST(ceil(0.50 * len(s)) AS INTEGER)] AS BIGINT) AS p50_s,
           CAST(s[CAST(ceil(0.75 * len(s)) AS INTEGER)] AS BIGINT) AS p75_s,
           CAST(s[CAST(ceil(0.90 * len(s)) AS INTEGER)] AS BIGINT) AS p90_s
    FROM srt
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E186: funnel latency — for every view that converts (first
    purchase by the same user within 24 h), the delay to conversion;
    nearest-rank p25/p50/p75/p90 per cohort.  E67 emits the matches,
    E176 tests the RATE; this measures the SPEED, the other half of
    every funnel review (a treatment that converts equally often but
    2× slower is not a wash).

    Exactness: delays are exact integer seconds (epoch-microsecond
    subtraction, floor division by 10⁶ exact for the sub-day window);
    MIN per view picks the FIRST conversion; percentiles are
    nearest-rank picks (ceil(q·n), 1-based) from the sorted integer
    list — no interpolation, no IEEE anywhere.

    Scale shape: the conversion join is the E67 bounded-interval
    shape; per-cohort delay lists sort once (conversion-count-sized;
    at extreme scale swap the sorted-pick for the E62 histogram sketch
    — stated trigger: list no longer driver-metadata-bounded per
    group, same output contract modulo sketch error)."""
    ev = io.table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", (F.col("user_id") % 2).alias("cohort")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    d = (
        v.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") > F.col("ts"))
            & (F.col("p_ts") <= F.col("ts") + F.expr(f"INTERVAL {_TTC_WINDOW_H} HOURS")),
        )
        .groupBy("cohort", "event_id")
        .agg(
            F.floor(
                F.min(io.epoch_us(F.col("p_ts")) - io.epoch_us(F.col("ts")))
                / F.lit(1_000_000)
            )
            .cast("long")
            .alias("delay_s")
        )
    )
    srt = d.groupBy("cohort").agg(
        F.count("*").cast("long").alias("n_converted"),
        F.array_sort(F.collect_list("delay_s")).alias("s"),
    )
    n = F.size("s")

    def pick(q: float):
        return F.element_at("s", F.ceil(F.lit(q) * n).cast("int")).cast("long")

    return srt.select(
        F.col("cohort").cast("long").alias("cohort"),
        "n_converted",
        pick(0.25).alias("p25_s"),
        pick(0.50).alias("p50_s"),
        pick(0.75).alias("p75_s"),
        pick(0.90).alias("p90_s"),
    )


# ---------------------------------------------------------------------------
# E187: session trigram mining
# ---------------------------------------------------------------------------

_TRIGRAM_TOP = 20
_TRIGRAM_GAP_MIN = 30


@register(
    "event_trigram_topk",
    tier="D",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type, 1) OVER w AS prev1,
             LAG(event_type, 2) OVER w AS prev2,
             LAG(ts, 1) OVER w AS ts1,
             LAG(ts, 2) OVER w AS ts2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tri AS (
      SELECT prev2 AS e1, prev1 AS e2, event_type AS e3
      FROM seq
      WHERE prev2 IS NOT NULL
        AND ts - ts2 <= INTERVAL {_TRIGRAM_GAP_MIN * 2} MINUTE
        AND ts - ts1 <= INTERVAL {_TRIGRAM_GAP_MIN} MINUTE
        AND ts1 - ts2 <= INTERVAL {_TRIGRAM_GAP_MIN} MINUTE
    )
    SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n
    FROM tri GROUP BY e1, e2, e3
    ORDER BY n DESC, e1, e2, e3
    LIMIT {_TRIGRAM_TOP}
    """,
)
def event_trigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E187: top-{top} consecutive event TRIGRAMS within sessions —
    E71's transition bigrams one order deeper: the three-step journeys
    (view→view→purchase vs view→error→view) that a first-order model
    provably cannot see.  Consecutiveness is enforced with per-step
    session gaps (≤30 min between adjacent events), so trigrams never
    straddle sessions.

    Unlike E174's basket triples (set-co-occurrence via joins), these
    are ORDERED and CONSECUTIVE — one double-lag window per user, no
    join at all: the sequence-mining counterpart built entirely from
    the window the sessionization queries already pay for.

    Exactness: pure integer counting; top-k breaks count ties on the
    trigram itself (total order).

    Scale shape: one per-user window (two lags share one frame), one
    rollup over a ≤|types|³-bounded key space, TakeOrdered top-k."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = io.table(spark, sf_dir, "events").select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("prev1"),
        F.lag("event_type", 2).over(w).alias("prev2"),
        F.col("ts"),
        F.lag("ts", 1).over(w).alias("ts1"),
        F.lag("ts", 2).over(w).alias("ts2"),
    )
    gap = F.expr(f"INTERVAL {_TRIGRAM_GAP_MIN} MINUTES")
    tri = seq.filter(
        F.col("prev2").isNotNull()
        & (F.col("ts") - F.col("ts1") <= gap)
        & (F.col("ts1") - F.col("ts2") <= gap)
    ).select(
        F.col("prev2").alias("e1"), F.col("prev1").alias("e2"), F.col("event_type").alias("e3")
    )
    return (
        tri.groupBy("e1", "e2", "e3")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), "e1", "e2", "e3")
        .limit(_TRIGRAM_TOP)
    )
