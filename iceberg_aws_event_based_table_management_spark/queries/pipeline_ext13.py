"""Tier C/D (part 14) — multiset algebra, temporal absence patterns,
sweep-line concurrency, and robust spike detection (SURVEY.md §2-E
E157-E160).

Thirteenth batch: INTERSECT ALL / EXCEPT ALL bag semantics between
the two halves of the event log (the multiset surface C32/C33's
set-semantics operators leave uncovered — Spark's intersectAll/
exceptAll against DuckDB's INTERSECT ALL), a temporal NOT-EXISTS
("views never followed by a purchase within the hour" — the absence
pattern funnels can't see because funnels count presence), maximum
concurrent activity via the classic sweep-line (+1/−1 boundary
events, running sum, argmax — the capacity-planning statistic), and
trailing-14-day rolling-median spike flags (the ROBUST alternative to
E131's mean±2σ band: a single prior spike inflates σ and masks the
next one; the median shrugs).

Float discipline: none needed — every query here is pure integers
and booleans (the rolling median keeps ×2 scaling so the even-window
midpoint average stays integral).

All built-in-function formulations (no Python UDFs); every query
carries an exact DuckDB oracle.  Imports pipeline_ext8's shared daily
CTE, so registers after it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import io
from ..registry import register
from .pipeline_ext8 import _DAILY_CTE, _daily

# ---------------------------------------------------------------------------
# E157: INTERSECT ALL / EXCEPT ALL between event-log halves
# ---------------------------------------------------------------------------

_HALF_SPLIT = """
    ev AS (
      SELECT user_id, event_type, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
    lab AS (
      SELECT user_id, event_type,
             (2 * (day - s.d0) <= (s.d1 - s.d0)) AS is_base
      FROM ev CROSS JOIN span s
    )"""


@register(
    "setop_bag_halves",
    tier="C",
    oracle="WITH "
    + _HALF_SPLIT
    + """,
    a AS (SELECT user_id, event_type FROM lab WHERE is_base),
    b AS (SELECT user_id, event_type FROM lab WHERE NOT is_base),
    i AS (SELECT * FROM a INTERSECT ALL SELECT * FROM b),
    x AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
    SELECT et.event_type,
           CAST(COALESCE(i.n, 0) AS BIGINT) AS n_intersect_all,
           CAST(COALESCE(x.n, 0) AS BIGINT) AS n_except_all
    FROM (SELECT DISTINCT event_type FROM ev) et
    LEFT JOIN (SELECT event_type, COUNT(*) AS n FROM i GROUP BY 1) i
      USING (event_type)
    LEFT JOIN (SELECT event_type, COUNT(*) AS n FROM x GROUP BY 1) x
      USING (event_type)
    """,
)
def setop_bag_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E157: multiset (bag) set operations — INTERSECT ALL and EXCEPT
    ALL of the (user, event_type) multisets from the first vs second
    half of the log, summarized per type.  C32/C33 cover the DISTINCT
    set semantics; the ALL variants are the other half of the SQL
    surface (multiplicity min / truncated difference), exercised
    through Spark's native intersectAll/exceptAll operators.
    Per-type counts read as behavioral churn: intersect-all =
    repeated (user, type) activity present in both halves at matched
    multiplicity.

    Scale shape: both operators hash-partition on the full row (the
    same one-shuffle shape as distinct); the halves split map-side
    off a 1-row span broadcast."""
    ev = io.table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
    )
    span = ev.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    lab = ev.crossJoin(F.broadcast(span)).withColumn(
        "is_base", 2 * F.datediff("day", "d0") <= F.datediff("d1", "d0")
    )
    a = lab.filter(F.col("is_base")).select("user_id", "event_type")
    b = lab.filter(~F.col("is_base")).select("user_id", "event_type")
    i = a.intersectAll(b).groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_intersect_all")
    )
    x = a.exceptAll(b).groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_except_all")
    )
    types = ev.select("event_type").distinct()
    return (
        types.join(i, "event_type", "left")
        .join(x, "event_type", "left")
        .select(
            "event_type",
            F.coalesce("n_intersect_all", F.lit(0))
            .cast("long")
            .alias("n_intersect_all"),
            F.coalesce("n_except_all", F.lit(0))
            .cast("long")
            .alias("n_except_all"),
        )
    )


# ---------------------------------------------------------------------------
# E158: temporal absence pattern
# ---------------------------------------------------------------------------

_ABANDON_US = 3_600_000_000  # purchase must follow within 1 hour


@register(
    "absence_view_no_purchase",
    tier="D",
    oracle=f"""
    WITH v AS (
      SELECT user_id, epoch_us(ts) AS vt
      FROM events WHERE event_type = 'view'
    ),
    p AS (
      SELECT user_id, epoch_us(ts) AS pt
      FROM events WHERE event_type = 'purchase'
    ),
    flagged AS (
      SELECT v.user_id,
             NOT EXISTS (
               SELECT 1 FROM p
               WHERE p.user_id = v.user_id
                 AND p.pt > v.vt AND p.pt <= v.vt + {_ABANDON_US}
             ) AS abandoned
      FROM v
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_views,
           CAST(SUM(CASE WHEN abandoned THEN 1 ELSE 0 END) AS BIGINT)
             AS n_abandoned,
           CAST(FLOOR((CAST(SUM(CASE WHEN abandoned THEN 1 ELSE 0 END)
                            AS DOUBLE) / COUNT(*)) * 1000000) AS BIGINT)
             AS abandon_ppm
    FROM flagged GROUP BY user_id
    """,
)
def absence_view_no_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E158: temporal absence pattern — per user, views NEVER followed
    by a purchase within the hour: the abandonment query.  Funnels
    (E72) count PRESENCE of the next step; absence requires a
    temporal anti-join (NOT EXISTS with a time band), the pattern SQL
    generators get wrong most often.

    Scale shape: the anti-join is user-equi with the time band as a
    post-join predicate — per-user fan-out bounded (E120's shape);
    both sides bucket on user_id at scale; counts reduce per user.
    Pure int64 epoch-µs."""
    ev = io.table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", io.epoch_us(F.col("ts")).alias("vt")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), io.epoch_us(F.col("ts")).alias("pt")
    )
    followed = v.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("pt") > F.col("vt"))
        & (F.col("pt") <= F.col("vt") + _ABANDON_US),
        "left_anti",
    )
    per_user = v.groupBy("user_id").agg(F.count("*").cast("long").alias("n_views"))
    ab = followed.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_abandoned")
    )
    return (
        per_user.join(ab, "user_id", "left")
        .select(
            "user_id",
            "n_views",
            F.coalesce("n_abandoned", F.lit(0)).cast("long").alias("n_abandoned"),
        )
        .withColumn(
            "abandon_ppm",
            F.floor(
                (F.col("n_abandoned").cast("double") / F.col("n_views")) * 1000000
            ).cast("long"),
        )
    )


# ---------------------------------------------------------------------------
# E159: sweep-line maximum concurrency
# ---------------------------------------------------------------------------

_CONC_SPAN_US = 300_000_000  # each event holds a slot for 5 minutes


@register(
    "max_concurrent_activity",
    tier="D",
    oracle=f"""
    WITH pts AS (
      SELECT event_type, epoch_us(ts) AS t, 1 AS delta FROM events
      UNION ALL
      SELECT event_type, epoch_us(ts) + {_CONC_SPAN_US}, -1 FROM events
    ),
    run AS (
      SELECT event_type, t, delta,
             CAST(SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS live
      FROM pts
    ),
    best AS (
      SELECT event_type, t, live,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY live DESC, t) AS rk
      FROM run
    )
    SELECT event_type, live AS max_concurrent, CAST(t AS BIGINT) AS at_us
    FROM best WHERE rk = 1
    """,
)
def max_concurrent_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E159: maximum concurrency via sweep-line — each event holds a
    5-minute slot; per event type, the peak number of simultaneously
    live slots and the earliest instant it occurs: the capacity-
    planning statistic (peak sessions, peak connections, peak
    compaction jobs).  Boundary points (+1 at start, −1 at end,
    half-open [s, e) so ends sort before starts at the same instant)
    reduce the interval problem to one running sum — the classic
    sweep, fully declarative.

    Scale shape (r14 rewrite of the r13-verdict audit-class form):
    the event-type key has BOUNDED CARDINALITY (~5), so the old
    per-type running-sum + argmax windows capped parallelism at
    |types| with per-task state events/|types| (sf10 smoke: 32.3 s,
    exp 1.15).  The running sum now uses the per-key carry-in
    decomposition (the udtf_binpack device): range-partition on
    (event_type, t, delta) — each type occupies a contiguous pid run
    in sweep order — local running sum per (type, pid), plus the
    broadcast sum of the type's earlier partitions.  The argmax is a
    plain partial-combinable aggregation (max of a (live, -t) struct
    = peak live, earliest instant), not a window.  Per-task state is
    n/partitions; no stage keys on the 5-value type alone."""
    ev = io.table(spark, sf_dir, "events").select(
        "event_type", io.epoch_us(F.col("ts")).alias("s")
    )
    pts = ev.select(
        "event_type", F.col("s").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        ev.select(
            "event_type",
            (F.col("s") + _CONC_SPAN_US).alias("t"),
            F.lit(-1).alias("delta"),
        )
    )
    from ..operators.skew import _default_partitions

    parts = _default_partitions(pts)
    keyed = pts.repartitionByRange(parts, "event_type", "t", "delta").withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("event_type", "_pid")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = keyed.withColumn("_lcum", F.sum("delta").over(w_local))
    totals = keyed.groupBy("event_type", "_pid").agg(F.sum("delta").alias("_t"))
    w_off = (
        Window.partitionBy("event_type")
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = totals.select(
        "event_type",
        "_pid",
        F.coalesce(F.sum("_t").over(w_off), F.lit(0)).alias("_off"),
    )
    run = local.join(F.broadcast(offs), ["event_type", "_pid"]).withColumn(
        "live", (F.col("_lcum") + F.col("_off")).cast("long")
    )
    best = run.groupBy("event_type").agg(
        F.max(F.struct(F.col("live"), (-F.col("t")).alias("negt"))).alias("b")
    )
    return best.select(
        "event_type",
        F.col("b.live").alias("max_concurrent"),
        (-F.col("b.negt")).cast("long").alias("at_us"),
    )


# ---------------------------------------------------------------------------
# E160: rolling-median spike detection
# ---------------------------------------------------------------------------

_MED_W = 14


@register(
    "rolling_median_spikes",
    tier="D",
    oracle="WITH "
    + _DAILY_CTE
    + f""",
    wl AS (
      SELECT event_type, day, n,
             list(n) OVER (PARTITION BY event_type ORDER BY day
                           ROWS BETWEEN {_MED_W - 1} PRECEDING AND CURRENT ROW)
               AS lst
      FROM daily
    ),
    med AS (
      SELECT event_type, day, n,
             CAST(len(lst) AS BIGINT) AS wlen,
             CAST(list_sort(lst)[(len(lst) + 1) // 2]
                  + list_sort(lst)[len(lst) // 2 + 1] AS BIGINT) AS med_x2
      FROM wl
    )
    SELECT event_type, day, n, wlen, med_x2,
           (n > med_x2) AS is_spike
    FROM med
    """,
)
def rolling_median_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E160: rolling-median spike flags — a day spikes when its count
    exceeds 2× the trailing-14-day median.  The ROBUST complement of
    E131's mean ± 2σ band: one prior spike inflates the rolling σ and
    masks the next anomaly (masking), while the median is unmoved by
    up to half the window being garbage — the estimator monitoring
    systems actually want.

    Exactness: the median stays ×2-scaled so the even-window midpoint
    average is an integer (sorted[(L+1)/2] + sorted[L/2+1], 1-based)
    — "n > 2·median" becomes the pure integer predicate n > med_x2.
    The window list sorts ≤14 ints per row (the E133 device).

    Scale shape: one (type, day) rollup; bounded rolling state —
    streaming-ready like E131."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(_MED_W - 1), 0)
    )
    wl = _daily(spark, sf_dir).select(
        "event_type", "day", "n", F.collect_list("n").over(w).alias("lst")
    )
    srt = F.array_sort("lst")
    wlen = F.size("lst")
    med_x2 = (
        F.element_at(srt, ((wlen + 1) / 2).cast("int"))
        + F.element_at(srt, (wlen / 2).cast("int") + 1)
    ).cast("long")
    return wl.select(
        "event_type",
        "day",
        "n",
        wlen.cast("long").alias("wlen"),
        med_x2.alias("med_x2"),
        (F.col("n") > med_x2).alias("is_spike"),
    )
