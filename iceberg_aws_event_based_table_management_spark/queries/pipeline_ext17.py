"""Tier D (part 18) — series memory and co-movement (SURVEY.md §2-E
E169-E170).

Seventeenth batch: lag-1/lag-7 autocorrelation of the daily event
series (does yesterday predict today; is there weekly seasonality —
the ACF numbers behind E112's day-of-week profile) and the pairwise
Pearson correlation matrix between event types' daily series (which
signals co-move — the cross-stream dependence every incident
post-mortem starts from).

Exactness: deviations are n-scaled (n·x_t − S, exact int64), and the
covariance/variance sufficient statistics accumulate those products
in decimal(38,0) (Spark) / HUGEINT (DuckDB) — still exact integers,
but with the headroom the squared/cross terms need at ~1e9 events/day
where int64 throws under ANSI (the E167 overflow class).  Pearson's
denominator uses sqrt, which IEEE-754 requires to be CORRECTLY
ROUNDED — the one transcendental both engines are guaranteed to agree
on bit-for-bit — followed by identically-parenthesized multiply/
divide/floor.

All built-in-function formulations; exact DuckDB oracles.  Imports
pipeline_ext8's daily CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from .pipeline_ext8 import _DAILY_CTE, _daily

def _no_silent_overflow(c, what: str):
    """Fail-stop guard for decimal(38,0) arithmetic whose inputs are
    provably non-NULL: under non-ANSI Spark a decimal overflow
    surfaces as NULL, while the DuckDB oracle's HUGEINT arithmetic
    THROWS — past the documented ~1e9 events/day exact-integer
    headroom the two engines would silently diverge.  Applied at TWO
    levels (round-7/round-8 ADVICE): (a) every PER-ROW product before
    it enters SUM — SUM skips NULL summands, so an unguarded
    overflowed product would be silently dropped and the sum would
    return a non-NULL wrong value that sails past any aggregate-level
    check, whereas the oracle's HUGEINT throws at that same per-term
    multiply; and (b) every post-aggregate combination, catching
    accumulator overflow.  At each call site the wrapped expression's
    inputs are non-NULL by construction (counts/sums over non-empty
    groups, or lag-NULL rows already routed to a 0 branch), so NULL
    here means overflow and raise_error fires exactly when the oracle
    would have thrown — divergence becomes a matching error, not a
    hash mismatch."""
    return F.when(
        c.isNull(),
        F.raise_error(
            F.lit(
                f"{what}: decimal(38,0) overflow in sufficient statistics "
                "(beyond the ~1e9 events/day exact-integer headroom; "
                "the DuckDB oracle's HUGEINT throws at the same point)"
            )
        ).cast("decimal(38,0)"),
    ).otherwise(c)


# ---------------------------------------------------------------------------
# E169: lag-k autocorrelation
# ---------------------------------------------------------------------------

_ACF_LAGS = (1, 7)


def _acf_lag_sql(k: int) -> str:
    # dev products run in HUGEINT (int128): each n-scaled deviation
    # fits int64 easily (n_days is calendar-bounded), but dev² is
    # quartic in daily volume and outgrows int64 near 1e9 events/day
    # — the E167 overflow class, pre-empted here
    return f"""
             CAST(FLOOR((CAST(SUM(CASE WHEN lag{k} IS NULL THEN 0
                                       ELSE CAST(n_days * n - s AS HUGEINT)
                                            * (n_days * lag{k} - s)
                                  END) AS DOUBLE)
                         / CAST(SUM(CAST(n_days * n - s AS HUGEINT)
                                    * (n_days * n - s))
                                AS DOUBLE)) * 1000000) AS BIGINT)"""


@register(
    "acf_daily_lags",
    tier="D",
    oracle="WITH "
    + _DAILY_CTE
    + f""",
    lagged AS (
      SELECT event_type, day, n,
             LAG(n, 1) OVER w AS lag1,
             LAG(n, 7) OVER w AS lag7,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_days,
             CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS s
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type,
           MIN(n_days) AS n_days,
           {_acf_lag_sql(1)} AS acf1_ppm,
           {_acf_lag_sql(7)} AS acf7_ppm
    FROM lagged GROUP BY event_type
    """,
)
def acf_daily_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E169: autocorrelation of the daily event series at lags 1 and
    7 — series memory (does yesterday predict today) and weekly
    seasonality (the ACF evidence behind E112's day-of-week
    profile).  ACF_k = Σ dev_t·dev_{t−k} / Σ dev_t² with the
    deviations n-scaled (n_days·x_t − S — exact int64, no float mean
    ever forms); the dev PRODUCTS accumulate in decimal(38,0)/HUGEINT
    (dev² is quartic in daily volume — int64 throws under ANSI near
    1e9 events/day); the ratio crosses IEEE once, floored to ppm (can
    be negative — floor toward −∞ in both engines).

    Scale shape: the series collapses to (type, day); one per-type
    window provides both lags and the scaling totals; one rollup."""
    pw = Window.partitionBy("event_type").orderBy("day")
    pall = Window.partitionBy("event_type")
    lagged = _daily(spark, sf_dir).select(
        "event_type",
        "n",
        F.lag("n", 1).over(pw).alias("lag1"),
        F.lag("n", 7).over(pw).alias("lag7"),
        F.count("*").over(pall).cast("long").alias("n_days"),
        F.sum("n").over(pall).cast("long").alias("s"),
    )
    # each n-scaled deviation fits int64 (n_days is calendar-bounded);
    # the PRODUCT of two is quartic in daily volume, so it runs in
    # decimal(38,0) — exact, deterministic, and ANSI-safe where int64
    # would throw near 1e9 events/day (the E167 overflow class)
    dev = (F.col("n_days") * F.col("n") - F.col("s")).cast("decimal(19,0)")

    def acf(lagcol: str):
        lag_dev = (F.col("n_days") * F.col(lagcol) - F.col("s")).cast("decimal(19,0)")
        # summand guards: inside .otherwise() both dev and lag_dev are
        # non-NULL, so a NULL product is a per-row overflow that SUM
        # would otherwise silently skip (DuckDB's HUGEINT throws here)
        num = _no_silent_overflow(
            F.sum(
                F.when(F.col(lagcol).isNull(), F.lit(0).cast("decimal(38,0)")).otherwise(
                    _no_silent_overflow(
                        (dev * lag_dev).cast("decimal(38,0)"),
                        f"E169 acf summand({lagcol})",
                    )
                )
            ),
            f"E169 acf num({lagcol})",
        )
        den = _no_silent_overflow(
            F.sum(
                _no_silent_overflow(
                    (dev * dev).cast("decimal(38,0)"), "E169 acf den summand"
                )
            ),
            f"E169 acf den({lagcol})",
        )
        return (
            F.floor((num.cast("double") / den.cast("double")) * 1000000)
            .cast("long")
        )

    return lagged.groupBy("event_type").agg(
        F.min("n_days").alias("n_days"),
        acf("lag1").alias("acf1_ppm"),
        acf("lag7").alias("acf7_ppm"),
    )


# ---------------------------------------------------------------------------
# E170: pairwise series correlation matrix
# ---------------------------------------------------------------------------


@register(
    "correlation_event_series",
    tier="D",
    oracle="WITH "
    + _DAILY_CTE
    + """,
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.n AS x, b.n AS y
      FROM daily a JOIN daily b
        ON a.day = b.day AND a.event_type < b.event_type
    ),
    stats AS (
      SELECT type_a, type_b,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(y AS HUGEINT) * y) AS syy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy
      FROM pairs GROUP BY 1, 2
    )
    SELECT type_a, type_b, CAST(n AS BIGINT) AS n,
           CAST(n * sxy - sx * sy AS BIGINT) AS cov_scaled,
           CAST(FLOOR((CAST(n * sxy - sx * sy AS DOUBLE)
                       / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                          * sqrt(CAST(n * syy - sy * sy AS DOUBLE))))
                      * 1000000) AS BIGINT) AS pearson_ppm
    FROM stats
    """,
)
def correlation_event_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E170: pairwise Pearson correlation between event types' daily
    series — the co-movement matrix (do errors spike with purchases;
    which signals are redundant) every monitoring stack and incident
    review reads first.  Sufficient statistics (n, Σx, Σy, Σx²,
    Σy², Σxy) are exact integers accumulated in decimal(38,0)/
    HUGEINT (Σx² is quadratic and n·Σxy cubic in daily volume —
    int64 throws under ANSI near 1e9 events/day, the E167 overflow
    class); r = (n·Σxy − ΣxΣy) / (√(n·Σxx−Σx²)·√(n·Σyy−Σy²))
    crosses IEEE through sqrt — which IEEE-754 mandates be correctly
    rounded, so both engines agree bit-for-bit — then one multiply,
    one divide, one floor, identically parenthesized.

    Scale shape: the series self-join is day-equi over (type, day)
    metadata (|types|²/2 pairs per day); sufficient stats are one
    partial-agg rollup — the mergeable streaming-regression state
    (E110's five sums, here six)."""
    daily = _daily(spark, sf_dir)
    a = daily.select(
        F.col("event_type").alias("type_a"), "day", F.col("n").alias("x")
    )
    b = daily.select(
        F.col("event_type").alias("type_b"), "day", F.col("n").alias("y")
    )
    pairs = a.join(b, "day").filter(F.col("type_a") < F.col("type_b"))
    # second-moment sums and their n-scaled combinations run in
    # decimal(38,0): Σx² is quadratic in daily volume and n·Σxy
    # cubic, so int64 throws under ANSI near 1e9 events/day (the
    # E167 overflow class); first moments stay int64-safe but ride
    # along in decimal so every combination below is one type
    xd, yd = F.col("x").cast("decimal(19,0)"), F.col("y").cast("decimal(19,0)")
    # summand guards: x/y are non-NULL counts, so a NULL second-moment
    # product is a per-row overflow that SUM would silently skip —
    # the oracle's HUGEINT throws at that same per-term multiply
    stats = pairs.groupBy("type_a", "type_b").agg(
        F.count("*").cast("decimal(19,0)").alias("n"),
        F.sum(xd).cast("decimal(38,0)").alias("sx"),
        F.sum(yd).cast("decimal(38,0)").alias("sy"),
        F.sum(
            _no_silent_overflow((xd * yd).cast("decimal(38,0)"), "E170 sxy summand")
        ).alias("sxy"),
        F.sum(
            _no_silent_overflow((xd * xd).cast("decimal(38,0)"), "E170 sxx summand")
        ).alias("sxx"),
        F.sum(
            _no_silent_overflow((yd * yd).cast("decimal(38,0)"), "E170 syy summand")
        ).alias("syy"),
    )
    # cov/vx/vy jointly touch all six sums, so a NULL from any
    # overflowed accumulator or combination is caught by the guards
    cov = _no_silent_overflow(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("decimal(38,0)"),
        "E170 cov",
    )
    vx = _no_silent_overflow(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("decimal(38,0)"),
        "E170 var_x",
    )
    vy = _no_silent_overflow(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("decimal(38,0)"),
        "E170 var_y",
    )
    return stats.select(
        "type_a",
        "type_b",
        F.col("n").cast("long").alias("n"),
        cov.cast("long").alias("cov_scaled"),
        F.floor(
            (cov.cast("double") / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))))
            * 1000000
        )
        .cast("long")
        .alias("pearson_ppm"),
    )
