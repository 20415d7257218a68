"""Tier D (part 20) — lead-lag, experiment adjustment, robust and
weighted location, power laws (SURVEY.md §2-E E179-E183).

Nineteenth batch, registered in round 8 and STAGED with E171-E178 for
the round-9 grading window: cross-correlation between event streams
(which stream LEADS), CUPED variance-reduced experiment readout (the
modern A/B estimator), per-group trimmed means, a Zipf power-law fit
over the corpus vocabulary, and weighted medians — filling the
lead-lag, covariate-adjustment, and weighted-location gaps in the
stats family (E135/E136/E167/E168/E176 test; E171/E97 robustify;
this batch adjusts and localizes).

Same exactness discipline as pipeline_ext18: integer sufficient
statistics, one identically-parenthesized IEEE crossing per output,
ppm floors, ordered array folds wherever a float sum's ORDER would
otherwise be engine luck (log-sum precedent: E86's entropy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import io
from ..registry import register
from .pipeline_ext8 import _DAILY_CTE, _daily

# ---------------------------------------------------------------------------
# E179: cross-correlation (lead-lag) between two event streams
# ---------------------------------------------------------------------------

_CCF_MAX_LAG = 7


@register(
    "ccf_event_lead_lag",
    tier="D",
    oracle="WITH "
    + _DAILY_CTE
    + f""",
    v AS (SELECT day, n AS x FROM daily WHERE event_type = 'view'),
    p AS (SELECT day, n AS y FROM daily WHERE event_type = 'purchase'),
    lags AS (SELECT unnest(generate_series(0, {_CCF_MAX_LAG})) AS k),
    m AS (
      SELECT k, CAST(v.x AS BIGINT) AS x, CAST(p.y AS BIGINT) AS y
      FROM lags JOIN v ON TRUE
      JOIN p ON p.day = v.day + CAST(k AS INTEGER)
    ),
    s AS (
      SELECT k,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(y AS HUGEINT) * y) AS syy
      FROM m GROUP BY k
    )
    SELECT CAST(k AS BIGINT) AS lag_days, n AS n_days,
           CAST(FLOOR((CAST(n * sxy - sx * sy AS DOUBLE)
                       / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                          * sqrt(CAST(n * syy - sy * sy AS DOUBLE))))
                      * 1000000) AS BIGINT) AS ccf_ppm
    FROM s
    """,
)
def ccf_event_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E179: cross-correlation function between the view and purchase
    daily series at lags 0..7 — does viewing LEAD purchasing, and by
    how many days?  The directed companion of E170's symmetric
    correlation matrix and E169's self-ACF: the lag that maximizes
    r(k) is the causal-delay estimate incident reviews and marketing
    attribution both want.

    Exactness: per-lag sufficient statistics are exact integers
    (quadratic terms in HUGEINT/decimal38 — the E170 headroom class);
    r(k) reuses E170's expression verbatim (sqrt correctly rounded,
    identical parenthesization), floored to ppm.

    Scale shape: both series collapse to (day, count) metadata first;
    the lag join is a calendar-bounded equi-join (≤ d rows per lag);
    one rollup per lag — 8 tiny groups."""
    daily = _daily(spark, sf_dir)
    v = daily.filter(F.col("event_type") == "view").select(
        "day", F.col("n").cast("long").alias("x")
    )
    p = daily.filter(F.col("event_type") == "purchase").select(
        F.col("day").alias("p_day"), F.col("n").cast("long").alias("y")
    )
    lags = spark.range(0, _CCF_MAX_LAG + 1).select(F.col("id").cast("int").alias("k"))
    m = (
        F.broadcast(lags)
        .crossJoin(v)
        .join(p, F.col("p_day") == F.expr("date_add(day, k)"))
        .select("k", "x", "y")
    )
    xd, yd = F.col("x").cast("decimal(19,0)"), F.col("y").cast("decimal(19,0)")
    s = m.groupBy("k").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum((xd * yd).cast("decimal(38,0)")).alias("sxy"),
        F.sum((xd * xd).cast("decimal(38,0)")).alias("sxx"),
        F.sum((yd * yd).cast("decimal(38,0)")).alias("syy"),
    )
    nn = F.col("n").cast("decimal(19,0)")
    num = (nn * F.col("sxy") - (F.col("sx").cast("decimal(19,0)") * F.col("sy"))).cast(
        "double"
    )
    vx = (nn * F.col("sxx") - (F.col("sx").cast("decimal(19,0)") * F.col("sx"))).cast(
        "double"
    )
    vy = (nn * F.col("syy") - (F.col("sy").cast("decimal(19,0)") * F.col("sy"))).cast(
        "double"
    )
    return s.select(
        F.col("k").cast("long").alias("lag_days"),
        F.col("n").alias("n_days"),
        F.floor((num / (F.sqrt(vx) * F.sqrt(vy))) * 1000000)
        .cast("long")
        .alias("ccf_ppm"),
    )


# ---------------------------------------------------------------------------
# E180: CUPED variance-reduced experiment readout
# ---------------------------------------------------------------------------

_CUPED_SPLIT = "2024-01-16"


@register(
    "cuped_adjusted_lift",
    tier="D",
    oracle=f"""
    WITH pre AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x
      FROM events WHERE ts < TIMESTAMP '{_CUPED_SPLIT}'
      GROUP BY user_id
    ),
    post AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS y
      FROM events
      WHERE ts >= TIMESTAMP '{_CUPED_SPLIT}' AND event_type = 'purchase'
      GROUP BY user_id
    ),
    u AS (
      SELECT p.user_id, p.user_id % 2 AS cohort,
             p.x, COALESCE(q.y, 0) AS y
      FROM pre p LEFT JOIN post q ON p.user_id = q.user_id
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx
      FROM u
    ),
    c AS (
      SELECT cohort,
             CAST(COUNT(*) AS BIGINT) AS n_c,
             CAST(SUM(x) AS BIGINT) AS sx_c, CAST(SUM(y) AS BIGINT) AS sy_c,
             SUM(CAST(y AS HUGEINT) * y) AS syy_c,
             SUM(CAST(x AS HUGEINT) * y) AS sxy_c,
             SUM(CAST(x AS HUGEINT) * x) AS sxx_c
      FROM u GROUP BY cohort
    )
    SELECT CAST(cohort AS BIGINT) AS cohort, n_c AS n_users,
           CAST(FLOOR((CAST(sy_c AS DOUBLE) / CAST(n_c AS DOUBLE)) * 1000000)
                AS BIGINT) AS mean_post_ppm,
           CAST(FLOOR(((CAST(sy_c AS DOUBLE) / CAST(n_c AS DOUBLE))
                       - (CAST(g.n * g.sxy - g.sx * g.sy AS DOUBLE)
                          / CAST(g.n * g.sxx - g.sx * g.sx AS DOUBLE))
                         * ((CAST(sx_c AS DOUBLE) / CAST(n_c AS DOUBLE))
                            - (CAST(g.sx AS DOUBLE) / CAST(g.n AS DOUBLE))))
                      * 1000000) AS BIGINT) AS adj_mean_ppm,
           CAST(FLOOR(((CAST(syy_c AS DOUBLE) / CAST(n_c AS DOUBLE)
                        - (CAST(sy_c AS DOUBLE) / CAST(n_c AS DOUBLE))
                          * (CAST(sy_c AS DOUBLE) / CAST(n_c AS DOUBLE)))
                       - (CAST(g.n * g.sxy - g.sx * g.sy AS DOUBLE)
                          / CAST(g.n * g.sxx - g.sx * g.sx AS DOUBLE))
                         * (CAST(g.n * g.sxy - g.sx * g.sy AS DOUBLE)
                            / CAST(g.n * g.sxx - g.sx * g.sx AS DOUBLE))
                         * (CAST(sxx_c AS DOUBLE) / CAST(n_c AS DOUBLE)
                            - (CAST(sx_c AS DOUBLE) / CAST(n_c AS DOUBLE))
                              * (CAST(sx_c AS DOUBLE) / CAST(n_c AS DOUBLE)))
                       + 2.0 * (CAST(g.n * g.sxy - g.sx * g.sy AS DOUBLE)
                                / CAST(g.n * g.sxx - g.sx * g.sx AS DOUBLE))
                             * ((CAST(g.n * g.sxy - g.sx * g.sy AS DOUBLE)
                                 / CAST(g.n * g.sxx - g.sx * g.sx AS DOUBLE))
                                * (CAST(sxx_c AS DOUBLE) / CAST(n_c AS DOUBLE)
                                   - (CAST(sx_c AS DOUBLE) / CAST(n_c AS DOUBLE))
                                     * (CAST(sx_c AS DOUBLE) / CAST(n_c AS DOUBLE)))
                                - (CAST(sxy_c AS DOUBLE) / CAST(n_c AS DOUBLE)
                                   - (CAST(sx_c AS DOUBLE) / CAST(n_c AS DOUBLE))
                                     * (CAST(sy_c AS DOUBLE) / CAST(n_c AS DOUBLE)))))
                      * 1000000) AS BIGINT) AS adj_var_ppm
    FROM c, g
    """,
)
def cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E180: CUPED (Controlled-experiment Using Pre-Experiment Data)
    readout — per cohort (user_id parity, the E176 split), the
    post-period purchase count adjusted by the pre-period activity
    covariate: ŷ = ȳ_c − θ(x̄_c − x̄), θ = cov(x,y)/var(x) pooled.
    CUPED is how large experiment platforms cut metric variance
    30-50% without touching the treatment; E176 tests a rate, this
    adjusts a mean with what users already did before the split.

    The adjusted VARIANCE var(y − θx) = var(y) + θ²var(x) − 2θcov(x,y)
    rides along per cohort, so the variance-reduction claim is
    inspectable in the output (adj_var ≤ raw var whenever the
    covariate correlates).

    Exactness: all sufficient statistics are exact integers (quadratic
    terms in decimal38/HUGEINT); θ and every adjusted moment cross
    IEEE through one identically-parenthesized expression per output
    column, floored to ppm.  θ is computed POOLED (standard CUPED —
    assignment-independent, so it cannot leak treatment).

    Scale shape: two per-user rollups + one 5-integer global row
    broadcast into a 2-row cohort frame — mergeable-statistics all the
    way down."""
    ev = io.table(spark, sf_dir, "events")
    split = F.lit(_CUPED_SPLIT).cast("timestamp_ntz")
    pre = ev.filter(F.col("ts") < split).groupBy("user_id").agg(
        F.count("*").cast("long").alias("x")
    )
    post = (
        ev.filter((F.col("ts") >= split) & (F.col("event_type") == "purchase"))
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("y"))
    )
    u = (
        pre.join(post, "user_id", "left")
        .select(
            (F.col("user_id") % 2).alias("cohort"),
            "x",
            F.coalesce("y", F.lit(0)).cast("long").alias("y"),
        )
    )
    xd, yd = F.col("x").cast("decimal(19,0)"), F.col("y").cast("decimal(19,0)")
    g = u.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum((xd * yd).cast("decimal(38,0)")).alias("sxy"),
        F.sum((xd * xd).cast("decimal(38,0)")).alias("sxx"),
    )
    c = u.groupBy("cohort").agg(
        F.count("*").cast("long").alias("n_c"),
        F.sum("x").cast("long").alias("sx_c"),
        F.sum("y").cast("long").alias("sy_c"),
        F.sum((yd * yd).cast("decimal(38,0)")).alias("syy_c"),
        F.sum((xd * yd).cast("decimal(38,0)")).alias("sxy_c"),
        F.sum((xd * xd).cast("decimal(38,0)")).alias("sxx_c"),
    )
    j = c.crossJoin(F.broadcast(g))
    nd = F.col("n").cast("decimal(19,0)")
    # try_divide mirrors DuckDB's x/0 -> NULL: zero pre-period variance
    # (single user, or every user tied) makes theta undefined and both
    # engines must agree on NULL (degenerate sweep, r8 verdict #8).
    theta = F.try_divide(
        (nd * F.col("sxy") - F.col("sx").cast("decimal(19,0)") * F.col("sy")).cast(
            "double"
        ),
        (nd * F.col("sxx") - F.col("sx").cast("decimal(19,0)") * F.col("sx")).cast(
            "double"
        ),
    )
    mean_y = F.col("sy_c").cast("double") / F.col("n_c").cast("double")
    mean_x = F.col("sx_c").cast("double") / F.col("n_c").cast("double")
    grand_x = F.col("sx").cast("double") / F.col("n").cast("double")
    var_y = F.col("syy_c").cast("double") / F.col("n_c").cast("double") - mean_y * mean_y
    var_x = F.col("sxx_c").cast("double") / F.col("n_c").cast("double") - mean_x * mean_x
    cov_xy = (
        F.col("sxy_c").cast("double") / F.col("n_c").cast("double") - mean_x * mean_y
    )
    adj_mean = mean_y - theta * (mean_x - grand_x)
    adj_var = var_y - theta * theta * var_x + 2.0 * theta * (theta * var_x - cov_xy)
    return j.select(
        F.col("cohort").cast("long").alias("cohort"),
        F.col("n_c").alias("n_users"),
        F.floor(mean_y * 1000000).cast("long").alias("mean_post_ppm"),
        F.floor(adj_mean * 1000000).cast("long").alias("adj_mean_ppm"),
        F.floor(adj_var * 1000000).cast("long").alias("adj_var_ppm"),
    )


# ---------------------------------------------------------------------------
# E181: trimmed mean per group
# ---------------------------------------------------------------------------

_TRIM_DENOM = 20  # 5% each side


@register(
    "trimmed_mean_lengths",
    tier="D",
    oracle=f"""
    WITH ranked AS (
      SELECT source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS r,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM documents
    )
    SELECT source,
           CAST(MIN(n) AS BIGINT) AS n_docs,
           CAST(MIN(n) // {_TRIM_DENOM} AS BIGINT) AS k_trim,
           CAST(FLOOR((CAST(SUM(CASE WHEN r > n // {_TRIM_DENOM}
                                      AND r <= n - n // {_TRIM_DENOM}
                                     THEN n_chars ELSE 0 END) AS DOUBLE)
                       / CAST(MIN(n) - 2 * (MIN(n) // {_TRIM_DENOM}) AS DOUBLE))
                      * 1000000) AS BIGINT) AS trimmed_mean_ppm,
           CAST(FLOOR((CAST(SUM(n_chars) AS DOUBLE) / CAST(MIN(n) AS DOUBLE))
                      * 1000000) AS BIGINT) AS raw_mean_ppm
    FROM ranked GROUP BY source
    """,
)
def trimmed_mean_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E181: 5%-trimmed mean document length per source — the location
    estimate between the mean (efficient, fragile) and the median
    (robust, wasteful): drop the k = ⌊n/20⌋ smallest and largest
    values, average the rest.  The robust-location family member
    E97 (MAD) and E160 (rolling median) were missing; raw mean rides
    along so the trim's effect is one subtraction away.

    Exactness: trim boundaries are integer ranks over a TOTAL order
    (n_chars, doc_id); the kept-sum is an exact integer; one IEEE
    division per output, floored to ppm.

    Scale shape: one per-source window rank + one rollup sharing the
    same partitioning — no second pass, no percentile sketch."""
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wn = Window.partitionBy("source")
    ranked = io.table(spark, sf_dir, "documents").select(
        "source",
        "n_chars",
        F.row_number().over(w).alias("r"),
        F.count("*").over(wn).alias("n"),
    )
    k = F.floor(F.col("n") / _TRIM_DENOM)
    kept = F.when(
        (F.col("r") > k) & (F.col("r") <= F.col("n") - k), F.col("n_chars")
    ).otherwise(0)
    g = ranked.groupBy("source").agg(
        F.min("n").cast("long").alias("n_docs"),
        F.min(k).cast("long").alias("k_trim"),
        F.sum(kept).cast("long").alias("kept_sum"),
        F.sum("n_chars").cast("long").alias("all_sum"),
    )
    return g.select(
        "source",
        "n_docs",
        "k_trim",
        F.floor(
            (
                F.col("kept_sum").cast("double")
                / (F.col("n_docs") - 2 * F.col("k_trim")).cast("double")
            )
            * 1000000
        )
        .cast("long")
        .alias("trimmed_mean_ppm"),
        F.floor(
            (F.col("all_sum").cast("double") / F.col("n_docs").cast("double")) * 1000000
        )
        .cast("long")
        .alias("raw_mean_ppm"),
    )


# ---------------------------------------------------------------------------
# E182: Zipf power-law fit over the corpus vocabulary
# ---------------------------------------------------------------------------

_ZIPF_TOP = 500


@register(
    "zipf_term_exponent",
    tier="D",
    oracle=f"""
    WITH terms AS (
      SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
      FROM documents
    ),
    tf AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS f
      FROM terms WHERE term <> '' GROUP BY term
    ),
    ranked AS (
      SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, term) AS r
      FROM tf
    ),
    top AS (SELECT r, f FROM ranked WHERE r <= {_ZIPF_TOP}),
    folded AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(ln(CAST(r AS DOUBLE)) ORDER BY r)), (a, b) -> a + b) AS slx,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(ln(CAST(f AS DOUBLE)) ORDER BY r)), (a, b) -> a + b) AS sly,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(ln(CAST(r AS DOUBLE)) * ln(CAST(f AS DOUBLE)) ORDER BY r)),
               (a, b) -> a + b) AS slxy,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE)) ORDER BY r)),
               (a, b) -> a + b) AS slxx
      FROM top
    )
    SELECT n AS n_terms,
           CAST(FLOOR(((CAST(n AS DOUBLE) * slxy - slx * sly)
                       / (CAST(n AS DOUBLE) * slxx - slx * slx)) * 1000000)
                AS BIGINT) AS zipf_slope_ppm
    FROM folded
    """,
)
def zipf_term_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E182: Zipf exponent of the corpus vocabulary — the OLS slope of
    ln(frequency) on ln(rank) over the top-{top} terms.  Natural
    corpora sit near −1; a corpus drifting toward 0 is template/
    boilerplate-heavy, steeper than −1 is vocabulary-starved — a
    single scalar QA signal on top of E20's raw top-k and E127's
    coverage curve.

    Exactness: ranks break frequency ties on the term string (total
    order); the four log-moment sums fold LEFT-TO-RIGHT over the
    rank-ordered top list in both engines (the E133/E86 device — a
    plain SUM's order is engine luck), seeded 0.0; ln matches
    bit-for-bit cross-engine on this libm (the E86 entropy precedent);
    the slope crosses IEEE once, floored to ppm.

    Scale shape: term counting is the E20 rollup; the fit touches only
    the top-{top} rows via one TakeOrdered; the fold runs on a single
    {top}-element array."""
    terms = (
        io.table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("term"))
        .filter(F.col("term") != "")
    )
    tf = terms.groupBy("term").agg(F.count("*").cast("long").alias("f"))
    ranked = tf.select(
        "f", F.row_number().over(Window.orderBy(F.desc("f"), "term")).alias("r")
    ).filter(F.col("r") <= _ZIPF_TOP)

    def fold(term_col):
        return F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("r"), F.col("f")))
                ),
                lambda s: term_col(
                    F.log(s["r"].cast("double")), F.log(s["f"].cast("double"))
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    folded = ranked.agg(
        F.count("*").cast("long").alias("n"),
        fold(lambda lr, lf: lr).alias("slx"),
        fold(lambda lr, lf: lf).alias("sly"),
        fold(lambda lr, lf: lr * lf).alias("slxy"),
        fold(lambda lr, lf: lr * lr).alias("slxx"),
    )
    nd = F.col("n").cast("double")
    # try_divide mirrors DuckDB's x/0 -> NULL: an empty corpus (or one
    # with a single distinct rank) has no defined slope.
    slope = F.try_divide(
        nd * F.col("slxy") - F.col("slx") * F.col("sly"),
        nd * F.col("slxx") - F.col("slx") * F.col("slx"),
    )
    return folded.select(
        F.col("n").alias("n_terms"),
        F.floor(slope * 1000000).cast("long").alias("zipf_slope_ppm"),
    )


# ---------------------------------------------------------------------------
# E183: weighted median
# ---------------------------------------------------------------------------


@register(
    "weighted_median_doclen",
    tier="D",
    oracle="""
    WITH wd AS (
      SELECT source, n_chars,
             CAST(len(regexp_split_to_array(lower(text), '\\s+')) AS BIGINT) AS wt,
             doc_id
      FROM documents
    ),
    cum AS (
      SELECT source, n_chars, wt,
             SUM(wt) OVER (PARTITION BY source
                           ORDER BY n_chars, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cw,
             SUM(wt) OVER (PARTITION BY source) AS tw
      FROM wd
    )
    SELECT source,
           CAST(MIN(tw) AS BIGINT) AS total_weight,
           CAST(MIN(CASE WHEN 2 * cw >= tw THEN n_chars END) AS BIGINT)
             AS wmedian_len
    FROM cum GROUP BY source
    """,
)
def weighted_median_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E183: token-weighted median document length per source — the
    length of the doc at the 50th percentile of TOKENS, not of docs.
    An unweighted median (E154's quartile family) says half the DOCS
    are shorter; this says half the CORPUS VOLUME lives in shorter
    docs — the statistic that actually predicts what a tokenizer/
    packer (E24/E52) will see, since training samples are drawn by
    token mass, not by document count.

    Definition: smallest value v with cumulative weight ≥ half the
    total (lower weighted median) — as a pure integer predicate
    2·cumweight ≥ totalweight, no float midpoint at all.

    Scale shape: one per-source cumulative window over (length,
    doc_id) total order + one rollup on the same partitioning; weights
    are word counts computed in the same scan."""
    wd = io.table(spark, sf_dir, "documents").select(
        "source",
        "n_chars",
        "doc_id",
        F.size(F.split(F.lower("text"), r"\s+")).cast("long").alias("wt"),
    )
    wc = (
        Window.partitionBy("source")
        .orderBy("n_chars", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("source")
    cum = wd.select(
        "source",
        "n_chars",
        F.sum("wt").over(wc).alias("cw"),
        F.sum("wt").over(wt).alias("tw"),
    )
    return cum.groupBy("source").agg(
        F.min("tw").cast("long").alias("total_weight"),
        F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("n_chars")))
        .cast("long")
        .alias("wmedian_len"),
    )
