"""Tier D (part 13) — lexical diversity, audience accounting, rolling
distincts, logistics percentiles, fair-share scheduling, and rank
movers (SURVEY.md §2-E E151-E156).

Twelfth batch: per-document lexical diversity (type-token ratio +
hapax share — the vocabulary-richness corpus-quality feature), a
cumulative-unique-users curve (first-appearance flags + one cumsum —
the audience-growth accounting that COUNT(DISTINCT) over a growing
prefix cannot do in one pass), 7-day rolling distinct actives (the
windowed distinct that plain window functions cannot express —
spine-joined exactly here, HLL-merged at scale), shipping-lag
quartiles per order priority (exact interpolated percentiles on
integer day lags — the logistics SLA distribution), max-min fair-
share (water-filling) allocation of a compaction byte budget across
tables (the scheduler decision behind B3's partial progress when
demand exceeds capacity), and period-over-period nation rank movers
(dense ranks per half, integer deltas — the "movers and shakers"
BI report).

Float discipline: as earlier batches — ratios floored to ppm from
exact int64; money/bytes in integer units; the only interpolation
(quartiles) uses dyadic fractions over integer day values, exact in
binary floating point (the E8 precedent).

All built-in-function formulations (no Python UDFs); every query
carries an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import io
from ..registry import register

# ---------------------------------------------------------------------------
# E151: lexical diversity
# ---------------------------------------------------------------------------


@register(
    "text_lexical_diversity",
    tier="D",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         w -> w <> '') AS ws
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(ws)) AS BIGINT) AS n_types,
             CAST(len(list_filter(list_distinct(ws),
                    w -> len(list_filter(ws, x -> x = w)) = 1)) AS BIGINT)
               AS n_hapax
      FROM toks
    )
    SELECT doc_id, n_tokens, n_types, n_hapax,
           CAST(FLOOR((CAST(n_types AS DOUBLE) / n_tokens) * 1000000)
                AS BIGINT) AS ttr_ppm,
           CAST(FLOOR((CAST(n_hapax AS DOUBLE) / n_types) * 1000000)
                AS BIGINT) AS hapax_ppm
    FROM m
    """,
)
def text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E151: lexical diversity — per document: type-token ratio and
    hapax-legomenon share (words used exactly once), the vocabulary-
    richness features corpus-quality models feed on (low TTR flags
    template/spam text; D5's quality score measures lengths, this
    measures REPETITION of types).  The per-word frequency check runs
    entirely inside array expressions (distinct × filter — O(types·
    tokens) per row, vocabulary-bounded).

    Scale shape: ZERO shuffle — one map-side pass, the E69/D5
    pattern; ratios are ppm floors over exact counts."""
    docs = io.table(spark, sf_dir, "documents").select("doc_id", "text")
    ws = F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
    types = F.array_distinct(ws)
    hapax = F.filter(
        types,
        lambda w: F.size(F.filter(ws, lambda x: x == w)) == 1,
    )
    m = docs.select(
        "doc_id",
        F.size(ws).cast("long").alias("n_tokens"),
        F.size(types).cast("long").alias("n_types"),
        F.size(hapax).cast("long").alias("n_hapax"),
    )
    return m.select(
        "doc_id",
        "n_tokens",
        "n_types",
        "n_hapax",
        F.floor((F.col("n_types").cast("double") / F.col("n_tokens")) * 1000000)
        .cast("long")
        .alias("ttr_ppm"),
        F.floor((F.col("n_hapax").cast("double") / F.col("n_types")) * 1000000)
        .cast("long")
        .alias("hapax_ppm"),
    )


# ---------------------------------------------------------------------------
# E152: cumulative unique users
# ---------------------------------------------------------------------------


@register(
    "cumulative_unique_users",
    tier="D",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    firsts AS (SELECT user_id, MIN(day) AS d0 FROM ud GROUP BY user_id),
    news AS (
      SELECT d0 AS day, CAST(COUNT(*) AS BIGINT) AS n_new
      FROM firsts GROUP BY d0
    ),
    spine AS (SELECT DISTINCT day FROM ud)
    SELECT s.day,
           CAST(COALESCE(n.n_new, 0) AS BIGINT) AS n_new_users,
           CAST(SUM(COALESCE(n.n_new, 0)) OVER (ORDER BY s.day) AS BIGINT)
             AS cum_unique_users
    FROM spine s LEFT JOIN news n USING (day)
    """,
)
def cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E152: cumulative audience — per active day, how many users
    appeared for the FIRST time and the running distinct-user total.
    The growth curve COUNT(DISTINCT) over an expanding prefix cannot
    produce in one pass; first-appearance flags turn it into a plain
    cumsum (the classic trick — distinct-to-date ≡ Σ new-per-day).

    Scale shape: one (user) min-agg for first days, one (day) count,
    one cumulative window over the DAY SPINE (retention-bounded
    metadata).  The corpus shuffles once on user_id."""
    ud = (
        io.table(spark, sf_dir, "events")
        .select(
            "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
        )
        .distinct()
    )
    news = (
        ud.groupBy("user_id")
        .agg(F.min("day").alias("day"))
        .groupBy("day")
        .agg(F.count("*").cast("long").alias("n_new"))
    )
    spine = ud.select("day").distinct()
    wday = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(news, "day", "left")
        .select("day", F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new_users"))
        .withColumn(
            "cum_unique_users",
            F.sum("n_new_users").over(wday).cast("long"),
        )
    )


# ---------------------------------------------------------------------------
# E153: 7-day rolling distinct actives
# ---------------------------------------------------------------------------

_ROLL_DAYS = 7


@register(
    "rolling_distinct_users_7d",
    tier="D",
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    spine AS (SELECT DISTINCT day FROM ud)
    SELECT s.day,
           CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS n_active_7d,
           CAST((SELECT COUNT(DISTINCT u2.user_id) FROM ud u2
                 WHERE u2.day = s.day) AS BIGINT) AS n_active_1d
    FROM spine s
    JOIN ud u ON u.day BETWEEN s.day - {_ROLL_DAYS - 1} AND s.day
    GROUP BY s.day
    """,
)
def rolling_distinct_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E153: 7-day rolling distinct active users — per day, the
    distinct users active in the trailing week (plus same-day
    actives).  Rolling DISTINCT is the one rolling aggregate window
    frames cannot express (distinct doesn't decompose over frames);
    the exact form joins user-days to the day spine within the
    horizon — work = user-days × 7, never users × days.

    Scale shape: the corpus collapses to DISTINCT (user, day) once;
    the spine is retention-bounded metadata broadcast into a range
    join; the distinct-count groupBy shuffles (day, user) pairs.  At
    open-web scale this swaps for per-day HLL sketches merged over
    the window (E106's mergeable-register form) — the documented
    approximate path with the same spine."""
    ud = (
        io.table(spark, sf_dir, "events")
        .select("user_id", F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .distinct()
    )
    spine = ud.select(F.col("day").alias("sday")).distinct()
    week = ud.join(
        F.broadcast(spine),
        (F.col("day") <= F.col("sday"))
        & (F.col("day") >= F.date_sub(F.col("sday"), _ROLL_DAYS - 1)),
    )
    roll = week.groupBy("sday").agg(
        F.countDistinct("user_id").cast("long").alias("n_active_7d")
    )
    today = ud.groupBy(F.col("day").alias("sday")).agg(
        F.countDistinct("user_id").cast("long").alias("n_active_1d")
    )
    return roll.join(today, "sday").select(
        F.col("sday").alias("day"), "n_active_7d", "n_active_1d"
    )


# ---------------------------------------------------------------------------
# E154: shipping-lag quartiles per priority
# ---------------------------------------------------------------------------


@register(
    "shipping_lag_percentiles",
    tier="D",
    oracle="""
    WITH lag AS (
      SELECT o.o_orderpriority AS priority,
             (CAST(date_trunc('day', l.l_shipdate) AS DATE)
              - CAST(date_trunc('day', o.o_orderdate) AS DATE)) AS lag_days
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    )
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n,
           quantile_cont(lag_days, 0.25) AS q25,
           quantile_cont(lag_days, 0.50) AS q50,
           quantile_cont(lag_days, 0.75) AS q75,
           CAST(MAX(lag_days) AS BIGINT) AS max_lag
    FROM lag GROUP BY priority
    """,
)
def shipping_lag_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E154: order-to-ship lag distribution per order priority —
    quartiles and max of (ship date − order date) in days: the
    logistics SLA report (does 1-URGENT actually ship faster?).
    Quartile interpolation over integer day lags uses dyadic
    fractions — exact in binary floating point, the E8 precedent —
    and both engines share the (n−1)·q rank definition.

    Scale shape: one fact-fact equi-join on the order key (both
    sides bucketable), integer datediff map-side, and a per-priority
    sort-based percentile agg; at scale the exact percentile swaps
    for approx_percentile with the identical plan (E8's note)."""
    o = io.table(spark, sf_dir, "orders")
    li = io.table(spark, sf_dir, "lineitem")
    lag = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(
            F.to_date(F.date_trunc("day", "l_shipdate")),
            F.to_date(F.date_trunc("day", "o_orderdate")),
        ).alias("lag_days"),
    )
    return lag.groupBy("priority").agg(
        F.count("*").cast("long").alias("n"),
        F.percentile("lag_days", F.lit(0.25)).alias("q25"),
        F.percentile("lag_days", F.lit(0.50)).alias("q50"),
        F.percentile("lag_days", F.lit(0.75)).alias("q75"),
        F.max("lag_days").cast("long").alias("max_lag"),
    )


# ---------------------------------------------------------------------------
# E155: max-min fair-share (water-filling) allocation
# ---------------------------------------------------------------------------

# Capacity = 40% of total demand — forces the water level below the
# largest demands so the max-min structure is exercised.
_FAIR_CAP_NUM, _FAIR_CAP_DEN = 2, 5


@register(
    "fair_share_allocation",
    tier="B",
    oracle=f"""
    WITH demand AS (
      SELECT table_name, CAST(SUM(file_size_bytes) AS BIGINT) AS demand
      FROM ({io.FILES_CTE}) GROUP BY table_name
    ),
    tot AS (
      SELECT CAST(SUM(demand) AS BIGINT) AS total,
             CAST(SUM(demand) * {_FAIR_CAP_NUM} // {_FAIR_CAP_DEN} AS BIGINT)
               AS cap,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM demand
    ),
    ranked AS (
      SELECT d.table_name, d.demand, t.cap, t.n,
             ROW_NUMBER() OVER (ORDER BY d.demand, d.table_name) AS j,
             COALESCE(SUM(d.demand) OVER (ORDER BY d.demand, d.table_name
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS prefix
      FROM demand d CROSS JOIN tot t
    ),
    marked AS (
      SELECT *,
             (demand * (n - j + 1) <= cap - prefix) AS served
      FROM ranked
    ),
    lvl AS (
      SELECT CAST(cap - COALESCE(SUM(CASE WHEN served THEN demand END), 0)
                  AS BIGINT) AS rem,
             CAST(SUM(CASE WHEN served THEN 0 ELSE 1 END) AS BIGINT)
               AS n_unserved
      FROM marked GROUP BY cap
    ),
    alloc AS (
      SELECT m.table_name, m.demand, m.served,
             CASE WHEN m.served THEN m.demand
                  ELSE CAST(l.rem // l.n_unserved AS BIGINT)
                       + CASE WHEN ROW_NUMBER() OVER (PARTITION BY m.served
                                     ORDER BY m.table_name)
                                   <= l.rem % l.n_unserved
                              THEN 1 ELSE 0 END
             END AS allocation
      FROM marked m CROSS JOIN lvl l
    )
    SELECT table_name, demand, CAST(allocation AS BIGINT) AS allocation,
           served AS fully_served
    FROM alloc
    """,
)
def fair_share_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E155: max-min fair-share (water-filling) allocation — split a
    compaction byte budget (40% of total demand) across tables so
    small demands are fully served and the rest share the remaining
    capacity evenly: the scheduler decision behind B3's partial-
    progress batching when rewrite demand exceeds the maintenance
    window, and the fairness complement of E134's proportional
    (Hamilton) split.  A demand sorted at position j is fully served
    iff d_j·(remaining tables) ≤ remaining capacity — the cross-
    multiplied water-level test, monotone in j, so the served set is
    a sorted prefix; unserved tables get ⌊rem/k⌋ with the leftover
    units distributed Hamilton-style (by table name) so allocations
    sum EXACTLY to the budget.

    Scale shape: demand is one metadata agg over the file inventory
    (O(files), never data); every window runs on the |tables| frame.
    Pure int64 end to end."""
    demand = (
        io.files(spark, sf_dir)
        .groupBy("table_name")
        .agg(F.sum("file_size_bytes").cast("long").alias("demand"))
    )
    tot = demand.agg(
        F.sum("demand").cast("long").alias("total"),
        F.floor(
            F.sum("demand") * _FAIR_CAP_NUM / _FAIR_CAP_DEN
        )
        .cast("long")
        .alias("cap"),
        F.count("*").cast("long").alias("n"),
    )
    worder = Window.orderBy("demand", "table_name")
    ranked = (
        demand.crossJoin(F.broadcast(tot))
        .withColumn("j", F.row_number().over(worder).cast("long"))
        .withColumn(
            "prefix",
            F.coalesce(
                F.sum("demand").over(
                    worder.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
    )
    marked = ranked.withColumn(
        "served",
        F.col("demand") * (F.col("n") - F.col("j") + 1)
        <= F.col("cap") - F.col("prefix"),
    )
    lvl = marked.groupBy("cap").agg(
        (
            F.col("cap")
            - F.coalesce(
                F.sum(F.when(F.col("served"), F.col("demand"))), F.lit(0)
            )
        )
        .cast("long")
        .alias("rem"),
        F.sum(F.when(F.col("served"), 0).otherwise(1))
        .cast("long")
        .alias("n_unserved"),
    ).select("rem", "n_unserved")
    wham = Window.partitionBy("served").orderBy("table_name")
    return (
        marked.crossJoin(F.broadcast(lvl))
        .withColumn("hr", F.row_number().over(wham))
        .select(
            "table_name",
            "demand",
            F.when(F.col("served"), F.col("demand"))
            .otherwise(
                F.floor(
                    F.col("rem").cast("double") / F.col("n_unserved").cast("double")
                ).cast("long")
                + F.when(
                    F.col("hr") <= F.col("rem") % F.col("n_unserved"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("allocation"),
            F.col("served").alias("fully_served"),
        )
    )


# ---------------------------------------------------------------------------
# E156: period-over-period rank movers
# ---------------------------------------------------------------------------


@register(
    "rank_movers_nations",
    tier="D",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_totalprice,
             CAST(date_trunc('day', o_orderdate) AS DATE) AS day
      FROM orders
    ),
    span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM o),
    rev AS (
      SELECT n.n_name AS nation,
             (2 * (o.day - s.d0) <= (s.d1 - s.d0)) AS is_base,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      CROSS JOIN span s
      GROUP BY 1, 2
    ),
    pivoted AS (
      SELECT nation,
             CAST(COALESCE(MAX(CASE WHEN is_base THEN cents END), 0) AS BIGINT)
               AS base_cents,
             CAST(COALESCE(MAX(CASE WHEN NOT is_base THEN cents END), 0)
                  AS BIGINT) AS cur_cents
      FROM rev GROUP BY nation
    )
    SELECT nation,
           (CAST(base_cents AS DOUBLE) / 100.0) AS base_revenue,
           (CAST(cur_cents AS DOUBLE) / 100.0) AS cur_revenue,
           CAST(DENSE_RANK() OVER (ORDER BY base_cents DESC, nation) AS BIGINT)
             AS rank_base,
           CAST(DENSE_RANK() OVER (ORDER BY cur_cents DESC, nation) AS BIGINT)
             AS rank_cur,
           CAST(DENSE_RANK() OVER (ORDER BY base_cents DESC, nation)
                - DENSE_RANK() OVER (ORDER BY cur_cents DESC, nation)
                AS BIGINT) AS rank_delta
    FROM pivoted
    """,
)
def rank_movers_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E156: period-over-period rank movers — nations ranked by
    revenue in the first vs second half of the order history, with
    the rank delta (positive = climbed): the "movers and shakers"
    BI report, on exact cents with total-order dense ranks.

    Scale shape: the fact table aggregates once onto (nation,
    period); the pivot and all three rank windows run on the
    |nations| dimension frame; span is a 1-row broadcast (the E135
    integer midpoint split)."""
    o = io.table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_totalprice",
        F.to_date(F.date_trunc("day", "o_orderdate")).alias("day"),
    )
    span = o.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    c = io.table(spark, sf_dir, "customer")
    n = io.table(spark, sf_dir, "nation")
    rev = (
        o.crossJoin(F.broadcast(span))
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            (2 * F.datediff("day", "d0") <= F.datediff("d1", "d0")).alias(
                "is_base"
            ),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "cents"
            )
        )
    )
    pivoted = rev.groupBy("nation").agg(
        F.coalesce(F.max(F.when(F.col("is_base"), F.col("cents"))), F.lit(0))
        .cast("long")
        .alias("base_cents"),
        F.coalesce(F.max(F.when(~F.col("is_base"), F.col("cents"))), F.lit(0))
        .cast("long")
        .alias("cur_cents"),
    )
    wb = Window.orderBy(F.desc("base_cents"), "nation")
    wc = Window.orderBy(F.desc("cur_cents"), "nation")
    return pivoted.select(
        "nation",
        (F.col("base_cents").cast("double") / 100.0).alias("base_revenue"),
        (F.col("cur_cents").cast("double") / 100.0).alias("cur_revenue"),
        F.dense_rank().over(wb).cast("long").alias("rank_base"),
        F.dense_rank().over(wc).cast("long").alias("rank_cur"),
        (F.dense_rank().over(wb) - F.dense_rank().over(wc))
        .cast("long")
        .alias("rank_delta"),
    )
