"""Tier D (part 10) — exact apportionment, drift testing, skew
planning, graph reachability, and distribution alignment (SURVEY.md
§2-E E134-E139).

Ninth batch: largest-remainder (Hamilton) apportionment of a fixed
token budget across sources (the EXACT form of E23's mixture weights
— quotas sum to the budget by construction, no float rounding drift),
a chi-square categorical drift gate between the first and second half
of the event log (the monitoring complement of E57's term drift, with
the statistic held rational until the ppm floor), a Mann-Whitney U
two-sample location test on document lengths (the nonparametric
numeric-drift test, computed exactly on the value GRID — no global
rank over rows), a salting plan for skewed join keys (the planner
that feeds operators/skew.py's two-stage aggregation), 3-hop BFS
reachability over the part-supplier bipartite graph (min-hop
semantics, unrolled joins — the bounded-depth form of E95's
fixed-point iteration), and quantile normalization of per-source
length distributions onto the global distribution (the batch-effect
alignment transform, mapped by cross-multiplied CDF comparison).

Float discipline: as pipeline_ext8 — exact int64 operands
everywhere; IEEE arithmetic only through identically-parenthesized
op sequences both engines round the same way; squares that could
exceed int64 range cross into double BEFORE squaring (conversion of
an identical int64 is itself deterministic).

All built-in-function formulations (no Python UDFs); every query
carries an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import io
from ..registry import register

# ---------------------------------------------------------------------------
# E134: largest-remainder apportionment
# ---------------------------------------------------------------------------

_APPORTION_BUDGET = 1_000_000  # training-token budget to split


@register(
    "apportion_token_budget",
    tier="D",
    oracle=f"""
    WITH src AS (
      SELECT source,
             CAST(SUM(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                      w -> w <> ''))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM src),
    quota AS (
      SELECT s.source, s.n_tokens,
             CAST({_APPORTION_BUDGET} * s.n_tokens // t.total AS BIGINT) AS base_quota,
             CAST({_APPORTION_BUDGET} * s.n_tokens % t.total AS BIGINT) AS remainder,
             CAST({_APPORTION_BUDGET} - SUM({_APPORTION_BUDGET} * s.n_tokens // t.total)
                    OVER () AS BIGINT) AS n_extra
      FROM src s CROSS JOIN tot t
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY remainder DESC, source) AS rk
      FROM quota
    )
    SELECT source, n_tokens, base_quota,
           (rk <= n_extra) AS got_extra,
           CAST(base_quota + CASE WHEN rk <= n_extra THEN 1 ELSE 0 END AS BIGINT)
             AS final_quota
    FROM ranked
    """,
)
def apportion_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E134: largest-remainder (Hamilton) apportionment — split a
    fixed training-token budget across sources proportionally so the
    integer quotas SUM EXACTLY to the budget: base = floor(B·nᵢ/total),
    the B − Σbase leftover units go to the largest remainders
    (B·nᵢ mod total, ties by source).  This is the exact-integer form
    of E23's mixture weights — the float shares there never quite sum
    to 1; these quotas sum to B by construction.

    Exactness: everything is int64 (B·nᵢ ≈ 1e6·4e5 « 2^63); the
    remainder ranking is a total order.

    Scale shape: one corpus agg to |sources| rows; all windows run on
    that dimension-sized frame."""
    docs = io.table(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(
        F.sum(
            F.size(F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != ""))
        )
        .cast("long")
        .alias("n_tokens")
    )
    wall = Window.partitionBy()
    quota = src.select(
        "source",
        "n_tokens",
        F.floor(
            F.lit(_APPORTION_BUDGET)
            * F.col("n_tokens")
            / F.sum("n_tokens").over(wall)
        )
        .cast("long")
        .alias("base_quota"),
        (
            F.lit(_APPORTION_BUDGET)
            * F.col("n_tokens")
            % F.sum("n_tokens").over(wall)
        )
        .cast("long")
        .alias("remainder"),
    ).withColumn(
        "n_extra",
        (F.lit(_APPORTION_BUDGET) - F.sum("base_quota").over(wall)).cast("long"),
    )
    wrk = Window.orderBy(F.desc("remainder"), "source")
    return (
        quota.withColumn("rk", F.row_number().over(wrk))
        .select(
            "source",
            "n_tokens",
            "base_quota",
            (F.col("rk") <= F.col("n_extra")).alias("got_extra"),
            (
                F.col("base_quota")
                + F.when(F.col("rk") <= F.col("n_extra"), 1).otherwise(0)
            )
            .cast("long")
            .alias("final_quota"),
        )
    )


# ---------------------------------------------------------------------------
# E135: chi-square categorical drift gate
# ---------------------------------------------------------------------------

# chi2_{df=4, alpha=0.05} = 9.4877 -> drift when total ppm > 9_487_700
_CHI2_THRESHOLD_PPM = 9_487_700


@register(
    "drift_chi_square_gate",
    tier="D",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
    lab AS (
      SELECT event_type,
             (2 * (day - s.d0) <= (s.d1 - s.d0)) AS is_base
      FROM daily CROSS JOIN span s
    ),
    mix AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN is_base THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
             CAST(SUM(CASE WHEN is_base THEN 0 ELSE 1 END) AS BIGINT) AS n_cur
      FROM lab GROUP BY event_type
    ),
    tot AS (
      SELECT CAST(SUM(n_base) AS BIGINT) AS tb, CAST(SUM(n_cur) AS BIGINT) AS tc
      FROM mix
    ),
    contrib AS (
      SELECT m.event_type, m.n_base, m.n_cur,
             CAST(FLOOR(((CAST(m.n_cur * t.tb - m.n_base * t.tc AS DOUBLE)
                          * CAST(m.n_cur * t.tb - m.n_base * t.tc AS DOUBLE))
                         / CAST(t.tb * t.tc * m.n_base AS DOUBLE))
                        * 1000000) AS BIGINT) AS contrib_ppm
      FROM mix m CROSS JOIN tot t
      WHERE m.n_base > 0
    )
    SELECT event_type, n_base, n_cur, contrib_ppm,
           CAST(SUM(contrib_ppm) OVER () AS BIGINT) AS chi2_total_ppm,
           (SUM(contrib_ppm) OVER () > {_CHI2_THRESHOLD_PPM}) AS is_drift
    FROM contrib
    """,
)
def drift_chi_square_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E135: chi-square categorical drift gate — is the second half of
    the event log's type mix consistent with the first half?  The
    monitoring gate for categorical distributions (event types, langs,
    sources) that E57 answers for text terms: per-type contribution
    (o·T_b − b·T_c)²/(T_b·T_c·b) in ppm, totaled against the
    χ²(df=4, α=.05) = 9.488 critical value.

    Exactness: the signed difference o·T_b − b·T_c is exact int64; it
    crosses to double BEFORE squaring (sf1 magnitudes square past
    int64 — the documented reason), then one divide and one scale:
    every IEEE step identically parenthesized in both engines.
    Per-type contributions are summed as INTEGER ppm.

    Scale shape: events collapse to (type, period) counts in one agg
    (the span is a 1-row broadcast); everything after runs on
    |types| rows."""
    ev = io.table(spark, sf_dir, "events").select(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    )
    span = ev.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    mix = (
        ev.crossJoin(F.broadcast(span))
        .withColumn(
            "is_base",
            2 * F.datediff("day", "d0") <= F.datediff("d1", "d0"),
        )
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("is_base"), 1).otherwise(0))
            .cast("long")
            .alias("n_base"),
            F.sum(F.when(F.col("is_base"), 0).otherwise(1))
            .cast("long")
            .alias("n_cur"),
        )
    )
    tot = mix.agg(
        F.sum("n_base").cast("long").alias("tb"),
        F.sum("n_cur").cast("long").alias("tc"),
    )
    # Integer products in decimal(38,0): the triple denominator
    # tb·tc·n_base is CUBIC in event count (long overflow past ~2e7
    # events — the r12 sf10 smoke's fail-stop) and the numerator diff
    # is quadratic (dies past ~3e9); decimal matches the oracle's
    # HUGEINT intermediates exactly, and the double conversions land
    # on the same values at every non-overflowing size.
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    diff = (dec("n_cur") * dec("tb") - dec("n_base") * dec("tc")).cast("double")
    contrib = (
        mix.crossJoin(F.broadcast(tot))
        .filter(F.col("n_base") > 0)
        .select(
            "event_type",
            "n_base",
            "n_cur",
            F.floor(
                (
                    (diff * diff)
                    / (dec("tb") * dec("tc") * dec("n_base")).cast("double")
                )
                * 1000000
            )
            .cast("long")
            .alias("contrib_ppm"),
        )
    )
    wall = Window.partitionBy()
    total = F.sum("contrib_ppm").over(wall)
    return contrib.select(
        "event_type",
        "n_base",
        "n_cur",
        "contrib_ppm",
        total.cast("long").alias("chi2_total_ppm"),
        (total > _CHI2_THRESHOLD_PPM).alias("is_drift"),
    )


# ---------------------------------------------------------------------------
# E136: Mann-Whitney U two-sample test on the value grid
# ---------------------------------------------------------------------------

_MW_SRC_A = "src0"
_MW_SRC_B = "src1"


@register(
    "mannwhitney_u_lengths",
    tier="D",
    oracle=f"""
    WITH grid AS (
      SELECT n_chars AS v,
             CAST(SUM(CASE WHEN source = '{_MW_SRC_A}' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN source = '{_MW_SRC_B}' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM documents
      WHERE source IN ('{_MW_SRC_A}', '{_MW_SRC_B}')
      GROUP BY 1
    ),
    cum AS (
      SELECT v, ca, cb,
             COALESCE(SUM(cb) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb_lt
      FROM grid
    ),
    u AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS n1,
             CAST(SUM(cb) AS BIGINT) AS n2,
             CAST(SUM(ca * (2 * cb_lt + cb)) AS BIGINT) AS u2
      FROM cum
    )
    SELECT n1, n2, u2,
           CAST(u2 - n1 * n2 AS BIGINT) AS diff2,
           CAST(FLOOR((CAST(u2 - n1 * n2 AS DOUBLE)
                       / CAST(n1 * n2 AS DOUBLE)) * 1000000) AS BIGINT)
             AS rank_biserial_ppm,
           (3 * (CAST(u2 - n1 * n2 AS DOUBLE) * CAST(u2 - n1 * n2 AS DOUBLE))
              > CAST(4 * n1 * n2 * (n1 + n2 + 1) AS DOUBLE)) AS is_shifted
    FROM u
    """,
)
def mannwhitney_u_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E136: Mann-Whitney U two-sample location test — are two
    sources' document-length distributions shifted?  The
    nonparametric numeric-drift test (E135 covers categories): with
    midrank tie handling, 2U = Σ_v ca(v)·(2·Σ_{v'<v}cb(v') + cb(v)),
    so the whole statistic computes on the VALUE GRID — never a
    global rank over documents.  |z| > 2 significance cross-
    multiplies to 3·(2U − n₁n₂)² > 4·n₁n₂(n₁+n₂+1); the effect size
    ships as rank-biserial ppm.

    Exactness: 2U and its mean-offset are exact int64; the square
    crosses to double first (sf1 headroom), both engines running the
    identical op sequence.

    Scale shape: one corpus agg to the length grid (bounded by max
    document length — metadata, the E62/E130 allowance); the
    cumulative window and the final 1-row reduction run on the
    grid."""
    docs = io.table(spark, sf_dir, "documents").filter(
        F.col("source").isin(_MW_SRC_A, _MW_SRC_B)
    )
    grid = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.sum(F.when(F.col("source") == _MW_SRC_A, 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("source") == _MW_SRC_B, 1).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    wlt = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = grid.select(
        "ca",
        "cb",
        F.coalesce(F.sum("cb").over(wlt), F.lit(0)).alias("cb_lt"),
    )
    u = cum.agg(
        F.sum("ca").cast("long").alias("n1"),
        F.sum("cb").cast("long").alias("n2"),
        F.sum(F.col("ca") * (2 * F.col("cb_lt") + F.col("cb")))
        .cast("long")
        .alias("u2"),
    )
    d = (F.col("u2") - F.col("n1") * F.col("n2")).cast("double")
    return u.select(
        "n1",
        "n2",
        "u2",
        (F.col("u2") - F.col("n1") * F.col("n2")).cast("long").alias("diff2"),
        F.floor((d / (F.col("n1") * F.col("n2")).cast("double")) * 1000000)
        .cast("long")
        .alias("rank_biserial_ppm"),
        (
            3 * (d * d)
            > (4 * F.col("n1") * F.col("n2") * (F.col("n1") + F.col("n2") + 1)).cast(
                "double"
            )
        ).alias("is_shifted"),
    )


# ---------------------------------------------------------------------------
# E137: salting plan for skewed join keys
# ---------------------------------------------------------------------------

_SALT_TARGET = 40  # rows per (key, salt) after salting


@register(
    "salting_plan_skewed_keys",
    tier="D",
    oracle=f"""
    WITH kc AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1
    )
    SELECT l_partkey, n,
           CAST(FLOOR(CAST(n + {_SALT_TARGET} - 1 AS DOUBLE) / {_SALT_TARGET})
                AS BIGINT) AS salt_factor,
           CAST(FLOOR(CAST(n + FLOOR(CAST(n + {_SALT_TARGET} - 1 AS DOUBLE)
                                     / {_SALT_TARGET}) - 1 AS DOUBLE)
                      / FLOOR(CAST(n + {_SALT_TARGET} - 1 AS DOUBLE)
                              / {_SALT_TARGET}))
                AS BIGINT) AS max_rows_after
    FROM kc WHERE n > {_SALT_TARGET}
    """,
)
def salting_plan_skewed_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E137: salting plan for skewed join/agg keys — the planner that
    sizes operators/skew.py's two-stage aggregation: for every key
    whose row count exceeds the per-task target, the salt factor
    ceil(n/target) and the resulting per-(key,salt) ceiling
    ceil(n/factor).  This is the decision AQE's skew-join makes from
    runtime stats, exposed as a queryable plan (and usable ahead of
    time for the salted-agg path, which AQE does not cover).

    Exactness: ceil(a/b) = floor((a+b−1)/b) through the double-divide
    gate — exact for these magnitudes (« 2^53).

    Scale shape: one partial-agg shuffle to key counts; the plan rows
    are only the skewed keys (the histogram head, metadata-sized by
    the skew definition itself)."""
    kc = (
        io.table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count("*").cast("long").alias("n"))
        .filter(F.col("n") > _SALT_TARGET)
    )
    salt = F.floor(
        (F.col("n") + _SALT_TARGET - 1).cast("double") / _SALT_TARGET
    )
    after = F.floor((F.col("n") + salt - 1).cast("double") / salt)
    return kc.select(
        "l_partkey",
        "n",
        salt.cast("long").alias("salt_factor"),
        after.cast("long").alias("max_rows_after"),
    )


# ---------------------------------------------------------------------------
# E138: 3-hop BFS reachability (part-supplier bipartite)
# ---------------------------------------------------------------------------


@register(
    "graph_khop_reach",
    tier="D",
    oracle="""
    WITH e AS (
      SELECT DISTINCT l_partkey AS part, l_suppkey AS supp FROM lineitem
    ),
    seed AS (SELECT MIN(supp) AS s FROM e),
    h1 AS (
      SELECT DISTINCT e.part FROM e JOIN seed ON e.supp = seed.s
    ),
    h2 AS (
      SELECT DISTINCT e.supp FROM e JOIN h1 USING (part)
      WHERE e.supp <> (SELECT s FROM seed)
    ),
    h3 AS (
      SELECT DISTINCT e.part FROM e JOIN h2 USING (supp)
      WHERE e.part NOT IN (SELECT part FROM h1)
    )
    SELECT 'supplier' AS node_type, s AS node_id, CAST(0 AS BIGINT) AS hop FROM seed
    UNION ALL SELECT 'part', part, 1 FROM h1
    UNION ALL SELECT 'supplier', supp, 2 FROM h2
    UNION ALL SELECT 'part', part, 3 FROM h3
    """,
)
def graph_khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E138: bounded-depth BFS — every node within 3 hops of a seed
    supplier on the part-supplier bipartite graph, labeled with its
    MINIMUM hop distance (each frontier excludes all earlier levels,
    so a node appears exactly once at its first reach).  The
    bounded-depth form of the graph family: E95 iterates to a
    fixpoint, E25 contracts components; this unrolls a fixed k — the
    "blast radius" query (supplier outage → affected parts →
    co-suppliers → their parts).

    Scale shape: the edge list is DISTINCT (part, supp) — bounded by
    the relationship table, not the fact table; each hop is one
    equi-join frontier-to-edges plus an anti-join against the
    previous levels; frontiers only ever shuffle node ids.  At web
    scale each hop stays an equi-join with the frontier broadcast
    while it fits (the E63-style working set)."""
    e = (
        io.table(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("part"), F.col("l_suppkey").alias("supp"))
        .distinct()
    )
    seed = e.agg(F.min("supp").alias("s"))
    h1 = (
        e.join(F.broadcast(seed), e.supp == F.col("s"))
        .select("part")
        .distinct()
    )
    h2 = (
        e.join(h1, "part")
        .join(F.broadcast(seed), e.supp == F.col("s"), "left_anti")
        .select("supp")
        .distinct()
    )
    h3 = (
        e.join(h2, "supp")
        .join(h1, "part", "left_anti")
        .select("part")
        .distinct()
    )
    lit = F.lit
    return (
        seed.select(
            lit("supplier").alias("node_type"),
            F.col("s").alias("node_id"),
            lit(0).cast("long").alias("hop"),
        )
        .unionAll(
            h1.select(lit("part"), F.col("part"), lit(1).cast("long"))
        )
        .unionAll(
            h2.select(lit("supplier"), F.col("supp"), lit(2).cast("long"))
        )
        .unionAll(
            h3.select(lit("part"), F.col("part"), lit(3).cast("long"))
        )
    )


# ---------------------------------------------------------------------------
# E139: quantile normalization of per-source distributions
# ---------------------------------------------------------------------------


@register(
    "quantile_normalize_lengths",
    tier="D",
    oracle="""
    WITH sgrid AS (
      SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM documents GROUP BY 1, 2
    ),
    scum AS (
      SELECT source, v,
             CAST(SUM(cnt) OVER (PARTITION BY source ORDER BY v) AS BIGINT) AS cs,
             CAST(SUM(cnt) OVER (PARTITION BY source) AS BIGINT) AS ts
      FROM sgrid
    ),
    ggrid AS (
      SELECT n_chars AS gv, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM documents GROUP BY 1
    ),
    gcum AS (
      SELECT gv,
             CAST(SUM(cnt) OVER (ORDER BY gv) AS BIGINT) AS cg,
             CAST(SUM(cnt) OVER () AS BIGINT) AS tg
      FROM ggrid
    )
    SELECT s.source, s.v AS n_chars,
           CAST(MIN(g.gv) AS BIGINT) AS mapped_chars
    FROM scum s JOIN gcum g ON g.cg * s.ts >= s.cs * g.tg
    GROUP BY s.source, s.v
    """,
)
def quantile_normalize_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E139: quantile normalization — map each source's length
    distribution onto the GLOBAL length distribution (the batch-
    effect alignment transform: after mapping, every source's CDF
    matches the corpus CDF as closely as the grid allows).  Each
    (source, value) maps to the smallest global value whose CDF
    reaches the source CDF at that value — compared cross-multiplied
    (cg·ts ≥ cs·tg), so no ratio ever forms.

    Scale shape: both CDFs live on value GRIDS (bounded by max
    document length — the E62/E130/E136 metadata allowance); the
    mapping is a grid×grid theta join with the global grid broadcast,
    then a min-reduce.  Corpus rows are touched once per grid
    build."""
    docs = io.table(spark, sf_dir, "documents")
    sgrid = docs.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    wsrc = Window.partitionBy("source").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wsall = Window.partitionBy("source")
    scum = sgrid.select(
        "source",
        "v",
        F.sum("cnt").over(wsrc).cast("long").alias("cs"),
        F.sum("cnt").over(wsall).cast("long").alias("ts"),
    )
    ggrid = docs.groupBy(F.col("n_chars").alias("gv")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    wg = Window.orderBy("gv").rowsBetween(Window.unboundedPreceding, 0)
    wgall = Window.partitionBy()
    gcum = ggrid.select(
        "gv",
        F.sum("cnt").over(wg).cast("long").alias("cg"),
        F.sum("cnt").over(wgall).cast("long").alias("tg"),
    )
    return (
        scum.join(
            F.broadcast(gcum),
            F.col("cg") * F.col("ts") >= F.col("cs") * F.col("tg"),
        )
        .groupBy("source", F.col("v").alias("n_chars"))
        .agg(F.min("gv").cast("long").alias("mapped_chars"))
    )
