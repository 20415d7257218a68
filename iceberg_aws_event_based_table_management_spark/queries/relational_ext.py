"""Tier C extensions — remaining relational surface of the spark-sql
shell the reference boots per job (EmrOnEc2OptimizeDataExecutor.java:88-94):
lateral explode, unpivot, exact percentiles, time-range window frames,
deterministic sampling, regex scalar family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import io
from ..registry import register


@register(
    "explode_unnest_tokens",
    tier="C",
    oracle=r"""
    WITH toks AS (
      SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
      FROM documents
    )
    SELECT token, COUNT(*) AS n
    FROM toks WHERE token <> ''
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 50
    """,
)
def explode_unnest_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode (UNNEST / LATERAL VIEW): whitespace-tokenize
    documents, explode to one row per token, global top-50 token
    frequencies with a total tiebreak order.  The explode is map-side
    (no shuffle); only the token counts shuffle — at 100 TB the
    aggregation is partial-combined per partition before exchange."""
    docs = io.table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(50)
    )


@register(
    "unpivot_stack_metrics",
    tier="C",
    oracle="""
    WITH long_form AS (
      SELECT l_returnflag, 'quantity' AS metric, l_quantity AS mval FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'price', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'discount', l_discount FROM lineitem
    )
    SELECT l_returnflag, metric,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(mval * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM long_form GROUP BY l_returnflag, metric
    """,
)
def unpivot_stack_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide -> long) via `stack`: three measure columns become
    (metric, value) rows, then a grouped rollup.  stack() is a
    generator expression — map-side, codegen'd, no Python; the 3x row
    blowup happens inside the scan stage, never materialized."""
    li = io.table(spark, sf_dir, "lineitem")
    long_form = li.select(
        "l_returnflag",
        F.expr(
            "stack(3, 'quantity', l_quantity, 'price', l_extendedprice,"
            " 'discount', l_discount) AS (metric, mval)"
        ),
    )
    return long_form.groupBy("l_returnflag", "metric").agg(
        F.count("*").alias("n"),
        F.sum(F.floor(F.col("mval") * 100).cast("long")).alias("sum_cents"),
    )


@register(
    "agg_percentiles_exact",
    tier="C",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.50) AS q50,
           quantile_cont(l_quantity, 0.75) AS q75
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (PERCENTILE_CONT): both engines
    use the (n-1)*q rank-interpolation definition, and l_quantity is
    integral, so quartile interpolation (steps of .25) is exact in
    binary floating point — hash-stable across engines.  Spark's
    `percentile` is a single-pass sort-based agg; at scale prefer
    approx_percentile (C20's HLL analog) — the exact form is the
    oracle anchor."""
    li = io.table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.expr("percentile(l_quantity, 0.25D)").alias("q25"),
        F.expr("percentile(l_quantity, 0.50D)").alias("q50"),
        F.expr("percentile(l_quantity, 0.75D)").alias("q75"),
    )


@register(
    "window_range_frame",
    tier="C",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, ts,
             CAST(FLOOR(value * 100) AS BIGINT) AS cents
      FROM events
    )
    SELECT event_id, user_id, ts,
           CAST(SUM(cents) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS rolling_cents
    FROM e
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per-table rolling 1-hour metric sum —
    the continuous form of the trigger evaluator's age math (A8,
    AwsTableManagementMetricsEvaluator.java:119).  RANGE frames bound
    by *value* (microseconds), not row count, so late/dense bursts are
    handled; partitioned per user so no global sort."""
    e = io.table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
        io.epoch_us("ts").alias("ts_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id", "user_id", "ts", F.sum("cents").over(w).alias("rolling_cents")
    )


@register(
    "sample_deterministic",
    tier="C",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM lineitem
    WHERE l_orderkey % 20 = 7
    GROUP BY l_returnflag
    """,
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic key-mod sampling — the reproducible TABLESAMPLE
    substitute for pipeline debugging at scale.  The predicate pushes
    to the scan (unlike TABLESAMPLE BERNOULLI, which reads everything
    and is seed/engine-dependent), and sampling by key keeps whole
    orders together."""
    li = io.table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 20 == 7)
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(F.floor("l_quantity").cast("long")).alias("sum_qty"),
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias("sum_cents"),
    )


@register(
    "scalar_regex_suite",
    tier="C",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS consonants,
           p_brand LIKE 'Brand#1%' AS brand1x,
           regexp_matches(p_type, '^(ECONOMY|SMALL)$') AS cheap_type
    FROM part
    """,
)
def scalar_regex_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar family (C34 companion): extract / global replace /
    LIKE prefix / full-match test.  All JVM-codegen'd expressions —
    no UDFs — so they stay inside WholeStageCodegen at scale."""
    p = io.table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("consonants"),
        F.col("p_brand").startswith("Brand#1").alias("brand1x"),
        F.col("p_type").rlike("^(ECONOMY|SMALL)$").alias("cheap_type"),
    )


@register(
    "window_rank_distributions",
    tier="C",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist() OVER w, 6) AS cume,
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice)
    """,
)
def window_rank_distributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C27 companions: percent_rank + cume_dist — distribution-position
    analytics per status partition.  Both are tie-stable (equal inputs
    get equal outputs), so results are deterministic without a
    tiebreak; one shuffle on the bounded partition key."""
    o = io.table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "profile_table_stats",
    tier="E",
    oracle="""
    WITH a AS (
      SELECT COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_id,
             COUNT(DISTINCT doc_id) AS dist_id,
             CAST(MIN(doc_id) AS VARCHAR) AS min_id, CAST(MAX(doc_id) AS VARCHAR) AS max_id,
             CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_lang,
             COUNT(DISTINCT lang) AS dist_lang,
             MIN(lang) AS min_lang, MAX(lang) AS max_lang,
             CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_src,
             COUNT(DISTINCT source) AS dist_src,
             MIN(source) AS min_src, MAX(source) AS max_src,
             CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_nc,
             COUNT(DISTINCT n_chars) AS dist_nc,
             CAST(MIN(n_chars) AS VARCHAR) AS min_nc, CAST(MAX(n_chars) AS VARCHAR) AS max_nc
      FROM documents
    )
    SELECT 'doc_id' AS col_name, n_rows, null_id AS n_nulls, dist_id AS n_distinct,
           min_id AS min_value, max_id AS max_value FROM a
    UNION ALL
    SELECT 'lang', n_rows, null_lang, dist_lang, min_lang, max_lang FROM a
    UNION ALL
    SELECT 'source', n_rows, null_src, dist_src, min_src, max_src FROM a
    UNION ALL
    SELECT 'n_chars', n_rows, null_nc, dist_nc, min_nc, max_nc FROM a
    """,
)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E35: single-pass table profiler (the ANALYZE TABLE / data-audit
    shape): per-column null count, exact distinct count, min and max —
    ALL columns in ONE aggregation job, vs the naive one-job-per-column
    profiler.  The one global agg is the only shuffle (multi
    count-distinct expands map-side); at 100 TB swap the exact
    distincts for approx_count_distinct and the plan is unchanged.
    Values surface as strings so heterogeneous column types share one
    long-format schema."""
    docs = io.table(spark, sf_dir, "documents")

    def metrics(c: str, alias: str):
        return [
            F.sum(F.col(c).isNull().cast("long")).alias(f"null_{alias}"),
            F.countDistinct(c).alias(f"dist_{alias}"),
            F.min(c).cast("string").alias(f"min_{alias}"),
            F.max(c).cast("string").alias(f"max_{alias}"),
        ]

    a = docs.agg(
        F.count("*").alias("n_rows"),
        *metrics("doc_id", "id"),
        *metrics("lang", "lang"),
        *metrics("source", "src"),
        *metrics("n_chars", "nc"),
    )
    cols = [("doc_id", "id"), ("lang", "lang"), ("source", "src"), ("n_chars", "nc")]
    return a.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col("n_rows").alias("n_rows"),
                        F.col(f"null_{al}").alias("n_nulls"),
                        F.col(f"dist_{al}").alias("n_distinct"),
                        F.col(f"min_{al}").alias("min_value"),
                        F.col(f"max_{al}").alias("max_value"),
                    )
                    for c, al in cols
                ]
            )
        ).alias("p")
    ).select("p.*")


@register(
    "audit_referential_integrity",
    tier="E",
    oracle="""
    WITH rels AS (
      SELECT 'orders->customer' AS relation, COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
      FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        ON o.o_custkey = c.c_custkey
      UNION ALL
      SELECT 'lineitem->orders', COUNT(*),
             CAST(SUM(CASE WHEN k.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) k
        ON l.l_orderkey = k.o_orderkey
      UNION ALL
      SELECT 'lineitem->part', COUNT(*),
             CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem l LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
        ON l.l_partkey = p.p_partkey
      UNION ALL
      SELECT 'lineitem->supplier', COUNT(*),
             CAST(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem l LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier) s
        ON l.l_suppkey = s.s_suppkey
    )
    SELECT relation, n_rows, n_orphans,
           ROUND(CAST(n_orphans AS DOUBLE) / n_rows, 6) AS orphan_pct
    FROM rels
    """,
)
def audit_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E38: referential-integrity audit — orphan-FK counts for the four
    fact->dim relations, each as ONE left join + conditional count (no
    separate anti-join pass + count pass).  Dim keys are
    distinct-projected before the join; at 100 TB each relation is one
    shuffle (or a broadcast when the dim fits), and the four audits
    run as independent union branches in a single job."""

    def fk_audit(child: DataFrame, fk: str, parent: DataFrame, pk: str, name: str) -> DataFrame:
        c = child.select(F.col(fk).alias("fk"))
        p = parent.select(F.col(pk).alias("pk")).distinct()
        return (
            c.join(p, c.fk == p.pk, "left")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum(F.col("pk").isNull().cast("long")).alias("n_orphans"),
            )
            .select(
                F.lit(name).alias("relation"),
                "n_rows",
                "n_orphans",
                F.round(F.col("n_orphans").cast("double") / F.col("n_rows"), 6).alias(
                    "orphan_pct"
                ),
            )
        )

    o = io.table(spark, sf_dir, "orders")
    li = io.table(spark, sf_dir, "lineitem")
    cu = io.table(spark, sf_dir, "customer")
    pa = io.table(spark, sf_dir, "part")
    su = io.table(spark, sf_dir, "supplier")
    return (
        fk_audit(o, "o_custkey", cu, "c_custkey", "orders->customer")
        .unionByName(fk_audit(li, "l_orderkey", o, "o_orderkey", "lineitem->orders"))
        .unionByName(fk_audit(li, "l_partkey", pa, "p_partkey", "lineitem->part"))
        .unionByName(fk_audit(li, "l_suppkey", su, "s_suppkey", "lineitem->supplier"))
    )


@register(
    "window_forward_fill",
    tier="E",
    oracle="""
    WITH gappy AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             CASE WHEN o_orderkey % 7 = 3 THEN NULL ELSE o_totalprice END AS v
      FROM orders
    )
    SELECT o_custkey, o_orderkey, v,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS v_filled
    FROM gappy
    """,
)
def window_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E43: forward-fill repair — nulls (injected deterministically on
    o_orderkey % 7 = 3) take the last non-null value in order-date
    order per customer; leading nulls stay null.  The standard
    sensor/ledger gap-repair idiom: last(ignorenulls) over an
    unbounded-preceding frame, one window shuffle on the bounded
    partition key, tiebreak o_orderkey for engine-stable order."""
    o = io.table(spark, sf_dir, "orders")
    v = F.when(F.col("o_orderkey") % 7 == 3, F.lit(None)).otherwise(
        F.col("o_totalprice")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        v.alias("v"),
        F.last(v, ignorenulls=True).over(w).alias("v_filled"),
    )


@register(
    "window_interpolate_linear",
    tier="E",
    oracle="""
    WITH gappy AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             CASE WHEN o_orderkey % 7 = 3 THEN NULL ELSE o_totalprice END AS v
      FROM orders
    ),
    ctx AS (
      SELECT o_custkey, o_orderkey, o_orderdate, v,
             last_value(v IGNORE NULLS) OVER wp AS v_prev,
             last_value(CASE WHEN v IS NOT NULL
                             THEN CAST(o_orderdate AS DATE) - DATE '1970-01-01' END
                        IGNORE NULLS) OVER wp AS t_prev,
             first_value(v IGNORE NULLS) OVER wf AS v_next,
             first_value(CASE WHEN v IS NOT NULL
                              THEN CAST(o_orderdate AS DATE) - DATE '1970-01-01' END
                         IGNORE NULLS) OVER wf AS t_next
      FROM gappy
      WINDOW
        wp AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT o_custkey, o_orderkey, v,
           ROUND(CASE
             WHEN v IS NOT NULL THEN v
             WHEN v_prev IS NOT NULL AND v_next IS NOT NULL AND t_next <> t_prev
               THEN v_prev + (CAST((CAST(o_orderdate AS DATE) - DATE '1970-01-01') - t_prev AS DOUBLE)
                              / (t_next - t_prev)) * (v_next - v_prev)
             WHEN v_prev IS NOT NULL AND v_next IS NOT NULL THEN v_prev
             ELSE COALESCE(v_prev, v_next)
           END, 6) AS v_interp
    FROM ctx
    """,
)
def window_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E49: linear-interpolation repair (E43's companion): a null takes
    the time-weighted blend of its nearest non-null neighbors; edges
    fall back to the available side.  Two frames per row
    (unbounded-preceding and unbounded-following), both streaming —
    one window shuffle total, shared by all four context columns.
    Determinism: the time axis is exact int DAYS since epoch
    (unix_date — timezone-free, o_orderdate is date-granular, and
    TIMESTAMP_NTZ must never pass through a session-timezone epoch
    conversion); the blend is subtract / divide / multiply / add on
    identical doubles — single correctly-rounded IEEE ops, ROUND 6 on
    top."""
    o = io.table(spark, sf_dir, "orders")
    v = F.when(F.col("o_orderkey") % 7 == 3, F.lit(None)).otherwise(
        F.col("o_totalprice")
    )
    t = F.unix_date(F.to_date("o_orderdate"))
    base = (
        Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    )
    wp = base.rowsBetween(Window.unboundedPreceding, -1)
    wf = base.rowsBetween(1, Window.unboundedFollowing)
    ctx = o.select(
        "o_custkey",
        "o_orderkey",
        t.alias("t"),
        v.alias("v"),
        F.last(v, ignorenulls=True).over(wp).alias("v_prev"),
        F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(wp).alias("t_prev"),
        F.first(v, ignorenulls=True).over(wf).alias("v_next"),
        F.first(F.when(v.isNotNull(), t), ignorenulls=True).over(wf).alias("t_next"),
    )
    blend = F.col("v_prev") + (
        (F.col("t") - F.col("t_prev")).cast("double")
        / (F.col("t_next") - F.col("t_prev"))
    ) * (F.col("v_next") - F.col("v_prev"))
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("v_prev").isNotNull()
            & F.col("v_next").isNotNull()
            & (F.col("t_next") != F.col("t_prev")),
            blend,
        )
        .when(F.col("v_prev").isNotNull() & F.col("v_next").isNotNull(), F.col("v_prev"))
        .otherwise(F.coalesce(F.col("v_prev"), F.col("v_next")))
    )
    return ctx.select(
        "o_custkey", "o_orderkey", "v", F.round(interp, 6).alias("v_interp")
    )


def _key_skew(df: DataFrame, key: str) -> DataFrame:
    counts = df.groupBy(key).agg(F.count("*").alias("c"))
    summary = counts.agg(
        F.sum("c").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.max("c").alias("max_key_rows"),
        F.round(F.sum("c").cast("double") / F.count("*"), 6).alias("avg_key_rows"),
        F.round(
            F.max("c").cast("double") / (F.sum("c").cast("double") / F.count("*")), 6
        ).alias("skew_ratio"),
    )
    return summary.select(F.lit(key).alias("key_column"), "*")


_SKEW_SQL = """
      SELECT '{key}' AS key_column,
             CAST(SUM(c) AS BIGINT) AS n_rows,
             COUNT(*) AS n_keys,
             CAST(MAX(c) AS BIGINT) AS max_key_rows,
             ROUND(CAST(SUM(c) AS DOUBLE) / COUNT(*), 6) AS avg_key_rows,
             ROUND(CAST(MAX(c) AS DOUBLE)
                   / (CAST(SUM(c) AS DOUBLE) / COUNT(*)), 6) AS skew_ratio
      FROM (SELECT {key}, COUNT(*) AS c FROM {rel} GROUP BY {key})
"""


@register(
    "join_key_skew_diagnosis",
    tier="C",
    oracle=f"""
    {_SKEW_SQL.format(key="l_orderkey", rel="lineitem")}
    UNION ALL
    {_SKEW_SQL.format(key="l_suppkey", rel="lineitem")}
    UNION ALL
    {_SKEW_SQL.format(key="o_custkey", rel="orders")}
    """,
)
def join_key_skew_diagnosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E76 — join-key skew diagnosis: per candidate join/agg key, row
    counts, key cardinality, the heaviest key's row count, and the
    skew ratio (max/avg rows per key) — the report that decides
    whether a key needs salting (operators/skew.py two-stage agg) or
    an AQE skew-join hint BEFORE a 100 TB join hits one straggler
    partition.

    Scale shape: one count-per-key agg per diagnosed key (partial
    aggs combine map-side — the heavy key never concentrates raw rows
    anywhere); the summary is a single-row reduction per key.  The
    diagnosis costs what one shuffle of key-count pairs costs,
    orders of magnitude below the join it de-risks."""
    li = io.table(spark, sf_dir, "lineitem")
    o = io.table(spark, sf_dir, "orders")
    return (
        _key_skew(li, "l_orderkey")
        .unionByName(_key_skew(li, "l_suppkey"))
        .unionByName(_key_skew(o, "o_custkey"))
    )
