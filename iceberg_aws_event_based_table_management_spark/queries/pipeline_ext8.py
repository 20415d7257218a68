"""Tier D (part 9) — retrieval ranking, multi-objective frontier,
split search, and time-series anomaly detection (SURVEY.md §2-E
E128-E133).

Eighth batch: BM25 ranked retrieval over the documents table (the
lexical-search baseline every RAG/eval harness needs next to the
embedding path — scored entirely in integer-ratio arithmetic so both
engines agree bit-for-bit), a bucket-pruned 2D Pareto skyline (the
multi-objective "best customers" frontier, computed without an n²
self-join OR an O(n) global sort: quantile buckets prune map-side,
the exact window runs over survivors only), an exact decision-tree
split finder (weighted Gini impurity over candidate thresholds in
cross-multiplied int64 — the ML-feature-prep kernel), and three
streaming-adjacent anomaly detectors over the daily event series:
Bollinger-band breakouts (rolling mean ± 2σ as a pure integer
predicate), CUSUM change-point location (argmax of the n-scaled
cumulative deviation), and exponentially weighted smoothing with a
dyadic decay (α = 1/2 over a 16-day horizon — every weight a power
of two, so the smoothed value is an exact integer ratio).

Float discipline (same as aggregates.py): no order-dependent double
sums anywhere; every ratio is formed from exact int64 operands and
crosses into IEEE arithmetic through at most two identically-
parenthesized operations (one divide, one scale), which both engines
round identically.

All built-in-function formulations (no Python UDFs); every query
carries an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import io
from ..operators import similarity as S
from ..registry import register

# ---------------------------------------------------------------------------
# E128: BM25 ranked retrieval
# ---------------------------------------------------------------------------

_BM25_TERMS = ("vector", "stream", "spark")  # fixed 3-term query
_BM25_TOPK = 10

# BM25 with k1 = 1.2, b = 0.75, idf = (N - df + 0.5)/(df + 0.5), kept
# rational: numerator and denominator are exact int64 products (scale
# both idf halves by 2, the length-norm term by 10*total_tokens):
#   idf        = (2N - 2df + 1) / (2df + 1)
#   tf-norm    = 22*tf*total / (10*tf*total + 3*total + 9*dl*N)
# per-term score_ppm = floor((a/b) * 1e6) with
#   a = (2N - 2df + 1) * 22 * tf * total
#   b = (2df + 1) * (10*tf*total + 3*total + 9*dl*N)
#
# CTE chain (no WITH / no final select) ending in the per-doc
# `bm25 (doc_id, score_ppm, n_terms, dl)` relation — shared with the
# RRF fusion in pipeline_ext10.
_BM25_SCORED_CTE = f"""
    docs AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\\s+'),
                         w -> w <> '') AS ws
      FROM documents
    ),
    dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM docs),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS total_tokens
      FROM dl
    ),
    tf AS (
      SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(ws) AS word FROM docs)
      WHERE word IN {_BM25_TERMS!r}
      GROUP BY doc_id, word
    ),
    df AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY word),
    scored AS (
      SELECT t.doc_id,
             CAST(FLOOR((CAST((2*s.n_docs - 2*f.df + 1) * 22 * t.tf * s.total_tokens AS DOUBLE)
                         / CAST((2*f.df + 1) * (10*t.tf*s.total_tokens + 3*s.total_tokens
                                                + 9*d.dl*s.n_docs) AS DOUBLE))
                        * 1000000) AS BIGINT) AS term_ppm
      FROM tf t
      JOIN df f USING (word)
      JOIN dl d USING (doc_id)
      CROSS JOIN stats s
    ),
    bm25 AS (
      SELECT s.doc_id,
             CAST(SUM(s.term_ppm) AS BIGINT) AS score_ppm,
             CAST(COUNT(*) AS BIGINT) AS n_terms,
             MIN(d.dl) AS dl
      FROM scored s JOIN dl d USING (doc_id)
      GROUP BY s.doc_id
    )"""

_BM25_ORACLE = (
    "WITH "
    + _BM25_SCORED_CTE
    + f"""
    SELECT doc_id, score_ppm, n_terms, dl
    FROM bm25
    ORDER BY score_ppm DESC, doc_id
    LIMIT {_BM25_TOPK}
    """
)


@register("bm25_topk_retrieval", tier="D", oracle=_BM25_ORACLE)
def bm25_topk_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E128: BM25 ranked retrieval — the lexical-search baseline
    (Robertson/Sparck Jones probabilistic ranking; k1=1.2, b=0.75)
    that complements the embedding retrieval path (D3/E34): top-10
    documents for a fixed 3-term query, scored per term as
    idf * tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) and summed.

    Exactness: the whole score is one integer ratio — idf's halves
    scale by 2, the length norm by 10*total_tokens, so numerator and
    denominator are exact int64 products (< 2^53 through sf1; the
    documented headroom bound) and per-term ppm is floor((a/b)*1e6)
    — two IEEE ops on identical operands.  Per-doc totals then SUM
    INTEGERS, immune to partial-agg order.

    Scale shape: tokens filter to the 3 query terms MAP-SIDE before
    the tf groupBy (the explode carries query-term hits only, not the
    corpus); df is a 3-row broadcast; doc length is size(split) with
    no explode; corpus-level N/total is a 1-row broadcast; top-10 is
    TakeOrdered (per-partition heaps).  At 100 TB this is the
    classic inverted-index score-join: work ∝ postings of the query
    terms, never ∝ corpus."""
    return (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.desc("score_ppm"), "doc_id")
        .limit(_BM25_TOPK)
    )


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc BM25 scores (doc_id, score_ppm, n_terms, dl) for the
    fixed query, un-truncated — the relation the `bm25` oracle CTE
    mirrors; shared with pipeline_ext10's RRF fusion."""
    # One narrow per-doc projection: doc length + query-term hits —
    # both downstream passes read THIS frame, so the corpus text is
    # split at most twice (stats prunes to dl; the postings pass
    # reads dl + hits) instead of 4x (r15; was dl, stats, tf and a
    # dl-join, each re-splitting the corpus).
    terms = F.array(*[F.lit(t) for t in _BM25_TERMS])
    docs = (
        io.table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "").alias("ws"),
        )
        .select(
            "doc_id",
            F.size("ws").cast("long").alias("dl"),
            F.filter("ws", lambda w: F.array_contains(terms, w)).alias("hits"),
        )
    )
    stats = docs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tokens"),
    )
    # dl rides the postings aggregation (min over a constant-per-doc
    # column) — the old doc-count-sized dl JOIN disappears.
    tf = (
        docs.select("doc_id", "dl", F.explode("hits").alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").cast("long").alias("tf"), F.min("dl").alias("dl"))
    )
    df = tf.groupBy("word").agg(F.count("*").cast("long").alias("df"))
    a = (
        (2 * F.col("n_docs") - 2 * F.col("df") + 1)
        * 22
        * F.col("tf")
        * F.col("total_tokens")
    )
    b = (2 * F.col("df") + 1) * (
        10 * F.col("tf") * F.col("total_tokens")
        + 3 * F.col("total_tokens")
        + 9 * F.col("dl") * F.col("n_docs")
    )
    scored = (
        tf.join(F.broadcast(df), "word")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "dl",
            F.floor((a.cast("double") / b.cast("double")) * 1000000)
            .cast("long")
            .alias("term_ppm"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("term_ppm").cast("long").alias("score_ppm"),
        F.count("*").cast("long").alias("n_terms"),
        F.min("dl").alias("dl"),
    )


# ---------------------------------------------------------------------------
# E129: bucket-pruned 2D Pareto skyline
# ---------------------------------------------------------------------------

_SKY_BUCKETS = 16


@register(
    "pareto_skyline_customers",
    tier="D",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS rev_cents,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY o_custkey
    )
    SELECT p.o_custkey,
           (CAST(p.rev_cents AS DOUBLE) / 100.0) AS revenue,
           p.n_orders
    FROM cust p
    WHERE NOT EXISTS (
      SELECT 1 FROM cust q
      WHERE q.rev_cents >= p.rev_cents AND q.n_orders >= p.n_orders
        AND (q.rev_cents > p.rev_cents OR q.n_orders > p.n_orders)
    )
    """,
)
def pareto_skyline_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E129: 2D Pareto skyline (maximize revenue AND order count) —
    the multi-objective frontier query: customers not dominated by
    any other on (total revenue, number of orders).  Revenue
    accumulates as exact cents (aggregates.dec_sum discipline), so
    dominance is pure int64 comparison.

    Scale shape — neither the n² self-join nor an O(n) global sort:
    (1) one stats pass takes 15 exact revenue quantiles (a 15-scalar
    driver collect, metadata-bounded like E117's boundaries); (2)
    bucket assignment is map-side bit math; (3) per-bucket max order
    counts (16 rows, driver-collected) give each bucket the max over
    all STRICTLY-higher-revenue buckets — any point at or below that
    threshold is provably dominated (every point in a higher bucket
    has strictly greater revenue by the boundary construction), and
    the dominator chain always terminates at a surviving point, so
    pruning is exact; (4) the precise frontier check (strict-greater
    running max via an integer RANGE frame) runs over SURVIVORS only
    — frontier-sized, the documented bound for its unpartitioned
    window.  The same plan survives 100× data: stats swap to
    approx_percentile (pruning stays sound for ANY boundaries) and
    survivors stay ~frontier-sized."""
    cust = (
        io.table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "rev_cents"
            ),
            F.count("*").cast("long").alias("n_orders"),
        )
    )
    fr = [k / _SKY_BUCKETS for k in range(1, _SKY_BUCKETS)]
    bounds = cust.agg(
        F.percentile("rev_cents", F.lit(fr)).alias("bp")
    ).head()[0]  # 15 scalars — metadata-bounded driver collect
    barr = S.lit_double_array(bounds)
    bucketed = cust.withColumn(
        "bucket", F.size(F.filter(barr, lambda b: b < F.col("rev_cents")))
    )
    bmax = {
        r["bucket"]: r["m"]
        for r in bucketed.groupBy("bucket")
        .agg(F.max("n_orders").alias("m"))
        .collect()  # <= 16 rows — metadata-bounded driver collect
    }
    # threshold[i] = max n_orders over buckets strictly above i
    thr, run = {}, -1
    for i in range(_SKY_BUCKETS - 1, -1, -1):
        thr[i] = run
        run = max(run, bmax.get(i, -1))
    thr_expr = F.coalesce(
        *[
            F.when(F.col("bucket") == i, F.lit(t))
            for i, t in thr.items()
        ]
    )
    survivors = bucketed.filter(F.col("n_orders") > thr_expr)
    # exact frontier over survivors: drop within-revenue non-maxima,
    # then require n_orders to beat every strictly-higher revenue
    wg = Window.partitionBy("rev_cents")
    ws = (
        Window.orderBy(F.desc("rev_cents"))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    return (
        survivors.withColumn("grpmax", F.max("n_orders").over(wg))
        .filter(F.col("n_orders") == F.col("grpmax"))
        .withColumn("strictmax", F.max("n_orders").over(ws))
        .filter(
            F.col("strictmax").isNull()
            | (F.col("n_orders") > F.col("strictmax"))
        )
        .select(
            "o_custkey",
            (F.col("rev_cents").cast("double") / 100.0).alias("revenue"),
            "n_orders",
        )
    )


# ---------------------------------------------------------------------------
# E130: decision-tree split finder (exact integer Gini)
# ---------------------------------------------------------------------------


@register(
    "tree_split_gini_quantity",
    tier="D",
    oracle="""
    WITH byv AS (
      SELECT CAST(l_quantity AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS n_v,
             CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS a_v,
             CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n2_v,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS r_v
      FROM lineitem GROUP BY 1
    ),
    cum AS (
      SELECT v,
             SUM(n_v)  OVER (ORDER BY v) AS nl,
             SUM(a_v)  OVER (ORDER BY v) AS ca,
             SUM(n2_v) OVER (ORDER BY v) AS cn,
             SUM(r_v)  OVER (ORDER BY v) AS cr,
             SUM(n_v)  OVER () AS n,
             SUM(a_v)  OVER () AS ta,
             SUM(n2_v) OVER () AS tn,
             SUM(r_v)  OVER () AS tr
      FROM byv
    ),
    g AS (
      SELECT v AS split_value,
             CAST(nl AS BIGINT) AS n_left,
             CAST(n - nl AS BIGINT) AS n_right,
             CAST(FLOOR((CAST((nl*nl - ca*ca - cn*cn - cr*cr) * (n - nl)
                              + ((n-nl)*(n-nl) - (ta-ca)*(ta-ca)
                                 - (tn-cn)*(tn-cn) - (tr-cr)*(tr-cr)) * nl
                              AS DOUBLE)
                         / CAST(n * nl * (n - nl) AS DOUBLE))
                        * 1000000) AS BIGINT) AS gini_ppm
      FROM cum WHERE n - nl > 0
    )
    SELECT split_value, n_left, n_right, gini_ppm,
           CAST(ROW_NUMBER() OVER (ORDER BY gini_ppm, split_value) AS BIGINT) AS rk
    FROM g
    """,
)
def tree_split_gini_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E130: exact decision-tree split search — for the candidate
    splits "l_quantity <= v" predicting l_returnflag, the weighted
    Gini impurity of every split and its rank (rk=1 is the split a
    tree learner takes).  The CART/feature-prep kernel, as one
    declarative pass.

    Exactness: impurity stays rational until output —
    weighted = [(nl² - Σcl²)·nr + (nr² - Σcr²)·nl] / (n·nl·nr),
    every operand an exact int64 (the cross-multiplied form; ~2¹⁷ at
    sf0.1 with int64 headroom through sf1, decimal128 beyond — the
    documented bound), floored to ppm through the two-IEEE-op gate.

    Scale shape: one groupBy collapses the fact table to ≤50
    (value, class-count) rows — the only corpus-sized work; the
    cumulative/ranking windows then run on that METADATA-sized
    grid (the E62 histogram allowance; at finer-grained features the
    grid is the E117 quantile sketch, same downstream plan)."""
    li = io.table(spark, sf_dir, "lineitem")
    byv = (
        li.groupBy(F.col("l_quantity").cast("long").alias("v"))
        .agg(
            F.count("*").cast("long").alias("n_v"),
            F.sum(F.when(F.col("l_returnflag") == "A", 1).otherwise(0))
            .cast("long")
            .alias("a_v"),
            F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0))
            .cast("long")
            .alias("n2_v"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("r_v"),
        )
    )
    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = byv.select(
        "v",
        F.sum("n_v").over(wcum).alias("nl"),
        F.sum("a_v").over(wcum).alias("ca"),
        F.sum("n2_v").over(wcum).alias("cn"),
        F.sum("r_v").over(wcum).alias("cr"),
        F.sum("n_v").over(wall).alias("n"),
        F.sum("a_v").over(wall).alias("ta"),
        F.sum("n2_v").over(wall).alias("tn"),
        F.sum("r_v").over(wall).alias("tr"),
    )
    nl, n = F.col("nl"), F.col("n")
    # The numerator is CUBIC in row count (nl² terms × nr) — long
    # arithmetic overflows past ~2M rows (caught by the r12 sf1 smoke
    # probe: ANSI fail-stop at sf1's 6M lineitem).  DuckDB's windowed
    # SUM promotes to HUGEINT (int128), so the oracle already computes
    # wide; decimal(38,0) gives the engine the same exact headroom to
    # ~10¹² rows, converting to double only at the final ratio exactly
    # as before (values identical at any non-overflowing size).
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    nl_d, n_d = dec(nl), dec(n)
    nr_d = n_d - nl_d
    nr = n - nl
    ca, cn, cr = dec(F.col("ca")), dec(F.col("cn")), dec(F.col("cr"))
    left_num = nl_d * nl_d - ca * ca - cn * cn - cr * cr
    ra = dec(F.col("ta")) - ca
    rn = dec(F.col("tn")) - cn
    rr = dec(F.col("tr")) - cr
    right_num = nr_d * nr_d - ra * ra - rn * rn - rr * rr
    g = (
        cum.filter(nr > 0)
        .select(
            F.col("v").alias("split_value"),
            nl.alias("n_left"),
            nr.alias("n_right"),
            F.floor(
                (
                    (left_num * nr_d + right_num * nl_d).cast("double")
                    / (n_d * nl_d * nr_d).cast("double")
                )
                * 1000000
            )
            .cast("long")
            .alias("gini_ppm"),
        )
    )
    wrk = Window.orderBy("gini_ppm", "split_value")
    return g.withColumn("rk", F.row_number().over(wrk).cast("long"))


# ---------------------------------------------------------------------------
# E131-E133: daily event-series anomaly detectors
# ---------------------------------------------------------------------------

# Shared oracle CTE: daily event counts per type (ts is naive in both
# engines by the io.py NTZ contract).
_DAILY_CTE = """
    daily AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
    ).agg(F.count("*").cast("long").alias("n"))


_BOLL_W = 7


@register(
    "bollinger_breakout_days",
    tier="D",
    oracle="WITH "
    + _DAILY_CTE
    + f""",
    roll AS (
      SELECT event_type, day, n,
             SUM(n)   OVER w AS s,
             SUM(n*n) OVER w AS q,
             COUNT(*) OVER w AS cnt
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN {_BOLL_W - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, day, n,
           CAST({_BOLL_W} * n - s AS BIGINT) AS dev_scaled,
           CAST({_BOLL_W} * q - s * s AS BIGINT) AS var_scaled,
           (({_BOLL_W}*n - s) * ({_BOLL_W}*n - s)
              > 4 * ({_BOLL_W}*q - s*s)) AS is_breakout
    FROM roll WHERE cnt = {_BOLL_W}
    """,
)
def bollinger_breakout_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E131: Bollinger-band breakout detection — days whose event
    count leaves the trailing-7-day mean ± 2σ band, per event type:
    the volatility-scaled alerting rule (the "is today's commit rate
    abnormal *for this table's recent regime*" upgrade of E45's
    fixed-threshold anomaly).

    Exactness: the band test |x - μ| > 2σ is cross-multiplied into
    pure int64 — (w·x - S)² > 4·(w·Q - S²) with S = Σx, Q = Σx² over
    the window — no float ever forms, so the boolean is engine-exact
    by construction (and the scaled deviation/variance diagnostics
    ship as integers).

    Scale shape: one groupBy collapses events to (type, day) rows;
    the rolling window is partitioned per type over day-counted rows
    — bounded state, the streaming-ready shape (C41's sliding window
    computes the same S/Q incrementally)."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(_BOLL_W - 1), 0)
    )
    roll = _daily(spark, sf_dir).select(
        "event_type",
        "day",
        "n",
        F.sum("n").over(w).alias("s"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("q"),
        F.count("*").over(w).alias("cnt"),
    )
    dev = _BOLL_W * F.col("n") - F.col("s")
    var = _BOLL_W * F.col("q") - F.col("s") * F.col("s")
    return roll.filter(F.col("cnt") == _BOLL_W).select(
        "event_type",
        "day",
        "n",
        dev.cast("long").alias("dev_scaled"),
        var.cast("long").alias("var_scaled"),
        (dev * dev > 4 * var).alias("is_breakout"),
    )


@register(
    "cusum_changepoint_daily",
    tier="D",
    oracle="WITH "
    + _DAILY_CTE
    + """,
    pre AS (
      SELECT event_type, day, n,
             CAST(ROW_NUMBER() OVER pw AS BIGINT) AS t,
             SUM(n) OVER (PARTITION BY event_type ORDER BY day) AS prefix,
             COUNT(*) OVER (PARTITION BY event_type) AS n_days,
             SUM(n) OVER (PARTITION BY event_type) AS total
      FROM daily
      WINDOW pw AS (PARTITION BY event_type ORDER BY day)
    ),
    dev AS (
      SELECT event_type, day, n_days, total,
             abs(n_days * prefix - t * total) AS abs_dev,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY abs(n_days * prefix - t * total) DESC,
                                         day) AS rk
      FROM pre
    )
    SELECT event_type, day AS change_day,
           CAST(abs_dev AS BIGINT) AS abs_dev_scaled,
           CAST(n_days AS BIGINT) AS n_days,
           CAST(total AS BIGINT) AS total
    FROM dev WHERE rk = 1
    """,
)
def cusum_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E132: CUSUM change-point location — per event type, the day
    where the cumulative deviation from the series mean peaks: the
    single most likely level-shift point (the offline CUSUM
    statistic; E45 flags outlier DAYS, this locates the REGIME
    change).

    Exactness: the statistic is n-scaled to stay integral —
    n_days·prefix_t − t·total is the CUSUM value times n_days, an
    exact int64 (counts ~1e6·days ~1e3 → ~1e9·n_days headroom);
    argmax ties break on earliest day, a total order.

    Scale shape: the series collapses to (type, day) metadata before
    any window; both windows share one per-type partitioning — the
    per-key-bounded shape (days per type is bounded by retention).
    """
    pw = Window.partitionBy("event_type").orderBy("day")
    pall = Window.partitionBy("event_type")
    pre = _daily(spark, sf_dir).select(
        "event_type",
        "day",
        F.row_number().over(pw).cast("long").alias("t"),
        F.sum("n").over(pw.rowsBetween(Window.unboundedPreceding, 0)).alias("prefix"),
        F.count("*").over(pall).alias("n_days"),
        F.sum("n").over(pall).alias("total"),
    )
    absdev = F.abs(
        F.col("n_days") * F.col("prefix") - F.col("t") * F.col("total")
    )
    wrk = Window.partitionBy("event_type").orderBy(F.desc(absdev), "day")
    return (
        pre.withColumn("abs_dev_scaled", absdev.cast("long"))
        .withColumn("rk", F.row_number().over(wrk))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("day").alias("change_day"),
            "abs_dev_scaled",
            F.col("n_days").cast("long").alias("n_days"),
            F.col("total").cast("long").alias("total"),
        )
    )


_EWMA_H = 16  # dyadic horizon: weights 2^0 .. 2^15, alpha = 1/2


@register(
    "ewma_daily_smoothing",
    tier="D",
    oracle="WITH "
    + _DAILY_CTE
    + f""",
    wl AS (
      SELECT event_type, day, n,
             list(n) OVER (PARTITION BY event_type ORDER BY day
                           ROWS BETWEEN {_EWMA_H - 1} PRECEDING AND CURRENT ROW)
               AS lst
      FROM daily
    ),
    h AS (
      SELECT event_type, day, n,
             CAST(len(lst) AS BIGINT) AS wlen,
             list_reduce(list_reverse(lst), (acc, x) -> acc * 2 + x) AS num
      FROM wl
    )
    SELECT event_type, day, n, wlen,
           CAST(FLOOR((CAST(num AS DOUBLE)
                       / CAST((CAST(1 AS BIGINT) << wlen) - 1 AS DOUBLE))
                      * 1000000) AS BIGINT) AS ewma_ppm
    FROM h
    """,
)
def ewma_daily_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E133: exponentially weighted moving average with dyadic decay
    — per event type, the 16-day half-life-1-day smoothed daily rate
    (α = 1/2): the denoised series trend monitors alert on.  EWMA's
    recursion is the one classic window op Spark's frame algebra
    can't express directly; with α = 1/2 every weight is a power of
    two, so the weighted sum is a HORNER FOLD over the window values
    — fold(reverse(window), 0, acc·2 + x) = Σ xᵢ·2^(i-1) — an exact
    integer in both engines, normalized by the exact weight total
    2^L − 1.

    Exactness: collect_list over a rows-frame window yields frame
    order in both engines (locked by this query's oracle equality);
    numerator ≤ max_count·2^16 int64; the ppm output crosses IEEE
    through the standard two-op gate.

    Scale shape: the fold runs over ≤16 values of METADATA (daily
    counts) per row — the series is already collapsed to (type, day)
    grain; state is bounded exactly like E131's rolling window."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(_EWMA_H - 1), 0)
    )
    wl = _daily(spark, sf_dir).select(
        "event_type", "day", "n", F.collect_list("n").over(w).alias("lst")
    )
    h = wl.select(
        "event_type",
        "day",
        "n",
        F.size("lst").cast("long").alias("wlen"),
        F.aggregate(
            F.reverse("lst"),
            F.lit(0).cast("long"),
            lambda acc, x: acc * 2 + x,
        ).alias("num"),
    )
    den = F.expr("shiftleft(cast(1 as bigint), cast(wlen as int)) - 1")
    return h.select(
        "event_type",
        "day",
        "n",
        "wlen",
        F.floor((F.col("num").cast("double") / den.cast("double")) * 1000000)
        .cast("long")
        .alias("ewma_ppm"),
    )
