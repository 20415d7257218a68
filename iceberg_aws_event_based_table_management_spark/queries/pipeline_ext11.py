"""Tier D (part 12) — label-quality auditing, classifier evaluation,
survival analysis, and hierarchical shares (SURVEY.md §2-E E146-E150).

Eleventh batch: kNN label-noise consensus (confident-learning-lite —
for every embedding, do its 5 nearest neighbors agree with its
label?), exact ROC-AUC of the E69 hashed-feature classifier against
the integer heuristic gate (AUC = the Mann-Whitney statistic, so
E136's value-grid trick computes it exactly — no sampled
approximation), a Kaplan-Meier repurchase-survival curve with right
censoring (the product-limit estimator, computed EXACTLY as an
integer Horner-style fold over packed (deaths, at-risk) steps — the
same windowed-fold device as E133), two-level ratio-to-parent revenue
shares (nation within region within total, in exact cents and ppm),
and a calibration reliability diagram (decile bins of predicted score
vs realized positive rate — the companion eval shape to E126's
confusion matrix and E147's AUC).

Float discipline: as pipeline_ext8-10 — scores and shares are
integer ppm; survival probabilities are stepwise-floored integer ppm
(the DEFINED semantics both engines implement identically via the
same fold); money in cents.

All built-in-function formulations except the kNN scoring (which
reuses operators/similarity.knn_join's Arrow GEMM — the D3/E12
pattern); every query carries an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import io
from ..operators import similarity as S
from ..registry import register
from .similarity import _DUCK_COS

# ---------------------------------------------------------------------------
# E146: kNN label-noise consensus
# ---------------------------------------------------------------------------

_NOISE_K = 5


@register(
    "label_noise_knn_consensus",
    tier="D",
    oracle=f"""
    WITH scored AS (
      SELECT a.vec_id AS q_id, a.label AS own_label,
             b.vec_id AS n_id, b.label AS n_label,
             ROUND({_DUCK_COS.format(a="b.embedding", b="a.embedding")}, 6)
               AS cosine_sim
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY cosine_sim DESC, n_id) AS rk
      FROM scored
    ),
    top AS (SELECT * FROM ranked WHERE rk <= {_NOISE_K}),
    counts AS (
      SELECT q_id, own_label, n_label, COUNT(*) AS cnt
      FROM top GROUP BY q_id, own_label, n_label
    ),
    major AS (
      SELECT q_id, own_label, n_label AS majority_label,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY cnt DESC, n_label) AS mr
      FROM counts
    ),
    agree AS (
      SELECT q_id, CAST(COALESCE(MAX(CASE WHEN n_label = own_label
                                          THEN cnt END), 0) AS BIGINT) AS n_agree
      FROM counts GROUP BY q_id
    )
    SELECT m.q_id AS vec_id, m.own_label AS label,
           a.n_agree, m.majority_label,
           (a.n_agree <= 1) AS is_suspect
    FROM major m JOIN agree a USING (q_id)
    WHERE m.mr = 1
    """,
)
def label_noise_knn_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E146: kNN label-noise detection — for every embedding, how many
    of its 5 nearest (cosine) neighbors share its label, the
    neighborhood's majority label, and a suspect flag when ≤1 agrees:
    the confident-learning-style audit that catches mislabeled
    training examples before they poison a classifier (the label-
    quality sibling of E33's centroid outliers — that flags
    GEOMETRIC strays, this flags LABEL strays).

    Correctness device: knn_join's top-(k+1) including self, minus
    self, re-ranked, equals the top-k among non-self rows whether or
    not self made the list — so the oracle ranks non-self directly.

    Scale shape: neighbor search is operators/similarity.knn_join
    (broadcast query matrix + per-batch float64 GEMM, local top-k
    before the one narrow shuffle — the E12 path with its enforced
    broadcast cap); consensus is a (q, label) groupBy over 5·n rows
    with a per-q window."""
    emb = io.table(spark, sf_dir, "embeddings")
    nb = (
        S.knn_join(emb, emb, k=_NOISE_K + 1)
        .filter(F.col("n_id") != F.col("q_id"))
        .withColumn(
            "rk2",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(
                    F.desc("cosine_sim"), "n_id"
                )
            ),
        )
        .filter(F.col("rk2") <= _NOISE_K)
        .select("q_id", "n_id")
    )
    labels = emb.select("vec_id", "label")
    nbl = nb.join(
        labels.select(
            F.col("vec_id").alias("n_id"), F.col("label").alias("n_label")
        ),
        "n_id",
    ).join(
        labels.select(
            F.col("vec_id").alias("q_id"), F.col("label").alias("own_label")
        ),
        "q_id",
    )
    counts = nbl.groupBy("q_id", "own_label", "n_label").agg(
        F.count("*").alias("cnt")
    )
    wmaj = Window.partitionBy("q_id").orderBy(F.desc("cnt"), "n_label")
    major = (
        counts.withColumn("mr", F.row_number().over(wmaj))
        .filter(F.col("mr") == 1)
        .select(
            "q_id", "own_label", F.col("n_label").alias("majority_label")
        )
    )
    agree = counts.groupBy("q_id").agg(
        F.coalesce(
            F.max(
                F.when(F.col("n_label") == F.col("own_label"), F.col("cnt"))
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("n_agree")
    )
    return major.join(agree, "q_id").select(
        F.col("q_id").alias("vec_id"),
        F.col("own_label").alias("label"),
        "n_agree",
        "majority_label",
        (F.col("n_agree") <= 1).alias("is_suspect"),
    )


# ---------------------------------------------------------------------------
# E147/E150 shared: classifier score ppm + integer gate label
# ---------------------------------------------------------------------------

# Per-doc classifier ppm score (E69's hashed-feature model; see
# text.text_quality_classifier) and the pure-integer heuristic label
# (n_tokens >= 50 AND has a stopword) — the CTE chain both eval
# queries build on (no WITH / no final select).
_CLF_HASH_SQL = (
    "CAST(list_reduce(string_split('0' || substr(md5({w}), 1, 15), ''), "
    "(acc, c) -> CAST(acc AS BIGINT) * 16 "
    "+ strpos('0123456789abcdef', c) - 1) AS BIGINT)"
)
_EVAL_STOP_SQL = (
    "'the', 'a', 'of', 'and', 'to', 'in', 'is', 'on', 'for', 'with'"
)
_CLF_EVAL_CTE = rf"""
    toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         w -> w <> '') AS ws
      FROM documents
    ),
    ev AS (
      SELECT doc_id,
             CAST(FLOOR((CAST(list_sum(list_transform(ws,
                    w -> ({_CLF_HASH_SQL.format(w="w")} % 4096)
                         * 48271 % 65537 - 32768)) AS DOUBLE)
                  / (32768.0 * len(ws))) * 1000000) AS BIGINT) AS score_ppm,
             (len(ws) >= 50 AND
              len(list_filter(ws, w -> w IN ({_EVAL_STOP_SQL}))) >= 1)
               AS is_pos
      FROM toks
    )"""


def _clf_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score_ppm, is_pos) — Spark mirror of the `ev` CTE."""
    from ..operators.text import STOPWORDS

    docs = io.table(spark, sf_dir, "documents").select("doc_id", "text")
    ws = F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")

    def _weight(w):
        b = (
            F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long") % 4096
        )
        return b * 48271 % 65537 - 32768

    raw = F.aggregate(ws, F.lit(0).cast("long"), lambda acc, w: acc + _weight(w))
    n = F.size(ws).cast("long")
    has_stop = (
        F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS))) >= 1
    )
    return docs.select(
        "doc_id",
        F.floor((raw.cast("double") / (32768.0 * n)) * 1000000)
        .cast("long")
        .alias("score_ppm"),
        ((n >= 50) & has_stop).alias("is_pos"),
    )


@register(
    "classifier_auc_exact",
    tier="D",
    oracle="WITH "
    + _CLF_EVAL_CTE
    + """,
    grid AS (
      SELECT score_ppm AS v,
             CAST(SUM(CASE WHEN is_pos THEN 1 ELSE 0 END) AS BIGINT) AS pv,
             CAST(SUM(CASE WHEN is_pos THEN 0 ELSE 1 END) AS BIGINT) AS nv
      FROM ev GROUP BY 1
    ),
    cum AS (
      SELECT v, pv, nv,
             COALESCE(SUM(nv) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nv_lt
      FROM grid
    ),
    u AS (
      SELECT CAST(SUM(pv) AS BIGINT) AS n_pos,
             CAST(SUM(nv) AS BIGINT) AS n_neg,
             CAST(SUM(pv * (2 * nv_lt + nv)) AS BIGINT) AS u2
      FROM cum
    )
    SELECT n_pos, n_neg, u2,
           CAST(FLOOR((CAST(u2 AS DOUBLE)
                       / CAST(2 * n_pos * n_neg AS DOUBLE)) * 1000000)
                AS BIGINT) AS auc_ppm,
           CAST(FLOOR((CAST(u2 - n_pos * n_neg AS DOUBLE)
                       / CAST(n_pos * n_neg AS DOUBLE)) * 1000000)
                AS BIGINT) AS gini_ppm
    FROM u
    """,
)
def classifier_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E147: exact ROC-AUC of the E69 hashed-feature classifier
    against the integer heuristic gate (n_tokens ≥ 50 AND has a
    stopword).  AUC = P(score_pos > score_neg) + ½P(tie) — the
    Mann-Whitney statistic — so E136's value-grid identity computes
    it EXACTLY: 2·AUC·n₊·n₋ = Σ_v p_v·(2·cum_n< + n_v) over the ppm
    score grid.  No sampling, no trapezoid approximation; Gini
    (= 2·AUC − 1) ships alongside.  With E126 (confusion matrix) and
    E150 (calibration) this completes the in-engine classifier-eval
    suite.

    Scale shape: scoring is E69's zero-shuffle map-side fold; the
    grid is bounded by the ppm range (≤ 2·10⁶ keys REGARDLESS of
    corpus size — a true metadata grid); one cumulative window and a
    1-row reduction on it."""
    evd = _clf_eval(spark, sf_dir)
    grid = evd.groupBy(F.col("score_ppm").alias("v")).agg(
        F.sum(F.when(F.col("is_pos"), 1).otherwise(0)).cast("long").alias("pv"),
        F.sum(F.when(F.col("is_pos"), 0).otherwise(1)).cast("long").alias("nv"),
    )
    wlt = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = grid.select(
        "pv",
        "nv",
        F.coalesce(F.sum("nv").over(wlt), F.lit(0)).alias("nv_lt"),
    )
    u = cum.agg(
        F.sum("pv").cast("long").alias("n_pos"),
        F.sum("nv").cast("long").alias("n_neg"),
        F.sum(F.col("pv") * (2 * F.col("nv_lt") + F.col("nv")))
        .cast("long")
        .alias("u2"),
    )
    return u.select(
        "n_pos",
        "n_neg",
        "u2",
        F.floor(
            (
                F.col("u2").cast("double")
                / (2 * F.col("n_pos") * F.col("n_neg")).cast("double")
            )
            * 1000000
        )
        .cast("long")
        .alias("auc_ppm"),
        F.floor(
            (
                (F.col("u2") - F.col("n_pos") * F.col("n_neg")).cast("double")
                / (F.col("n_pos") * F.col("n_neg")).cast("double")
            )
            * 1000000
        )
        .cast("long")
        .alias("gini_ppm"),
    )


# ---------------------------------------------------------------------------
# E148: Kaplan-Meier repurchase survival
# ---------------------------------------------------------------------------

# (deaths, at-risk) packed into one int64: x = d * 2^20 + n; valid
# while the at-risk population < 2^20 (~1M users) — widen the shift
# at larger scale (documented).
_KM_SHIFT = 20
_KM_MASK = (1 << _KM_SHIFT) - 1


@register(
    "survival_km_repurchase",
    tier="D",
    oracle=f"""
    WITH p AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events WHERE event_type = 'purchase'
    ),
    horizon AS (
      SELECT MAX(CAST(date_trunc('day', ts) AS DATE)) AS dmax FROM events
    ),
    obs AS (
      SELECT f.user_id,
             CASE WHEN s.day IS NULL THEN (h.dmax - f.day)
                  ELSE (s.day - f.day) END AS t,
             (s.day IS NOT NULL) AS event
      FROM (SELECT user_id, day FROM p WHERE rn = 1) f
      LEFT JOIN (SELECT user_id, day FROM p WHERE rn = 2) s USING (user_id)
      CROSS JOIN horizon h
    ),
    grid AS (
      SELECT t,
             CAST(COUNT(*) AS BIGINT) AS c_all,
             CAST(SUM(CASE WHEN event THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM obs GROUP BY t
    ),
    risk AS (
      SELECT t, d,
             CAST(SUM(c_all) OVER (ORDER BY t DESC) AS BIGINT) AS n_risk
      FROM grid
    ),
    ev AS (SELECT t, d, n_risk FROM risk WHERE d > 0),
    folded AS (
      SELECT t, d, n_risk,
             list_reduce(
               list_prepend(CAST(1000000 AS BIGINT),
                 list(d * {1 << _KM_SHIFT} + n_risk)
                   OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)),
               (acc, x) -> CAST(FLOOR(CAST(acc * ((x & {_KM_MASK})
                                            - (x >> {_KM_SHIFT})) AS DOUBLE)
                                      / CAST(x & {_KM_MASK} AS DOUBLE))
                                AS BIGINT)) AS s_ppm
      FROM ev
    )
    SELECT CAST(t AS BIGINT) AS t_days, d AS n_events, n_risk, s_ppm
    FROM folded
    """,
)
def survival_km_repurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E148: Kaplan-Meier repurchase survival — the product-limit
    estimate of "time from first to second purchase", right-censored
    at the corpus horizon for one-purchase users: at each event time
    t, S(t) = Π_{t'≤t} (1 − d_t'/n_t') with n = at-risk (observed
    time ≥ t').  THE retention/churn statistic, with censoring done
    properly (naive 'median gap among repurchasers' is biased — the
    whole reason KM exists).

    Exactness: the product is a stepwise-FLOORED integer fold —
    S_ppm ← ⌊S_ppm·(n−d)/n⌋ — over (d, n) steps packed into single
    int64s (d·2²⁰ + n; at-risk < 2²⁰ documented, widen the shift
    beyond), the E133 windowed-fold device, so both engines produce
    identical ppm curves.

    Scale shape: per-user observation = one window over purchases
    (E44's bound); the grid is distinct event TIMES (days — bounded
    by retention horizon, a true metadata grid); at-risk counts are
    one reverse cumsum; the fold touches ≤|grid| packed ints per
    row."""
    p = (
        io.table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.to_date(F.date_trunc("day", "ts")).alias("day"),
            "ts",
            "event_id",
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
            ),
        )
    )
    # first/second purchase as ONE conditional-agg pivot over rn<=2:
    # the groupBy(user_id) rides the window's (user_id) partitioning —
    # no second scan, no self-join shuffle (r15; was
    # first-LEFT-JOIN-second over two filtered copies of `p`).  d1
    # always exists (rn=1 exists per user); d2 is NULL for
    # one-purchase users — exactly the old left join.
    fs = (
        p.filter(F.col("rn") <= 2)
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("day"))).alias("d1"),
            F.max(F.when(F.col("rn") == 2, F.col("day"))).alias("d2"),
        )
    )
    horizon = (
        io.table(spark, sf_dir, "events")
        .agg(F.max(F.to_date(F.date_trunc("day", "ts"))).alias("dmax"))
    )
    obs = (
        fs.crossJoin(F.broadcast(horizon))
        .select(
            F.when(
                F.col("d2").isNull(), F.datediff("dmax", "d1")
            )
            .otherwise(F.datediff("d2", "d1"))
            .alias("t"),
            F.col("d2").isNotNull().alias("event"),
        )
    )
    grid = obs.groupBy("t").agg(
        F.count("*").cast("long").alias("c_all"),
        F.sum(F.when(F.col("event"), 1).otherwise(0)).cast("long").alias("d"),
    )
    wdesc = Window.orderBy(F.desc("t")).rowsBetween(Window.unboundedPreceding, 0)
    risk = grid.select(
        "t", "d", F.sum("c_all").over(wdesc).cast("long").alias("n_risk")
    ).filter(F.col("d") > 0)
    wfold = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    packed = (F.col("d") * (1 << _KM_SHIFT) + F.col("n_risk")).alias("x")
    folded = risk.withColumn("lst", F.collect_list(packed).over(wfold)).select(
        F.col("t").cast("long").alias("t_days"),
        F.col("d").alias("n_events"),
        "n_risk",
        F.aggregate(
            "lst",
            F.lit(1000000).cast("long"),
            lambda acc, x: F.floor(
                (acc * ((x % (1 << _KM_SHIFT)) - F.shiftright(x, _KM_SHIFT))).cast(
                    "double"
                )
                / (x % (1 << _KM_SHIFT)).cast("double")
            ).cast("long"),
        ).alias("s_ppm"),
    )
    return folded


# ---------------------------------------------------------------------------
# E149: two-level ratio-to-parent revenue shares
# ---------------------------------------------------------------------------


@register(
    "ratio_to_parent_revenue",
    tier="D",
    oracle="""
    WITH nat AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    )
    SELECT region, nation,
           (CAST(cents AS DOUBLE) / 100.0) AS revenue,
           (CAST(SUM(cents) OVER (PARTITION BY region) AS DOUBLE) / 100.0)
             AS region_revenue,
           CAST(FLOOR((CAST(cents AS DOUBLE)
                       / CAST(SUM(cents) OVER (PARTITION BY region) AS DOUBLE))
                      * 1000000) AS BIGINT) AS nation_share_ppm,
           CAST(FLOOR((CAST(SUM(cents) OVER (PARTITION BY region) AS DOUBLE)
                       / CAST(SUM(cents) OVER () AS DOUBLE))
                      * 1000000) AS BIGINT) AS region_share_ppm
    FROM nat
    """,
)
def ratio_to_parent_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E149: ratio-to-parent rollup — nation revenue as a share of its
    region, region as a share of the total, in one pass: the
    hierarchical percent-of-parent report every BI layer renders
    (and the normalization E47's rollup cascade leaves to the
    client).  Shares are ppm floors over exact-cents sums.

    Scale shape: the fact table aggregates once on the (region,
    nation) dimension pair (customer join shuffles on custkey;
    nation/region broadcast); both share windows run on the ≤|nation|
    dimension frame."""
    o = io.table(spark, sf_dir, "orders")
    c = io.table(spark, sf_dir, "customer")
    n = io.table(spark, sf_dir, "nation")
    r = io.table(spark, sf_dir, "region")
    nat = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "cents"
            )
        )
    )
    wreg = Window.partitionBy("region")
    wall = Window.partitionBy()
    reg = F.sum("cents").over(wreg)
    tot = F.sum("cents").over(wall)
    return nat.select(
        "region",
        "nation",
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
        (reg.cast("double") / 100.0).alias("region_revenue"),
        F.floor((F.col("cents").cast("double") / reg.cast("double")) * 1000000)
        .cast("long")
        .alias("nation_share_ppm"),
        F.floor((reg.cast("double") / tot.cast("double")) * 1000000)
        .cast("long")
        .alias("region_share_ppm"),
    )


# ---------------------------------------------------------------------------
# E150: calibration reliability bins
# ---------------------------------------------------------------------------

_CAL_BINS = 10


@register(
    "calibration_reliability_bins",
    tier="D",
    oracle="WITH "
    + _CLF_EVAL_CTE
    + f""",
    binned AS (
      SELECT LEAST(CAST(FLOOR(CAST(score_ppm + 1000000 AS DOUBLE)
                              / {2_000_000 // _CAL_BINS}) AS BIGINT),
                   {_CAL_BINS - 1}) AS bin,
             score_ppm, is_pos
      FROM ev
    )
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN is_pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           CAST(FLOOR(CAST(SUM(score_ppm) AS DOUBLE) / COUNT(*)) AS BIGINT)
             AS mean_score_ppm,
           CAST(FLOOR((CAST(SUM(CASE WHEN is_pos THEN 1 ELSE 0 END) AS DOUBLE)
                       / COUNT(*)) * 1000000) AS BIGINT) AS pos_rate_ppm
    FROM binned GROUP BY bin
    """,
)
def calibration_reliability_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E150: calibration reliability diagram — the E69 classifier's
    score range [−1, 1] cut into 10 equal ppm bins; per bin the count,
    mean predicted score, and realized positive rate against the
    integer gate.  A well-calibrated scorer has pos_rate tracking
    mean_score; the gap is what temperature scaling fixes.  Completes
    the eval trio: E126 confusion (hard labels), E147 AUC (ranking),
    E150 calibration (probabilities).

    Exactness: bin assignment is integer arithmetic on the ppm score;
    bin means are floors over exact integer sums.

    Scale shape: scoring is map-side (E69); one groupBy over ≤10 bin
    keys — the cheapest possible reduction."""
    evd = _clf_eval(spark, sf_dir)
    width = 2_000_000 // _CAL_BINS
    binned = evd.select(
        F.least(
            F.floor((F.col("score_ppm") + 1000000).cast("double") / width),
            F.lit(_CAL_BINS - 1),
        )
        .cast("long")
        .alias("bin"),
        "score_ppm",
        "is_pos",
    )
    return binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("is_pos"), 1).otherwise(0)).cast("long").alias("n_pos"),
        F.floor(F.sum("score_ppm").cast("double") / F.count("*"))
        .cast("long")
        .alias("mean_score_ppm"),
        F.floor(
            (
                F.sum(F.when(F.col("is_pos"), 1).otherwise(0)).cast("double")
                / F.count("*")
            )
            * 1000000
        )
        .cast("long")
        .alias("pos_rate_ppm"),
    )
