"""Tier C/D (part 8) — hamming near-dup, temporal enrichment, IVF-PQ
composition, and revenue concentration (SURVEY.md §2-E E119-E122).

Seventh batch: SimHash near-dup detection at hamming distance ≤ 3 via
block pigeonhole candidates (Manku et al., WWW'07 — the web-scale
near-dup detector; upgrades D2s's equal-fingerprint buckets to the
real tolerance-radius search), a point-in-time SCD2 enrichment join
(purchases attributed to the browsing-state interval they occurred
in — the temporal-join consumer of E93's intervals), an end-to-end
IVF-PQ recall audit (coarse k-means probe + asymmetric-distance PQ
scoring, composing E53's IVF and E103's codes into the full ANN index
read path with an exact-top-k truth), and per-segment revenue
concentration (Gini + top-decile share in integer ppm — the Lorenz
statistics of E85, on money).

All built-in-function formulations (no Python UDFs); every query
carries an exact DuckDB oracle.  Registers LAST (after dedup) so it
may import the shared SimHash fingerprint CTE without perturbing
earlier registration order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import io
from ..operators import dedup as D
from ..operators import similarity as S
from ..registry import register
from .dedup import _SIMHASH_FP_CTE

_HAM_BLOCKS = 4
_HAM_BLOCK_BITS = 15  # 60-bit fingerprint -> 4 x 15-bit blocks
_HAM_MAX_DIST = 3  # pigeonhole: <= 3 flipped bits leave >= 1 block equal


@register(
    "dedup_simhash_hamming",
    tier="D",
    oracle=(
        "WITH "
        + _SIMHASH_FP_CTE
        + f"""
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {_HAM_MAX_DIST}
    """
    ),
)
def dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E119: SimHash near-dups at hamming distance ≤ {d} — the Manku/
    Jain/Sarma (WWW'07) web-crawl dedup algorithm.  D2s buckets only
    EQUAL fingerprints; real near-dups flip a few simhash bits, so
    the production detector searches a hamming BALL.  Candidates by
    pigeonhole: split the 60-bit fingerprint into {k} 15-bit blocks —
    any pair within distance {d} must agree on ≥ 1 whole block — then
    verify popcount(xor) on candidates only.  100% recall by proof
    (the same candidates-by-construction discipline as E116's prefix
    filter), vs scanning all pairs.  The engine-neutral fingerprint
    (operators/dedup.simhash) makes the oracle's brute-force all-pairs
    scan bit-exact.

    Scale shape: fingerprints are one agg (64 bytes/doc state); the
    block index is {k} rows/doc of three longs, equi-joined on
    (block_no, block_value) — candidate counts track true near-dups
    because a shared 15-bit block is a 2^-15 coincidence for random
    docs; verification is map-side xor/popcount.  The oracle's
    all-pairs form exists only as the audit."""
    docs = io.table(spark, sf_dir, "documents").select("doc_id", "text")
    fps = D.simhash(docs, bits=_HAM_BLOCKS * _HAM_BLOCK_BITS).localCheckpoint(
        eager=False
    )
    mask = (1 << _HAM_BLOCK_BITS) - 1
    blocks = fps.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("block_no"),
                        F.shiftright("simhash", j * _HAM_BLOCK_BITS)
                        .bitwiseAND(F.lit(mask))
                        .alias("block_val"),
                    )
                    for j in range(_HAM_BLOCKS)
                ]
            )
        ).alias("blk"),
    ).select("doc_id", "simhash", "blk.block_no", "blk.block_val")
    a, b = blocks.alias("a"), blocks.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.block_no") == F.col("b.block_no"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("long")
    return (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= _HAM_MAX_DIST)
        .select("doc_id_a", "doc_id_b", "hamming")
    )


@register(
    "scd2_point_in_time_join",
    tier="C",
    oracle="""
    WITH states AS (
      SELECT user_id, ts, event_id, event_type FROM events
      WHERE event_type <> 'purchase'
    ),
    marked AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM states
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    seg AS (
      SELECT user_id, ts, event_type,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS segment_no
      FROM marked
    ),
    iv AS (
      SELECT user_id, segment_no, event_type AS state,
             MIN(ts) AS valid_from
      FROM seg GROUP BY 1, 2, 3
    ),
    intervals AS (
      SELECT user_id, state, valid_from,
             lead(valid_from) OVER (PARTITION BY user_id
                                    ORDER BY segment_no) AS valid_to
      FROM iv
    ),
    p AS (
      SELECT user_id, ts, CAST(FLOOR(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    attributed AS (
      SELECT COALESCE(i.state, 'none') AS state, p.cents
      FROM p LEFT JOIN intervals i
        ON p.user_id = i.user_id
       AND p.ts >= i.valid_from
       AND (i.valid_to IS NULL OR p.ts < i.valid_to)
    )
    SELECT state,
           COUNT(*) AS n_purchases,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM attributed GROUP BY state
    """,
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E120: point-in-time (SCD2) enrichment join — each purchase is
    attributed to the browsing-state interval (E93's validity
    intervals, built over the NON-purchase event stream) that contains
    its timestamp: the temporal-join read path every SCD2 table exists
    to serve ('what state was this user in when X happened'), and the
    consumer E93 produces intervals for.  Purchases before a user's
    first observed state land in 'none' (left join, not dropped — the
    audit must account for every purchase).  Interval containment with
    half-open [from, to) bounds and (ts, event_id) ordering makes
    boundary attribution deterministic.

    Scale shape: interval construction is E93's one (user; ts, id)
    exchange over state changes; the enrichment is a user-EQUI join
    with containment as a post-join predicate (per-user interval
    counts are bounded by state changes) — at 100 TB both sides
    bucket on user_id and the intervals side is the small one.  The
    rollup keys on ≤5 states."""
    ev = io.table(spark, sf_dir, "events")
    states = ev.filter(F.col("event_type") != "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = states.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        )
        .otherwise(0)
        .alias("chg"),
    )
    seg = marked.select(
        "user_id", "ts", "event_type", F.sum("chg").over(w).alias("segment_no")
    )
    iv = seg.groupBy("user_id", "segment_no", F.col("event_type").alias("state")).agg(
        F.min("ts").alias("valid_from")
    )
    lw = Window.partitionBy("user_id").orderBy("segment_no")
    intervals = iv.select(
        "user_id",
        "state",
        "valid_from",
        F.lead("valid_from").over(lw).alias("valid_to"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.floor(F.col("value") * 100).cast("long").alias("cents")
    )
    attributed = p.join(
        intervals,
        (p.user_id == intervals.user_id)
        & (p.ts >= intervals.valid_from)
        & (intervals.valid_to.isNull() | (p.ts < intervals.valid_to)),
        "left",
    ).select(F.coalesce("state", F.lit("none")).alias("state"), "cents")
    return attributed.groupBy("state").agg(
        F.count("*").alias("n_purchases"),
        F.sum("cents").cast("long").alias("total_cents"),
    )


_IVF_K = 8
_IVF_NPROBE = 2
_PQ7_K = 4
_PQ7_BLOCKS = 4
_PQ7_SUBDIM = 16
_ANN_TOPK = 20


def _l2_sql(a: str, b: str, lo: int, n: int) -> str:
    return (
        f"CAST(list_sum(list_transform(generate_series(1, {n}),"
        f" j -> ({a}[{lo} + j] - {b}[{lo} + j])"
        f" * ({a}[{lo} + j] - {b}[{lo} + j]))) AS BIGINT)"
    )


@register(
    "ann_ivfpq_recall_audit",
    tier="D",
    oracle=f"""
    WITH x AS (
      SELECT vec_id,
             list_transform(embedding,
               e -> CAST(FLOOR(CAST(e AS DOUBLE) * {float(S.VEC_Q)}) AS BIGINT)) AS xq
      FROM embeddings
    ),
    coarse AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell_id, xq AS cq
      FROM x ORDER BY vec_id LIMIT {_IVF_K}
    ),
    assigned AS (
      SELECT vec_id, cell_id FROM (
        SELECT x.vec_id, c.cell_id,
               ROW_NUMBER() OVER (PARTITION BY x.vec_id
                 ORDER BY {_l2_sql("x.xq", "c.cq", 0, 64)}, c.cell_id) AS rk
        FROM x CROSS JOIN coarse c
      ) WHERE rk = 1
    ),
    q AS (SELECT xq AS qq FROM x WHERE vec_id = 0),
    probed AS (
      SELECT cell_id FROM (
        SELECT c.cell_id,
               ROW_NUMBER() OVER (ORDER BY {_l2_sql("q.qq", "c.cq", 0, 64)},
                                  c.cell_id) AS rk
        FROM coarse c CROSS JOIN q
      ) WHERE rk <= {_IVF_NPROBE}
    ),
    cand AS (
      SELECT a.vec_id FROM assigned a JOIN probed p ON a.cell_id = p.cell_id
    ),
    cb AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code_id, xq AS cq
      FROM x ORDER BY vec_id LIMIT {_PQ7_K}
    ),
    codes AS (
      SELECT vec_id, blk, code_id FROM (
        SELECT x.vec_id, b.blk, c.code_id,
               ROW_NUMBER() OVER (PARTITION BY x.vec_id, b.blk ORDER BY
                 CASE b.blk
                   {" ".join(f"WHEN {b} THEN {_l2_sql('x.xq', 'c.cq', b * _PQ7_SUBDIM, _PQ7_SUBDIM)}" for b in range(_PQ7_BLOCKS))}
                 END, c.code_id) AS rk
        FROM x CROSS JOIN (SELECT unnest(generate_series(0, {_PQ7_BLOCKS - 1})) AS blk) b
        CROSS JOIN cb c
      ) WHERE rk = 1
    ),
    adc AS (
      SELECT b.blk, c.code_id,
             CASE b.blk
               {" ".join(f"WHEN {b} THEN {_l2_sql('q.qq', 'c.cq', b * _PQ7_SUBDIM, _PQ7_SUBDIM)}" for b in range(_PQ7_BLOCKS))}
             END AS d
      FROM cb c CROSS JOIN (SELECT unnest(generate_series(0, {_PQ7_BLOCKS - 1})) AS blk) b
      CROSS JOIN q
    ),
    approx AS (
      SELECT cd.vec_id, CAST(SUM(a.d) AS BIGINT) AS adc_dist
      FROM cand JOIN codes cd ON cand.vec_id = cd.vec_id
      JOIN adc a ON a.blk = cd.blk AND a.code_id = cd.code_id
      GROUP BY cd.vec_id
    ),
    atop AS (
      SELECT vec_id FROM approx ORDER BY adc_dist, vec_id LIMIT {_ANN_TOPK}
    ),
    btop AS (
      SELECT x.vec_id FROM x CROSS JOIN q
      ORDER BY {_l2_sql("x.xq", "q.qq", 0, 64)}, x.vec_id LIMIT {_ANN_TOPK}
    )
    SELECT (SELECT COUNT(*) FROM cand) AS n_candidates,
           (SELECT COUNT(*) FROM atop JOIN btop ON atop.vec_id = btop.vec_id)
             AS n_hits,
           CAST((SELECT COUNT(*) FROM atop JOIN btop
                 ON atop.vec_id = btop.vec_id) AS DOUBLE) / {_ANN_TOPK}
             AS recall_at_20
    """,
)
def ann_ivfpq_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E121: the full IVF-PQ ANN read path, audited — coarse k-means
    probe (E53's deterministic cells, nprobe={np}) narrows to
    candidate cells, then ASYMMETRIC distance computation scores each
    candidate as Σ_blocks L2(query-sub-vector, codebook[its PQ code])
    — a {k}×{blk}-entry lookup table built once per query, never
    touching raw candidate vectors (the point of PQ: the index reads
    codes, not embeddings).  Approx top-{t} vs exact integer-L2
    top-{t} gives recall@{t} — the one-number audit an ANN deployment
    monitors, completing the story E53 (coarse) + E103 (codes) + E68
    (recall audit for plain IVF) build toward.  All arithmetic is
    quantized int64 until the final recall division, so the entire
    chain is oracle-exact.

    Scale shape: coarse centroids and PQ codebook are broadcast
    k-rows; cell assignment and code assignment are min(struct)
    partial aggs (E53/E103's shapes); the ADC table is {k}×{blk}
    rows crossed with the query only; candidate scoring joins codes
    (3 ints/row) to the broadcast ADC — the corpus' float vectors are
    read ONCE at index build, never at query time.  The exact-top-k
    side exists only as the audit."""
    x = io.table(spark, sf_dir, "embeddings").select(
        "vec_id", S.quantize(F.col("embedding")).alias("xq")
    )

    def l2(a: str, b: str, lo: int, n: int) -> F.Column:
        return F.aggregate(
            F.zip_with(
                F.slice(a, lo + 1, n), F.slice(b, lo + 1, n), lambda u, v: (u - v) * (u - v)
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    coarse = (
        x.orderBy("vec_id")
        .limit(_IVF_K)
        .select(
            (F.row_number().over(Window.orderBy("vec_id")) - 1)
            .cast("long")
            .alias("cell_id"),
            F.col("xq").alias("cq"),
        )
    )
    assigned = (
        x.crossJoin(F.broadcast(coarse))
        .select("vec_id", "cell_id", l2("xq", "cq", 0, 64).alias("d"))
        .groupBy("vec_id")
        .agg(F.min(F.struct("d", "cell_id")).alias("m"))
        .select("vec_id", F.col("m.cell_id").alias("cell_id"))
    )
    q = x.filter(F.col("vec_id") == 0).select(F.col("xq").alias("qq"))
    probed = (
        coarse.crossJoin(F.broadcast(q))
        .select("cell_id", l2("cq", "qq", 0, 64).alias("d"))
        .orderBy("d", "cell_id")
        .limit(_IVF_NPROBE)
        .select("cell_id")
    )
    cand = assigned.join(F.broadcast(probed), "cell_id").select("vec_id")
    cb = (
        x.orderBy("vec_id")
        .limit(_PQ7_K)
        .select(
            (F.row_number().over(Window.orderBy("vec_id")) - 1)
            .cast("long")
            .alias("code_id"),
            F.col("xq").alias("cq"),
        )
    )
    codes = (
        x.crossJoin(F.broadcast(cb))
        .select(
            "vec_id",
            "code_id",
            *[
                l2("xq", "cq", b * _PQ7_SUBDIM, _PQ7_SUBDIM).alias(f"d{b}")
                for b in range(_PQ7_BLOCKS)
            ],
        )
        .groupBy("vec_id")
        .agg(
            *[
                F.min(F.struct(F.col(f"d{b}"), F.col("code_id"))).alias(f"m{b}")
                for b in range(_PQ7_BLOCKS)
            ]
        )
        .select(
            "vec_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).cast("long").alias("blk"),
                            F.col(f"m{b}.code_id").alias("code_id"),
                        )
                        for b in range(_PQ7_BLOCKS)
                    ]
                )
            ).alias("bc"),
        )
        .select("vec_id", "bc.blk", "bc.code_id")
    )
    adc = cb.crossJoin(F.broadcast(q)).select(
        "code_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).cast("long").alias("blk"),
                        l2("qq", "cq", b * _PQ7_SUBDIM, _PQ7_SUBDIM).alias("d"),
                    )
                    for b in range(_PQ7_BLOCKS)
                ]
            )
        ).alias("bd"),
    ).select("code_id", "bd.blk", "bd.d")
    approx = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(adc), ["blk", "code_id"])
        .groupBy("vec_id")
        .agg(F.sum("d").cast("long").alias("adc_dist"))
    )
    atop = approx.orderBy("adc_dist", "vec_id").limit(_ANN_TOPK).select("vec_id")
    btop = (
        x.crossJoin(F.broadcast(q))
        .select("vec_id", l2("xq", "qq", 0, 64).alias("d"))
        .orderBy("d", "vec_id")
        .limit(_ANN_TOPK)
        .select("vec_id")
    )
    n_cand = cand.agg(F.count("*").alias("n_candidates"))
    hits = atop.join(btop, "vec_id").agg(F.count("*").alias("n_hits"))
    return n_cand.crossJoin(hits).select(
        "n_candidates",
        "n_hits",
        (F.col("n_hits").cast("double") / _ANN_TOPK).alias("recall_at_20"),
    )


@register(
    "pareto_revenue_concentration",
    tier="D",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ),
    seg AS (
      SELECT c.c_mktsegment AS mktsegment, r.o_custkey, r.cents FROM rev r
      JOIN customer c ON r.o_custkey = c.c_custkey
    ),
    ranked AS (
      SELECT mktsegment, cents,
             ROW_NUMBER() OVER (PARTITION BY mktsegment
                                ORDER BY cents DESC, o_custkey) AS rk_desc,
             ROW_NUMBER() OVER (PARTITION BY mktsegment
                                ORDER BY cents, o_custkey) AS rk_asc,
             COUNT(*) OVER (PARTITION BY mktsegment) AS n,
             SUM(cents) OVER (PARTITION BY mktsegment) AS total
      FROM seg
    )
    SELECT mktsegment,
           CAST(MIN(n) AS BIGINT) AS n_customers,
           CAST(MIN(total) AS BIGINT) AS total_cents,
           CAST(FLOOR(1000000.0
                * SUM(CASE WHEN rk_desc <= CEIL(n / 10.0)
                           THEN cents ELSE 0 END)
                / MIN(total)) AS BIGINT) AS top10_share_ppm,
           ROUND(2.0 * SUM(rk_asc * cents) / (MIN(n) * MIN(total))
                 - (MIN(n) + 1.0) / MIN(n), 6) AS gini
    FROM ranked GROUP BY mktsegment
    """,
)
def pareto_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E122: revenue concentration per market segment — the share of
    lifetime revenue held by the top decile of customers (integer
    ppm) and the Gini coefficient via the rank formula
    G = 2·Σ(i·y_i_asc)/(n·Σy) − (n+1)/n.  E85 measures length
    concentration per source; this is the same Lorenz statistic on
    MONEY — the 'whales' metric that sizes per-customer skew before
    it becomes a hot-key problem (the E76/skew.py family's business
    mirror).  Both statistics reduce to exact int64 sufficient sums
    (Σ i·y fits int64 through sf1 with ~400× headroom); each output
    is one to two IEEE double ops on those sums, identical in both
    engines, ROUND/FLOOR only at the end.

    Scale shape: per-customer rollup is one partial agg; both rank
    windows and the in-partition totals share ONE per-segment
    exchange of (custkey, cents) pairs — aggregate-sized, not
    order-sized; the final rollup keys on 5 segments.  A single
    giant segment still only windows customer-count rows; beyond
    that, Σ i·y decomposes over sorted chunks (prefix-sum partials),
    the documented mergeable form."""
    orders = io.table(spark, sf_dir, "orders")
    cust = io.table(spark, sf_dir, "customer")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    seg = rev.join(
        cust.select(
            F.col("c_custkey").alias("o_custkey"),
            F.col("c_mktsegment").alias("mktsegment"),
        ),
        "o_custkey",
    )
    part = Window.partitionBy("mktsegment")
    ranked = seg.select(
        "mktsegment",
        "cents",
        F.row_number()
        .over(part.orderBy(F.desc("cents"), "o_custkey"))
        .cast("long")
        .alias("rk_desc"),
        F.row_number()
        .over(part.orderBy("cents", "o_custkey"))
        .cast("long")
        .alias("rk_asc"),
        F.count("*").over(part).alias("n"),
        F.sum("cents").over(part).alias("total"),
    )
    top = F.sum(
        F.when(F.col("rk_desc") <= F.ceil(F.col("n") / 10.0), F.col("cents")).otherwise(
            0
        )
    )
    return ranked.groupBy("mktsegment").agg(
        F.min("n").cast("long").alias("n_customers"),
        F.min("total").cast("long").alias("total_cents"),
        F.floor(F.lit(1000000.0) * top / F.min("total")).cast("long").alias(
            "top10_share_ppm"
        ),
        F.round(
            F.lit(2.0)
            * F.sum(F.col("rk_asc") * F.col("cents"))
            / (F.min("n") * F.min("total"))
            - (F.min("n") + F.lit(1.0)) / F.min("n"),
            6,
        ).alias("gini"),
    )
