"""Tier B/C/D (part 8) — hamming near-dup, temporal enrichment,
IVF-PQ composition, concentration, graph census, ranking metrics, and
composite skipping (SURVEY.md §2-E E119-E125).

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
statistics of E85, on money), plus a triangle census with global
clustering coefficient (the third classic graph primitive after E95's
PageRank and E25's components), per-session first-purchase MRR in
integer ppm, and composite-predicate file skipping (the E74/E105/E117
observability trio's conjunction case).

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
from .text import _LANGID_PRED_CTE

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
    block index and self-join run over DISTINCT fingerprints only —
    a real crawl's k-sized clusters of identical/templated docs share
    one fingerprint, so the hot bucket the naive doc-level join pays
    4k² rows for (r5 verdict #2) contributes exactly one index row
    here, the Manku et al. dedup-first discipline.  Block rows are
    three longs equi-joined on (block_no, block_value) — a shared
    15-bit block is a 2^-15 coincidence for random fingerprints —
    and popcount verification runs BEFORE member re-expansion, so
    join work tracks distinct fingerprints and near-dup fp pairs;
    only the final member-pair emission is ∝ the k² OUTPUT the pair
    semantics inherently demand (hamming-0 pairs come from a
    same-fingerprint self-join whose work IS its output).  The
    oracle's all-pairs form exists only as the audit."""
    docs = io.table(spark, sf_dir, "documents").select("doc_id", "text")
    fps = D.simhash(docs, bits=_HAM_BLOCKS * _HAM_BLOCK_BITS)
    # ONE groupBy yields everything the doc level needs: the distinct
    # fingerprints (group keys) for the block join, the sorted member
    # list per fingerprint for re-expansion, and the hamming-0 pairs
    # (emitted map-side from each group's array — no second self-join
    # shuffle).  Checkpointed: it feeds four plan branches.
    groups = (
        fps.groupBy("simhash")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("members"))
        .localCheckpoint(eager=False)
    )
    fpairs = _simhash_fp_candidate_pairs(groups.select("simhash"))
    cross = (
        fpairs.join(
            groups.select(F.col("simhash").alias("sh_a"), F.col("members").alias("ma")),
            "sh_a",
        )
        .join(
            groups.select(F.col("simhash").alias("sh_b"), F.col("members").alias("mb")),
            "sh_b",
        )
        .select(F.explode("ma").alias("da"), "mb", "hamming")
        .select("da", F.explode("mb").alias("db"), "hamming")
        .select(
            F.least("da", "db").alias("doc_id_a"),
            F.greatest("da", "db").alias("doc_id_b"),
            "hamming",
        )
    )
    # members is ascending, so pairing each element with its suffix
    # emits every (a < b) member pair exactly once (the jaccard_pairs
    # in-group emission pattern)
    intra_pairs = D._suffix_pair_structs("members")
    intra = (
        groups.filter(F.size("members") >= 2)
        .select(F.explode(intra_pairs).alias("p"))
        .select("p.doc_id_a", "p.doc_id_b", F.lit(0).cast("long").alias("hamming"))
    )
    return cross.unionByName(intra)


def _simhash_fp_candidate_pairs(ufp: DataFrame) -> DataFrame:
    """Hamming-ball search over a table of DISTINCT `simhash` values:
    pigeonhole block index -> equi-join -> popcount verify.  Returns
    (sh_a < sh_b, hamming) for every distinct-fingerprint pair within
    _HAM_MAX_DIST.  Split out so the property test can bound the
    candidate volume independently of member re-expansion."""
    mask = (1 << _HAM_BLOCK_BITS) - 1
    structs = ", ".join(
        f"named_struct('block_no', {j}, "
        f"'block_val', shiftright(simhash, {j * _HAM_BLOCK_BITS}) & {mask})"
        for j in range(_HAM_BLOCKS)
    )
    blocks = ufp.select(
        "simhash", F.explode(F.expr(f"array({structs})")).alias("blk")
    ).select("simhash", "blk.block_no", "blk.block_val")
    a, b = blocks.alias("a"), blocks.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).cast(
        "long"
    )
    return (
        a.join(
            b,
            (F.col("a.block_no") == F.col("b.block_no"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a.simhash") < F.col("b.simhash")),
        )
        .filter(hamming <= _HAM_MAX_DIST)
        .select(
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
            hamming.alias("hamming"),
        )
        .distinct()
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

    Scale shape (r15 rework): the coarse centroids, PQ codebook and
    query vector are k = {k} DETERMINISTIC rows (lowest vec_ids), so
    they are pulled ONCE in a bounded driver collect (8 rows of 64
    int64s — the knn_join/rrf metadata-pull pattern) and inlined as
    literal expressions.  Cell assignment and per-block code
    assignment become map-side argmins against the literal centroids
    — the former coarse/codebook crossJoin + groupBy(vec_id) pair
    shuffled the whole corpus TWICE; now nothing shuffles but the two
    TakeOrdered top-{t}s and the candidate count.  The ADC lookup
    table is computed exactly in Python integers (the same quantized
    int64 arithmetic) and inlined as literal arrays indexed by each
    row's code — no join.  The exact-top-k side exists only as the
    audit."""
    x = io.table(spark, sf_dir, "embeddings").select(
        "vec_id", S.quantize(F.col("embedding")).alias("xq")
    )

    # ONE bounded driver pull: the 8 lowest-vec_id quantized vectors
    # seed coarse cells, PQ codebook (first 4) and the query (vec_id 0).
    head = x.orderBy("vec_id").limit(_IVF_K).collect()
    cents = [list(r["xq"]) for r in head]
    cb = cents[:_PQ7_K]
    qrows = [c for r, c in zip(head, cents) if r["vec_id"] == 0]

    def arr_lit(vals) -> str:
        return "array(" + ", ".join(f"{int(v)}L" for v in vals) + ")"

    def l2_lit(col: str, vec, lo: int, n: int) -> str:
        # engine-side exact integer L2 of a column slice vs a literal
        return (
            f"aggregate(zip_with(slice({col}, {lo + 1}, {n}), "
            f"{arr_lit(vec[lo:lo + n])}, (u, v) -> (u - v) * (u - v)), "
            f"CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        )

    def l2_py(a, b, lo: int, n: int) -> int:
        return sum((a[lo + i] - b[lo + i]) ** 2 for i in range(n))

    # nearest coarse cell / per-block nearest code: map-side argmin
    # over literal centroids, same (d, id) struct-min tiebreak as the
    # former min(struct(d, cell_id)) aggregate
    cell_expr = (
        "array_min(array("
        + ", ".join(
            f"named_struct('d', {l2_lit('xq', c, 0, 64)}, 'i', CAST({i} AS BIGINT))"
            for i, c in enumerate(cents)
        )
        + ")).i"
    )

    def code_expr(b: int) -> str:
        return (
            "array_min(array("
            + ", ".join(
                f"named_struct('d', {l2_lit('xq', c, b * _PQ7_SUBDIM, _PQ7_SUBDIM)}, "
                f"'c', {ci})"
                for ci, c in enumerate(cb)
            )
            + ")).c"
        )

    if qrows:
        qv = qrows[0]
        # probe cells and ADC table computed driver-side in exact
        # Python integer arithmetic (identical to the engine's int64)
        probed_ids = [
            cid
            for _, cid in sorted(
                (l2_py(qv, c, 0, 64), i) for i, c in enumerate(cents)
            )[:_IVF_NPROBE]
        ]
        adc = [
            [l2_py(qv, c, b * _PQ7_SUBDIM, _PQ7_SUBDIM) for c in cb]
            for b in range(_PQ7_BLOCKS)
        ]
        adc_expr = " + ".join(
            f"{arr_lit(adc[b])}[{code_expr(b)}]" for b in range(_PQ7_BLOCKS)
        )
        qd_expr = l2_lit("xq", qv, 0, 64)
    else:
        # no vec_id-0 query: every probed/ADC/exact stage is empty,
        # exactly as the former join form produced
        probed_ids = []
        adc_expr = "CAST(0 AS BIGINT)"
        qd_expr = "CAST(0 AS BIGINT)"

    scored = x.select(
        "vec_id",
        F.expr(cell_expr).alias("cell_id"),
        F.expr(adc_expr).alias("adc_dist"),
        F.expr(qd_expr).alias("qd"),
    )
    cand = scored.filter(
        F.col("cell_id").isin(probed_ids) if probed_ids else F.lit(False)
    )
    atop = cand.orderBy("adc_dist", "vec_id").limit(_ANN_TOPK).select("vec_id")
    btop = (
        (scored if qrows else scored.filter(F.lit(False)))
        .orderBy("qd", "vec_id")
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
        # Σ i·y and n·Σy in decimal(38,0): the long form's "~400×
        # headroom through sf1" ran out at the r12 sf10 smoke (10×
        # ranks × 10× money is 100× the sum).  DuckDB's SUM already
        # promotes to HUGEINT, so the oracle computed wide all along;
        # the double conversions sit at the same two points, so values
        # are identical at every non-overflowing size.
        F.round(
            F.lit(2.0)
            * F.sum(F.col("rk_asc").cast("decimal(38,0)") * F.col("cents"))
            / (F.min("n").cast("decimal(38,0)") * F.min("total"))
            - (F.min("n") + F.lit(1.0)) / F.min("n"),
            6,
        ).alias("gini"),
    )


_TRI_MIN_SUPPORT = 2


@register(
    "graph_triangle_census",
    tier="D",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    edges AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_TRI_MIN_SUPPORT}
    ),
    deg AS (
      SELECT u AS node, COUNT(*) AS d FROM (
        SELECT u FROM edges UNION ALL SELECT v FROM edges
      ) t(u) GROUP BY 1
    ),
    tri AS (
      SELECT COUNT(*) AS n_triangles
      FROM edges e1
      JOIN edges e2 ON e1.v = e2.u
      JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    wedges AS (
      SELECT CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS n_wedges FROM deg
    )
    SELECT (SELECT COUNT(*) FROM edges) AS n_edges,
           (SELECT COUNT(*) FROM deg) AS n_nodes,
           (SELECT n_triangles FROM tri) AS n_triangles,
           (SELECT n_wedges FROM wedges) AS n_wedges,
           ROUND(3.0 * (SELECT n_triangles FROM tri)
                 / (SELECT n_wedges FROM wedges), 6) AS clustering_coeff
    """,
)
def graph_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E123: triangle census + global clustering coefficient over the
    part co-order graph (edges = part pairs co-ordered in ≥ 2
    baskets) — the third classic distributed-graph primitive after
    PageRank (E95) and connected components (E25): triangles measure
    local cohesion (are my neighbors each other's neighbors), and
    3·triangles/wedges is the global clustering coefficient.  Counted
    on the ORIENTED graph (u < v): each triangle u<v<w appears exactly
    once as e1=(u,v), e2=(v,w), e3=(u,w) — two self-joins, no
    double-counting, no post-hoc division by 6.

    Scale shape: edge building reuses E115's bounded within-basket
    discipline + support pruning; the oriented two-join is the
    standard MapReduce triangle algorithm, with work Σ_v deg²(v) on
    the oriented (halved-degree) graph — at web scale the orientation
    switches to degree-ordering (low→high), same joins, provably
    O(m^1.5); wedge counts are one degree agg.  Every count is
    integer; the coefficient is one IEEE division."""
    li = io.table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count("*").alias("s"))
        .filter(F.col("s") >= _TRI_MIN_SUPPORT)
        .select("u", "v")
        .localCheckpoint(eager=False)
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )
    wed = deg.agg(
        F.sum((F.col("d") * (F.col("d") - 1) / 2).cast("long")).alias("n_wedges")
    )
    counts = edges.agg(F.count("*").alias("n_edges")).crossJoin(
        deg.agg(F.count("*").alias("n_nodes"))
    )
    return (
        counts.crossJoin(tri)
        .crossJoin(wed)
        .select(
            "n_edges",
            "n_nodes",
            "n_triangles",
            "n_wedges",
            F.round(
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6
            ).alias("clustering_coeff"),
        )
    )


@register(
    "session_first_purchase_mrr",
    tier="D",
    oracle="""
    WITH sess AS (
      SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                ORDER BY ts, event_id) AS pos
      FROM events
    ),
    firstbuy AS (
      SELECT user_id, day, MIN(pos) AS first_purchase_pos
      FROM sess WHERE event_type = 'purchase'
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT s.user_id, s.day,
             CASE WHEN f.first_purchase_pos IS NULL THEN 0
                  ELSE CAST(FLOOR(1000000.0 / f.first_purchase_pos) AS BIGINT)
             END AS rr_ppm
      FROM (SELECT DISTINCT user_id, day FROM sess) s
      LEFT JOIN firstbuy f ON s.user_id = f.user_id AND s.day = f.day
    )
    SELECT day,
           COUNT(*) AS n_sessions,
           CAST(SUM(CASE WHEN rr_ppm > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_converting,
           CAST(SUM(rr_ppm) AS BIGINT) AS sum_rr_ppm,
           CAST(FLOOR(CAST(SUM(rr_ppm) AS DOUBLE) / COUNT(*)) AS BIGINT)
             AS mrr_ppm
    FROM scored GROUP BY day
    """,
)
def session_first_purchase_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E124: mean reciprocal rank of the first purchase per (user,
    day) session — the ranking-quality metric (MRR) applied to
    conversion position: a purchase as the session's 2nd event scores
    1/2, an unconverted session 0.  Reciprocals are INTEGER ppm
    (floor(1e6/pos)), so daily sums are exact int64 — the E114
    discipline for a metric textbooks define as a float mean.  Daily
    MRR trend is the funnel-efficiency complement of E72's stage
    conversion rates.

    Scale shape: one (user, day) window orders each session once;
    the first-purchase position is a per-session MIN agg sharing the
    same partitioning; the daily rollup keys on dates.  A hot
    user-day is bounded by one user's daily event volume."""
    ev = io.table(spark, sf_dir, "events")
    sw = Window.partitionBy("user_id", F.col("ts").cast("date")).orderBy(
        "ts", "event_id"
    )
    sess = ev.select(
        "user_id",
        F.col("ts").cast("date").alias("day"),
        "event_type",
        F.row_number().over(sw).alias("pos"),
    )
    firstbuy = (
        sess.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "day")
        .agg(F.min("pos").alias("first_purchase_pos"))
    )
    scored = (
        sess.select("user_id", "day")
        .distinct()
        .join(firstbuy, ["user_id", "day"], "left")
        .select(
            "day",
            F.when(F.col("first_purchase_pos").isNull(), F.lit(0).cast("long"))
            .otherwise(
                F.floor(F.lit(1000000.0) / F.col("first_purchase_pos")).cast("long")
            )
            .alias("rr_ppm"),
        )
    )
    return scored.groupBy("day").agg(
        F.count("*").alias("n_sessions"),
        F.sum((F.col("rr_ppm") > 0).cast("long")).alias("n_converting"),
        F.sum("rr_ppm").cast("long").alias("sum_rr_ppm"),
        F.floor(F.sum("rr_ppm").cast("double") / F.count("*"))
        .cast("long")
        .alias("mrr_ppm"),
    )


_CSK_DATE_LO = "1995-03-01"
_CSK_DATE_HI = "1995-08-31"
_CSK_PARTKEY = 500


@register(
    "files_composite_predicate_skipping",
    tier="B",
    oracle=f"""
    WITH fstats AS (
      SELECT 't' || CAST(l_orderkey % 8 AS VARCHAR) AS table_name,
             l_orderkey // 100 AS file_no,
             MIN(l_shipdate) AS min_sd, MAX(l_shipdate) AS max_sd,
             MIN(l_partkey) AS min_pk, MAX(l_partkey) AS max_pk,
             COUNT(*) AS record_count
      FROM lineitem GROUP BY 1, 2
    ),
    judged AS (
      SELECT table_name, record_count,
             (max_sd < DATE '{_CSK_DATE_LO}'
              OR min_sd > DATE '{_CSK_DATE_HI}') AS skip_date,
             ({_CSK_PARTKEY} < min_pk OR {_CSK_PARTKEY} > max_pk) AS skip_pk
      FROM fstats
    )
    SELECT table_name,
           COUNT(*) AS n_files,
           CAST(SUM(CASE WHEN skip_date THEN 1 ELSE 0 END) AS BIGINT)
             AS n_skip_date_only,
           CAST(SUM(CASE WHEN skip_pk THEN 1 ELSE 0 END) AS BIGINT)
             AS n_skip_pk_only,
           CAST(SUM(CASE WHEN skip_date OR skip_pk THEN 1 ELSE 0 END) AS BIGINT)
             AS n_skip_composite,
           CAST(SUM(CASE WHEN NOT (skip_date OR skip_pk)
                         THEN record_count ELSE 0 END) AS BIGINT)
             AS rows_scanned
    FROM judged GROUP BY table_name
    """,
)
def files_composite_predicate_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E125: composite-predicate file skipping — E74 evaluates ONE
    column's min/max against a range; real scans carry conjunctions
    (`shipdate BETWEEN ... AND partkey = P`), and a file skips if ANY
    conjunct's stats exclude it — so composite skipping is the UNION
    of single-column skips, which is exactly why multi-column
    clustering (z-order, E117) beats single-key sort: it makes BOTH
    conjuncts' stats tight at once.  Per table: files skipped by each
    conjunct alone, by the conjunction, and rows actually scanned —
    the numbers that justify (or refuse) a z-order rewrite for a
    given workload, completing the E74/E105/E117 observability trio.

    Scale shape: identical to E74 — one stats groupBy (free from
    manifests in a real lake), then metadata-sized judgment and
    rollup; no joins."""
    li = io.table(spark, sf_dir, "lineitem")
    fstats = li.groupBy(
        F.concat(F.lit("t"), (F.col("l_orderkey") % 8).cast("string")).alias(
            "table_name"
        ),
        (F.col("l_orderkey") / 100).cast("long").alias("file_no"),
    ).agg(
        F.min("l_shipdate").alias("min_sd"),
        F.max("l_shipdate").alias("max_sd"),
        F.min("l_partkey").alias("min_pk"),
        F.max("l_partkey").alias("max_pk"),
        F.count("*").alias("record_count"),
    )
    lo, hi = F.lit(_CSK_DATE_LO).cast("date"), F.lit(_CSK_DATE_HI).cast("date")
    judged = fstats.select(
        "table_name",
        "record_count",
        ((F.col("max_sd") < lo) | (F.col("min_sd") > hi)).alias("skip_date"),
        (
            (F.lit(_CSK_PARTKEY) < F.col("min_pk"))
            | (F.lit(_CSK_PARTKEY) > F.col("max_pk"))
        ).alias("skip_pk"),
    )
    return judged.groupBy("table_name").agg(
        F.count("*").alias("n_files"),
        F.sum(F.col("skip_date").cast("long")).alias("n_skip_date_only"),
        F.sum(F.col("skip_pk").cast("long")).alias("n_skip_pk_only"),
        F.sum((F.col("skip_date") | F.col("skip_pk")).cast("long")).alias(
            "n_skip_composite"
        ),
        F.sum(
            F.when(~(F.col("skip_date") | F.col("skip_pk")), F.col("record_count"))
            .otherwise(0)
        )
        .cast("long")
        .alias("rows_scanned"),
    )


@register(
    "langid_confusion_matrix",
    tier="D",
    oracle="WITH "
    + _LANGID_PRED_CTE
    + """,
    assigned AS (
      SELECT d.lang, COALESCE(p.profile_lang, 'unknown') AS predicted_lang
      FROM documents d LEFT JOIN pred p USING (doc_id)
    ),
    truth AS (SELECT lang, COUNT(*) AS n_true FROM assigned GROUP BY lang)
    SELECT a.lang, a.predicted_lang,
           COUNT(*) AS n,
           CAST(MIN(t.n_true) AS BIGINT) AS n_true,
           ROUND(CAST(COUNT(*) AS DOUBLE) / MIN(t.n_true), 6) AS share
    FROM assigned a JOIN truth t ON a.lang = t.lang
    GROUP BY a.lang, a.predicted_lang
    """,
)
def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E126: language-ID confusion matrix — D5's classifier (corpus-
    learned function-word profiles, text_lang_id) evaluated against
    the labeled lang column: per (true, predicted) cell the count and
    its share of the true class (the recall diagonal / confusion
    off-diagonals).  This is the MODEL-EVALUATION query shape every
    classifier in the pipeline needs (E69's scored filter, E37's
    gate): same engine, same declarative plan, metric = one grouped
    count over predictions — no separate eval framework.

    Scale shape: prediction is text_lang_id's plan (tiny profile
    broadcast + one vote shuffle); the matrix is a groupBy over
    (lang, predicted) — |langs|² keys; class totals broadcast back.
    Share = one IEEE division on exact counts."""
    from ..operators import text as TX

    pred = TX.lang_id_ngram(io.table(spark, sf_dir, "documents"), profile_size=20)
    assigned = pred.select("lang", "predicted_lang")
    truth = assigned.groupBy("lang").agg(F.count("*").alias("n_true"))
    return (
        assigned.groupBy("lang", "predicted_lang")
        .agg(F.count("*").alias("n"))
        .join(truth, "lang")
        .select(
            "lang",
            "predicted_lang",
            "n",
            F.col("n_true").cast("long").alias("n_true"),
            F.round(F.col("n").cast("double") / F.col("n_true"), 6).alias("share"),
        )
    )


_COVERAGE_THRESHOLDS = [50, 90, 99]


@register(
    "vocab_coverage_curve",
    tier="D",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
      FROM documents
    ),
    tk AS (SELECT word FROM toks WHERE word <> ''),
    freq AS (SELECT word, COUNT(*) AS n FROM tk GROUP BY word),
    ranked AS (
      SELECT word, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, word) AS rnk,
             SUM(n) OVER (ORDER BY n DESC, word
                          ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(n) OVER () AS total
      FROM freq
    ),
    crossed AS (
      SELECT t.threshold_pct, r.rnk, r.cum, r.total
      FROM ranked r
      CROSS JOIN (SELECT unnest({_COVERAGE_THRESHOLDS!r}) AS threshold_pct) t
      WHERE r.cum * 100 >= r.total * t.threshold_pct
    )
    SELECT threshold_pct,
           CAST(MIN(rnk) AS BIGINT) AS vocab_size,
           CAST(MIN_BY(cum, rnk) AS BIGINT) AS tokens_covered,
           CAST(MIN(total) AS BIGINT) AS total_tokens
    FROM crossed GROUP BY threshold_pct
    """,
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E127: vocabulary coverage curve — the smallest frequency-ranked
    vocabulary covering 50/90/99% of corpus tokens: THE tokenizer-
    budget question (how many types buy how much coverage; the long
    tail past the 99% knee is what byte-fallback/BPE exists for).
    Crossing detection is pure integers (cum·100 ≥ total·pct — no
    ratio floats), ranks tie-break on (freq desc, word), and the
    covered-token count at the crossing rank rides along via MIN_BY/
    min(struct).

    Scale shape: the frequency table is one partial-agg shuffle; the
    ranking window runs over the VOCABULARY (types, not tokens —
    metadata-sized next to the corpus, the E21 allowance), and the
    threshold expansion is 3× vocab rows filtered map-side.  At
    open-web scale the exact global window swaps for frequency-bucket
    histogram prefix sums (E62's shape); this form is the oracle
    anchor."""
    docs = io.table(spark, sf_dir, "documents")
    tk = docs.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    freq = tk.groupBy("word").agg(F.count("*").alias("n"))
    ow = Window.orderBy(F.desc("n"), "word")
    ranked = freq.select(
        F.row_number().over(ow).cast("long").alias("rnk"),
        F.sum("n").over(ow.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("n").over(Window.partitionBy()).alias("total"),
    )
    crossed = (
        ranked.withColumn(
            "threshold_pct",
            F.explode(F.array(*[F.lit(t) for t in _COVERAGE_THRESHOLDS])),
        )
        .filter(F.col("cum") * 100 >= F.col("total") * F.col("threshold_pct"))
    )
    return crossed.groupBy("threshold_pct").agg(
        F.min("rnk").alias("vocab_size"),
        F.min(F.struct("rnk", "cum")).getField("cum").alias("tokens_covered"),
        F.min("total").cast("long").alias("total_tokens"),
    )
