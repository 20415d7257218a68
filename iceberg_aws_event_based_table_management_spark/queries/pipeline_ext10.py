"""Tier D (part 11) — typo-tolerant blocking, market-data rollups,
interval algebra, cohort economics, rank fusion, and dependency
profiling (SURVEY.md §2-E E140-E145).

Tenth batch: edit-distance-1 record linkage via SymSpell deletion
neighborhoods (every Levenshtein-1 pair shares a deletion variant —
provable completeness like E116/E119, verified by the exact
Levenshtein both engines implement identically), daily OHLC
(open/high/low/close) rollups of the event value series (the
market-data aggregation shape: order-statistics endpoints, no float
sums), merging overlapping per-user activity intervals (the interval-
algebra coverage primitive behind session stitching and SLA credit),
weekly cohort LTV curves (signup-cohort × week-index cumulative
revenue in exact cents — the unit-economics query), reciprocal-rank
fusion of the BM25 and embedding retrieval lists (the standard hybrid-
search combiner, composing E128 with D3), and a functional-dependency
audit (does A determine B — the data-profiling primitive schema
inference and key discovery are built on).

Float discipline: as pipeline_ext8/9 — money in cents, reciprocal
ranks floored to ppm integers before summing, order-statistics
(min/max/first/last) instead of float accumulation everywhere.

All built-in-function formulations (no Python UDFs); every query
carries an exact DuckDB oracle.  Registers after pipeline_ext8 so it
may import the shared BM25 CTE without perturbing registration order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import io
from ..operators import dedup as D
from ..registry import register
from .aggregates import dec_sum, _dec_sum_sql
from .pipeline_ext8 import _BM25_SCORED_CTE, _bm25_scored

# ---------------------------------------------------------------------------
# E140: edit-distance-1 pairs via SymSpell deletion neighborhoods
# ---------------------------------------------------------------------------


@register(
    "dedup_edit1_names",
    tier="D",
    oracle="""
    SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
           a.c_name AS name_a, b.c_name AS name_b
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) = 1
    """,
)
def dedup_edit1_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E140: all customer-name pairs at Levenshtein distance exactly 1
    — typo-tolerant record linkage, blocked by SymSpell DELETION
    NEIGHBORHOODS (Garbe's FastSS family): each name emits itself
    plus every single-character deletion; two names at edit distance
    1 ALWAYS share a variant (substitution → delete the differing
    position from both; insertion/deletion → the shorter IS a variant
    of the longer), so the candidate join is provably complete — the
    deterministic-recall property E116/E119 provide for set/bit
    similarity, here for edit distance.  Better: candidates need NO
    distance verification at all —
    · equal-length names matching on the SAME deletion position agree
      everywhere except that position, so (names distinct ⇒) hamming
      = 1 ⇒ Levenshtein = 1 by construction, exactly once per pair;
    · a name matching another's deletion variant IS that name minus
      one character ⇒ Levenshtein = 1 by construction (deduped, since
      "aab"→"ab" matches at two positions).
    The oracle is the unblocked n² Levenshtein scan.

    Scale shape (r11 rework — the sf10 audit caught the row-level
    variant join at exponent 1.6 / 152 s once replication gave every
    name ~100 copies): the variant join runs over DISTINCT names —
    ~(len+1) variant rows per distinct name on (position, variant),
    buckets alphabet-bounded — and custkey pairs are re-expanded by a
    name-keyed hash join afterwards, so join work is immune to name
    multiplicity and the only multiplicity-quadratic term is the
    OUTPUT itself (ka×kb custkey pairs per name pair — semantically
    irreducible).  At 100 TB the distinct-name variant table persists
    like the LSH band index (E54/E63 pattern)."""
    names = io.table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    nd = names.select("c_name").distinct()
    pos = F.explode(F.sequence(F.lit(1), F.length("c_name"))).alias("pos")
    dels = nd.select("c_name", pos).select(
        "c_name",
        "pos",
        F.concat(
            F.expr("substr(c_name, 1, pos - 1)"),
            F.expr("substr(c_name, pos + 1)"),
        ).alias("variant"),
    )
    # substitution name pairs: same deletion position, same variant,
    # different names — provably hamming-1, emitted exactly once
    # (the pair differs at exactly one position, so exactly one
    # (pos, variant) witnesses it).  Grouped posting-list emission
    # (the jaccard_pairs/lsh shape, r15): the variant table shuffles
    # ONCE into (pos, variant) buckets and sorted member lists emit
    # each (a < b) pair map-side — the former two-sided self-join
    # shuffled/broadcast dels twice and re-derived its explode chain
    # per alias.  Identical pair set by the same witness argument.
    subs_n = (
        dels.groupBy("pos", "variant")
        .agg(F.array_sort(F.collect_list("c_name")).alias("ds"))
        .filter(F.size("ds") >= 2)
        .select(F.explode(D._suffix_pair_structs("ds")).alias("p"))
        .select(F.col("p.doc_id_a").alias("nx"), F.col("p.doc_id_b").alias("ny"))
    )
    # insertion/deletion name pairs: one name IS the other minus one
    # character (lengths differ, so disjoint from subs_n); dedup
    # multi-position witnesses ("aab" -> "ab" matches twice)
    w, d = nd.alias("a"), dels.alias("b")
    indel_n = (
        w.join(d, F.col("a.c_name") == F.col("b.variant"))
        .select(
            F.least("a.c_name", "b.c_name").alias("nx"),
            F.greatest("a.c_name", "b.c_name").alias("ny"),
        )
        .distinct()
    )
    name_pairs = subs_n.unionByName(indel_n)
    # expansion: every custkey of nx crossed with every custkey of ny,
    # ordered per pair — output-proportional hash joins on the name
    ka = names.select(F.col("c_name").alias("nx"), F.col("c_custkey").alias("ka"))
    kb = names.select(F.col("c_name").alias("ny"), F.col("c_custkey").alias("kb"))
    return (
        name_pairs.join(ka, "nx")
        .join(kb, "ny")
        .select(
            F.least("ka", "kb").alias("custkey_a"),
            F.greatest("ka", "kb").alias("custkey_b"),
            F.when(F.col("ka") < F.col("kb"), F.col("nx"))
            .otherwise(F.col("ny"))
            .alias("name_a"),
            F.when(F.col("ka") < F.col("kb"), F.col("ny"))
            .otherwise(F.col("nx"))
            .alias("name_b"),
        )
    )


# ---------------------------------------------------------------------------
# E141: daily OHLC rollup
# ---------------------------------------------------------------------------


@register(
    "ohlc_daily_value",
    tier="D",
    oracle=f"""
    WITH base AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             ts, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                ORDER BY ts, event_id) AS rn,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                ORDER BY ts DESC, event_id DESC) AS rnd
      FROM events
    )
    SELECT event_type, day,
           MAX(CASE WHEN rn = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rnd = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n,
           {_dec_sum_sql("value")} AS volume
    FROM base GROUP BY event_type, day
    """,
)
def ohlc_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E141: daily OHLC (open/high/low/close) candles over the event
    value series per type — the market-data/telemetry rollup shape:
    endpoints are ORDER STATISTICS over the (ts, event_id) total
    order (first/last via rank, high/low via min/max — raw doubles
    pass through untouched, so no float accumulation exists to
    diverge), and volume uses the cents-scaled exact sum
    (aggregates.dec_sum).

    Scale shape: one (type, day) window partitioning serves both
    rank directions, and the final agg groups on the same key — one
    exchange total; per-partition state is a day of one type's
    events.  This is C42/E44's sessionization partitioning with
    order-statistic outputs."""
    w = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", "day").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    base = (
        io.table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.to_date(F.date_trunc("day", "ts")).alias("day"),
            "ts",
            "event_id",
            "value",
        )
        .withColumn("rn", F.row_number().over(w))
        .withColumn("rnd", F.row_number().over(wd))
    )
    return base.groupBy("event_type", "day").agg(
        F.max(F.when(F.col("rn") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rnd") == 1, F.col("value"))).alias("close"),
        F.count("*").cast("long").alias("n"),
        dec_sum("value").alias("volume"),
    )


# ---------------------------------------------------------------------------
# E142: merge overlapping activity intervals
# ---------------------------------------------------------------------------

_IV_SPAN_US = 300_000_000  # each event opens a 5-minute activity window


@register(
    "merge_user_intervals",
    tier="D",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + {_IV_SPAN_US} AS e
      FROM events
    ),
    flagged AS (
      SELECT user_id, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      -9223372036854775808)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM flagged
    ),
    merged AS (
      SELECT user_id, island,
             MIN(s) AS ist, MAX(e) AS ien, COUNT(*) AS nev
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(SUM(nev) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(ien - ist) AS BIGINT) AS covered_us
    FROM merged GROUP BY user_id
    """,
)
def merge_user_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E142: merge overlapping activity intervals — each event opens a
    5-minute window; per user, overlapping/touching windows coalesce
    into maximal islands (start > running max of prior ends ⇒ new
    island; the classic gaps-and-islands interval merge), reporting
    interval count and exact covered microseconds.  The interval-
    algebra primitive behind session stitching, SLA-credit
    computation, and dedup of overlapping retention holds — C42
    sessionizes by fixed GAP; this merges by OVERLAP, which gap
    logic cannot express when spans vary.

    Exactness: pure int64 epoch-µs arithmetic end to end.

    Scale shape: one per-user partitioning serves the running-max
    window, the island cumsum, and both rollups — one exchange; per-
    user state is that user's events (E44's bound)."""
    ev = io.table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        io.epoch_us(F.col("ts")).alias("s"),
        (io.epoch_us(F.col("ts")) + _IV_SPAN_US).alias("e"),
    )
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = iv.withColumn(
        "new_island",
        F.when(
            F.col("s")
            > F.coalesce(
                F.max("e").over(wprev), F.lit(-(2**63))
            ),
            1,
        ).otherwise(0),
    ).withColumn("island", F.sum("new_island").over(wcum))
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("ist"),
        F.max("e").alias("ien"),
        F.count("*").alias("nev"),
    )
    return merged.groupBy("user_id").agg(
        F.sum("nev").cast("long").alias("n_events"),
        F.count("*").cast("long").alias("n_intervals"),
        F.sum(F.col("ien") - F.col("ist")).cast("long").alias("covered_us"),
    )


# ---------------------------------------------------------------------------
# E143: weekly cohort LTV curve
# ---------------------------------------------------------------------------


@register(
    "cohort_ltv_weekly",
    tier="D",
    oracle="""
    WITH ev AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             event_type, value
      FROM events
    ),
    first_day AS (
      SELECT user_id,
             CAST(date_trunc('week', MIN(day)) AS DATE) AS cohort_week
      FROM ev GROUP BY user_id
    ),
    sizes AS (
      SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS n_users
      FROM first_day GROUP BY cohort_week
    ),
    rev AS (
      SELECT f.cohort_week,
             CAST((e.day - f.cohort_week) // 7 AS BIGINT) AS week_idx,
             CAST(SUM(CAST(ROUND(e.value * 100, 0) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM ev e JOIN first_day f USING (user_id)
      WHERE e.event_type = 'purchase'
      GROUP BY 1, 2
    )
    SELECT r.cohort_week, r.week_idx, s.n_users,
           (CAST(r.rev_cents AS DOUBLE) / 100.0) AS revenue,
           (CAST(SUM(r.rev_cents) OVER (PARTITION BY r.cohort_week
                ORDER BY r.week_idx) AS DOUBLE) / 100.0) AS cum_revenue
    FROM rev r JOIN sizes s USING (cohort_week)
    """,
)
def cohort_ltv_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E143: weekly cohort LTV curve — users grouped by first-seen
    ISO week; per (cohort, weeks-since-signup): cohort size, purchase
    revenue, and cumulative LTV.  The unit-economics query on top of
    E71's cohort-retention shape, with MONEY instead of presence —
    revenue accumulates in exact cents (the dec_sum discipline) so
    cumulative curves are engine-identical.

    Scale shape: first-seen day is one per-user agg; revenue joins
    the (user → cohort) map back on user_id (bucketable both sides)
    and groups on (cohort, week) — dimension-sized output; the
    cumulative window runs per cohort over week indexes (bounded by
    product age in weeks)."""
    ev = io.table(spark, sf_dir, "events").select(
        "user_id",
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        "event_type",
        "value",
    )
    first_day = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("day"))).alias("cohort_week")
    )
    sizes = first_day.groupBy("cohort_week").agg(
        F.count("*").cast("long").alias("n_users")
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_day, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(F.datediff("day", "cohort_week") / 7)
            .cast("long")
            .alias("week_idx"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
                "rev_cents"
            )
        )
    )
    wc = Window.partitionBy("cohort_week").orderBy("week_idx")
    return (
        rev.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_idx",
            "n_users",
            (F.col("rev_cents").cast("double") / 100.0).alias("revenue"),
            (F.sum("rev_cents").over(wc).cast("double") / 100.0).alias(
                "cum_revenue"
            ),
        )
    )


# ---------------------------------------------------------------------------
# E144: reciprocal-rank fusion of BM25 and embedding retrieval
# ---------------------------------------------------------------------------

_RRF_K = 60
_RRF_LIST = 50  # depth of each input ranking
_RRF_TOPK = 10

# DuckDB cosine mirror (same expression family as queries/similarity).
_RRF_COS = (
    "list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)), "
    "list_transform(qe, x -> CAST(x AS DOUBLE)))"
    " / (sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),"
    " list_transform(embedding, x -> CAST(x AS DOUBLE))))"
    " * sqrt(list_dot_product(list_transform(qe, x -> CAST(x AS DOUBLE)),"
    " list_transform(qe, x -> CAST(x AS DOUBLE)))))"
)


@register(
    "rrf_fuse_retrieval",
    tier="D",
    oracle="WITH "
    + _BM25_SCORED_CTE
    + f""",
    lex AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY score_ppm DESC, doc_id) AS ra
      FROM bm25
      ORDER BY score_ppm DESC, doc_id LIMIT {_RRF_LIST}
    ),
    q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    emb AS (
      SELECT vec_id AS doc_id,
             ROW_NUMBER() OVER (ORDER BY cosine_sim DESC, vec_id) AS rb
      FROM (
        SELECT vec_id, ROUND({_RRF_COS}, 6) AS cosine_sim
        FROM embeddings CROSS JOIN q
      )
      ORDER BY cosine_sim DESC, doc_id LIMIT {_RRF_LIST}
    ),
    fused AS (
      SELECT COALESCE(l.doc_id, e.doc_id) AS doc_id,
             l.ra AS bm25_rank, e.rb AS embed_rank,
             CAST(COALESCE(CAST(FLOOR(CAST(1000000 AS DOUBLE)
                                      / ({_RRF_K} + l.ra)) AS BIGINT), 0)
                  + COALESCE(CAST(FLOOR(CAST(1000000 AS DOUBLE)
                                        / ({_RRF_K} + e.rb)) AS BIGINT), 0)
                  AS BIGINT) AS rrf_ppm
      FROM lex l FULL OUTER JOIN emb e ON l.doc_id = e.doc_id
    )
    SELECT doc_id, bm25_rank, embed_rank, rrf_ppm
    FROM fused
    ORDER BY rrf_ppm DESC, doc_id
    LIMIT {_RRF_TOPK}
    """,
)
def rrf_fuse_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E144: reciprocal-rank fusion — the standard hybrid-search
    combiner (Cormack et al.): fuse the BM25 lexical top-50 (E128)
    with the embedding cosine top-50 (D3's brute-force ranking,
    vec_id=0 query) by RRF(d) = Σ_lists 1/(60 + rank_d), and return
    the fused top-10.  Score-scale-free by construction — only ranks
    cross lists, which is why RRF survives heterogeneous retrievers
    unchanged.

    Exactness: each reciprocal floors to integer ppm BEFORE summing
    (the defined semantics both engines implement identically);
    ranks come from total orders (score desc, id).

    Scale shape: each input ranking is TakeOrdered top-50, then the
    rank window and the full-outer fusion run on ≤50-row frames —
    the corpus is touched once per retriever, exactly as in the
    production two-tower + lexical stack."""
    from ..operators.similarity import as_double, cosine, lit_double_array

    lex = (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.desc("score_ppm"), "doc_id")
        .limit(_RRF_LIST)
        .withColumn(
            "ra",
            F.row_number().over(Window.orderBy(F.desc("score_ppm"), "doc_id")),
        )
        .select("doc_id", "ra")
    )
    emb_tbl = io.table(spark, sf_dir, "embeddings")
    qvec = emb_tbl.filter(F.col("vec_id") == 0).select("embedding").collect()[0][
        0
    ]  # one query vector — metadata-bounded driver collect
    q = lit_double_array(qvec)
    emb = (
        emb_tbl.select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(as_double("embedding"), q), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), "doc_id")
        .limit(_RRF_LIST)
        .withColumn(
            "rb",
            F.row_number().over(
                Window.orderBy(F.desc("cosine_sim"), "doc_id")
            ),
        )
        .select("doc_id", "rb")
    )
    rec = lambda r: F.floor(F.lit(1000000.0) / (_RRF_K + r)).cast("long")
    fused = lex.join(emb, "doc_id", "full_outer").select(
        "doc_id",
        F.col("ra").alias("bm25_rank"),
        F.col("rb").alias("embed_rank"),
        (
            F.coalesce(rec(F.col("ra")), F.lit(0))
            + F.coalesce(rec(F.col("rb")), F.lit(0))
        )
        .cast("long")
        .alias("rrf_ppm"),
    )
    return fused.orderBy(F.desc("rrf_ppm"), "doc_id").limit(_RRF_TOPK)


# ---------------------------------------------------------------------------
# E145: functional-dependency audit
# ---------------------------------------------------------------------------

_FD_CANDIDATES = [
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("documents", "source", "lang"),
    ("customer", "c_name", "c_mktsegment"),
]


def _fd_oracle_one(table: str, lhs: str, rhs: str) -> str:
    return f"""
    SELECT '{table}' AS table_name, '{lhs}' AS lhs, '{rhs}' AS rhs,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating,
           (SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) = 0) AS holds
    FROM (SELECT {lhs}, COUNT(DISTINCT {rhs}) AS d FROM {table} GROUP BY {lhs})
    """


@register(
    "functional_dependency_audit",
    tier="D",
    oracle=" UNION ALL ".join(
        _fd_oracle_one(t, l, r) for t, l, r in _FD_CANDIDATES
    ),
)
def functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E145: functional-dependency audit — for each candidate A → B,
    the number of A-groups, how many contain more than one distinct B
    (violations), and whether the dependency holds.  The data-
    profiling primitive under key discovery, normalization advice,
    and schema inference (E38 audits REFERENTIAL integrity across
    tables; this audits INTRA-table determination).

    Scale shape: each candidate is one groupBy(A) with a distinct-
    count of B — the standard partial-agg shape — reduced to a 1-row
    verdict; candidates union to a |candidates|-row report.  At
    profiling scale, COUNT(DISTINCT) swaps for HLL (C20/E106) with
    the same plan."""
    out = None
    for table, lhs, rhs in _FD_CANDIDATES:
        d = (
            io.table(spark, sf_dir, table)
            .groupBy(lhs)
            .agg(F.countDistinct(rhs).alias("d"))
            .agg(
                F.count("*").cast("long").alias("n_groups"),
                F.sum(F.when(F.col("d") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_violating"),
            )
            .select(
                F.lit(table).alias("table_name"),
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                "n_groups",
                "n_violating",
                (F.col("n_violating") == 0).alias("holds"),
            )
        )
        out = d if out is None else out.unionAll(d)
    return out
