"""Tier D (part 3) — training-data-pipeline extensions (SURVEY.md
SS2-E E50-E55).

Second batch of LLM-corpus operators beyond E18-E49: corpus-frequency
boilerplate detection, BPE merge-candidate counting, sequence-length
bucketing for batch assembly, a deterministic k-means iteration over
embeddings, Bloom-filter membership pre-screening with exact
false-positive accounting, and a write-audit-publish promotion gate
(the Iceberg WAP pattern applied to a corpus registry — the data-path
completion of the reference's snapshot lifecycle,
AwsTableManagementMetricsEvaluator.java:74-105).

All built-in-function formulations (no Python UDFs); every query
carries an exact DuckDB oracle.  Engine-neutral hashing reuses
operators/dedup.neutral_word_hash (md5-derived) so DuckDB reproduces
every hash bit; embedding math reuses the VEC_Q integer quantization
(operators/similarity.py:242-259) so every distance is exact int64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import io
from ..operators import dedup as D
from ..operators import similarity as S
from ..registry import register

# DuckDB mirror of operators/dedup.neutral_word_hash(col): first 15 md5
# hex chars parsed base-16 -> 60-bit BIGINT (same expression the SimHash
# oracle uses, dedup.py:164).
_NEUTRAL_HASH = (
    "CAST(list_reduce(string_split('0' || substr(md5({col}), 1, 15), ''),"
    " (acc, c) -> CAST(acc AS BIGINT) * 16"
    " + strpos('0123456789abcdef', c) - 1) AS BIGINT)"
)

# Distinct word-3-gram shingles per doc (same shape as the dedup/
# contamination oracles, parameterized by source relation).
_GRAMS3 = r"""
  ws AS (
    SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w
    FROM documents
  ),
  grams AS (
    SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
    FROM ws, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
  ),
  gramsf AS (SELECT * FROM grams WHERE shingle <> '')
"""

_BOILER_MIN_DOCS = 3  # a shingle in >= this many distinct docs is boilerplate


@register(
    "text_boilerplate_ngrams",
    tier="D",
    oracle=f"""
    WITH
    {_GRAMS3},
    df AS (
      SELECT shingle, COUNT(DISTINCT doc_id) AS n_docs
      FROM gramsf GROUP BY shingle
    ),
    flagged AS (
      SELECT g.doc_id,
             COUNT(*) AS n_shingles,
             CAST(SUM(CASE WHEN d.n_docs >= {_BOILER_MIN_DOCS} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_boiler
      FROM gramsf g JOIN df d ON g.shingle = d.shingle
      GROUP BY g.doc_id
    )
    SELECT doc_id, n_shingles, n_boiler,
           ROUND(CAST(n_boiler AS DOUBLE) / n_shingles, 6) AS boiler_frac
    FROM flagged
    """,
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E50: corpus-frequency boilerplate detection — the C4/CCNet-style
    pass that strips navigation chrome, license headers, and cookie
    banners: a word-3-gram occurring in >= 3 *distinct* documents is
    boilerplate; each doc reports its distinct-shingle count and
    boilerplate fraction (the removal decision input).

    Scale shape: shingling is narrow (operators/dedup.shingles); the
    doc-frequency table shuffles once on the shingle key and joins back
    on the same key, so the exchange is reused — text itself never
    travels with the shingles.  At 100 TB the frequent-shingle side is
    tiny relative to the corpus (boilerplate is frequent by definition)
    and AQE broadcast-converts the join-back."""
    sh = D.shingles(io.table(spark, sf_dir, "documents").select("doc_id", "text"), 3)
    df = sh.groupBy("shingle").agg(F.count_distinct("doc_id").alias("n_docs"))
    return (
        sh.join(df, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(
                F.when(F.col("n_docs") >= _BOILER_MIN_DOCS, 1).otherwise(0)
            ).alias("n_boiler"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_boiler",
            F.round(F.col("n_boiler") / F.col("n_shingles"), 6).alias("boiler_frac"),
        )
    )


_TOP_PAIRS = 20


@register(
    "vocab_pair_merge_counts",
    tier="D",
    oracle=f"""
    WITH words AS (
      SELECT UNNEST(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                w -> w <> '')) AS word
      FROM documents
    ),
    pairs AS (
      SELECT substr(word, i, 2) AS pair
      FROM words, UNNEST(generate_series(1, len(word) - 1)) AS t(i)
    )
    SELECT pair, COUNT(*) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair LIMIT {_TOP_PAIRS}
    """,
)
def vocab_pair_merge_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E51: BPE merge-candidate counting — the first iteration of
    byte-pair-encoding vocabulary induction: count every adjacent
    character pair inside every word occurrence and rank the top
    merge candidates (count desc, pair asc — the deterministic merge
    order).  Full BPE repeats this after each merge; one iteration is
    the representative (and by far the hottest) kernel.

    Scale shape: pair extraction is a narrow transform+explode, the
    count is one map-side-combined agg on a key space bounded by the
    symbol alphabet squared (tiny), and the top-k sits behind a total
    order — TakeOrderedAndProject, no global sort materialization."""
    words = (
        io.table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("word"))
        # length >= 2: Spark's sequence(1, 0) produces a DESCENDING
        # [1, 0] rather than DuckDB generate_series's empty set — the
        # filter removes pairless words before either engine diverges
        .filter(F.length("word") >= 2)
    )
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(_TOP_PAIRS)
    )


# power-of-two sequence buckets for batch assembly; cap = max model
# context this pipeline packs for
_SEQ_BUCKETS = (8, 16, 32, 64, 128, 256, 512, 1024)


def _bucket_case_sql() -> str:
    branches = " ".join(
        f"WHEN n_tokens <= {b} THEN {b}" for b in _SEQ_BUCKETS
    )
    return f"CASE {branches} ELSE {_SEQ_BUCKETS[-1]} END"


@register(
    "seqlen_bucket_padding",
    tier="D",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                             w -> w <> '')) AS n_tokens
      FROM documents
    ),
    bucketed AS (
      SELECT doc_id, n_tokens, {_bucket_case_sql()} AS bucket
      FROM toks
    )
    SELECT bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(bucket * COUNT(*) AS BIGINT) AS padded_tokens,
           ROUND(1.0 - CAST(SUM(n_tokens) AS DOUBLE) / (bucket * COUNT(*)), 6)
             AS waste_frac
    FROM bucketed GROUP BY bucket
    """,
)
def seqlen_bucket_padding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E52: sequence-length bucketing for batch assembly — assign each
    doc to the next power-of-two token bucket (cap 1024, the packing
    context) and account the padding waste per bucket: the metric that
    decides between padded batching and sequence packing (E24).

    The bucket is an explicit CASE chain, not 2^ceil(log2 n) — float
    log rounding at exact powers of two differs between engines, the
    chain is branch-predictable and engine-exact.

    Scale shape: token count and bucket are map-side expressions; one
    agg on <= 8 keys with map-side partial combine; no joins."""
    toks = io.table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
        ).alias("n_tokens"),
    )
    bucket = F.lit(_SEQ_BUCKETS[-1])
    for b in reversed(_SEQ_BUCKETS):
        bucket = F.when(F.col("n_tokens") <= b, b).otherwise(bucket)
    return (
        toks.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
        )
        .select(
            "bucket",
            "n_docs",
            "sum_tokens",
            (F.col("bucket") * F.col("n_docs")).cast("long").alias("padded_tokens"),
            F.round(
                1.0 - F.col("sum_tokens") / (F.col("bucket") * F.col("n_docs")), 6
            ).alias("waste_frac"),
        )
    )


_KMEANS_K = 8


@register(
    "kmeans_assign_step",
    tier="D",
    oracle=f"""
    WITH x AS (
      SELECT vec_id,
             list_transform(embedding,
               e -> CAST(FLOOR(CAST(e AS DOUBLE) * {float(S.VEC_Q)}) AS BIGINT)) AS xq
      FROM embeddings
    ),
    cent AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster_id, xq AS cq
      FROM x ORDER BY vec_id LIMIT {_KMEANS_K}
    ),
    dists AS (
      SELECT x.vec_id, c.cluster_id,
             CAST(list_sum(list_transform(generate_series(1, 64),
               j -> (x.xq[j] - c.cq[j]) * (x.xq[j] - c.cq[j]))) AS BIGINT) AS d
      FROM x CROSS JOIN cent c
    ),
    best AS (
      SELECT vec_id, cluster_id, d,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY d, cluster_id) AS rn
      FROM dists
    )
    SELECT cluster_id,
           COUNT(*) AS n_vectors,
           CAST(SUM(d) AS BIGINT) AS inertia
    FROM best WHERE rn = 1 GROUP BY cluster_id
    """,
)
def kmeans_assign_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E53: one deterministic Lloyd iteration over the embedding table
    — document-clustering for corpus curation (topic balancing, outlier
    pruning).  Centroids are the k=8 lowest vec_ids (the
    deterministic k-means++ stand-in); every vector is assigned to its
    nearest centroid by exact quantized-L2 (ties -> lowest cluster id)
    and per-cluster size + inertia come back — the convergence signal
    a full k-means loop iterates on.

    Exactness: distances are int64 over floor(x*2^20) quantized
    components (operators/similarity.py VEC_Q), so Spark and DuckDB
    agree bit-for-bit; (2*2^20)^2 * 64 dims < 2^48 — no overflow.

    Scale shape: the centroid side is k rows — broadcast; distance is
    a map-side zip_with/aggregate; the per-vector argmin is a
    min(struct(d, cluster)) partial agg (combines map-side, one
    shuffle on vec_id only for partial-merge); the final per-cluster
    rollup is an agg on k keys.  A full k-means loop re-broadcasts the
    k x 64 updated centroids per iteration — no iteration ever
    shuffles the corpus."""
    x = io.table(spark, sf_dir, "embeddings").select(
        "vec_id", S.quantize(F.col("embedding")).alias("xq")
    )
    cent = (
        x.orderBy("vec_id")
        .limit(_KMEANS_K)
        .select(
            (F.row_number().over(Window.orderBy("vec_id")) - 1).alias("cluster_id"),
            F.col("xq").alias("cq"),
        )
    )
    d = F.aggregate(
        F.zip_with(F.col("xq"), F.col("cq"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    dists = x.crossJoin(F.broadcast(cent)).select(
        "vec_id", "cluster_id", d.alias("d")
    )
    best = (
        dists.groupBy("vec_id")
        .agg(F.min(F.struct("d", "cluster_id")).alias("m"))
        .select(F.col("m.cluster_id").alias("cluster_id"), F.col("m.d").alias("d"))
    )
    return best.groupBy("cluster_id").agg(
        F.count("*").alias("n_vectors"),
        F.sum("d").cast("long").alias("inertia"),
    )


_BLOOM_M = 1 << 11  # sized so the fixture exhibits real false positives
_BLOOM_SEEDS = ("a:", "b:", "c:")


@register(
    "bloom_membership_audit",
    tier="D",
    oracle=f"""
    WITH train AS (SELECT text FROM documents WHERE doc_id % 10 < 8),
    probe AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 8),
    bits AS (
      SELECT DISTINCT {_NEUTRAL_HASH.format(col="s.seed || t.text")} % {_BLOOM_M} AS pos
      FROM train t CROSS JOIN (
        SELECT UNNEST(['{_BLOOM_SEEDS[0]}', '{_BLOOM_SEEDS[1]}', '{_BLOOM_SEEDS[2]}']) AS seed
      ) s
    ),
    probe_pos AS (
      SELECT p.doc_id, {_NEUTRAL_HASH.format(col="s.seed || p.text")} % {_BLOOM_M} AS pos
      FROM probe p CROSS JOIN (
        SELECT UNNEST(['{_BLOOM_SEEDS[0]}', '{_BLOOM_SEEDS[1]}', '{_BLOOM_SEEDS[2]}']) AS seed
      ) s
    ),
    hits AS (
      SELECT pp.doc_id,
             SUM(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
      FROM probe_pos pp LEFT JOIN bits b ON pp.pos = b.pos
      GROUP BY pp.doc_id
    ),
    truth AS (
      SELECT DISTINCT p.doc_id
      FROM probe p JOIN train t ON md5(p.text) = md5(t.text)
    )
    SELECT (h.n_hit = {len(_BLOOM_SEEDS)}) AS maybe_member,
           (tr.doc_id IS NOT NULL) AS is_member,
           COUNT(*) AS n_docs
    FROM hits h LEFT JOIN truth tr ON h.doc_id = tr.doc_id
    GROUP BY 1, 2
    """,
)
def bloom_membership_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E54: Bloom-filter membership pre-screen with exact
    false-positive accounting — the cheap first pass of incremental
    ingest dedup (E39): build an m-bit (m=2048 here, deliberately
    small so the fixture exhibits measurable FPs; production sizes m
    for the target FP rate), k=3 filter over the training slice's
    content, probe the incoming slice, then join to ground truth
    (exact content match) and report the confusion counts.  The FP
    row is the measured cost of skipping the exact check; a
    (maybe=false, member=true) row is structurally impossible (Bloom
    filters have no false negatives — the audit proves it on data).

    Engine-neutral: positions are md5-derived 60-bit hashes mod m
    (operators/dedup.neutral_word_hash pattern), so DuckDB reproduces
    every bit position exactly.

    Scale shape: the bit set is bounded by m (<= 64 Ki rows) — it
    broadcasts no matter how large the training corpus is; probes are
    3 map-side hash expressions + a broadcast join; ground truth joins
    on content hash (shuffle) only over the incoming slice.  This is
    the standard 'filter 99% cheaply, verify survivors exactly'
    split."""
    docs = io.table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 10 < 8).select("text")
    probe = docs.filter(F.col("doc_id") % 10 >= 8).select("doc_id", "text")
    seeds = F.array(*[F.lit(s) for s in _BLOOM_SEEDS])

    def positions(df: DataFrame, text_col: str) -> DataFrame:
        return df.select(
            *[c for c in df.columns if c != text_col],
            F.explode(seeds).alias("seed"),
            F.col(text_col).alias("_t"),
        ).select(
            *[c for c in df.columns if c != text_col],
            (D.neutral_word_hash(F.concat("seed", "_t")) % _BLOOM_M).alias("pos"),
        )

    bits = positions(train, "text").select("pos").distinct()
    probe_pos = positions(probe, "text")
    hits = (
        probe_pos.join(F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("doc_id")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"))
    )
    truth = (
        probe.alias("p")
        .join(
            train.select(F.md5("text").alias("th")).distinct().alias("t"),
            F.md5(F.col("p.text")) == F.col("t.th"),
            "left_semi",
        )
        .select("doc_id")
        .distinct()
        .withColumn("is_m", F.lit(True))
    )
    return (
        hits.join(truth, "doc_id", "left")
        .groupBy(
            (F.col("n_hit") == len(_BLOOM_SEEDS)).alias("maybe_member"),
            F.coalesce(F.col("is_m"), F.lit(False)).alias("is_member"),
        )
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "wap_publish_gate",
    tier="D",
    oracle="""
    WITH base AS (SELECT * FROM documents WHERE doc_id % 10 < 8),
    staged AS (SELECT * FROM documents),
    vol AS (
      SELECT CAST((SELECT COUNT(*) FROM staged) AS DOUBLE)
             / (SELECT COUNT(*) FROM base) AS v
    ),
    new_docs AS (
      SELECT * FROM documents WHERE doc_id % 10 >= 8
    ),
    dup AS (
      SELECT CAST(COUNT(CASE WHEN b.h IS NOT NULL THEN 1 END) AS DOUBLE)
             / COUNT(*) AS v
      FROM (SELECT doc_id, md5(text) AS h FROM new_docs) n
      LEFT JOIN (SELECT DISTINCT md5(text) AS h FROM base) b USING (h)
    ),
    empty AS (
      SELECT CAST(COUNT(CASE WHEN trim(text) = '' THEN 1 END) AS DOUBLE) AS v
      FROM new_docs
    ),
    shift AS (
      SELECT MAX(ABS(COALESCE(s.share, 0) - COALESCE(b.share, 0))) AS v
      FROM (
        SELECT lang, CAST(COUNT(*) AS DOUBLE)
                     / (SELECT COUNT(*) FROM staged) AS share
        FROM staged GROUP BY lang
      ) s
      FULL OUTER JOIN (
        SELECT lang, CAST(COUNT(*) AS DOUBLE)
                     / (SELECT COUNT(*) FROM base) AS share
        FROM base GROUP BY lang
      ) b USING (lang)
    ),
    audits AS (
      SELECT 'volume_ratio' AS audit, ROUND(v, 6) AS metric,
             (v BETWEEN 0.8 AND 1.5) AS passed FROM vol
      UNION ALL
      SELECT 'dup_rate', ROUND(v, 6), v <= 0.10 FROM dup
      UNION ALL
      SELECT 'empty_docs', ROUND(v, 6), v = 0 FROM empty
      UNION ALL
      SELECT 'lang_shift', ROUND(v, 6), v <= 0.10 FROM shift
    )
    SELECT audit, metric, passed FROM audits
    UNION ALL
    SELECT 'publish', CAST(NULL AS DOUBLE), bool_and(passed) FROM audits
    """,
)
def wap_publish_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E55: write-audit-publish gate — the Iceberg WAP pattern over a
    corpus registry: a staged corpus version (base slice doc_id%10<8
    plus the incoming remainder) must pass volume-delta, duplicate-
    rate, empty-doc, and language-distribution-shift audits before the
    snapshot is published; the final row is the publish decision the
    snapshot-promotion job (the reference's REPLACE commit,
    SURVEY SS2-B B4) acts on.

    Scale shape: every audit reduces to an O(languages)- or O(1)-row
    aggregate before any join; the dup audit joins the *incoming slice
    only* against base content hashes (shuffle on the hash key, or
    broadcast when the increment is small); the audit union is
    driver-sized.  This runs per promotion, not per query."""
    docs = io.table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 10 < 8)
    staged = docs
    new_docs = docs.filter(F.col("doc_id") % 10 >= 8)

    # 1-row count aggregates; cross-joined (broadcast) where a ratio
    # needs both — no driver-side .count() actions.
    nb = base.agg(F.count("*").alias("nb"))
    ns = staged.agg(F.count("*").alias("ns"))
    vol_row = ns.crossJoin(nb).select((F.col("ns") / F.col("nb")).alias("v"))

    dup_row = (
        new_docs.select("doc_id", F.md5("text").alias("h"))
        .join(
            base.select(F.md5("text").alias("h")).distinct().withColumn("in_b", F.lit(1)),
            "h",
            "left",
        )
        .agg(
            (
                F.count(F.when(F.col("in_b").isNotNull(), 1))
                / F.count("*")
            ).alias("v")
        )
    )
    empty_row = new_docs.agg(
        F.count(F.when(F.trim("text") == "", 1)).cast("double").alias("v")
    )
    s_share = (
        staged.groupBy("lang")
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(ns))
        .select("lang", (F.col("n") / F.col("ns")).alias("s"))
    )
    b_share = (
        base.groupBy("lang")
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(nb))
        .select("lang", (F.col("n") / F.col("nb")).alias("b"))
    )
    shift_row = (
        s_share.join(b_share, "lang", "full_outer")
        .agg(
            F.max(
                F.abs(
                    F.coalesce(F.col("s"), F.lit(0.0))
                    - F.coalesce(F.col("b"), F.lit(0.0))
                )
            ).alias("v")
        )
    )

    def audit(name: str, row: DataFrame, passed) -> DataFrame:
        return row.select(
            F.lit(name).alias("audit"),
            F.round(F.col("v"), 6).alias("metric"),
            passed(F.col("v")).alias("passed"),
        )

    audits = (
        audit("volume_ratio", vol_row, lambda v: (v >= 0.8) & (v <= 1.5))
        .unionAll(audit("dup_rate", dup_row, lambda v: v <= 0.10))
        .unionAll(audit("empty_docs", empty_row, lambda v: v == 0))
        .unionAll(audit("lang_shift", shift_row, lambda v: v <= 0.10))
    )
    publish = audits.agg(
        F.lit("publish").alias("audit"),
        F.lit(None).cast("double").alias("metric"),
        F.bool_and("passed").alias("passed"),
    ).select("audit", "metric", "passed")
    return audits.unionAll(publish)
