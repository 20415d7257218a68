"""Tier D (part 3) — training-data-pipeline extensions (SURVEY.md
SS2-E E50-E59).

Second batch of LLM-corpus operators beyond E18-E49: corpus-frequency
boilerplate detection, BPE merge-candidate counting, sequence-length
bucketing for batch assembly, a deterministic k-means iteration over
embeddings, Bloom-filter membership pre-screening with exact
false-positive accounting, a write-audit-publish promotion gate
(the Iceberg WAP pattern applied to a corpus registry — the data-path
completion of the reference's snapshot lifecycle,
AwsTableManagementMetricsEvaluator.java:74-105), quality-decile
resampling, term-level corpus drift, ingest quarantine routing, and
dedup ROI accounting.

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
from ..operators import text as TXo
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

    Scale shape: shingling is narrow (operators/dedup.shingles) and
    materialized once (localCheckpoint) for its three consumers.  The
    join carries ONLY the boilerplate shingles (df >= 3 post-filter) —
    tiny relative to the corpus since boilerplate is frequent by
    definition, so AQE broadcast-converts it; the full doc-frequency
    table (mostly singleton shingles, nearly as large as the shingle
    table itself) never sits on a sort-merge join side.  Per-doc
    totals and per-doc boilerplate counts agg on the same doc_id key,
    so the final join reuses one partitioning.  shingles() emits
    DISTINCT (doc_id, shingle), so document frequency is a plain
    COUNT(*) — no distinct-agg buffers."""
    sh = D.shingles(
        io.table(spark, sf_dir, "documents").select("doc_id", "text"), 3
    ).localCheckpoint(eager=False)
    boiler = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= _BOILER_MIN_DOCS)
        .select("shingle")
    )
    # Totals and boilerplate counts in ONE pass: left-join the (tiny,
    # broadcast) boiler set onto the shingle rows and aggregate by
    # doc_id once — the former shape aggregated sh by doc_id twice
    # (plain count + post-inner-join count) and joined the two
    # doc-sized results back together.  The broadcast probe work is
    # unchanged (the inner join probed every sh row too); one sh scan,
    # one doc-keyed exchange, and the final doc_id join disappear
    # (r15, the CMS/dq ride-one-scan move).  boiler rows are distinct
    # shingles, so the left join duplicates nothing.
    flagged = sh.join(
        boiler.withColumn("is_boiler", F.lit(1)), "shingle", "left"
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce("is_boiler", F.lit(0))).cast("long").alias("n_boiler"),
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


_STOP_SQL = ", ".join(f"'{w}'" for w in TXo.STOPWORDS)

# quality-score CTE — keep in lockstep with queries/text.py
# text_quality_score (the driver-green formulation)
_QUALITY_CTE = rf"""
  qbase AS (
    SELECT doc_id, lang, source, text,
           CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS DOUBLE) AS n_words,
           CAST(length(text) AS DOUBLE) AS n_chars,
           CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) AS n_punct,
           CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                                w -> w IN ({_STOP_SQL}))) AS DOUBLE) AS n_stop
    FROM documents
  ),
  quality AS (
    SELECT doc_id, lang, source, text,
           0.4 * least(n_words / 100.0, 1.0)
           + 0.4 * least(n_stop / greatest(n_words, 1.0) * 4, 1.0)
           + 0.2 * (1 - least(n_punct / greatest(n_chars, 1.0) * 10, 1.0))
             AS q
    FROM qbase
  )
"""


@register(
    "sample_quality_deciles",
    tier="D",
    oracle=f"""
    WITH
    {_QUALITY_CTE},
    ranked AS (
      SELECT doc_id, lang, source, text, q,
             NTILE(10) OVER (PARTITION BY lang ORDER BY q, doc_id) AS decile
      FROM quality
    ),
    admitted AS (
      SELECT lang, decile,
             CASE WHEN {_NEUTRAL_HASH.format(col="text")} % 1000000
                       < decile * 100000
                  THEN 1 ELSE 0 END AS admit
      FROM ranked
    )
    SELECT lang, decile,
           COUNT(*) AS n_docs,
           CAST(SUM(admit) AS BIGINT) AS n_admitted
    FROM admitted GROUP BY lang, decile
    """,
)
def sample_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E56: quality-decile resampling — the perplexity-bucket sampling
    idiom: rank docs into per-language quality deciles, then admit
    decile d at d*10% (keep most of the best, a thin slice of the
    worst — preserving some low-quality data is the standard recipe
    against distribution collapse).  Admission is deterministic
    content-hash thresholding (E41/E46 pattern): re-runs and
    repartitions never change the sample.

    Scale shape: the decile rank is a per-language window (bounded
    stratum count, same shape as the driver-green stratified sampler);
    at 100 TB the rank is replaced by broadcast approx-quantile
    cutoffs — the admission and accounting stages are unchanged.  One
    window shuffle on lang + one bounded agg."""
    # un-rounded quality score (the green text_quality_score rounds
    # only at output; the decile rank needs the raw double)
    _, len_s, stop_s, punct_p = TXo._quality_parts()
    qexpr = 0.4 * len_s + 0.4 * stop_s + 0.2 * (1 - punct_p)
    w = Window.partitionBy("lang").orderBy("q", "doc_id")
    ranked = (
        io.table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "text", qexpr.alias("q"))
        .withColumn("decile", F.ntile(10).over(w))
    )
    admit = (
        D.neutral_word_hash(F.col("text")) % 1_000_000
        < F.col("decile") * 100_000
    ).cast("long")
    return (
        ranked.select("lang", "decile", admit.alias("admit"))
        .groupBy("lang", "decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("admit").cast("long").alias("n_admitted"),
        )
    )


_DRIFT_TOP = 20


@register(
    "corpus_term_drift",
    tier="D",
    oracle=rf"""
    WITH words_s AS (
      SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                w -> w <> '')) AS word
      FROM documents
    ),
    words_b AS (
      SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                w -> w <> '')) AS word
      FROM documents WHERE doc_id % 10 < 8
    ),
    cs AS (SELECT word, COUNT(*) AS n_staged FROM words_s GROUP BY word),
    cb AS (SELECT word, COUNT(*) AS n_base FROM words_b GROUP BY word),
    tot AS (
      SELECT (SELECT CAST(SUM(n_staged) AS BIGINT) FROM cs) AS ts,
             (SELECT CAST(SUM(n_base) AS BIGINT) FROM cb) AS tb
    ),
    joined AS (
      SELECT COALESCE(cs.word, cb.word) AS word,
             COALESCE(cs.n_staged, 0) AS n_staged,
             COALESCE(cb.n_base, 0) AS n_base
      FROM cs FULL OUTER JOIN cb ON cs.word = cb.word
    )
    SELECT word,
           CAST(n_base AS BIGINT) AS n_base,
           CAST(n_staged AS BIGINT) AS n_staged,
           ROUND(ABS(CAST(n_staged AS DOUBLE) / t.ts
                     - CAST(n_base AS DOUBLE) / t.tb), 6) AS drift
    FROM joined CROSS JOIN tot t
    ORDER BY drift DESC, word LIMIT {_DRIFT_TOP}
    """,
)
def corpus_term_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E57: term-level distribution drift between the base corpus
    (doc_id%10<8) and the staged version — the fine-grained companion
    of the WAP gate's coarse language-shift audit: the top-20 terms by
    absolute unigram-share change, the observability signal that
    catches a scraper regression or a new spam source before
    publishing.

    Scale shape: two word aggs shuffle on the word key and full-outer
    join on the SAME key (one exchange reused); the two scalar totals
    broadcast; top-k sits behind a total order.  No corpus text ever
    moves — only (word, count) pairs."""
    def words(df: DataFrame) -> DataFrame:
        return df.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("word")
        ).filter(F.col("word") != "")

    docs = io.table(spark, sf_dir, "documents")
    cs = words(docs).groupBy("word").agg(F.count("*").alias("n_staged"))
    cb = words(docs.filter(F.col("doc_id") % 10 < 8)).groupBy("word").agg(
        F.count("*").alias("n_base")
    )
    tot = cs.agg(F.sum("n_staged").cast("long").alias("ts")).crossJoin(
        cb.agg(F.sum("n_base").cast("long").alias("tb"))
    )
    joined = (
        cs.join(cb, "word", "full_outer")
        .select(
            "word",
            F.coalesce("n_staged", F.lit(0)).alias("n_staged"),
            F.coalesce("n_base", F.lit(0)).alias("n_base"),
        )
        .crossJoin(F.broadcast(tot))
    )
    return (
        joined.select(
            "word",
            F.col("n_base").cast("long").alias("n_base"),
            F.col("n_staged").cast("long").alias("n_staged"),
            F.round(
                F.abs(
                    F.col("n_staged") / F.col("ts") - F.col("n_base") / F.col("tb")
                ),
                6,
            ).alias("drift"),
        )
        .orderBy(F.desc("drift"), F.asc("word"))
        .limit(_DRIFT_TOP)
    )


@register(
    "route_quarantine",
    tier="D",
    oracle=rf"""
    WITH
    {_QUALITY_CTE},
    feats AS (
      SELECT source, q,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_tokens,
             len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{{2,}}')) AS n_pii
      FROM quality
    ),
    routed AS (
      SELECT source,
             CASE WHEN q < 0.3 OR n_tokens < 5 THEN 'reject'
                  WHEN n_pii > 0 THEN 'review'
                  ELSE 'accept' END AS verdict,
             n_tokens
      FROM feats
    )
    SELECT source, verdict,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM routed GROUP BY source, verdict
    """,
)
def route_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E58: ingest routing / dead-letter quarantine — every incoming
    doc is routed accept / review (PII present -> human or scrubber
    queue) / reject (degenerate quality or too short), with per-source
    routing counts: the triage report an ingest pipeline emits per
    batch.  Composes the driver-green quality score (gate), the E13
    PII detector (review trigger), and the token counter (floor).

    Scale shape: every signal is a map-side expression on the text
    column; one agg on (source, verdict) — bounded keys, partial
    combine; no joins, no window."""
    docs = io.table(spark, sf_dir, "documents")
    # un-rounded quality score, same as sample_quality_deciles
    _, len_s, stop_s, punct_p = TXo._quality_parts()
    q = 0.4 * len_s + 0.4 * stop_s + 0.2 * (1 - punct_p)
    n_tokens = TXo.token_count_col()
    n_pii = F.size(
        F.regexp_extract_all(
            F.col("text"), F.lit(r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"), F.lit(0)
        )
    )
    verdict = (
        F.when((q < 0.3) | (n_tokens < 5), "reject")
        .when(n_pii > 0, "review")
        .otherwise("accept")
    )
    return (
        docs.select("source", verdict.alias("verdict"), n_tokens.alias("n_tokens"))
        .groupBy("source", "verdict")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )


@register(
    "dedup_token_savings",
    tier="D",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, source, md5(text) AS h,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_tokens
      FROM documents
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rk
      FROM toks
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
           CAST(SUM(CASE WHEN rk > 1 THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_saved,
           ROUND(CAST(SUM(CASE WHEN rk > 1 THEN n_tokens ELSE 0 END) AS DOUBLE)
                 / SUM(n_tokens), 6) AS savings_frac
    FROM ranked GROUP BY source
    """,
)
def dedup_token_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E59: dedup ROI accounting — per source, the documents and
    tokens that exact dedup (D1's min-doc_id survivor rule) removes:
    the metric that justifies (or kills) a dedup stage's compute
    budget, and the per-source dup-rate monitor fed back to crawl
    scheduling.

    Scale shape: the same single window shuffle on content hash as
    the D1 dedup itself (rank per hash partition), then one bounded
    agg on source — dedup and its accounting share one plan."""
    w = Window.partitionBy("h").orderBy("doc_id")
    toks = io.table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.md5("text").alias("h"), TXo.token_count_col().alias("n_tokens")
    )
    ranked = toks.withColumn("rk", F.row_number().over(w))
    dropped = (F.col("rk") > 1).cast("long")
    return ranked.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(dropped).cast("long").alias("n_dropped"),
        F.sum("n_tokens").cast("long").alias("tokens_total"),
        F.sum(dropped * F.col("n_tokens")).cast("long").alias("tokens_saved"),
        F.round(
            F.sum(dropped * F.col("n_tokens")) / F.sum("n_tokens"), 6
        ).alias("savings_frac"),
    )
