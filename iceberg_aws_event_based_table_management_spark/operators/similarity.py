"""Similarity search over embedding columns (SURVEY.md SS2-D D3/D4 +
BASELINE.json ANN requirement).

Paths, in order of scale:

- brute-force cosine top-k: cross join against the (broadcast) query
  vector; exact — the oracle-validation path at small sf, and the
  correct baseline for recall measurement.
- threshold self-join blocked by `label`: all pairs >= tau inside each
  block — blocking bounds the quadratic term to block sizes.
- LSH-bucketed ANN (random hyperplane signs): candidate generation by
  bucket equi-join, exact re-rank inside buckets only.  This is the
  100 TB path: the cross join never materializes.

Dot products use zip_with + aggregate on doubles — JVM-side, sequential
fold (deterministic order).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def lit_double_array(values) -> Column:
    """A DOUBLE array literal built as ONE parsed expression — the
    element-wise F.lit loop paid ~len(values) py4j round-trips of
    driver latency per query build (≈0.3-0.5 s for a 64-dim query
    vector, profiled r15).  `repr(float(x))` is the shortest
    round-trip decimal, and Spark's `...D` literal parses it back via
    Double.parseDouble to the bit-identical value."""
    return F.expr("array(" + ", ".join(f"{float(x)!r}D" for x in values) + ")")


def lit_long_array(values) -> Column:
    """A BIGINT array literal as one parsed expression (see
    lit_double_array)."""
    return F.expr("array(" + ", ".join(f"{int(v)}L" for v in values) + ")")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def topk_bruteforce(embeddings: DataFrame, query_vec: list[float], k: int = 20) -> DataFrame:
    """D3 baseline: exact cosine top-k vs a literal query vector.

    The query vector is a broadcast literal column — the 'cross join'
    is really a map-side projection + TakeOrderedAndProject; nothing
    shuffles but the k winners."""
    q = lit_double_array(query_vec)
    scored = embeddings.select(
        "vec_id",
        "label",
        F.round(cosine(as_double("embedding"), q), 6).alias("cosine_sim"),
    )
    return scored.orderBy(F.desc("cosine_sim"), "vec_id").limit(k)


def knn_join(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    max_broadcast_rows: int = 100_000,
    max_chunks: int = 16,
) -> DataFrame:
    """Batch kNN join: for every query vector, its exact top-k cosine
    neighbors among the candidates — the many-query generalization of
    topk_bruteforce (one retrieval pass serves a whole query table).

    The query matrix is broadcast to executors; each candidate Arrow
    batch scores against all queries as ONE float64 GEMM (the
    threshold_pairs_blocked lesson: dense linear algebra beats
    per-pair zip_with folds ~5-10x), then emits only its LOCAL top-k
    per query, so rows leaving the scan stage are k x queries x
    batches — never candidates x queries.  One narrow shuffle ranks
    the local winners globally.  Local selection uses the same
    (sim desc, id asc) total order as the final rank, so the global
    top-k is always contained in the union of local top-ks, ties
    included.

    Query sides above `max_broadcast_rows` run as a block-nested GEMM:
    the query table splits into ceil(n / cap) hash chunks on vec_id,
    each chunk broadcasts within the cap and scores in its own pass
    over the candidates (q_ids are disjoint across chunks, so one
    final window ranks the union).  The cost — one candidate scan per
    chunk — is the honest exact-kNN quadratic term made explicit and
    memory-bounded; past `max_chunks` passes the call raises instead
    of burying an accidental n² (that scale wants the LSH/IVF paths,
    ann_topk_lsh / ivf_search)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    sc = candidates.sparkSession.sparkContext
    q_sel = queries.select("vec_id", "embedding")
    # PULL-FIRST sizing (r15): snapshot limit(cap+1) BEFORE any
    # count().  A query side within the cap — the overwhelmingly
    # common case — is fully sized by its own bounded snapshot, so
    # the separate sizing-count job (one full pass + one job barrier
    # per query BUILD, paid 4x per benched query) disappears.  Only
    # an over-cap snapshot (cap+1 rows pulled) pays the count, which
    # then sizes the chunked path exactly as before; a count that
    # STILL says <= cap contradicts the snapshot (nondeterministic
    # query side) and raises the r13 single-chunk guard unchanged.
    # Driver materialization stays bounded by cap+1 rows either way.
    head_pd = q_sel.limit(max_broadcast_rows + 1).toPandas()
    if len(head_pd) <= max_broadcast_rows:
        n_chunks = 1
    else:
        n_queries = q_sel.count()
        n_chunks = max(1, -(-n_queries // max_broadcast_rows))
        if n_chunks > max_chunks:
            raise ValueError(
                f"knn_join query side has {n_queries} rows = {n_chunks} "
                f"broadcast chunks of {max_broadcast_rows}, above the "
                f"{max_chunks}-pass cap; use the LSH-blocked path "
                "(ann_topk_lsh) or raise max_broadcast_rows/max_chunks "
                "explicitly"
            )
        if n_chunks == 1:
            # cap+1 rows snapshotted but the count says <= cap: the
            # query side is nondeterministic between evaluations.
            raise ValueError(
                f"knn_join query snapshot exceeds max_broadcast_rows"
                f"={max_broadcast_rows} (the sizing count saw fewer — "
                "nondeterministic query side?); use ann_topk_lsh/"
                "ivf_search or raise max_broadcast_rows"
            )
    if n_chunks > 1:
        # persist() pins ONE evaluation of the query side across the
        # per-chunk toPandas() reads below: if `queries` is
        # nondeterministic (limit/sample/derived from a shuffle without
        # a stable sort), re-evaluation could change rows between reads
        # and the xxhash64-mod chunking would silently drop or
        # duplicate queries.  The single-chunk path does exactly one
        # toPandas() — already one evaluation — so it skips the cache
        # write/read round-trip (r11 bench: the persist cost
        # label_noise_knn_consensus ~0.7 s per run at sf0.1; the
        # count() above may see a different evaluation, but it only
        # sizes the chunking, never selects rows).  Bounded memory:
        # the cap rejects query sides above
        # max_chunks x max_broadcast_rows rows before anything large
        # is cached.  Unpersisted before return — every chunk is
        # already materialized driver-side into its broadcast by then.
        q_sel = q_sel.persist()
    cand_sel = candidates.select("vec_id", "embedding")

    def make_score(bq):
        def score(batches):
            ids_q, qu = bq.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                cm = np.asarray(
                    [np.asarray(x, dtype=np.float64) for x in pdf["embedding"]]
                )
                n_ids = pdf["vec_id"].to_numpy()
                cn = np.linalg.norm(cm, axis=1)
                cn[cn == 0.0] = 1.0
                cu = cm / cn[:, None]
                n_b = cu.shape[0]
                kk = min(k, n_b)
                # Sub-block the query axis so the (batch × queries)
                # sims matrix stays ~4M cells (~32 MB) per worker —
                # at 200k broadcast queries an unblocked GEMM output
                # was 8 GB × 32 workers (the r11 sf10 OOM).  Each
                # query column's top-k is independent, so blocking is
                # result-invariant.
                qblock = max(256, (1 << 22) // max(n_b, 1))
                # Exact (sim desc, id asc) top-k via ONE int64
                # composite key per cell: sims are 6-dec rounded so
                # rint(sims*1e6) is exact, and key = sim_i*n_b -
                # id_rank orders by (sim desc, id asc) — an id-rank
                # difference (< n_b) can never flip a 1-ulp sim step
                # (= n_b).  argpartition is O(n_b) per column vs the
                # r11 matrix lexsort's O(n_b log n_b) — 3x at
                # 10k × 2k in the kernel micro-bench.  Emission order
                # within the k is irrelevant: the global window
                # re-ranks with the same total order, so only the SET
                # of locally-emitted candidates matters, and the key
                # selects exactly the lexsort's set, ties included.
                id_rank = np.empty(n_b, dtype=np.int64)
                id_rank[np.argsort(n_ids, kind="stable")] = np.arange(n_b)
                for s in range(0, len(ids_q), qblock):
                    sims = np.round(cu @ qu[s : s + qblock].T, 6)
                    key = (
                        np.rint(sims * 1e6).astype(np.int64) * n_b
                        - id_rank[:, None]
                    )
                    order = np.argpartition(-key, kk - 1, axis=0)[:kk]
                    yield pd.DataFrame(
                        {
                            "q_id": np.repeat(ids_q[s : s + qblock], kk),
                            "n_id": n_ids[order].T.ravel(),
                            "cosine_sim": np.take_along_axis(
                                sims, order, axis=0
                            ).T.ravel(),
                        }
                    )

        return score

    scored = None
    for c in range(n_chunks):
        if n_chunks == 1:
            # The pull-first snapshot above already delivered the
            # whole (<= cap) query side — reuse it; the single-chunk
            # path does exactly ONE pull, one evaluation.
            qpd = head_pd
        else:
            # The sizing count() above and this pull are separate
            # evaluations; on a NONDETERMINISTIC query side (sample /
            # limit / unstable shuffle) the snapshot can exceed what
            # the count saw — in the multi-chunk path too, since the
            # count ran BEFORE persist() pinned the evaluation the
            # chunks read.  Pulling through limit(bound+1) caps what
            # the DRIVER ever materializes (r13 ADVICE: the old
            # post-pull check fired only after the oversized
            # toPandas() had already paid the spike) while returning
            # every row of an in-bound chunk unchanged.  A hash chunk
            # gets 2x slack because xxhash64-mod splitting is
            # balanced only in expectation (n_chunks = ceil(n/cap)
            # puts the mean chunk near cap, so ordinary variance may
            # nudge one past it) — overflow past the slack still
            # raises with the same escalation contract as the
            # max_chunks cap: that scale wants LSH/IVF.
            chunk = q_sel.filter(F.pmod(F.xxhash64("vec_id"), F.lit(n_chunks)) == c)
            bound = 2 * max_broadcast_rows
            qpd = chunk.limit(bound + 1).toPandas()
            if len(qpd) > bound:
                raise ValueError(
                    f"knn_join chunk {c} "
                    f"exceeds 2x max_broadcast_rows"
                    f"={bound} (the sizing count saw fewer — "
                    "nondeterministic query side?); use ann_topk_lsh/"
                    "ivf_search or raise max_broadcast_rows"
                )
        if len(qpd) == 0:
            continue
        q_ids = qpd["vec_id"].to_numpy()
        qm = np.asarray([np.asarray(x, dtype=np.float64) for x in qpd["embedding"]])
        qn = np.linalg.norm(qm, axis=1)
        qn[qn == 0.0] = 1.0
        bq = sc.broadcast((q_ids, qm / qn[:, None]))
        part = cand_sel.mapInPandas(
            make_score(bq), schema="q_id long, n_id long, cosine_sim double"
        )
        scored = part if scored is None else scored.unionByName(part)
    if n_chunks > 1:
        q_sel.unpersist()
    if scored is None:
        return candidates.sparkSession.createDataFrame(
            [], "q_id long, n_id long, cosine_sim double, rank int"
        )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine_sim"), "n_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def threshold_pairs_blocked(embeddings: DataFrame, tau: float = 0.2) -> DataFrame:
    """D4: all pairs with cosine >= tau, blocked by `label` — the
    group-by on the block key keeps each task at block_size^2, not n^2.

    Inside each block the pairwise cosines are one float64 GEMM
    (applyInPandas -> numpy V @ V.T on unit-normalized rows) — dense
    linear algebra is the one place built-in expressions lose badly to
    an Arrow-vectorized UDF (~5x here vs a zip_with/aggregate join).
    One shuffle on the block key, no join.  At 100 TB, blocks beyond
    ~10^5 rows should be sub-blocked (second-level LSH key) so the s^2
    pair term and the s x dim matrix stay within a task's memory."""
    import numpy as np
    import pandas as pd

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        v = np.asarray([np.asarray(x, dtype=np.float64) for x in pdf["embedding"]])
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids, v = ids[order], v[order]
        nrm = np.linalg.norm(v, axis=1)
        nrm[nrm == 0.0] = 1.0
        sims = np.round((v / nrm[:, None]) @ (v / nrm[:, None]).T, 6)
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= tau
        return pd.DataFrame(
            {
                "label": pdf["label"].iloc[0],
                "vec_id_a": ids[ia[keep]],
                "vec_id_b": ids[ib[keep]],
                "cosine_sim": sims[ia, ib][keep],
            }
        )

    label_type = dict(embeddings.dtypes)["label"]
    return embeddings.groupBy("label").applyInPandas(
        block_pairs,
        schema=f"label {label_type}, vec_id_a long, vec_id_b long, cosine_sim double",
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure python LCG —
    no numpy RNG state, reproducible across runs/engines)."""
    state = seed
    planes = []
    for _ in range(n_planes):
        vec = []
        for _ in range(dim):
            # Park-Miller LCG
            state = (state * 48271) % 2147483647
            vec.append((state / 2147483647.0) * 2.0 - 1.0)
        n = math.sqrt(sum(x * x for x in vec)) or 1.0
        planes.append([x / n for x in vec])
    return planes


def lsh_bucket_signature(dim: int, n_planes: int = 12, seed: int = 42):
    """Random-hyperplane sign signature as a single long column builder."""
    planes = _hyperplanes(dim, n_planes, seed)

    def sig(vec_col: Column) -> Column:
        bits = []
        for i, p in enumerate(planes):
            pc = lit_double_array(p)
            bits.append(
                F.when(dot(vec_col, pc) >= 0, F.lit(2**i).cast("long")).otherwise(F.lit(0).cast("long"))
            )
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    return sig


def ann_topk_lsh(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 20,
    n_planes: int = 8,
    probe_hamming: int = 1,
) -> DataFrame:
    """D3 scale path: LSH-bucketed approximate top-k.

    Candidates = vectors whose hyperplane-sign bucket is within
    `probe_hamming` bit flips of the query's bucket (multi-probe);
    exact cosine re-rank on candidates only.  Bucket count 2^n_planes
    bounds each probe to ~n/2^planes vectors — at 1000 executors the
    probe list is a broadcast semi-join, never a cross join."""
    dim = len(query_vec)
    sig = lsh_bucket_signature(dim, n_planes)
    e = embeddings.select("vec_id", "label", as_double("embedding").alias("v"))
    bucketed = e.withColumn("bucket", sig(F.col("v")))

    qcol = lit_double_array(query_vec)
    # compute the query bucket on the driver-side via the same planes
    planes = _hyperplanes(dim, n_planes)
    qbits = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, p)) >= 0:
            qbits |= 1 << i
    # multi-probe: every bucket within `probe_hamming` bit flips of the
    # query bucket (recall/cost dial: candidates ~ n * sum(C(planes,k)) / 2^planes)
    probes = [
        qbits ^ mask
        for mask in range(2**n_planes)
        if bin(mask).count("1") <= probe_hamming
    ]

    cands = bucketed.filter(F.col("bucket").isin(probes))
    scored = cands.select(
        "vec_id", "label", F.round(cosine(F.col("v"), qcol), 6).alias("cosine_sim")
    )
    return scored.orderBy(F.desc("cosine_sim"), "vec_id").limit(k)


# IVF determinism scheme: every vector is quantized ONCE to integers
# (xq = floor(x * VEC_Q) per component), after which every REDUCTION in
# the k-means loop — dot products, sums of squares, per-dimension mean
# sums — is exact int64 arithmetic, which commutes: no shuffle order,
# partition count, or engine can change it.  The only float ops left
# are single correctly-rounded IEEE ops on identical inputs (int→double
# below 2^53, one divide, one sqrt), which every engine computes
# bit-identically.  That is what lets ann_topk_ivf carry an exact SQL
# oracle that replays the training, and makes training results
# independent of cluster layout.  Bounds: |x| < 1 in the fixture, so
# xq < 2^20, dot terms < 2^40*64 < 2^46, mean sums < 2^20 * n_rows —
# double-exact up to ~2^33 rows per cluster.
VEC_Q = 1 << 20


def quantize(v: Column) -> Column:
    """floor(x * VEC_Q) per component — exact in both engines (the
    multiply is an exponent shift; floor is floor)."""
    return F.transform(v, lambda x: F.floor(x * F.lit(float(VEC_Q))).cast("long"))


def _int_dot(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def _centroid_score(xq: Column, cq: list[int]) -> Column:
    """score = dot(xq, cq) / ||cq|| — the int dot is exact, the int→
    double casts are exact, and /, sqrt are single IEEE ops: the score
    double is bit-identical across engines."""
    s = sum(v * v for v in cq) or 1
    cql = lit_long_array(cq)
    return _int_dot(xq, cql).cast("double") / F.lit(math.sqrt(float(s)))


def _nearest_centroid(xq: Column, centroids: list[list[int]]) -> Column:
    """Index of the max-score centroid (ties -> highest index, the
    struct-max order)."""
    scored = F.array(
        *[
            F.struct(_centroid_score(xq, cq).alias("d"), F.lit(i).alias("i"))
            for i, cq in enumerate(centroids)
        ]
    )
    return F.array_max(scored)["i"]


def ivf_train(embeddings: DataFrame, k_clusters: int = 16, iters: int = 2) -> list[list[int]]:
    """Train an IVF coarse quantizer: k-means with norm-scored (cosine)
    assignment over the corpus, expressed as DataFrame ops (assign =
    broadcast-literal argmax score; re-estimate = posexplode +
    groupBy(cluster, pos) integer-mean).  Only the K centroid vectors
    ever reach the driver — O(K x dim) metadata, the bounded-driver
    rule at any corpus size.

    Returns centroids as QUANTIZED integer vectors (see VEC_Q note):
    seeds are the K lowest vec_ids' quantized vectors; per-dimension
    means are floor(sum/count) of int64 sums; assignment compares the
    engine-exact score double with ties to the highest index.  Fully
    deterministic across engines and partitionings, so ann_topk_ivf
    carries an exact SQL oracle that replays the training."""
    xq = embeddings.select(
        "vec_id", quantize(as_double("embedding")).alias("xq")
    )
    seeds = xq.orderBy("vec_id").limit(k_clusters).collect()
    centroids = [list(r["xq"]) for r in seeds]
    for _ in range(iters):
        assigned = xq.withColumn("c", _nearest_centroid(F.col("xq"), centroids))
        means = (
            assigned.select("c", F.posexplode("xq").alias("pos", "x"))
            .groupBy("c", "pos")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .withColumn(
                "mq",
                F.floor(F.col("s").cast("double") / F.col("n").cast("double")).cast("long"),
            )
            .groupBy("c")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mq"))), lambda s: s["mq"]
                ).alias("cq")
            )
            .collect()
        )
        by_c = {r["c"]: list(r["cq"]) for r in means}
        # empty cluster keeps its old centroid
        centroids = [by_c.get(i, old) for i, old in enumerate(centroids)]
    return centroids


def ann_topk_ivf(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 20,
    k_clusters: int = 16,
    nprobe: int = 4,
    centroids: list[list[int]] | None = None,
) -> DataFrame:
    """D3 scale path, IVF flavor: coarse-quantize the corpus into
    k_clusters inverted lists, probe the nprobe lists nearest the
    query, exact cosine re-rank inside the probed lists only.

    At 100 TB the assignment column is written once at ingest (and the
    table partitioned/bucketed by it), so a query scans ~nprobe/K of
    the corpus — partition pruning does the work, not a full pass."""
    if centroids is None:
        centroids = ivf_train(embeddings, k_clusters)
    e = embeddings.select("vec_id", "label", as_double("embedding").alias("v"))
    assigned = e.withColumn(
        "cluster_id", _nearest_centroid(quantize(F.col("v")), centroids)
    )

    # probe selection replays _centroid_score in python: exact int dot
    # of the quantized query, then the same two IEEE ops — identical to
    # what the engines compute; ties break to the lower index.
    qq = [math.floor(float(x) * VEC_Q) for x in query_vec]
    def score(cq: list[int]) -> float:
        s = sum(v * v for v in cq) or 1
        return sum(a * b for a, b in zip(qq, cq)) / math.sqrt(float(s))

    probe_order = sorted(range(len(centroids)), key=lambda i: (-score(centroids[i]), i))
    probes = probe_order[:nprobe]

    qcol = lit_double_array(query_vec)
    return (
        assigned.filter(F.col("cluster_id").isin(probes))
        .select("vec_id", "label", F.round(cosine(F.col("v"), qcol), 6).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), "vec_id")
        .limit(k)
    )


def embedding_neardup_pairs(embeddings: DataFrame, tau: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate detection (dedup family): pairs
    above tau inside label blocks; survivors = min vec_id per
    connected pair set is left to the caller."""
    return threshold_pairs_blocked(embeddings, tau)


def label_centroid_outliers(embeddings: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-label centroid + cosine-to-own-centroid outlier score (the
    embedding-space pruning pass: far-from-centroid vectors are
    mislabeled/noise candidates).

    Shape: quantize once (VEC_Q scheme above) -> posexplode +
    groupBy(label, pos) integer-mean builds the centroid table
    (O(labels x dim) — broadcast) -> one broadcast join back scores
    every vector map-side -> per-label rank window.  Two metadata-sized
    shuffles (centroid agg, rank window); the corpus shuffles never.

    Determinism: integer sums commute; the mean is floor(one double
    divide); the score is one int->double dot + two sqrts + one
    divide — all single correctly-rounded IEEE ops, so scores and
    ranks are engine-identical (same argument as ivf_train)."""
    xq = quantize(as_double(F.col(vec_col)))
    base = embeddings.select("vec_id", "label", xq.alias("xq"))
    cent = (
        base.select("label", F.posexplode("xq").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(
            F.floor(F.sum("val").cast("double") / F.count("*").cast("double"))
            .cast("long")
            .alias("mq")
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mq"))), lambda s: s["mq"]
            ).alias("cq")
        )
    )
    joined = base.join(F.broadcast(cent), "label")
    a, c = F.col("xq"), F.col("cq")
    score = F.round(
        _int_dot(a, c).cast("double")
        / (
            F.sqrt(_int_dot(a, a).cast("double"))
            * F.sqrt(_int_dot(c, c).cast("double"))
        ),
        6,
    )
    w = Window.partitionBy("label").orderBy(F.asc("centroid_sim"), F.asc("vec_id"))
    return (
        joined.select("vec_id", "label", score.alias("centroid_sim"))
        .withColumn("outlier_rank", F.row_number().over(w).cast("long"))
    )


def normalize_quantize_int8(embeddings: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """L2-normalize + symmetric int8 quantization (the 4x-smaller
    embedding store every retrieval index builds): q_i = round(x_i /
    ||x|| * 127).  Map-side transform only — zero shuffle, linear at
    any corpus size.

    Determinism: float→double casts are exact; the norm is a
    left-to-right double fold (same order both engines) closed by one
    sqrt; each element then sees one divide, one multiply, one
    half-away-from-zero round — all single correctly-rounded IEEE ops
    on identical inputs, so qvec is bit-identical across engines."""
    v = as_double(F.col(vec_col))
    nrm = norm(v)
    qvec = F.transform(v, lambda x: F.round((x / nrm) * 127, 0).cast("int"))
    return embeddings.select(
        "vec_id",
        "label",
        F.round(nrm, 6).alias("l2_norm"),
        qvec.alias("qvec"),
    )


def assign_quantized_l2(embeddings: DataFrame, k: int = 8) -> DataFrame:
    """(vec_id, cluster_id): nearest of k deterministic centroids under
    exact quantized L2 — the k lowest vec_ids' quantized vectors serve
    as centroids (the deterministic k-means++ stand-in; same scheme as
    the E53 assign step, factored out here so SemDeDup can reuse it).

    Scale shape: the centroid side is k rows — broadcast; the distance
    is a map-side zip_with/aggregate over int64 (exact, engine-
    independent — see the VEC_Q note above); the per-vector argmin is
    a min(struct) partial agg that combines map-side.  The corpus
    never shuffles on anything but vec_id."""
    x = embeddings.select("vec_id", quantize(F.col("embedding")).alias("xq"))
    cent = (
        x.orderBy("vec_id")
        .limit(k)
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
    dists = x.crossJoin(F.broadcast(cent)).select("vec_id", "cluster_id", d.alias("d"))
    return (
        dists.groupBy("vec_id")
        .agg(F.min(F.struct("d", "cluster_id")).alias("m"))
        .select("vec_id", F.col("m.cluster_id").alias("cluster_id"))
    )


def semdedup_flags(embeddings: DataFrame, k: int = 8, tau: float = 0.3) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    dedup by k-means blocking + within-cluster cosine pruning.  Every
    vector is assigned to a cluster; inside each cluster, any vector
    with a cosine >= tau neighbor of smaller vec_id is pruned (the
    keep-lowest-id survivor rule, the same convention as exact dedup).
    Returns (vec_id, cluster_id, is_pruned) for the whole corpus.

    The clustering is what makes this the scale path for semantic
    dedup: pairwise work is bounded per cluster (cluster_size^2), not
    n^2 — exactly the paper's argument.  Clusters beyond ~10^5 rows
    sub-block like threshold_pairs_blocked.  One shuffle on the
    cluster key for the GEMM, one hash-join back on vec_id."""
    assign = assign_quantized_l2(embeddings, k)
    blocked = (
        embeddings.join(assign, "vec_id")
        .select(F.col("cluster_id").alias("label"), "vec_id", "embedding")
    )
    pairs = threshold_pairs_blocked(blocked, tau)
    pruned = (
        pairs.select(F.col("vec_id_b").alias("vec_id"))
        .distinct()
        .withColumn("pr", F.lit(True))
    )
    return (
        assign.join(pruned, "vec_id", "left")
        .select(
            "vec_id",
            "cluster_id",
            F.coalesce("pr", F.lit(False)).alias("is_pruned"),
        )
    )
