"""Measured scaling curve for the heavy-dedup family (r8 verdict #5).

Builds synthetic corpora at multiples of sf0.1 (an sf1-equivalent at
x10) and times each dedup query across the curve, fitting the log-log
scaling exponent.  SCALE.md's dedup rows argue linearity from plan
shape; this converts the argument into a measurement exactly where
100 TB risk concentrates.

Corpus construction preserves the DUPLICATE-DENSITY PROFILE: copy k of
the sf0.1 documents gets every word suffixed with the copy tag, so
copies share zero shingle/token vocabulary — within-copy duplicate
structure is replicated exactly, cross-copy similarity is zero, and
the true output (duplicate pairs, clusters) scales x k by
construction.  Naive replication (identical text) would inflate every
duplicate cluster k-fold and make pair counts grow k^2 BY
CONSTRUCTION, which would measure the fixture, not the engine.

Usage: python tools/scale_probe.py [--mults 1,3,10] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import iceberg_aws_event_based_table_management_spark as engine
from iceberg_aws_event_based_table_management_spark.session import get_spark

BASE = "/root/testdata/sf0.1"
FAMILIES = {
    "dedup": [
        "dedup_ngram_jaccard",
        "dedup_simhash_hamming",
        "dedup_prefix_filter_pairs",
        "dedup_incremental_neardup",
        "dedup_cluster_survivors",
    ],
    "text": [
        "tfidf_top_terms",
        "text_boilerplate_ngrams",
        "text_winnow_fingerprints",
        "pipeline_training_corpus",
    ],
    "embedding": [
        "topk_similarity_bruteforce",
        "ann_topk_ivf",
        "ann_topk_lsh",
        "dedup_embedding_neardup",
        "dedup_semantic_semdedup",
        "kmeans_assign_step",
    ],
}
QUERIES = FAMILIES["dedup"]
ID_STRIDE = 10_000_000


def build_scaled(spark, mult: int, workdir: str) -> str:
    out = os.path.join(workdir, f"x{mult}")
    dest = os.path.join(out, "documents.parquet")
    if os.path.exists(dest):
        return out
    os.makedirs(out, exist_ok=True)
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    parts = []
    for k in range(mult):
        c = docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * ID_STRIDE))
        if k > 0:
            # disjoint vocabulary per copy: every word suffixed x{k}
            c = c.withColumn(
                "text", F.regexp_replace("text", r"(\S+)", f"$1x{k}")
            ).withColumn("n_chars", F.length("text"))
        parts.append(c)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.repartition(max(4, 4 * mult)).write.mode("overwrite").parquet(dest)

    # Embeddings: copy k applies a per-copy RANDOM ROTATION (a true
    # isometry): every within-copy inner product — and therefore every
    # within-copy near-dup / kNN / centroid structure — is preserved
    # EXACTLY, while cross-copy cosines collapse to ~1/sqrt(d) random
    # directions, so the true near-dup output scales x k linearly just
    # like the disjoint-vocabulary corpus.  (A sign-flip pattern is
    # NOT enough here: the fixture's vectors concentrate ~60% of their
    # mass in 2 of 64 dims, so flips that spare the spike dims leaked
    # cross-copy pairs — measured before switching to rotations.)
    import numpy as np
    import pandas as pd

    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    rotations = {}
    for k in range(1, mult):
        rng = np.random.RandomState(1000 + k)
        q, _ = np.linalg.qr(rng.randn(dim, dim))
        rotations[k] = q.astype(np.float64)

    def rotate(k: int):
        rot = rotations[k]

        def fn(batches):
            for pdf in batches:
                mat = np.vstack(pdf["embedding"].map(np.asarray).to_numpy())
                pdf = pdf.copy()
                pdf["embedding"] = list((mat @ rot.T).astype(np.float32))
                pdf["vec_id"] = pdf["vec_id"] + k * ID_STRIDE
                # labels offset per copy: label is the BLOCKING key of
                # the near-dup operators, so shared labels would put
                # rotated strangers in one block and leak cross-copy
                # candidate pairs (tau=0.3 is low enough that ~0.8% of
                # random same-block cosines pass — measured)
                pdf["label"] = pdf["label"] + k * 1000
                yield pdf

        return fn

    eparts = [emb]
    for k in range(1, mult):
        eparts.append(emb.mapInPandas(rotate(k), schema=emb.schema))
    ue = eparts[0]
    for p in eparts[1:]:
        ue = ue.unionByName(p)
    ue.repartition(max(4, 4 * mult)).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,3,10")
    ap.add_argument("--out", default=None)
    ap.add_argument("--family", default=None, choices=sorted(FAMILIES))
    ap.add_argument("--queries", default=None)
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]
    if args.queries:
        queries = args.queries.split(",")
    elif args.family:
        queries = FAMILIES[args.family]
    else:
        queries = QUERIES

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    engine.load_all_queries()
    qmap = engine.query_map()

    workdir = "/tmp/dedup-scale-probe"
    shutil.rmtree(workdir, ignore_errors=True)
    # Record fixture-build time separately from measurement (r11
    # verdict #7: the ppjoin x30 "40.7 s" conflated rebuild + GC with
    # the measured run and needed an A/B appendix to explain away).
    build_s: dict[str, float] = {}
    dirs: dict[int, str] = {}
    for m in mults:
        t0 = time.monotonic()
        dirs[m] = build_scaled(spark, m, workdir)
        build_s[str(m)] = round(time.monotonic() - t0, 3)

    results: dict[str, dict] = {}
    for q in queries:
        times, rows, warm_s = {}, {}, {}
        for m in mults:
            # One untimed warm run PER (query, mult) — not just at the
            # smallest mult — so the timed runs never pay first-scan
            # page-cache misses or codegen for this plan shape; its
            # duration is still recorded (warm_run_s) for honesty.
            t0 = time.monotonic()
            n = qmap[q](spark, dirs[m]).count()
            warm_s[str(m)] = round(time.monotonic() - t0, 3)
            # min of 2 runs: a single local-mode run is exposed to GC
            # pauses and shuffle-dir churn from the previous query's
            # x10 run (observed 40s vs 4s flukes); min is the standard
            # noise floor estimator for scaling curves
            best = None
            for _ in range(2):
                t0 = time.monotonic()
                n = qmap[q](spark, dirs[m]).count()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            times[m] = round(best, 3)
            rows[m] = n
        lo, hi = mults[0], mults[-1]
        exponent = math.log(times[hi] / times[lo]) / math.log(hi / lo)
        results[q] = {
            "seconds": {str(m): times[m] for m in mults},
            "warm_run_s": warm_s,
            "rows": {str(m): rows[m] for m in mults},
            "exponent_x1_to_x%d" % hi: round(exponent, 3),
        }
        print(q, results[q])

    payload = {
        "base": BASE,
        "mults": mults,
        "build_s": build_s,
        "protocol": "exponents from warm timed runs only: per (query, mult) "
        "one untimed warm pass then min-of-2 timed; fixture build cost "
        "recorded separately in build_s",
        "note": "copy-k words suffixed -> disjoint cross-copy vocabulary; "
        "duplicate density preserved, output scales linearly by construction",
        "results": results,
    }
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(payload, fh, indent=1)
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
