"""One-off profile of the dedup_prefix_filter_pairs x30 cliff (r9
verdict #3): stage-by-stage row counts and timings at each corpus
multiple, plus which broadcast-gate branch fires, to separate
candidate blowup / window skew / plan-regime switch / fixture
artifact.

Usage: python tools/profile_ppjoin.py [--mults 1,10,30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

import iceberg_aws_event_based_table_management_spark as engine
from iceberg_aws_event_based_table_management_spark.operators import dedup as D
from iceberg_aws_event_based_table_management_spark.session import get_spark
from iceberg_aws_event_based_table_management_spark.queries import pipeline_ext6 as E6
from iceberg_aws_event_based_table_management_spark import io

from tools.scale_probe import build_scaled


def timed(label, thunk, out):
    t0 = time.monotonic()
    v = thunk()
    dt = round(time.monotonic() - t0, 2)
    out[label] = {"value": v, "sec": dt}
    print(f"  {label}: {v} [{dt}s]", flush=True)
    return v


def profile(spark, sf_dir: str) -> dict:
    out: dict = {}
    est = E6._pf_estimated_shingles(sf_dir)
    out["estimated_shingles"] = est
    out["broadcast_gate"] = bool(est <= E6._PF_BCAST_MAX_SHINGLES)
    print(f"  gate: est={est} broadcast={out['broadcast_gate']}", flush=True)

    docs = io.table(spark, sf_dir, "documents").select("doc_id", "text")
    sh = D.shingles(docs, 3).localCheckpoint(eager=False)
    timed("n_shingle_rows", lambda: sh.count(), out)
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df")).filter(F.col("df") >= 2)
    timed("n_repeated_shingles", lambda: dfreq.count(), out)
    ranked = sh.join(dfreq, "shingle", "left").withColumn(
        "df", F.coalesce(F.col("df"), F.lit(1))
    )
    byrare = Window.partitionBy("doc_id").orderBy("df", "shingle")
    docw = Window.partitionBy("doc_id")
    pref = (
        ranked.select(
            "doc_id",
            "shingle",
            F.row_number().over(byrare).alias("rn"),
            F.count("*").over(docw).alias("n"),
        )
        .filter(F.col("rn") <= F.floor(F.col("n") / 2) + 1)
        .select("doc_id", "shingle", "n")
    )
    timed("n_prefix_rows", lambda: pref.count(), out)
    cands = (
        pref.alias("pa")
        .join(
            pref.alias("pb"),
            (F.col("pa.shingle") == F.col("pb.shingle"))
            & (F.col("pa.doc_id") < F.col("pb.doc_id"))
            & (F.col("pa.n") <= 2 * F.col("pb.n"))
            & (F.col("pb.n") <= 2 * F.col("pa.n")),
        )
        .select(
            F.col("pa.doc_id").alias("doc_id_a"), F.col("pb.doc_id").alias("doc_id_b")
        )
    )
    timed("n_candidate_rows_predistinct", lambda: cands.count(), out)
    timed("n_candidates_distinct", lambda: cands.distinct().count(), out)
    # full query, twice (min)
    qmap = engine.query_map()
    best = None
    for _ in range(2):
        t0 = time.monotonic()
        n = qmap["dedup_prefix_filter_pairs"](spark, sf_dir).count()
        best = min(best or 9e9, time.monotonic() - t0)
    out["full_query"] = {"rows": n, "sec": round(best, 2)}
    print(f"  full_query: {n} rows [{best:.2f}s]", flush=True)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,10,30")
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]
    spark = get_spark("ppjoin-profile")
    spark.sparkContext.setLogLevel("ERROR")
    engine.load_all_queries()
    workdir = "/tmp/dedup-scale-probe"
    res = {}
    for m in mults:
        d = build_scaled(spark, m, workdir)
        print(f"x{m}:", flush=True)
        res[m] = profile(spark, d)
    print(json.dumps({str(m): r for m, r in res.items()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
