"""Measure the DISTRIBUTED connected-components path above the r12
small-graph gate (r12 verdict #3).

Since d9f6ebd every measured sf takes the driver union-find (candidate
pairs <= 200k at every generated scale), so the label-propagation /
star machinery that would carry a real >200k-pair corpus had plan
tests but no recorded at-scale wall time.  This probe runs the two
CC-backed queries at the given sfs twice each — gated (default) and
FORCED distributed (small_cutoff=0 via a wrapper) — recording wall
time, the label-prop round count (operators/dedup._LAST_CC_INFO), the
sf-to-sf exponent of the forced path, and row-set equality between
the two paths (exceptAll in both directions — distributed compare, no
driver data).

Usage: python tools/cc_forced_probe.py [--sfs 1,10] [--out bench_runs/cc_forced_r13.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import iceberg_aws_event_based_table_management_spark as engine
from iceberg_aws_event_based_table_management_spark.operators import dedup as D
from iceberg_aws_event_based_table_management_spark.session import get_spark

SF_DIRS = {"0.1": "/root/testdata/sf0.1", "1": "/tmp/sf1", "10": "/tmp/sf10"}
QUERIES = ["dedup_cluster_survivors", "dedup_near_clusters"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sfs", default="1,10")
    ap.add_argument("--out", default="bench_runs/cc_forced_r13.json")
    args = ap.parse_args()

    engine.load_all_queries()
    qmap = engine.query_map()
    spark = get_spark("ebtm-cc-probe")
    spark.sparkContext.setLogLevel("ERROR")

    real_cc = D.connected_components

    def forced_cc(pairs, max_iters: int = 25, small_cutoff: int = 200_000):
        return real_cc(pairs, max_iters=max_iters, small_cutoff=0)

    results: dict = {}
    for sf in args.sfs.split(","):
        sf_dir = SF_DIRS[sf]
        for q in QUERIES:
            rec: dict = {}
            for mode in ("gated", "forced"):
                D.connected_components = forced_cc if mode == "forced" else real_cc
                try:
                    t0 = time.perf_counter()
                    df = qmap[q](spark, sf_dir)
                    df.write.format("noop").mode("overwrite").save()
                    rec[mode] = {
                        "sec": round(time.perf_counter() - t0, 3),
                        "cc": dict(D._LAST_CC_INFO),
                    }
                finally:
                    D.connected_components = real_cc
            # row-set equality, untimed (distributed compare)
            g = qmap[q](spark, sf_dir)
            D.connected_components = forced_cc
            try:
                f = qmap[q](spark, sf_dir)
            finally:
                D.connected_components = real_cc
            rec["rowset_equal"] = (
                g.exceptAll(f).count() == 0 and f.exceptAll(g).count() == 0
            )
            results[f"{q}@sf{sf}"] = rec
            print(json.dumps({f"{q}@sf{sf}": rec}), flush=True)

    # forced-path decade exponents where both legs exist
    sfs = args.sfs.split(",")
    if len(sfs) == 2:
        lo, hi = float(sfs[0]), float(sfs[1])
        for q in QUERIES:
            a = results.get(f"{q}@sf{sfs[0]}", {}).get("forced", {}).get("sec")
            b = results.get(f"{q}@sf{sfs[1]}", {}).get("forced", {}).get("sec")
            if a and b:
                results[f"{q}_forced_exponent"] = round(
                    math.log(b / a) / math.log(hi / lo), 3
                )

    payload = {
        "_note": (
            "Forced distributed connected-components leg (small_cutoff=0) vs the "
            "gated default, r12 verdict #3.  One warmless pass per cell (the CC "
            "queries build eagerly; wall includes pair-pipeline build + execute, "
            "the bench.py window).  rowset_equal = exceptAll both directions."
        ),
        "results": results,
    }
    with open(args.out, "w") as fh:
        json.dump(payload, fh, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
