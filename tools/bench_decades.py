"""Second relational scale decade (r10 verdict #4): build sf1 and sf10
by key-offset replication of sf0.1 (tools/build_sf1.py scheme) and run
the headline-40 bench at sf0.1 / sf1 / sf10 in ONE process, computing
per-query decade exponents.

The TPC-H-shaped families (C9-C30 joins/windows) had measured curves
only to sf1; the 100x question needs a second decade.  Per-query
exponent over a decade = log10(t_hi / t_lo); a query whose sf1->sf10
exponent exceeds 1.0 is super-linear and gets a plan audit.

Protocol matches bench.py (the real instrument): noop sink, 1 warm run
+ 3 timed per query per sf, median reported.  Runs sequentially on an
otherwise-idle machine; output JSON under bench_runs/.

Usage: python tools/bench_decades.py [--out bench_runs/bench_r11_sf10.json]
       [--skip-build] [--sfs 0.1,1,10]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import iceberg_aws_event_based_table_management_spark as engine
from iceberg_aws_event_based_table_management_spark.session import get_spark

SF_DIRS = {"0.1": "/root/testdata/sf0.1", "1": "/tmp/sf1", "10": "/tmp/sf10"}
MULTS = {"1": 10, "10": 100}


def ensure_built(sf: str) -> None:
    d = SF_DIRS[sf]
    if sf == "0.1" or os.path.isdir(os.path.join(d, "lineitem.parquet")):
        print(f"sf{sf}: present at {d}", flush=True)
        return
    print(f"sf{sf}: building at {d} (x{MULTS[sf]})", flush=True)
    subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "build_sf1.py"),
            "--out",
            d,
            "--mult",
            str(MULTS[sf]),
        ],
        check=True,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench_runs/bench_r11_sf10.json")
    ap.add_argument("--sfs", default="0.1,1,10")
    ap.add_argument("--skip-build", action="store_true")
    args = ap.parse_args()
    sfs = args.sfs.split(",")

    if not args.skip_build:
        for sf in sfs:
            ensure_built(sf)

    from bench import HEADLINE

    engine.load_all_queries()
    qmap = engine.query_map()
    spark = get_spark("bench-decades")
    spark.sparkContext.setLogLevel("ERROR")

    per_sf: dict[str, dict[str, float]] = {}
    for sf in sfs:
        sf_dir = SF_DIRS[sf]
        qmap["scan_parquet"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        timings: dict[str, float] = {}
        for name in HEADLINE:
            qmap[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                qmap[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(time.perf_counter() - t0)
            timings[name] = round(statistics.median(runs), 3)
            print(f"sf{sf} {name}: {timings[name]}", flush=True)
        per_sf[sf] = timings
        print(
            f"sf{sf} TOTAL: {round(sum(timings.values()), 3)}",
            flush=True,
        )
        # crash insurance: a partial record per completed sf leg (the
        # first sf10 attempt OOMed with everything buffered in a pipe)
        with open(args.out + ".partial", "w") as fh:
            json.dump(per_sf, fh, indent=1)

    # clamp sub-millisecond medians: a 0.0 timing would crash the log
    # AFTER every timing leg has run (the .partial keeps raw numbers,
    # but the final payload would be lost — r11 advice)
    EPS = 1e-3
    exponents: dict[str, dict[str, float]] = {}
    pairs = [(sfs[i], sfs[i + 1]) for i in range(len(sfs) - 1)]
    for name in per_sf[sfs[0]]:
        e: dict[str, float] = {}
        for lo, hi in pairs:
            ratio = float(hi) / float(lo)
            e[f"x{lo}_to_x{hi}"] = round(
                math.log(
                    max(per_sf[hi][name], EPS) / max(per_sf[lo][name], EPS)
                )
                / math.log(ratio),
                3,
            )
        exponents[name] = e

    totals = {sf: round(sum(t.values()), 3) for sf, t in per_sf.items()}
    suite_exp = {}
    for lo, hi in pairs:
        suite_exp[f"x{lo}_to_x{hi}"] = round(
            math.log(max(totals[hi], EPS) / max(totals[lo], EPS))
            / math.log(float(hi) / float(lo)),
            3,
        )
    payload = {
        "metric": "headline_decades",
        "protocol": "bench.py (noop sink, 1 warm + 3 timed, median), one session, idle machine",
        "totals_sec": totals,
        "suite_exponent": suite_exp,
        "per_query_sec": per_sf,
        "per_query_exponent": exponents,
        "superlinear": sorted(
            n
            for n, e in exponents.items()
            if any(v > 1.0 for v in e.values())
        ),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps({k: payload[k] for k in ("totals_sec", "suite_exponent", "superlinear")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
