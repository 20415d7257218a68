"""Interleaved A/B bench of registered queries across two source trees.

The only perf evidence this repo accepts on its drifting VM is an
interleaved same-process comparison (SURVEY §7.-3 machine-state caveat;
the cbbb4b4/e7331e2 protocol): one SparkSession, one JVM, variants
alternated in ABBA blocks so slow monotonic machine drift cancels in
the medians instead of masquerading as a code delta.

Usage:
  python tools/ab_compare.py --tree-a /root/repo --tree-b /tmp/r11tree \
      --label-a r13 --label-b r11 --pairs 4 --out bench_runs/ab_x.json \
      dedup_prefix_filter_pairs sketch_heavy_hitters_cms ...

Each ABBA block contributes 2 runs per variant; --pairs 4 = 8 runs per
variant per query.  A run = query BUILD + noop-sink execution (the
bench.py timed window).  Variants are re-imported from their tree per
run (module purge + sys.path swap — the package is self-contained and
registry state is module-level); import time is excluded from the
timed window.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

PKG = "iceberg_aws_event_based_table_management_spark"


def load_tree(tree: str):
    """(Re)import the engine package from `tree`, returning its query map."""
    for mod in [m for m in sys.modules if m == PKG or m.startswith(PKG + ".")]:
        del sys.modules[mod]
    sys.path = [p for p in sys.path if p != tree]
    sys.path.insert(0, tree)
    import importlib

    engine = importlib.import_module(PKG)
    engine.load_all_queries()
    return engine.query_map()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--tree-a", required=True)
    ap.add_argument("--tree-b", required=True)
    ap.add_argument("--label-a", default="A")
    ap.add_argument("--label-b", default="B")
    ap.add_argument("--pairs", type=int, default=4, help="ABBA blocks (2 runs/variant each)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    # Session comes from tree A's factory.  The shared session is only
    # a fair instrument if both trees would have BUILT the same
    # session: if tree B changed session.py conf (shuffle partitions,
    # AQE flags, ...), both variants silently run under A's conf and
    # the A/B attributes a conf delta to code (r13 ADVICE).  Verify
    # byte-identity of the two session factories up front.
    import os

    conf_identical = True
    sess_files = {}
    for label, tree in (("a", args.tree_a), ("b", args.tree_b)):
        p = os.path.join(tree, PKG, "session.py")
        with open(p, "rb") as fh:
            sess_files[label] = fh.read()
    if sess_files["a"] != sess_files["b"]:
        conf_identical = False
        print(
            "WARNING: session.py differs between trees — the shared "
            "session runs BOTH variants under tree A's conf; any conf "
            "delta between the trees will be attributed to code. "
            "Recorded as conf_identical=false in the payload.",
            file=sys.stderr,
        )
    qmap_a = load_tree(args.tree_a)
    from iceberg_aws_event_based_table_management_spark.session import get_spark

    spark = get_spark("ebtm-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    results: dict = {}
    for q in args.queries:
        runs: dict[str, list[float]] = {"a": [], "b": []}
        order: list[str] = []
        # one warm run per variant (codegen + python-worker fork), untimed record
        warm = {}
        for side, tree in (("a", args.tree_a), ("b", args.tree_b)):
            qm = load_tree(tree)
            warm[side] = round(run(qm[q]), 3)
        for block in range(args.pairs):
            seq = ("a", "b", "b", "a") if block % 2 == 0 else ("b", "a", "a", "b")
            for side in seq:
                qm = load_tree(args.tree_a if side == "a" else args.tree_b)
                runs[side].append(round(run(qm[q]), 3))
                order.append(side)
        med_a = statistics.median(runs["a"])
        med_b = statistics.median(runs["b"])
        results[q] = {
            "median_a": med_a,
            "median_b": med_b,
            "ratio_a_over_b": round(med_a / med_b, 3) if med_b else None,
            "runs_a": runs["a"],
            "runs_b": runs["b"],
            "warm": warm,
            "order": "".join(order),
        }
        print(
            f"{q}: {args.label_a}={med_a:.3f}s {args.label_b}={med_b:.3f}s "
            f"ratio={results[q]['ratio_a_over_b']}",
            flush=True,
        )

    payload = {
        "protocol": "interleaved ABBA, medians of %d per variant, one session" % (2 * args.pairs),
        "label_a": args.label_a,
        "label_b": args.label_b,
        "tree_a": args.tree_a,
        "tree_b": args.tree_b,
        "sf_dir": args.sf_dir,
        "conf_identical": conf_identical,
        "session_conf": dict(spark.sparkContext.getConf().getAll()),
        "results": results,
    }
    out = json.dumps(payload, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")
    print(out)


if __name__ == "__main__":
    main()
