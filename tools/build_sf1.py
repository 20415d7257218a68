"""Build an sf1-equivalent dataset by x10-replicating sf0.1 with
consistent key offsets (r9 verdict #4: the TPC-H-shaped relational
families have never run past sf0.1 while the document families have
measured x30 curves).

/root/testdata is read-only, so output goes to a scratch dir (default
/tmp/sf1) and bench.py points at it via SPARK_GRAFT_SF_DIR.

Replication discipline — preserve every distribution the engine's
plans depend on, scale only cardinality:

- fact/entity tables (customer, supplier, part, orders, lineitem,
  events, documents, embeddings): copy k offsets every ENTITY key by
  k * stride, with FK columns offset by the SAME stride as their PK
  (l_orderkey tracks o_orderkey, o_custkey tracks c_custkey, ...).
  Join fan-outs, per-key group sizes, and value distributions are
  replicated exactly; group COUNTS grow x10 — precisely how a real
  corpus grows under a fixed workload shape.
- dimension tables (region, nation) stay FIXED: c_nationkey /
  s_nationkey are untouched, so the broadcast-dim joins see x10 fan-in
  per nation, the realistic direction (TPC-H holds nation/region
  constant across sf too).
- events keep their 30-day ts span (densification, not elongation:
  windows per hour grow x10, window COUNT stays — matching how a
  busier catalog commits more per hour).
- documents get the disjoint-vocabulary word suffix and embeddings a
  per-copy random rotation, reusing tools/scale_probe.build_scaled's
  construction so duplicate/near-dup densities stay fixture-true.

Usage: python tools/build_sf1.py [--out /tmp/sf1] [--mult 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from iceberg_aws_event_based_table_management_spark.session import get_spark
from tools.scale_probe import build_scaled

BASE = "/root/testdata/sf0.1"
STRIDE = 10_000_000

# per-table: columns offset by k * STRIDE (PKs and the FKs that
# reference them share the stride, so joins stay consistent)
OFFSET_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
COPY_AS_IS = ["region", "nation"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--mult", type=int, default=10)
    args = ap.parse_args()

    spark = get_spark("build-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)

    for t in COPY_AS_IS:
        spark.read.parquet(f"{BASE}/{t}.parquet").write.mode("overwrite").parquet(
            f"{args.out}/{t}.parquet"
        )
        print(f"{t}: copied", flush=True)

    for t, keys in OFFSET_COLS.items():
        src = spark.read.parquet(f"{BASE}/{t}.parquet")
        # Guard the replication invariant (r10 ADVICE): if any offset
        # column ever exceeds the stride, replicated copies collide and
        # silently corrupt join fan-outs in the scaled dataset.
        maxes = src.agg(*[F.max(c).alias(c) for c in keys]).collect()[0].asDict()
        for col, mx in maxes.items():
            if mx is not None and mx >= STRIDE:
                raise SystemExit(
                    f"build_sf1: {t}.{col} max={mx} >= STRIDE={STRIDE}; "
                    f"raise STRIDE or the x{args.mult} copies will collide"
                )
        parts = []
        for k in range(args.mult):
            c = src
            for col in keys:
                c = c.withColumn(col, F.col(col) + F.lit(k * STRIDE))
            parts.append(c)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.repartition(4 * args.mult).write.mode("overwrite").parquet(
            f"{args.out}/{t}.parquet"
        )
        print(f"{t}: x{args.mult}", flush=True)

    # documents + embeddings via the probe construction (disjoint
    # vocabulary / rotated copies), then move into place
    staged = build_scaled(spark, args.mult, args.out + "-docs")
    for t in ("documents", "embeddings"):
        spark.read.parquet(f"{staged}/{t}.parquet").write.mode("overwrite").parquet(
            f"{args.out}/{t}.parquet"
        )
        print(f"{t}: x{args.mult} (probe construction)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
