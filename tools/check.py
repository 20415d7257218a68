"""Local mimic of the driver's correctness gate.

Runs every registered query at a given sf dir on Spark AND its DuckDB
oracle, then compares row count, column names, and order-insensitive
values.  Use while iterating; the real gate is the driver's
CORRECTNESS_r{N}.json.

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import iceberg_aws_event_based_table_management_spark as engine
from iceberg_aws_event_based_table_management_spark import io as eio
from iceberg_aws_event_based_table_management_spark.session import get_spark


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v  # exact — mirror worst-case driver hashing
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else eio.ORACLE_SF_DIR
    only = set(sys.argv[2:])

    engine.load_all_queries()
    qmap = engine.query_map()
    omap = engine.oracle_map()

    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("OFF")
    con = duckdb.connect()
    for t in eio.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = n_rows_only = 0
    for name, fn in sorted(qmap.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in omap:
            print(f"rows  {name}: {len(s_rows)} rows (rows-only check) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            res = con.execute(omap[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sc, sr = _normalize(s_cols, s_rows)
        dc, dr = _normalize(d_cols, d_rows)
        status = []
        if sc != dc:
            status.append(f"cols spark={sc} duck={dc}")
        if len(sr) != len(dr):
            status.append(f"rowcount spark={len(sr)} duck={len(dr)}")
        elif sr != dr:
            bad = next(i for i, (a, b) in enumerate(zip(sr, dr)) if a != b)
            status.append(f"values differ at sorted-row {bad}:\n  spark={sr[bad]}\n  duck ={dr[bad]}")
        if status:
            print(f"FAIL  {name}: " + "; ".join(status))
            n_fail += 1
        else:
            print(f"ok    {name}: {len(sr)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
