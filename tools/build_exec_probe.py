"""Split each headline query's wall time into Python-side BUILD
(DataFrame construction: py4j round-trips + any eager work at build)
and EXECUTE (noop sink).  Mirrors bench.py methodology: warm run then
3 timed runs, median.  Usage:

    python tools/build_exec_probe.py [query ...] > /tmp/buildexec.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import iceberg_aws_event_based_table_management_spark as engine
from iceberg_aws_event_based_table_management_spark.session import get_spark
from bench import HEADLINE


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    engine.load_all_queries()
    qmap = engine.query_map()
    names = sys.argv[1:] or HEADLINE

    spark = get_spark("ebtm-buildexec")
    spark.sparkContext.setLogLevel("ERROR")
    qmap["scan_parquet"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    out = []
    for name in names:
        spark.sparkContext.setJobDescription(f"probe:{name}")
        # warm
        qmap[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        builds, execs = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            df = qmap[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        rec = {
            "query": name,
            "build": round(statistics.median(builds), 3),
            "exec": round(statistics.median(execs), 3),
            "total": round(statistics.median(builds) + statistics.median(execs), 3),
            "builds": [round(b, 3) for b in builds],
            "execs": [round(e, 3) for e in execs],
        }
        out.append(rec)
        print(json.dumps(rec), file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
