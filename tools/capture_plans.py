"""Capture .explain("formatted") output for queries into
plans/$SPARK_GRAFT_PLAN_ROUND/ (default r16).

Usage: python tools/capture_plans.py <suffix> [query ...]

With no query list, captures every bench.py headliner.  Writes
plans/<round>/<query>_<suffix>.txt (suffix = "before" / "after").

Note: queries whose construction is eager (connected-components gate)
execute their upstream pipeline during capture; the capture is still
faithful — the explain shows the plan the noop sink would run.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import iceberg_aws_event_based_table_management_spark as engine
from iceberg_aws_event_based_table_management_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    engine.load_all_queries()
    qmap = engine.query_map()
    if len(sys.argv) > 2:
        names = sys.argv[2:]
    else:
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import bench

        names = list(bench.HEADLINE)

    round_dir = os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r16")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", round_dir
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("ebtm-capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = qmap[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")


if __name__ == "__main__":
    main()
