"""Wall vs executor-time map over all bench headliners (guide §1).

One session in bench order (same regime the driver measures): warm run
+ 2 timed runs per query; captures the LAST run's stages from the UI
REST API and prints wall, executor-run-time sum, stage/task counts and
the parallel floor (executor_sum / cores).  Queries with wall far above
the floor are driver/barrier-bound; queries at the floor are
compute-bound.

Usage: python tools/profile_all.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import iceberg_aws_event_based_table_management_spark as engine


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    engine.load_all_queries()
    qmap = engine.query_map()
    import bench

    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ebtm-profile-all")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.retainedStages", "5000")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def stages():
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        ) as r:
            return json.load(r)

    qmap["scan_parquet"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    rows = []
    for name in bench.HEADLINE:
        walls = []
        for i in range(3):
            if i == 2:
                seen = {s["stageId"] for s in stages()}
            spark.sparkContext.setJobDescription(f"{name}: run{i}")
            t0 = time.perf_counter()
            qmap[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
        new = [s for s in stages() if s["stageId"] not in seen]
        run_ms = sum(s.get("executorRunTime") or 0 for s in new)
        n_tasks = sum(s.get("numCompleteTasks") or 0 for s in new)
        row = {
            "query": name,
            "wall": round(walls[2], 3),
            "walls": [round(w, 3) for w in walls],
            "exec_sum": round(run_ms / 1000.0, 2),
            "floor": round(run_ms / 1000.0 / cpus, 3),
            "stages": len(new),
            "tasks": n_tasks,
        }
        rows.append(row)
        print(
            f"{name:36s} wall {row['wall']:6.2f}s floor {row['floor']:6.3f}s "
            f"exec {row['exec_sum']:7.2f}s stages {row['stages']:3d} tasks {n_tasks:5d}"
        )
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
