"""Per-stage timing attribution for ONE registered query (guide §1/§7.1).

Clean session, warm run + 2 more runs (bench steady state), then pulls
per-stage metrics of the LAST run from the UI REST API: wall timeline
(submission->completion relative to the run start), task time, shuffle
bytes — enough to attribute the query's seconds to operators and spot
serialized (low-parallelism) stages.

Usage: python tools/profile_stages.py <query>
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import iceberg_aws_event_based_table_management_spark as engine


def _ts(s: str) -> float:
    return dt.datetime.strptime(s[:-3], "%Y-%m-%dT%H:%M:%S.%f").timestamp()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    engine.load_all_queries()
    qmap = engine.query_map()

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ebtm-profile")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.shuffle.partitions", cpus)
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

    qmap["scan_parquet"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    name = sys.argv[1]
    times = []
    for i in range(3):
        if i == 2:
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/stages"
            ) as r:
                seen = {s["stageId"] for s in json.load(r)}
        spark.sparkContext.setJobDescription(f"{name}: run{i}")
        t0 = time.perf_counter()
        qmap[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
        if i == 2:
            wall0 = time.time() - times[-1]

    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
        stages = [s for s in json.load(r) if s["stageId"] not in seen]

    print(f"=== {name}: runs {[round(t,3) for t in times]} "
          f"(last-run stages: {len(stages)}) ===")
    stages.sort(key=lambda s: s.get("submissionTime") or "")
    tot_task_ms = 0
    for s in stages:
        sub = s.get("submissionTime")
        comp = s.get("completionTime")
        t_rel = _ts(sub) - wall0 if sub else -1
        durs = (_ts(comp) - _ts(sub)) if (sub and comp) else -1
        tot_task_ms += s.get("executorRunTime") or 0
        print(
            f"  [{t_rel:6.2f}s +{durs:5.2f}s]"
            f" run {s.get('executorRunTime', 0)/1000.0:7.2f}s"
            f" tasks {s.get('numCompleteTasks', 0):4d}"
            f" in {s.get('inputBytes', 0)/1e6:7.1f}MB"
            f" sR {s.get('shuffleReadBytes', 0)/1e6:6.1f}MB"
            f" sW {s.get('shuffleWriteBytes', 0)/1e6:6.1f}MB"
            f"  id={s['stageId']}"
        )
    print(f"  total executorRunTime {tot_task_ms/1000.0:.2f}s; "
          f"ideal wall at {cpus} cores ≈ {tot_task_ms/1000.0/int(cpus):.2f}s")


if __name__ == "__main__":
    main()
