"""SparkSession factory (SURVEY.md SS7 M0).

Local-mode defaults tuned for the test harness, but every setting is
chosen for the 100 TB design point too: AQE on (runtime coalesce +
skew-join handling), Arrow on (vectorized Python boundary), UTC
session timezone (deterministic timestamp semantics vs the DuckDB
oracle), and shuffle partitions sized to the local core count rather
than the 200 default (on a real cluster this is set to ~2-3x total
cores; AQE coalesces down from there).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "ebtm-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # events.parquet carries TIMESTAMP(NANOS) which Spark has no
        # native type for; read as long ns and convert in the IO layer
        # (io.table) — DuckDB truncates ns->us the same way.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    return builder.getOrCreate()


def tune_for_local_tests(spark: SparkSession) -> SparkSession:
    """Reduce overhead when an existing session is reused by pytest."""
    spark.sparkContext.setLogLevel("WARN")
    return spark
