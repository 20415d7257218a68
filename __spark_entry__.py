"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All logic lives in ``iceberg_aws_event_based_table_management_spark``;
this file only adapts the registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import iceberg_aws_event_based_table_management_spark as engine


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the reference's core question — "which tables should be
    optimized right now?" (shouldOptimizeDataFiles,
    AwsTableManagementMetricsEvaluator.java:108-140) — over the
    sf0.001 events-derived snapshot lineage.
    """
    engine.load_all_queries()
    return engine.query_map()["should_optimize_decision"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md SS2."""
    engine.load_all_queries()
    return engine.query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted -> rows-only check)."""
    engine.load_all_queries()
    return engine.oracle_map()
