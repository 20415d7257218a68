"""Table-lifecycle queries — the maintenance procedures adjacent to the
reference's single `optimize-data` action (README.md:5), expressed
over the `_snapshots` / `_files` control tables so the DuckDB oracle
can verify them.  Implementations in operators/lifecycle.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import io
from ..operators.lifecycle import (
    cdc_diff,
    merge_upsert,
    orphan_files,
    plan_expired_snapshots,
    table_state_asof,
)
from ..registry import register

EXPIRE_OLDER_THAN = "2024-01-25 00:00:00"
EXPIRE_RETAIN_LAST = 5
ASOF_TS = "2024-01-20 00:00:00"
CDC_FROM = "2024-01-10 00:00:00"
CDC_TO = "2024-01-20 00:00:00"
MANIFEST_CUTOFF = "1998-01-01 00:00:00"


@register(
    "maintenance_expire_snapshots",
    tier="B",
    oracle=f"""
    WITH snaps AS ({io.SNAPSHOTS_CTE}),
    ranked AS (
      SELECT table_name, snapshot_id, ts, operation,
             ROW_NUMBER() OVER (PARTITION BY table_name
                                ORDER BY ts DESC, snapshot_id DESC) AS rn
      FROM snaps
    )
    SELECT table_name, snapshot_id, ts, operation
    FROM ranked
    WHERE rn > {EXPIRE_RETAIN_LAST}
      AND ts < TIMESTAMP '{EXPIRE_OLDER_THAN}'
    """,
)
def maintenance_expire_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`expire_snapshots(older_than, retain_last)` planning — the
    Iceberg maintenance procedure the reference's trigger/executor
    scaffold (Executor.java:9-23) is built to host next after
    optimize-data.  A snapshot expires iff older than the cutoff AND
    outside the retain_last most recent per table."""
    return plan_expired_snapshots(
        io.snapshots(spark, sf_dir),
        older_than=EXPIRE_OLDER_THAN,
        retain_last=EXPIRE_RETAIN_LAST,
    )


@register(
    "snapshot_time_travel",
    tier="B",
    oracle=f"""
    WITH snaps AS ({io.SNAPSHOTS_CTE}),
    ranked AS (
      SELECT table_name, snapshot_id, ts, operation,
             ROW_NUMBER() OVER (PARTITION BY table_name
                                ORDER BY ts DESC, snapshot_id DESC) AS rn
      FROM snaps
      WHERE ts <= TIMESTAMP '{ASOF_TS}'
    )
    SELECT table_name, snapshot_id, ts, operation FROM ranked WHERE rn = 1
    """,
)
def snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`TIMESTAMP AS OF` time travel: the current snapshot of every
    table pinned to a historical instant — the reference's
    `SnapshotUtil.currentAncestors` walk
    (AwsTableManagementMetricsEvaluator.java:74) evaluated at a past
    point of the lineage."""
    return table_state_asof(io.snapshots(spark, sf_dir), ASOF_TS)


@register(
    "maintenance_orphan_files",
    tier="B",
    oracle=f"""
    WITH inv AS ({io.FILES_CTE}),
    manifest AS (
      SELECT {io.FILES_PATH_SQL} AS file_path
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{MANIFEST_CUTOFF}'
    )
    SELECT i.table_name,
           COUNT(*) AS n_orphans,
           CAST(SUM(i.file_size_bytes) AS BIGINT) AS orphan_bytes
    FROM inv i
    WHERE NOT EXISTS (SELECT 1 FROM manifest m WHERE m.file_path = i.file_path)
    GROUP BY i.table_name
    """,
)
def maintenance_orphan_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`remove_orphan_files` planning: storage-listing files absent
    from the live manifest (files referenced by the current snapshot),
    via left-anti join — metadata-sized at any data scale."""
    inv = io.files(spark, sf_dir)
    li = io.table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit(MANIFEST_CUTOFF).cast("timestamp")
    )
    manifest = io.files_from(li)
    return orphan_files(inv, manifest).groupBy("table_name").agg(
        F.count("*").alias("n_orphans"),
        F.sum("file_size_bytes").alias("orphan_bytes"),
    )


_MERGE_SRC_SQL = """
      SELECT o_orderkey, o_custkey, o_orderstatus,
             o_totalprice * CAST(1.1 AS DOUBLE) AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey, 'N',
             o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 7 = 3
"""


@register(
    "merge_upsert_orders",
    tier="C",
    oracle=f"""
    WITH src AS ({_MERGE_SRC_SQL}),
    merged AS (
      SELECT t.o_orderkey, t.o_orderstatus,
             COALESCE(s.o_totalprice, t.o_totalprice) AS o_totalprice
      FROM orders t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
      UNION ALL
      SELECT s.o_orderkey, s.o_orderstatus, s.o_totalprice
      FROM src s
      WHERE NOT EXISTS (SELECT 1 FROM orders t WHERE t.o_orderkey = s.o_orderkey)
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM merged GROUP BY o_orderstatus
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (matched -> update price, not matched ->
    insert) as one full-outer join — the upsert write pattern whose
    small-file fallout is exactly what the reference's compaction
    trigger exists to clean up.  Money summed as unscaled cents
    (exact long arithmetic, order-insensitive)."""
    orders = io.table(spark, sf_dir, "orders")
    updates = orders.filter(F.col("o_orderkey") % 7 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * F.lit(1.1)
    )
    inserts = (
        orders.filter(F.col("o_orderkey") % 7 == 3)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(100000000))
        .withColumn("o_orderstatus", F.lit("N"))
    )
    source = updates.unionByName(inserts)
    merged = merge_upsert(orders, source, keys=["o_orderkey"], update_cols=["o_totalprice"])
    return merged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("total_cents"),
    )


@register(
    "changelog_cdc_diff",
    tier="B",
    oracle=f"""
    WITH snaps AS ({io.SNAPSHOTS_CTE})
    SELECT table_name, operation,
           COUNT(*) AS n_commits,
           MIN(ts) AS first_ts,
           MAX(ts) AS last_ts
    FROM snaps
    WHERE ts > TIMESTAMP '{CDC_FROM}' AND ts <= TIMESTAMP '{CDC_TO}'
    GROUP BY table_name, operation
    """,
)
def changelog_cdc_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog between two table versions (Iceberg
    `create_changelog_view` analog): per-table commit activity in
    (from, to] — the incremental-consumption pattern downstream
    pipelines use instead of full rescans."""
    return cdc_diff(io.snapshots(spark, sf_dir), CDC_FROM, CDC_TO)
