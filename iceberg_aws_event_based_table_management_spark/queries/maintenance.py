"""Tier B — compaction planning/invariant queries (SURVEY.md SS2-B).

The physical rewrite lives in operators/maintenance.py (exercised by
the invariant tests, SURVEY SS5.4); these queries express its *plan*
and its *invariants* declaratively over the `_files` inventory so the
DuckDB oracle can check them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import config, io
from ..operators.maintenance import plan_binpack_groups
from ..registry import register

CAP = config.FIXTURE_GROUP_CAP_BYTES
TARGET = 50_000_000  # fixture-scale target output file size

_PLAN_CTE = f"""
  files AS ({io.FILES_CTE}),
  planned AS (
    SELECT table_name, file_path, file_size_bytes, record_count,
           CAST(FLOOR((SUM(file_size_bytes) OVER (
                  PARTITION BY table_name
                  ORDER BY file_size_bytes DESC, file_path
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) - file_size_bytes) / {CAP}) AS BIGINT) AS group_id
    FROM files
  )
"""


@register(
    "binpack_group_assignment",
    tier="B",
    oracle=f"WITH {_PLAN_CTE} SELECT table_name, file_path, file_size_bytes, group_id FROM planned",
)
def binpack_group_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1/B3: binpack group planning — files packed into <= cap groups
    via per-table running cumsum (the window formulation of the
    rewrite's file-group sizing, AwsManageProperties.java:48-50).  Each
    group is an independent partial-progress commit."""
    return plan_binpack_groups(io.files(spark, sf_dir), CAP).select(
        "table_name", "file_path", "file_size_bytes", "group_id"
    )


@register(
    "compaction_rowcount_invariant",
    tier="B",
    oracle=f"""
    WITH {_PLAN_CTE},
    post AS (
      SELECT table_name, group_id,
             COUNT(*) AS files_in_group,
             SUM(file_size_bytes) AS group_bytes,
             SUM(record_count) AS group_records,
             CAST(CEIL(CAST(SUM(file_size_bytes) AS DOUBLE) / {TARGET}) AS BIGINT) AS files_after
      FROM planned GROUP BY table_name, group_id
    )
    SELECT table_name,
           COUNT(*) AS n_groups,
           CAST(SUM(files_in_group) AS BIGINT) AS files_before,
           CAST(SUM(files_after) AS BIGINT) AS files_after,
           CAST(SUM(group_bytes) AS BIGINT) AS total_bytes,
           CAST(SUM(group_records) AS BIGINT) AS total_records,
           SUM(files_after) < SUM(files_in_group) AS file_count_reduced
    FROM post GROUP BY table_name
    """,
)
def compaction_rowcount_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1: the compaction invariants as a query — per table, the
    planned rewrite keeps bytes/records constant while strictly
    reducing file count (files_after = ceil(group_bytes/target) per
    group).  Mirrors what the reference trusts Iceberg to guarantee
    (SURVEY SS5.4)."""
    planned = plan_binpack_groups(io.files(spark, sf_dir), CAP)
    post = planned.groupBy("table_name", "group_id").agg(
        F.count("*").alias("files_in_group"),
        F.sum("file_size_bytes").alias("group_bytes"),
        F.sum("record_count").alias("group_records"),
        F.ceil(F.sum("file_size_bytes").cast("double") / TARGET).cast("long").alias("files_after"),
    )
    return post.groupBy("table_name").agg(
        F.count("*").alias("n_groups"),
        F.sum("files_in_group").alias("files_before"),
        F.sum("files_after").alias("files_after"),
        F.sum("group_bytes").alias("total_bytes"),
        F.sum("group_records").alias("total_records"),
        (F.sum("files_after") < F.sum("files_in_group")).alias("file_count_reduced"),
    )


@register(
    "sort_compaction_order",
    tier="B",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate,
           ROW_NUMBER() OVER (ORDER BY l_shipdate, l_orderkey, l_linenumber) AS write_order
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2001-01-01'
    """,
)
def sort_compaction_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: sort-strategy rewrite order — the globally sorted layout
    (`strategy=sort`, sort_order, EMRSparkUtil.java:118-124) captured
    as an explicit write_order rank.  In the physical rewrite this is
    repartitionByRange + sortWithinPartitions (range-partitioned global
    sort — no single-node bottleneck)."""
    li = io.table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    w = Window.orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    return li.select(
        "l_orderkey", "l_linenumber", "l_shipdate", F.row_number().over(w).alias("write_order")
    )


def _zorder_oracle() -> str:
    from ..operators.maintenance import zorder_value_sql

    mins = {c: f"(SELECT MIN({c}) FROM lineitem)" for c in ("l_partkey", "l_suppkey")}
    ranges = {
        c: f"((SELECT MAX({c}) FROM lineitem) - (SELECT MIN({c}) FROM lineitem))"
        for c in ("l_partkey", "l_suppkey")
    }
    zv = zorder_value_sql(["l_partkey", "l_suppkey"], bits=8, mins=mins, ranges=ranges)
    return f"""
    SELECT ({zv} >> 8) AS zbucket,
           COUNT(*) AS n_rows,
           MIN(l_partkey) AS min_part, MAX(l_partkey) AS max_part,
           MIN(l_suppkey) AS min_supp, MAX(l_suppkey) AS max_supp
    FROM lineitem
    GROUP BY 1
    """


@register("sort_compaction_zorder", tier="B", oracle=_zorder_oracle())
def sort_compaction_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 (z-order flavor): the clustering key behind Iceberg's
    `rewrite_data_files(strategy => 'sort', sort_order =>
    'zorder(l_partkey, l_suppkey)')` — Morton-interleave the two
    equi-width-bucketed keys, then aggregate per z-bucket (the
    per-output-file key-range stats a z-ordered rewrite produces;
    both dimensions' ranges shrink together, which is what makes
    multi-column scan pruning work).  Two passes: a scalar min/max
    stats agg, then map-side bit math — no global ranking window, so
    it scales to any row count."""
    from ..operators.maintenance import zorder_value

    li = io.table(spark, sf_dir, "lineitem")
    st = li.agg(
        F.min("l_partkey"), F.max("l_partkey"), F.min("l_suppkey"), F.max("l_suppkey")
    ).collect()[0]
    mins = {"l_partkey": int(st[0]), "l_suppkey": int(st[2])}
    ranges = {"l_partkey": int(st[1]) - int(st[0]), "l_suppkey": int(st[3]) - int(st[2])}
    zv = zorder_value(["l_partkey", "l_suppkey"], bits=8, mins=mins, ranges=ranges)
    return (
        li.withColumn("zbucket", F.shiftright(zv, 8))
        .groupBy("zbucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_partkey").alias("min_part"),
            F.max("l_partkey").alias("max_part"),
            F.min("l_suppkey").alias("min_supp"),
            F.max("l_suppkey").alias("max_supp"),
        )
    )
