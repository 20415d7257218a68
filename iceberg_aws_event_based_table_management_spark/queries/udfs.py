"""Tier C (part 6) — the UDF/UDAF/UDTF surface (C46-C48).

UDFs are the slow path; these queries exist to prove the Arrow-batched
boundary works and produces results identical to the native (and
oracle) formulation.  Each is the vectorized pandas variant — never
row-at-a-time Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import io
from ..registry import register


@register(
    "udf_tablename_parse_parity",
    tier="C",
    oracle="""
    WITH ids AS (
      SELECT DISTINCT
        'cat' || CAST(user_id % 3 AS VARCHAR) || '.db' || CAST(user_id % 5 AS VARCHAR)
          || '.t' || CAST(user_id AS VARCHAR) AS full_name
      FROM events
    )
    SELECT full_name,
           array_to_string(string_split(full_name, '.')[2:], '.') AS table_identifier
    FROM ids
    """,
)
def udf_tablename_parse_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C46: scalar pandas UDF — the A4 identifier parse
    (AwsManageUtil.java:19-24) done on the Arrow path, hash-identical
    to the native string-function version (and the oracle)."""

    @F.pandas_udf(T.StringType())
    def strip_catalog(names: pd.Series) -> pd.Series:
        return names.str.split(".").str[1:].str.join(".")

    ev = io.table(spark, sf_dir, "events")
    ids = ev.select(
        F.concat(
            F.lit("cat"),
            (F.col("user_id") % 3).cast("string"),
            F.lit(".db"),
            (F.col("user_id") % 5).cast("string"),
            F.lit(".t"),
            F.col("user_id").cast("string"),
        ).alias("full_name")
    ).distinct()
    return ids.select("full_name", strip_catalog("full_name").alias("table_identifier"))


@register(
    "udaf_weighted_avg",
    tier="C",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                    * CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS weighted_cents,
           CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C47: grouped-agg pandas UDF (quantity-weighted price) — computed
    in exact integer cents inside the UDF so the Arrow aggregation is
    order-independent and oracle-matchable."""

    @F.pandas_udf("long")
    def weighted_cents(price: pd.Series, qty: pd.Series) -> int:
        cents = (price * 100 + 0.5).astype("int64")
        return int((cents * qty.astype("int64")).sum())

    @F.pandas_udf("long")
    def qty_sum(qty: pd.Series) -> int:
        return int(qty.astype("int64").sum())

    li = io.table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        weighted_cents("l_extendedprice", "l_quantity").alias("weighted_cents"),
        qty_sum("l_quantity").alias("total_qty"),
    )


@register(
    "udtf_binpack_per_table",
    tier="C",
    oracle=f"""
    WITH files AS ({io.FILES_CTE})
    SELECT table_name, file_path,
           CAST(FLOOR((SUM(file_size_bytes) OVER (
                  PARTITION BY table_name
                  ORDER BY file_size_bytes DESC, file_path
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) - file_size_bytes) / 200000000) AS BIGINT) AS group_id
    FROM files
    """,
)
def udtf_binpack_per_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C48: grouped-map applyInPandas — the binpack planner as a
    pandas function (imperative cumsum), provably identical to the
    declarative window formulation (C26/B1).

    The naive key choice — groupBy(table_name) — bounds each pandas
    batch to one TABLE's file list: with the synthetic inventory
    emitting one file row per lineitem row over 8 tables, the r13 sf10
    smoke measured 207.6 s at exponent 1.51 (the registry's worst
    curve), and at 100x one group is a ~750M-row pandas frame through
    a single Python worker — an OOM, not a slowdown.  So the group key
    is SUB-BUCKETED: range-partition on (table_name, size DESC, path)
    — each table occupies a contiguous run of partition ids, in
    bin-pack order — then applyInPandas per (table_name, _pid) group
    computes the LOCAL running size, and the global cumulative-before
    is local + the broadcast total of the table's earlier partitions
    (the operators/skew offset device applied per table).  Every
    pandas frame is bounded by a range partition (~n/partitions rows),
    never by table size."""

    def plan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["file_size_bytes", "file_path"], ascending=[False, True]
        ).reset_index(drop=True)
        pdf["local_before"] = (
            pdf["file_size_bytes"].cumsum() - pdf["file_size_bytes"]
        ).astype("int64")
        return pdf[["table_name", "file_path", "_pid", "local_before"]]

    from ..operators.skew import _default_partitions

    files = io.files(spark, sf_dir).select("table_name", "file_path", "file_size_bytes")
    parts = _default_partitions(files)
    keyed = files.repartitionByRange(
        parts, "table_name", F.desc("file_size_bytes"), "file_path"
    ).withColumn("_pid", F.spark_partition_id())
    local = keyed.groupBy("table_name", "_pid").applyInPandas(
        plan,
        schema="table_name string, file_path string, _pid int, local_before long",
    )
    totals = keyed.groupBy("table_name", "_pid").agg(
        F.sum("file_size_bytes").alias("_t")
    )
    w_off = (
        Window.partitionBy("table_name")
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = totals.select(
        "table_name",
        "_pid",
        F.coalesce(F.sum("_t").over(w_off), F.lit(0)).alias("_off"),
    )
    # exact integer bucket edge (operators/skew.global_ntile's intdiv
    # pattern, r14 ADVICE): floor(double divide) can round a cumulative
    # byte total across a bucket edge past ~2^53; (x - x mod b) / b is
    # an integer-valued double quotient, exact for nonnegative longs.
    before = F.col("local_before") + F.col("_off")
    bucket = F.lit(200_000_000)
    return local.join(F.broadcast(offs), ["table_name", "_pid"]).select(
        "table_name",
        "file_path",
        ((before - F.pmod(before, bucket)) / bucket).cast("long").alias("group_id"),
    )
