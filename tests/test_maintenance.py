"""Compaction invariant tests (SURVEY.md SS5.4) + the end-to-end
event->decision->compaction path (SS3.1) against real parquet dirs."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iceberg_aws_event_based_table_management_spark import config, io
from iceberg_aws_event_based_table_management_spark.operators import jobs, maintenance


@pytest.fixture()
def small_table(spark, sf_dir, tmp_path):
    """A parquet table written as 40 deliberately tiny files."""
    table_dir = str(tmp_path / "t_lineitem")
    df = io.table(spark, sf_dir, "lineitem")
    maintenance.write_table(spark, df, table_dir, n_files=40)
    return table_dir


def _checksums(spark, table_dir):
    df = spark.read.parquet(os.path.join(table_dir, "data"))
    row = df.agg(
        F.count("*").alias("n"),
        F.sum(F.floor("l_quantity").cast("long")).alias("q"),
        F.sum(F.xxhash64("l_orderkey", "l_linenumber") % 1_000_000_007).alias("keyhash"),
    ).collect()[0]
    return (row["n"], row["q"], row["keyhash"])


def test_binpack_reduces_files_preserves_data(spark, small_table):
    pre = _checksums(spark, small_table)
    res = maintenance.compact_table(
        spark,
        small_table,
        max_group_size_bytes=10_000_000,
        target_file_size_bytes=1_000_000,
    )
    post = _checksums(spark, small_table)
    assert post == pre, "compaction must preserve rows exactly"
    assert res.files_after < res.files_before
    assert res.rows_after == res.rows_before


def test_partial_progress_one_replace_per_group(spark, small_table):
    res = maintenance.compact_table(
        spark,
        small_table,
        max_group_size_bytes=200_000,  # force multiple groups
        target_file_size_bytes=1_000_000,
        partial_progress=True,
    )
    assert res.n_groups > 1
    snaps = maintenance.read_snapshots(spark, small_table)
    n_replace = snaps.filter(F.col("operation") == "replace").count()
    assert n_replace == res.n_groups == len(res.replace_snapshot_ids)


def test_sort_strategy_orders_rows(spark, small_table):
    maintenance.compact_table(
        spark,
        small_table,
        strategy=config.STRATEGY_SORT,
        sort_order=["l_shipdate", "l_orderkey", "l_linenumber"],
        target_file_size_bytes=10_000_000_000,  # single output file -> total order
    )
    files = maintenance._list_data_files(small_table)
    assert len(files) == 1
    pdf = spark.read.parquet(files[0]).select("l_shipdate", "l_orderkey", "l_linenumber").toPandas()
    assert pdf.sort_values(["l_shipdate", "l_orderkey", "l_linenumber"]).reset_index(
        drop=True
    ).equals(pdf.reset_index(drop=True))


def test_replace_watermark_stops_trigger(spark, small_table):
    """After compaction, the REPLACE snapshot suppresses the trigger
    (the reference's recursion-avoidance, SURVEY SS4.1)."""
    from iceberg_aws_event_based_table_management_spark.operators import trigger

    maintenance.compact_table(spark, small_table)
    snaps = maintenance.read_snapshots(spark, small_table)
    d = trigger.decide_optimize(
        snaps, now="2030-01-01 00:00:00", replace_op="replace"
    ).collect()[0]
    assert d["n_commits_since_replace"] == 0
    assert not d["should_optimize"]


def test_end_to_end_evaluate_and_optimize(spark, small_table):
    """SS3.1 main path: commits accumulate -> decision fires -> executor
    compacts -> second evaluation is quiet."""
    for _ in range(config.COMMIT_THRESHOLD):
        maintenance.append_snapshot(spark, small_table, "append")
    ex = jobs.evaluate_and_maybe_optimize(
        spark,
        small_table,
        {"optimize-data.synchronous-enabled": "true", "metrics-reporter-impl": "x"},
    )
    assert ex is not None
    assert ex.state == jobs.JobState.SUCCEEDED
    assert ex.result.files_after < ex.result.files_before
    assert "metrics-reporter-impl" not in ex.properties  # recursion guard (A11)
    assert ex.script_path and open(ex.script_path).read().startswith("from pyspark.sql")
    # freshly compacted -> no re-trigger within thresholds
    ex2 = jobs.evaluate_and_maybe_optimize(spark, small_table, {})
    assert ex2 is None


def test_load_executor_unknown_impl_raises(spark):
    with pytest.raises(ValueError, match="Cannot initialize Executor"):
        jobs.load_executor("org.example.DoesNotExist")
