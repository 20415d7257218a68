"""Unit tests for lifecycle operators (expire / time-travel / orphan /
MERGE / CDC) on hand-built micro-frames — the three-exit-path style of
SURVEY SS5.5, applied to the lifecycle module."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from iceberg_aws_event_based_table_management_spark.operators.lifecycle import (
    merge_upsert,
    orphan_files,
    plan_expired_snapshots,
    table_state_asof,
)


def _snapshots(spark):
    rows = [
        Row(table_name="t1", snapshot_id=i, ts=f"2024-01-{i:02d} 00:00:00", operation="append")
        for i in range(1, 11)
    ] + [
        Row(table_name="t2", snapshot_id=100 + i, ts=f"2024-01-{i:02d} 00:00:00", operation="append")
        for i in range(1, 4)
    ]
    return spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))


def test_expire_respects_both_conditions(spark):
    snaps = _snapshots(spark)
    # retain_last=3 keeps ids 8,9,10 for t1 regardless of age; cutoff
    # Jan 6 additionally protects 6,7.  t2 has only 3 snapshots: none expire.
    out = plan_expired_snapshots(snaps, older_than="2024-01-06 00:00:00", retain_last=3)
    got = sorted(r.snapshot_id for r in out.collect())
    assert got == [1, 2, 3, 4, 5]


def test_expire_retain_last_alone_protects(spark):
    snaps = _snapshots(spark)
    out = plan_expired_snapshots(snaps, older_than="2025-01-01 00:00:00", retain_last=9)
    assert sorted(r.snapshot_id for r in out.collect()) == [1]


def test_time_travel_picks_latest_at_or_before(spark):
    snaps = _snapshots(spark)
    out = {r.table_name: r.snapshot_id for r in table_state_asof(snaps, "2024-01-05 12:00:00").collect()}
    assert out == {"t1": 5, "t2": 103}


def test_orphan_files_anti_join(spark):
    inv = spark.createDataFrame(
        [Row(table_name="t1", file_path=f"f{i}", file_size_bytes=10) for i in range(5)]
    )
    manifest = inv.filter(F.col("file_path").isin("f0", "f2"))
    got = sorted(r.file_path for r in orphan_files(inv, manifest).collect())
    assert got == ["f1", "f3", "f4"]


def test_merge_upsert_three_row_fates(spark):
    target = spark.createDataFrame(
        [Row(k=1, v=10.0, tag="a"), Row(k=2, v=20.0, tag="b")]
    )
    source = spark.createDataFrame(
        [Row(k=2, v=99.0, tag="zzz"), Row(k=3, v=30.0, tag="c")]
    )
    out = {r.k: (r.v, r.tag) for r in merge_upsert(target, source, keys=["k"], update_cols=["v"]).collect()}
    # k=1 untouched; k=2 matched -> v updated, tag kept from target; k=3 inserted.
    assert out == {1: (10.0, "a"), 2: (99.0, "b"), 3: (30.0, "c")}


def test_merge_upsert_version_guard_is_order_insensitive(spark):
    """WHEN MATCHED AND s.v > t.v: an older source row must NOT clobber
    newer state — merging batches in any order converges to max-v."""
    newer = F.col("s.v") > F.col("t.v")
    b1 = spark.createDataFrame([Row(k=1, v=5.0)])
    b2 = spark.createDataFrame([Row(k=1, v=9.0)])

    from iceberg_aws_event_based_table_management_spark.operators.lifecycle import merge_upsert as mu

    fwd = mu(mu(b1, b2, ["k"], ["v"], update_condition=newer), b1, ["k"], ["v"], update_condition=newer)
    rev = mu(mu(b2, b1, ["k"], ["v"], update_condition=newer), b2, ["k"], ["v"], update_condition=newer)
    assert fwd.collect() == rev.collect() == [Row(k=1, v=9.0)]


def test_merge_upsert_null_keys_never_match(spark):
    """SQL MERGE ON t.k = s.k: NULL never equals NULL, so a NULL-keyed
    target row is kept verbatim and a NULL-keyed source row is
    inserted — two distinct output rows, not one merged row."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    schema = StructType([StructField("k", LongType()), StructField("v", DoubleType())])
    target = spark.createDataFrame([(None, 1.0), (7, 70.0)], schema)
    source = spark.createDataFrame([(None, 2.0), (7, 77.0)], schema)
    out = sorted(
        ((r.k, r.v) for r in merge_upsert(target, source, keys=["k"], update_cols=["v"]).collect()),
        key=lambda t: (t[0] is None, t[0], t[1]),
    )
    # k=7 matched -> updated; the two NULL-keyed rows pass through on
    # their own paths (target kept, source inserted).
    assert out == [(7, 77.0), (None, 1.0), (None, 2.0)]


def test_merge_upsert_guard_fail_keeps_null_target_column(spark):
    """A matched row whose guard fails keeps the target row verbatim —
    including a NULL target column that a coalesce would silently
    overwrite with the source value."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("ver", LongType()),
            StructField("v", DoubleType()),
        ]
    )
    target = spark.createDataFrame([(1, 5, None)], schema)
    source = spark.createDataFrame([(1, 3, 42.0)], schema)
    guard = F.col("s.ver") > F.col("t.ver")
    out = merge_upsert(target, source, keys=["k"], update_cols=["ver", "v"], update_condition=guard).collect()
    assert out == [Row(k=1, ver=5, v=None)]


def test_merge_upsert_composite_keys(spark):
    """Composite ON clause: both key parts must match; partial key
    overlap is an insert, and key columns come from the owning side."""
    target = spark.createDataFrame([Row(a=1, b="x", v=10.0), Row(a=1, b="y", v=20.0)])
    source = spark.createDataFrame([Row(a=1, b="y", v=99.0), Row(a=2, b="x", v=30.0)])
    out = {(r.a, r.b): r.v for r in merge_upsert(target, source, keys=["a", "b"], update_cols=["v"]).collect()}
    assert out == {(1, "x"): 10.0, (1, "y"): 99.0, (2, "x"): 30.0}
