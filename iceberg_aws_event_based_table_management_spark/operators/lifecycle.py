"""Table-lifecycle operators beyond `optimize-data` — the natural
siblings of the reference's single maintenance action.

The reference supports only small-file compaction (README.md:5
"Currently, only the `optimize-data` optimization is supported"), but
its design — a `MetricsReporter` trigger plus pluggable `Executor`
(Executor.java:9-23) — is explicitly the scaffold for the other
Iceberg maintenance procedures.  This module implements those
procedures' *planning/data semantics* natively:

- ``plan_expired_snapshots``: `expire_snapshots(older_than,
  retain_last)` planning over the `_snapshots` lineage.
- ``orphan_files``: `remove_orphan_files` planning — inventory files
  not reachable from the live manifest (anti-join).
- ``table_state_asof``: snapshot time travel (`VERSION AS OF` /
  `TIMESTAMP AS OF`) over the lineage log.
- ``merge_upsert``: MERGE INTO (the write pattern whose small-file
  output is exactly what the reference's compaction cleans up).
- ``cdc_diff``: changelog between two timestamps (Iceberg
  `create_changelog_view` analog).

Scale notes: all of these operate on *metadata-sized* inputs
(snapshot lineage, file inventory) except MERGE, which is a single
shuffled full-outer join on the target key — the same cost class as
the Iceberg MERGE it models.  No driver-side loops, no collect().
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def plan_expired_snapshots(
    snapshots: DataFrame, *, older_than: str, retain_last: int
) -> DataFrame:
    """Plan `expire_snapshots`: per table, a snapshot expires iff it is
    older than ``older_than`` AND not among the ``retain_last`` most
    recent.  Mirrors Iceberg's ExpireSnapshots contract (both
    conditions must hold).  Window is partitioned per table — lineage
    length is bounded by commit count, never data volume.
    """
    w = Window.partitionBy("table_name").orderBy(
        F.desc("ts"), F.desc("snapshot_id")
    )
    return (
        snapshots.withColumn("recency_rank", F.row_number().over(w))
        .filter(
            (F.col("recency_rank") > F.lit(retain_last))
            & (F.col("ts") < F.lit(older_than).cast("timestamp"))
        )
        .drop("recency_rank")
    )


def orphan_files(inventory: DataFrame, manifest: DataFrame) -> DataFrame:
    """`remove_orphan_files` planning: files present in the storage
    listing (``inventory``) but absent from the live manifest — a
    left-anti join on (table_name, file_path).  Both sides are file
    *metadata*; at 100 TB this is millions of rows, not bytes of data,
    and the anti-join shuffles only paths.
    """
    return inventory.join(
        manifest.select("table_name", "file_path"),
        on=["table_name", "file_path"],
        how="left_anti",
    )


def table_state_asof(snapshots: DataFrame, ts: str) -> DataFrame:
    """Time travel: the current snapshot of every table as of ``ts``
    (latest commit with commit-ts <= ts) — `TIMESTAMP AS OF` over our
    `_snapshots` log, i.e. the reference's `SnapshotUtil` ancestor
    walk (AwsTableManagementMetricsEvaluator.java:74) pinned to a
    historical point.
    """
    w = Window.partitionBy("table_name").orderBy(
        F.desc("ts"), F.desc("snapshot_id")
    )
    return (
        snapshots.filter(F.col("ts") <= F.lit(ts).cast("timestamp"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    update_cols: Sequence[str],
    update_condition=None,
) -> DataFrame:
    """MERGE INTO target USING source ON keys
    WHEN MATCHED [AND update_condition] THEN UPDATE SET update_cols = source.update_cols
    WHEN NOT MATCHED THEN INSERT *.

    Implemented as one full-outer join + coalesce — a single shuffle
    on the merge key, which is exactly Iceberg's copy-on-write MERGE
    cost model.  Columns not in ``update_cols`` keep the target value
    for matched rows.  Assumes source is deduplicated on ``keys``
    (standard MERGE precondition).

    ``update_condition``: optional Column over the ``t.``/``s.``
    aliases (e.g. ``F.col("s.ts") > F.col("t.ts")``) — the
    `WHEN MATCHED AND ...` guard of SQL MERGE.  The canonical CDC use
    is a version/timestamp guard, which makes repeated merges
    idempotent and arrival-order-insensitive.

    NULL semantics match SQL MERGE exactly: the ON clause is plain
    equality, so a NULL key never matches (a NULL-keyed target row is
    kept verbatim; a NULL-keyed source row is inserted).  Row
    provenance comes from explicit per-side presence markers, not from
    key-NULL inference, so a matched row whose guard fails keeps the
    target row verbatim — including its NULL columns.
    """
    key_list = list(keys)
    t = target.withColumn("_t_present", F.lit(True)).alias("t")
    s = source.withColumn("_s_present", F.lit(True)).alias("s")
    cond = [F.col(f"t.{k}") == F.col(f"s.{k}") for k in key_list]
    joined = t.join(s, cond, "full_outer")
    t_present = F.col("t._t_present").isNotNull()
    s_present = F.col("s._s_present").isNotNull()
    updated = t_present & s_present
    if update_condition is not None:
        updated = updated & update_condition
    out_cols = []
    for c in target.columns:
        tcol = F.col(f"t.{c}")
        scol = F.col(f"s.{c}") if c in source.columns else F.lit(None)
        if c in update_cols and c in source.columns:
            # matched+guard -> source; any present target -> target
            # verbatim; else (not-matched insert) -> source
            expr = F.when(updated, scol).when(t_present, tcol).otherwise(scol)
        else:
            expr = F.when(t_present, tcol).otherwise(scol)
        out_cols.append(expr.alias(c))
    return joined.select(*out_cols)


def cdc_diff(snapshots: DataFrame, ts_from: str, ts_to: str) -> DataFrame:
    """Changelog between two points in time: per table, the commit
    activity in (ts_from, ts_to] — counts and net metric delta by
    operation.  The batch analog of Iceberg's
    `create_changelog_view`; feeding it the `_snapshots` log keeps it
    metadata-sized.
    """
    win = snapshots.filter(
        (F.col("ts") > F.lit(ts_from).cast("timestamp"))
        & (F.col("ts") <= F.lit(ts_to).cast("timestamp"))
    )
    return win.groupBy("table_name", "operation").agg(
        F.count("*").alias("n_commits"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )
