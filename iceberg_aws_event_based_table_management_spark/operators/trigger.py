"""The optimize-trigger evaluator — the reference's brain, Spark-first.

Re-expresses ``shouldOptimizeDataFiles``
(/root/reference/.../AwsTableManagementMetricsEvaluator.java:108-140)
as declarative DataFrame logic over a snapshot-lineage table:

  1. order each table's snapshots newest-first (SnapshotUtil.currentAncestors, :74)
  2. stop at the most recent REPLACE commit (:114-117)
  3. fire when any remaining snapshot is older than time-threshold-ms (:119-126)
     OR the remaining count reaches commit-threshold (:128-135)

The reference walks the lineage imperatively with early exit; the
set-based window formulation below is equivalent (the early exits only
short-circuit an OR) and is what scales: one shuffle on table_name,
window + aggregation, no driver-side iteration.  At 100 TB the
snapshots table is metadata (rows ~ number of commits), so this is
cheap; partitioning by table_name keeps the window bounded per table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import config
from ..io import epoch_ms


def rank_lineage(snapshots: DataFrame) -> DataFrame:
    """A6: latest-first lineage rank per table (ties broken by snapshot_id)."""
    w = Window.partitionBy("table_name").orderBy(F.desc("ts"), F.desc("snapshot_id"))
    return snapshots.withColumn("lineage_rank", F.row_number().over(w))


def pending_since_replace(snapshots: DataFrame, replace_op: str = config.REPLACE_OPERATION) -> DataFrame:
    """A7: snapshots strictly newer than the newest REPLACE commit.

    Tables with no REPLACE keep their whole lineage.  Implemented as a
    per-table window min over the REPLACE ranks — no join needed, one
    pass over the ranked lineage.
    """
    ranked = rank_lineage(snapshots)
    w = Window.partitionBy("table_name")
    replace_rank = F.min(
        F.when(F.col("operation") == F.lit(replace_op), F.col("lineage_rank"))
    ).over(w)
    return (
        ranked.withColumn("replace_rank", replace_rank)
        .filter(F.col("replace_rank").isNull() | (F.col("lineage_rank") < F.col("replace_rank")))
        .drop("replace_rank")
    )


def decide_optimize(
    snapshots: DataFrame,
    *,
    now: str = config.NOW_LITERAL,
    commit_threshold: int = config.COMMIT_THRESHOLD,
    time_threshold_ms: int = config.TIME_THRESHOLD_MS,
    replace_op: str = config.REPLACE_OPERATION,
) -> DataFrame:
    """A10: full trigger decision per table.

    Returns one row per table:
      table_name, n_commits_since_replace, max_pending_age_ms (-1 when
      no pending commits), time_trigger, commit_trigger, should_optimize.

    ``now`` is always an explicit parameter — never wall clock — so the
    decision is reproducible (and oracle-checkable).
    """
    now_ms = F.unix_millis(F.lit(now).cast("timestamp"))
    # One-pass formulation: flag pending rows inside the ranked lineage
    # and aggregate conditionally — the groupBy naturally covers tables
    # with zero pending commits, so no distinct + left join is needed
    # (one shuffle on table_name total; both window functions share the
    # same exchange).
    ranked = rank_lineage(snapshots)
    w = Window.partitionBy("table_name")
    replace_rank = F.min(
        F.when(F.col("operation") == F.lit(replace_op), F.col("lineage_rank"))
    ).over(w)
    flagged = ranked.withColumn(
        "is_pending",
        replace_rank.isNull() | (F.col("lineage_rank") < replace_rank),
    )
    agg = flagged.groupBy("table_name").agg(
        F.count(F.when(F.col("is_pending"), 1)).alias("n_pending"),
        F.max(
            F.when(F.col("is_pending"), now_ms - epoch_ms("ts"))
        ).alias("max_age"),
    )
    n = F.coalesce(F.col("n_pending"), F.lit(0))
    age = F.coalesce(F.col("max_age"), F.lit(-1)).cast("long")
    return agg.select(
        F.col("table_name"),
        n.alias("n_commits_since_replace"),
        age.alias("max_pending_age_ms"),
        (age >= F.lit(time_threshold_ms)).alias("time_trigger"),
        (n >= F.lit(commit_threshold)).alias("commit_trigger"),
        ((age >= F.lit(time_threshold_ms)) | (n >= F.lit(commit_threshold))).alias("should_optimize"),
    )
