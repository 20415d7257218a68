"""Unit tests for the optimize-trigger evaluator (SURVEY.md SS5.5).

Hand-built snapshot timelines exercising the four exit paths of
`shouldOptimizeDataFiles` (reference
AwsTableManagementMetricsEvaluator.java:108-140): REPLACE-stop,
time fire, count fire, exhausted-list no-fire.
"""

from __future__ import annotations

import datetime as dt

from iceberg_aws_event_based_table_management_spark.operators import trigger

NOW = "2024-06-01 12:00:00"
BASE = dt.datetime(2024, 6, 1, 11, 0, 0)


def _snaps(spark, rows):
    return spark.createDataFrame(
        [(t, i, ts, op) for (t, i, ts, op) in rows],
        "table_name string, snapshot_id long, ts timestamp, operation string",
    )


def _decide(spark, rows, **kw):
    df = trigger.decide_optimize(
        _snaps(spark, rows), now=NOW, replace_op="replace", **kw
    )
    return {r["table_name"]: r.asDict() for r in df.collect()}


def _ts(minutes_before_now: int) -> dt.datetime:
    return dt.datetime(2024, 6, 1, 12, 0, 0) - dt.timedelta(minutes=minutes_before_now)


def test_count_fire(spark):
    # 10 fresh appends since a replace -> commit trigger fires.
    rows = [("t1", 100, _ts(60), "replace")]
    rows += [("t1", 100 + i, _ts(50 - i), "append") for i in range(1, 11)]
    d = _decide(spark, rows)["t1"]
    assert d["commit_trigger"] is True
    assert d["n_commits_since_replace"] == 10
    assert d["should_optimize"] is True
    assert d["time_trigger"] is False  # all < 3h old


def test_below_count_no_fire(spark):
    rows = [("t1", 100, _ts(60), "replace")]
    rows += [("t1", 100 + i, _ts(50 - i), "append") for i in range(1, 10)]
    d = _decide(spark, rows)["t1"]
    assert d["n_commits_since_replace"] == 9
    assert d["should_optimize"] is False


def test_time_fire(spark):
    # one old pending commit (4 h) -> time trigger fires even with count 1.
    rows = [("t1", 1, _ts(240), "append")]
    d = _decide(spark, rows)["t1"]
    assert d["time_trigger"] is True
    assert d["commit_trigger"] is False
    assert d["should_optimize"] is True


def test_replace_stop(spark):
    # an old commit *behind* the replace watermark must not count:
    # replace at -30min, old append at -600min (before replace).
    rows = [
        ("t1", 2, _ts(30), "replace"),
        ("t1", 1, _ts(600), "append"),
    ]
    d = _decide(spark, rows)["t1"]
    assert d["n_commits_since_replace"] == 0
    assert d["max_pending_age_ms"] == -1
    assert d["should_optimize"] is False


def test_no_replace_whole_lineage_counts(spark):
    rows = [("t1", i, _ts(10 * i), "append") for i in range(1, 4)]
    d = _decide(spark, rows)["t1"]
    assert d["n_commits_since_replace"] == 3


def test_tie_on_ts_broken_by_snapshot_id(spark):
    # replace and append share a timestamp; the append with the higher
    # id is "after" the replace and counts as pending.
    t = _ts(30)
    rows = [("t1", 5, t, "replace"), ("t1", 6, t, "append"), ("t1", 4, t, "append")]
    d = _decide(spark, rows)["t1"]
    assert d["n_commits_since_replace"] == 1


def test_multi_table_independence(spark):
    rows = [("t1", 1, _ts(240), "append"), ("t2", 2, _ts(5), "append")]
    d = _decide(spark, rows)
    assert d["t1"]["should_optimize"] is True
    assert d["t2"]["should_optimize"] is False
