"""Grading-window mechanics: rotation, pinning (regression canaries),
and the hand-authored round-8 regime flip.

These are driver-contract tests — no SparkSession needed.  They lock
the round-7 ADVICE fix (rotate_graded must not be able to evict a
hand-pinned canary) and the r7 verdict's task 4 (the round-8 window =
9 never-graded tail names + 41 pinned canaries, flipped automatically
once the staged backlog is green).
"""

from __future__ import annotations

import re
import warnings
from pathlib import Path

import pytest

from iceberg_aws_event_based_table_management_spark import registry

QUERIES_INIT = (
    Path(__file__).resolve().parents[1]
    / "iceberg_aws_event_based_table_management_spark"
    / "queries"
    / "__init__.py"
)

TAIL_R8 = [
    "setop_bag_halves",
    "absence_view_no_purchase",
    "max_concurrent_activity",
    "rolling_median_spikes",
    "business_days_lag",
    "ks_two_sample_lengths",
    "emd_lengths",
    "acf_daily_lags",
    "correlation_event_series",
]


def _hand_authored(list_name: str) -> list[str]:
    src = QUERIES_INIT.read_text()
    m = re.search(rf"{list_name} = \[(.*?)\]", src, re.S)
    assert m, f"{list_name} not found in queries/__init__.py"
    return re.findall(r'"([a-z0-9_]+)"', m.group(1))


@pytest.fixture()
def loaded():
    import iceberg_aws_event_based_table_management_spark as engine

    engine.load_all_queries()
    return registry


def test_rotate_graded_pinned_names_survive(loaded):
    """A green name listed as pinned must keep its manual position —
    this is what makes deliberate canary re-grading possible."""
    names = list(registry.QUERIES)
    head = names[0]
    # Pretend the head of the window is already green; without pinning
    # it would rotate to the back.
    snapshot = dict(registry.QUERIES)
    try:
        registry.rotate_graded({head}, pinned={head})
        assert list(registry.QUERIES)[0] == head
        registry.rotate_graded({head})
        assert list(registry.QUERIES)[-1] == head
    finally:
        registry.QUERIES.clear()
        registry.QUERIES.update(snapshot)


def test_r8_window_names_all_registered(loaded):
    tail = _hand_authored("tail_r8")
    canaries = _hand_authored("canaries_r8")
    assert tail == TAIL_R8
    assert len(canaries) == 41
    assert len(set(canaries)) == 41
    assert not set(canaries) & set(tail)
    for n in tail + canaries:
        assert n in registry.QUERIES, f"unregistered window name {n}"


def _real_records() -> list[dict]:
    """The repo's actual CORRECTNESS_r*.json contents — the same
    inputs the driver-facing load() consumes in production."""
    import glob
    import json

    root = Path(__file__).resolve().parents[1]
    records = []
    for path in sorted(glob.glob(str(root / "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            records.append(json.load(fh))
    assert records, "no CORRECTNESS records found — did the layout change?"
    return records


def test_r8_regime_flip_is_live(loaded, monkeypatch):
    """With the REAL driver records on disk (r1-r7 greens + the
    rows-only `agg_approx_distinct` excluded from the backlog), load()
    must already hand the first-50 window to tail_r8 + canaries_r8 —
    the r7 verdict's headline defect was that it could never activate.

    No green-set monkeypatching: this simulates exactly what the
    driver will grade in round 8."""
    import iceberg_aws_event_based_table_management_spark.queries as q

    snapshot = dict(registry.QUERIES)
    monkeypatch.setattr(q, "_LOADED", False)
    try:
        q.load()
        names = list(registry.QUERIES)
        canaries = _hand_authored("canaries_r8")
        assert names[:9] == TAIL_R8
        assert names[9:50] == canaries
        # The judge's explicit done-criteria for the r8 window:
        assert "dedup_cluster_survivors" in names[:50]
        assert "should_optimize_decision" in names[:50]
        # The perpetual no_oracle row must never burn a grading slot.
        assert "agg_approx_distinct" not in names[:50]
    finally:
        registry.QUERIES.clear()
        registry.QUERIES.update(snapshot)
        monkeypatch.setattr(q, "_LOADED", True)


def test_r9_flip_after_tail_greens(loaded, monkeypatch):
    """Real records plus a synthetic r8 record greening the 9 tail
    names — exactly what round 9's load() will see once CORRECTNESS_r08
    lands: the regime must rotate to the FRESH canaries_r9 window
    (r7 verdict #5), pinned against rotation, not re-grade the r8
    canaries forever."""
    import iceberg_aws_event_based_table_management_spark.queries as q

    synthetic_r8 = {
        n: {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
        for n in TAIL_R8
    }
    records = _real_records() + [synthetic_r8]
    real_fn = registry.driver_green_names
    monkeypatch.setattr(
        registry, "driver_green_names", lambda recs=None: real_fn(records=records)
    )
    snapshot = dict(registry.QUERIES)
    monkeypatch.setattr(q, "_LOADED", False)
    try:
        q.load()
        names = list(registry.QUERIES)
        canaries = _hand_authored("canaries_r9")
        staged = _hand_authored("staged_new_r8")
        assert len(canaries) == 50
        # Never-graded round-8 newcomers lead, fresh canaries fill the
        # window behind them (the driver grades the first 50).
        assert names[: len(staged)] == staged
        assert names[len(staged) : len(staged) + 50] == canaries
        # The round-8 rewrites the r8 window never re-graded are the
        # first canaries.
        assert canaries[:3] == [
            "stream_join_view_purchase",
            "stream_merge_upsert",
            "dedup_near_clusters",
        ]
        assert "agg_approx_distinct" not in names[:50]
    finally:
        registry.QUERIES.clear()
        registry.QUERIES.update(snapshot)
        monkeypatch.setattr(q, "_LOADED", True)


def test_canaries_r9_all_registered_and_fresh(loaded):
    """Every r9 canary must be a registered query, the list must be
    duplicate-free, and — bar the three round-8 rewrites it exists to
    re-grade — disjoint from the r8 canary list (the rotation's whole
    point is sweeping DIFFERENT families each round)."""
    canaries_r9 = _hand_authored("canaries_r9")
    assert len(canaries_r9) == len(set(canaries_r9))
    for n in canaries_r9:
        assert n in registry.QUERIES, f"unregistered r9 canary {n}"
    overlap = set(canaries_r9) & set(_hand_authored("canaries_r8"))
    assert not overlap, f"r9 canaries reuse r8 names: {sorted(overlap)}"


def test_r8_flip_warns_on_unexpected_backlog_name(loaded, monkeypatch):
    """A never-green query missing from the hand-authored tail must be
    appended to the window (not silently evicted) with a warning
    (round-7 ADVICE, low)."""
    import iceberg_aws_event_based_table_management_spark.queries as q

    # Green everything EXCEPT one non-tail query (simulating a
    # rename/addition after tail_r8 was authored) and 8 of the 9 tail
    # names, so the backlog is exactly 9 and the flip fires with a
    # composition that diverges from the literal tail_r8.
    straggler = "scalar_math_suite"
    ungreen = {straggler, *TAIL_R8[:8]}
    synthetic = {
        n: {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
        for n in registry.QUERIES
        if n not in ungreen
    }
    real_fn = registry.driver_green_names
    monkeypatch.setattr(
        registry, "driver_green_names", lambda recs=None: real_fn(records=[synthetic])
    )
    snapshot = dict(registry.QUERIES)
    monkeypatch.setattr(q, "_LOADED", False)
    try:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            q.load()
        assert any("outside the hand-authored window" in str(w.message) for w in caught)
        names = list(registry.QUERIES)
        assert straggler in names[:50], "computed backlog name evicted from window"
        assert names[:9] == TAIL_R8[:8] + [straggler]
    finally:
        registry.QUERIES.clear()
        registry.QUERIES.update(snapshot)
        monkeypatch.setattr(q, "_LOADED", True)


def test_unparseable_correctness_record_warns(tmp_path, monkeypatch, loaded):
    """A corrupted CORRECTNESS file must not silently vanish from
    window arithmetic (round-7 ADVICE, low)."""
    import glob as glob_mod

    bad = tmp_path / "CORRECTNESS_r99.json"
    bad.write_text("{truncated")
    monkeypatch.setattr(
        glob_mod, "glob", lambda pattern: [str(bad)] if "CORRECTNESS" in pattern else []
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        green = registry.driver_green_names()
    assert green == set()
    assert any("unparseable" in str(w.message) for w in caught)


def test_demote_unknown_name_warns_not_crashes(loaded):
    """A renamed query referenced by a hand-authored window list must
    degrade to a warning — a KeyError here would crash load() and take
    the whole driver contract down."""
    snapshot = dict(registry.QUERIES)
    try:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            registry.demote("no_such_query_name", next(iter(registry.QUERIES)))
        assert any("unknown query name" in str(w.message) for w in caught)
        assert len(registry.QUERIES) == len(snapshot)
    finally:
        registry.QUERIES.clear()
        registry.QUERIES.update(snapshot)
