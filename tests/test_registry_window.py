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


def test_r8_regime_flip(loaded, monkeypatch):
    """Once every non-tail name is green, load() must hand the window
    to tail_r8 + canaries_r8 and pin the canaries against rotation."""
    import iceberg_aws_event_based_table_management_spark.queries as q

    tail = set(TAIL_R8)
    snapshot = dict(registry.QUERIES)
    monkeypatch.setattr(
        registry, "driver_green_names", lambda records=None: set(registry.QUERIES) - tail
    )
    monkeypatch.setattr(q, "_LOADED", False)
    try:
        q.load()
        names = list(registry.QUERIES)
        assert names[:9] == TAIL_R8
        canaries = _hand_authored("canaries_r8")
        assert names[9:50] == canaries
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
