"""Semantic invariants for the E161-E164 operators (value correctness
is the oracle's job; these lock the *guarantees* each operator's
contract promises)."""

from __future__ import annotations

import pytest

import iceberg_aws_event_based_table_management_spark as engine
from iceberg_aws_event_based_table_management_spark import io
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def qmap():
    engine.load_all_queries()
    return engine.query_map()


def test_mor_delete_attribution_is_disjoint(spark, sf_dir, qmap):
    """pos + eq + live = base everywhere; flavors never double-claim;
    totals reconcile with direct recounts."""
    rows = qmap["mor_deletes_read"](spark, sf_dir).collect()
    li = io.table(spark, sf_dir, "lineitem")
    assert sum(r.n_base for r in rows) == li.count()
    pos_total = li.filter(
        (F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 13 == 0
    ).count()
    assert sum(r.n_pos_deleted for r in rows) == pos_total
    for r in rows:
        assert r.n_pos_deleted + r.n_eq_deleted + r.n_live == r.n_base
        assert r.live_ppm == r.n_live * 1_000_000 // r.n_base


def test_refs_expiry_never_drops_head_or_tag(spark, sf_dir, qmap):
    """kept + expired = total; every table keeps >= 1 (the head);
    ref-saved <= kept; recount tags directly."""
    rows = qmap["refs_aware_snapshot_expiry"](spark, sf_dir).collect()
    snaps = io.snapshots(spark, sf_dir)
    assert sum(r.n_snapshots for r in rows) == snaps.count()
    n_tags = snaps.filter(F.col("snapshot_id") % 101 == 0).count()
    for r in rows:
        assert r.n_kept + r.n_expired == r.n_snapshots
        assert r.n_kept >= 1
        assert 0 <= r.n_ref_saved <= r.n_kept
    # ref-saved only exists where a tag/head fell below the cutoff;
    # total tags bounds the tag-side contribution
    assert sum(r.n_ref_saved for r in rows) <= n_tags + len(rows)


def test_two_tier_never_scans_inside_pruned_manifests(spark, sf_dir, qmap):
    """File accounting partitions exactly; manifest pruning implies
    every member file is out of range (soundness)."""
    rows = qmap["two_tier_manifest_skipping"](spark, sf_dir).collect()
    one = qmap["files_skipping_estimate"](spark, sf_dir).collect()
    one_by_t = {r.table_name: r for r in one}
    for r in rows:
        assert r.n_manifests_pruned <= r.n_manifests
        # two-tier total pruned = one-tier pruned (same stats, the
        # hierarchy only changes WHEN files are discarded, not which)
        assert (
            r.n_files_unexamined + r.n_files_pruned_file_level
            == one_by_t[r.table_name].n_skipped
        )
        assert r.rows_scanned == one_by_t[r.table_name].rows_scanned
        assert r.n_files == one_by_t[r.table_name].n_files


def test_partition_evolution_amplification_gap(spark, sf_dir, qmap):
    """Both specs find the same matches they contain; the old spec
    scans strictly more rows per match (the residual amplification);
    the new spec's scan is bucket-tight."""
    rows = {r.spec_id: r for r in qmap["partition_evolution_scan"](spark, sf_dir).collect()}
    assert set(rows) == {1, 2}
    for r in rows.values():
        assert r.rows_matched <= r.rows_scanned <= r.n_rows_total
        assert r.n_partitions_scanned <= r.n_partitions
    # matched rows are inside scanned partitions by construction;
    # spec 1 (month-only) must scan more rows per matched row than
    # spec 2 (month+bucket) — the whole point of the evolution
    r1, r2 = rows[1], rows[2]
    if r1.rows_matched and r2.rows_matched:
        assert (
            r1.rows_scanned * r2.rows_matched
            > r2.rows_scanned * r1.rows_matched
        )
    # spec 2 scans ~1/4 of the month rows: strictly fewer partitions
    # scanned per total partitions than spec 1's month-share
    total = (
        io.table(spark, sf_dir, "lineitem").count()
    )
    assert r1.n_rows_total + r2.n_rows_total == total
