"""Semantic invariants for the E119-E122 operators (value correctness
is the oracle's job; these lock the *guarantees* each operator's
contract promises)."""

from __future__ import annotations

import pytest

import iceberg_aws_event_based_table_management_spark as engine
from iceberg_aws_event_based_table_management_spark import io
from iceberg_aws_event_based_table_management_spark.operators import dedup as D
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def qmap():
    engine.load_all_queries()
    return engine.query_map()


def test_hamming_pairs_match_bruteforce_over_fingerprints(spark, sf_dir, qmap):
    """Block-pigeonhole candidates must lose nothing: the output
    equals a brute-force hamming scan over the (collected)
    fingerprints, and strictly contains the equal-fingerprint pairs."""
    docs = io.table(spark, sf_dir, "documents").select("doc_id", "text")
    fps = {r.doc_id: r.simhash for r in D.simhash(docs, bits=60).collect()}
    ids = sorted(fps)
    brute = {
        (a, b): bin(fps[a] ^ fps[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    got = {
        (r.doc_id_a, r.doc_id_b): r.hamming
        for r in qmap["dedup_simhash_hamming"](spark, sf_dir).collect()
    }
    assert got == brute
    equal_pairs = {p for p, h in brute.items() if h == 0}
    assert set(got) >= equal_pairs
    assert got, "fixture must contain hamming-close pairs"


def test_scd2_join_accounts_for_every_purchase(spark, sf_dir, qmap):
    """No purchase may vanish in the temporal join; states come from
    the non-purchase vocabulary plus the 'none' bucket."""
    rows = qmap["scd2_point_in_time_join"](spark, sf_dir).collect()
    ev = io.table(spark, sf_dir, "events")
    n_purchases = ev.filter(F.col("event_type") == "purchase").count()
    assert sum(r.n_purchases for r in rows) == n_purchases
    state_vocab = {
        r.event_type
        for r in ev.select("event_type").distinct().collect()
        if r.event_type != "purchase"
    } | {"none"}
    assert {r.state for r in rows} <= state_vocab


def test_ivfpq_audit_is_sane(spark, sf_dir, qmap):
    """Candidates are a strict subset of the corpus (that's the IVF
    pruning), hits are bounded by k, and the probe must recover at
    least some of the true neighborhood."""
    r = qmap["ann_ivfpq_recall_audit"](spark, sf_dir).collect()[0]
    n_vecs = io.table(spark, sf_dir, "embeddings").count()
    assert 0 < r.n_candidates < n_vecs
    assert 0 <= r.n_hits <= 20
    assert r.recall_at_20 == r.n_hits / 20
    assert r.recall_at_20 >= 0.05, "probe should recover at least one true neighbor"


def test_pareto_matches_python_lorenz(spark, sf_dir, qmap):
    """Gini and top-decile share must agree with a straightforward
    Python Lorenz computation per segment."""
    import math

    rows = {r.mktsegment: r for r in qmap["pareto_revenue_concentration"](spark, sf_dir).collect()}
    rev = (
        io.table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
        .join(
            io.table(spark, sf_dir, "customer").select(
                F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
            ),
            "o_custkey",
        )
        .collect()
    )
    by_seg: dict[str, list[int]] = {}
    for r in rev:
        by_seg.setdefault(r.c_mktsegment, []).append(r.cents)
    for seg, cents in by_seg.items():
        got = rows[seg]
        n, total = len(cents), sum(cents)
        assert (got.n_customers, got.total_cents) == (n, total)
        asc = sorted(cents)
        gini = 2 * sum((i + 1) * y for i, y in enumerate(asc)) / (n * total) - (n + 1) / n
        assert abs(got.gini - gini) < 1e-5, seg
        top = sum(sorted(cents, reverse=True)[: math.ceil(n / 10)])
        assert got.top10_share_ppm == int(1_000_000 * top / total) or abs(
            got.top10_share_ppm - 1_000_000 * top / total
        ) <= 1, seg
        assert got.top10_share_ppm >= 100_000, "top decile holds >= its pro-rata share"


def test_triangle_census_matches_networkless_python(spark, sf_dir, qmap):
    """The oriented two-join count must equal a plain Python triangle
    count over the same support-pruned edge set."""
    from collections import defaultdict

    items = (
        io.table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets = defaultdict(set)
    for r in items:
        baskets[r.l_orderkey].add(r.l_partkey)
    support = defaultdict(int)
    for parts in baskets.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                support[(u, v)] += 1
    edges = {e for e, s in support.items() if s >= 2}
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)  # oriented u < v
    n_tri = sum(1 for u, v in edges for w in adj.get(v, ()) if w in adj[u])
    deg = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    n_wedges = sum(d * (d - 1) // 2 for d in deg.values())
    r = qmap["graph_triangle_census"](spark, sf_dir).collect()[0]
    assert (r.n_edges, r.n_nodes, r.n_triangles, r.n_wedges) == (
        len(edges),
        len(deg),
        n_tri,
        n_wedges,
    )
    assert abs(r.clustering_coeff - 3 * n_tri / n_wedges) < 1e-6


def test_mrr_bounds_and_reconciliation(spark, sf_dir, qmap):
    """Session accounting: converting <= sessions, rr in (0, 1e6],
    and total sessions reconcile with distinct (user, day) pairs."""
    rows = qmap["session_first_purchase_mrr"](spark, sf_dir).collect()
    ev = io.table(spark, sf_dir, "events")
    n_sessions = (
        ev.select("user_id", F.col("ts").cast("date")).distinct().count()
    )
    assert sum(r.n_sessions for r in rows) == n_sessions
    for r in rows:
        assert 0 <= r.n_converting <= r.n_sessions
        assert r.sum_rr_ppm <= 1_000_000 * r.n_converting
        assert r.mrr_ppm == int(r.sum_rr_ppm / r.n_sessions)


def test_composite_skipping_dominates_single_column(spark, sf_dir, qmap):
    """The union property: composite skips >= each single conjunct's
    skips, and scanned rows + skipped files reconcile."""
    for r in qmap["files_composite_predicate_skipping"](spark, sf_dir).collect():
        assert r.n_skip_composite >= max(r.n_skip_date_only, r.n_skip_pk_only), r
        assert r.n_skip_composite <= r.n_skip_date_only + r.n_skip_pk_only
        assert 0 <= r.n_skip_composite <= r.n_files
        assert r.rows_scanned >= 0


def test_confusion_matrix_reconciles_with_langid(spark, sf_dir, qmap):
    """Matrix cells must sum to the corpus; per-class shares must sum
    to 1; the diagonal must match text_lang_id's correct count."""
    rows = qmap["langid_confusion_matrix"](spark, sf_dir).collect()
    n_docs = io.table(spark, sf_dir, "documents").count()
    assert sum(r.n for r in rows) == n_docs
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, cells in by_lang.items():
        assert abs(sum(c.share for c in cells) - 1.0) < 1e-4, lang
        assert all(c.n_true == cells[0].n_true for c in cells)
    diag = sum(r.n for r in rows if r.lang == r.predicted_lang)
    correct = sum(
        1 for r in qmap["text_lang_id"](spark, sf_dir).collect() if r.correct
    )
    assert diag == correct


def test_coverage_curve_is_monotone_and_tight(spark, sf_dir, qmap):
    """Higher thresholds need no smaller vocabulary; each reported
    vocab size is TIGHT (one fewer type drops below the threshold);
    totals agree across rows."""
    rows = sorted(
        qmap["vocab_coverage_curve"](spark, sf_dir).collect(),
        key=lambda r: r.threshold_pct,
    )
    assert [r.threshold_pct for r in rows] == [50, 90, 99]
    assert rows[0].vocab_size <= rows[1].vocab_size <= rows[2].vocab_size
    total = rows[0].total_tokens
    freqs = sorted(
        (
            r.n
            for r in io.table(spark, sf_dir, "documents")
            .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
            .filter(F.col("w") != "")
            .groupBy("w")
            .count()
            .withColumnRenamed("count", "n")
            .collect()
        ),
        reverse=True,
    )
    assert sum(freqs) == total
    for r in rows:
        covered = sum(freqs[: r.vocab_size])
        assert covered == r.tokens_covered
        assert covered * 100 >= total * r.threshold_pct
        assert sum(freqs[: r.vocab_size - 1]) * 100 < total * r.threshold_pct
