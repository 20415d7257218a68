"""Semantic invariants for the E101-E106 operators (value correctness
is the oracle's job; these lock the *guarantees* each operator's
contract promises)."""

from __future__ import annotations

import math

import pytest

import iceberg_aws_event_based_table_management_spark as engine
from iceberg_aws_event_based_table_management_spark import io
from iceberg_aws_event_based_table_management_spark.operators import dedup as D
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def qmap():
    engine.load_all_queries()
    return engine.query_map()


def test_cluster_holdout_partitions_the_corpus(spark, sf_dir, qmap):
    """Splits are a partition: every doc lands in exactly one split and
    totals reconcile with the corpus."""
    rows = qmap["split_cluster_holdout"](spark, sf_dir).collect()
    docs = io.table(spark, sf_dir, "documents")
    n_docs = docs.count()
    n_chars = docs.agg(F.sum("n_chars")).collect()[0][0]
    assert {r.split for r in rows} <= {"train", "val", "test"}
    assert sum(r.n_docs for r in rows) == n_docs
    assert sum(r.n_chars_total for r in rows) == n_chars


def test_cluster_holdout_never_splits_a_near_dup_pair(spark, sf_dir, qmap):
    """The leakage guarantee itself: both ends of every verified
    near-dup pair receive the same split assignment."""
    docs = io.table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = D.jaccard_pairs(D.shingles(docs, 3), threshold=0.5)
    comp = D.connected_components(pairs)
    assign = (
        io.table(spark, sf_dir, "documents")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component_id", "doc_id").alias("component_id"),
        )
        .withColumn(
            "bucket",
            D.neutral_word_hash(
                F.concat(F.col("component_id").cast("string"), F.lit(":holdout"))
            )
            % 10,
        )
    )
    split_of = {r.doc_id: r.bucket for r in assign.collect()}
    checked = 0
    for p in pairs.collect():
        assert split_of[p.doc_id_a] == split_of[p.doc_id_b], p
        checked += 1
    assert checked > 0, "fixture must contain near-dup pairs"


def test_winnow_guarantees_shared_fingerprint_for_copied_passage(
    spark, qmap, tmp_path
):
    """Winnowing's coverage guarantee on a crafted corpus (the fixture
    has no exact dups): an identical text pair shares ALL fingerprints;
    a doc embedding a long copied passage inside fresh prose shares at
    least one; an unrelated doc shares none."""
    passage = " ".join(f"tok{i}" for i in range(40))
    rows = [
        (1, passage, "en", "a", len(passage)),
        (2, passage, "en", "a", len(passage)),
        (3, "alpha beta " + passage + " gamma delta", "en", "a", 1),
        (4, " ".join(f"other{i}" for i in range(60)), "en", "b", 1),
    ]
    corpus = tmp_path / "winnow"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(corpus / "documents.parquet"))
    out = {r.doc_id: r for r in qmap["text_winnow_fingerprints"](spark, str(corpus)).collect()}
    assert out[1].n_shared_fp == out[1].n_fingerprints
    assert out[2].n_shared_fp == out[2].n_fingerprints
    assert out[3].n_shared_fp >= 1, "copied passage must surface"
    assert out[4].n_shared_fp == 0, "unrelated doc must not"


def test_winnow_density_is_bounded(spark, sf_dir, qmap):
    """Selected fingerprints are a strict, bounded subsample: never
    more than the window-start count, never zero for a non-empty doc."""
    for r in qmap["text_winnow_fingerprints"](spark, sf_dir).collect():
        assert 1 <= r.n_fingerprints <= max(r.n_grams - 3, 1), r


def test_pq_codes_reconstruct_codebook_vectors_exactly(spark, sf_dir, qmap):
    """The four codebook-seed vectors (lowest vec_ids) must encode to
    themselves with zero distortion — PQ is lossless exactly on the
    codebook; every other vector has positive distortion and in-range
    codes."""
    rows = {r.vec_id: r for r in qmap["embedding_pq_codes"](spark, sf_dir).collect()}
    seed_ids = sorted(rows)[:4]
    for code, vec_id in enumerate(seed_ids):
        r = rows[vec_id]
        assert (r.code0, r.code1, r.code2, r.code3) == (code,) * 4
        assert r.distortion == 0, r
    others = [r for v, r in rows.items() if v not in seed_ids]
    assert others
    for r in others:
        assert all(0 <= c <= 3 for c in (r.code0, r.code1, r.code2, r.code3))
        assert r.distortion >= 0


def test_incremental_maintenance_equals_full_recompute(spark, sf_dir, qmap):
    """merge(base, delta) == full rescan, per customer — the algebraic
    property the operator exists to demonstrate."""
    merged = {
        r.o_custkey: (r.n_orders, r.total_cents, r.last_order)
        for r in qmap["agg_incremental_maintenance"](spark, sf_dir).collect()
    }
    full = {
        r.o_custkey: (r.n_orders, r.total_cents, r.last_order)
        for r in io.table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("total_cents"),
            F.max("o_orderdate").alias("last_order"),
        )
        .collect()
    }
    assert merged == full


def test_overlap_depth_separates_clustered_from_random_key(spark, sf_dir, qmap):
    """Files are orderkey slices, so the layout key's stabbing depth
    must sit near 1 while the unclustered partkey's approaches the
    file count — the contrast that prices a sort rewrite."""
    rows = qmap["files_overlap_depth"](spark, sf_dir).collect()
    by_key: dict[str, list] = {}
    for r in rows:
        by_key.setdefault(r.key_col, []).append(r)
        assert 1 <= r.avg_depth <= r.max_depth <= r.n_files
    ok = sum(r.avg_depth for r in by_key["l_orderkey"]) / len(by_key["l_orderkey"])
    pk = sum(r.avg_depth for r in by_key["l_partkey"]) / len(by_key["l_partkey"])
    assert ok < 2.0, "layout-key depth should be ~1"
    assert pk > 5 * ok, "unclustered key must overlap far more than the layout key"


def test_hll_estimate_tracks_exact_distinct(spark, sf_dir, qmap):
    """m=64 gives ~13% standard error; assert every source lands
    within 4 sigma (52%) of exact, and registers are sane."""
    rows = qmap["distinct_hll_neutral"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_zero_registers <= 64
        assert r.exact_distinct <= r.n_tokens
        rel = abs(r.hll_estimate - r.exact_distinct) / r.exact_distinct
        assert rel < 0.52, r


def test_hll_merge_is_register_max(spark, sf_dir):
    """The sketch's mergeability: the union estimate computed from
    element-wise-max registers over two shards equals the estimate of
    the concatenated stream — verified in pure Python against the same
    md5 hash the engines use."""
    import hashlib

    def registers(words):
        regs = [0] * 64
        for w in words:
            h = int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
            reg, rest = h >> 54, h & ((1 << 54) - 1)
            rho = 55 if rest == 0 else 55 - rest.bit_length()
            regs[reg] = max(regs[reg], rho)
        return regs

    a = [f"w{i}" for i in range(500)]
    b = [f"w{i}" for i in range(300, 900)]
    merged = [max(x, y) for x, y in zip(registers(a), registers(b))]
    assert merged == registers(a + b)
