"""Quality bounds for rows-only (non-oracle) queries."""

from __future__ import annotations

from pyspark.sql import functions as F

import iceberg_aws_event_based_table_management_spark as engine
from iceberg_aws_event_based_table_management_spark import io


def _q(name):
    engine.load_all_queries()
    return engine.query_map()[name]


def test_approx_distinct_within_rsd(spark, sf_dir):
    """C20 is now an oracle-checkable audit (r8 verdict #3): the row
    carries the exact count plus a within-5%-bound boolean that the
    DuckDB oracle asserts TRUE; this test re-derives the exact counts
    independently and checks the audit booleans all hold."""
    rows = _q("agg_approx_distinct")(spark, sf_dir).collect()
    audited = {r["l_returnflag"]: r for r in rows}
    exact = {
        r["l_returnflag"]: r["n"]
        for r in io.table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert set(audited) == set(exact)
    for k, n in exact.items():
        assert audited[k]["exact_orders"] == n
        assert audited[k]["approx_within_bound"] is True, (k, n)


def test_stream_ingest_matches_batch_counts(spark, sf_dir):
    stream_counts = {
        r["event_type"]: r["n_events"] for r in _q("stream_events_ingest")(spark, sf_dir).collect()
    }
    batch_counts = {
        r["event_type"]: r["n"]
        for r in io.table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert stream_counts == batch_counts


def test_simhash_is_deterministic_across_runs(spark, sf_dir):
    a = sorted(tuple(r) for r in _q("dedup_simhash_buckets")(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in _q("dedup_simhash_buckets")(spark, sf_dir).collect())
    assert a == b


def test_cluster_survivor_is_best_quality_member(spark, sf_dir):
    """E26: every multi-member component's survivor must be its
    highest-quality member (tiebreak doc_id), and component members
    must partition the corpus (sum of n_members == corpus size)."""
    from iceberg_aws_event_based_table_management_spark.operators import text as TXo

    out = _q("dedup_cluster_survivors")(spark, sf_dir).collect()
    docs = io.table(spark, sf_dir, "documents")
    assert sum(r["n_members"] for r in out) == docs.count()
    q = {
        r["doc_id"]: r["q"]
        for r in docs.select("doc_id", TXo.quality_score_col().alias("q")).collect()
    }
    for r in out:
        assert q[r["survivor_doc_id"]] == r["survivor_quality"]


def test_interleave_round_robin_prefix(spark, sf_dir):
    """E27: sorting by interleave_key, the first n_sources docs are
    exactly one per source (each source's best), i.e. the order really
    interleaves sources round-robin."""
    rows = sorted(
        _q("curriculum_interleave")(spark, sf_dir).collect(),
        key=lambda r: r["interleave_key"],
    )
    n_sources = len({r["source"] for r in rows})
    first_round = rows[:n_sources]
    assert {r["source"] for r in first_round} == {r["source"] for r in rows}
    assert all(r["src_rank"] == 1 for r in first_round)


def test_repetition_stats_hand_computed(spark):
    """E29: repetition signals on hand-computed docs — the sorted-array
    run-length fold must equal the explode/groupBy bigram mode."""
    from iceberg_aws_event_based_table_management_spark.operators import text as TXo

    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "x y z"), (3, "go go go go")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in TXo.repetition_stats(docs).collect()}
    # doc 1: 4 words, 2 distinct -> dup 0.5; bigrams [a a, a a, a b] -> 2/3
    assert out[1]["n_words"] == 4
    assert out[1]["dup_word_ratio"] == 0.5
    assert out[1]["top_bigram_ratio"] == round(2 / 3, 6)
    # doc 2: all distinct -> dup 0; bigrams all unique -> 1/2
    assert out[2]["dup_word_ratio"] == 0.0
    assert out[2]["top_bigram_ratio"] == 0.5
    # doc 3: one word repeated -> dup 0.75; single bigram x3 -> 3/3
    assert out[3]["dup_word_ratio"] == 0.75
    assert out[3]["top_bigram_ratio"] == 1.0


def test_heuristic_filter_rules(spark):
    """E30: each rule flips `keep` independently."""
    from iceberg_aws_event_based_table_management_spark.operators import text as TXo

    long_good = "the " + "word " * 60  # >=50 words, has stopword, clean
    out = {
        r["doc_id"]: r
        for r in TXo.heuristic_filter(
            spark.createDataFrame(
                [
                    (1, long_good),
                    (2, "the quick fox"),  # too short
                    (3, "zz " * 70),  # no stopword
                    (4, "the " + "!! " * 80),  # symbol ratio + word len
                ],
                ["doc_id", "text"],
            )
        ).collect()
    }
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False and out[2]["n_words"] == 3
    assert out[3]["keep"] is False and out[3]["has_stopword"] is False
    assert out[4]["keep"] is False and out[4]["symbol_word_ratio"] > 0.2


def test_chunk_overlap_covers_document(spark):
    """E31: chunks tile the word sequence with the stride/size contract
    and reassemble to the original text."""
    from iceberg_aws_event_based_table_management_spark.operators import text as TXo

    words = [f"w{i}" for i in range(75)]
    df = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    chunks = sorted(
        TXo.chunk_documents(df, chunk_size=32, stride=24).collect(),
        key=lambda r: r["chunk_id"],
    )
    # starts 0, 24, 48, 72 -> 4 chunks
    assert [r["chunk_id"] for r in chunks] == [0, 1, 2, 3]
    for r in chunks:
        start = r["chunk_id"] * 24
        expect = words[start : start + 32]
        assert r["chunk_text"].split(" ") == expect
        assert r["n_chunk_words"] == len(expect)


def test_token_budget_greedy_prefix(spark, sf_dir):
    """E28: kept tokens exhaust the 800 budget per source (kept_tokens
    >= 800 when the source has that many, and dropping the last
    admitted doc would fall back under budget)."""
    for r in _q("source_token_budget")(spark, sf_dir).collect():
        assert 1 <= r["n_kept"] <= r["n_docs"]
        if r["n_kept"] < r["n_docs"]:  # budget actually cut this source
            assert r["kept_tokens"] >= 800


def test_split_stable_under_repartition(spark, sf_dir):
    """E41: split assignment is content-keyed — repartitioning the
    input cannot move any document across splits, and train dominates
    (98/1/1 target)."""
    q = _q("split_train_val_test")
    a = {r["doc_id"]: r["split"] for r in q(spark, sf_dir).collect()}
    docs = io.table(spark, sf_dir, "documents").repartition(17)
    from iceberg_aws_event_based_table_management_spark.operators.dedup import (
        neutral_word_hash,
    )

    bucket = neutral_word_hash(F.col("text")) % 100
    split = (
        F.when(bucket < 1, F.lit("val"))
        .when(bucket < 2, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    b = {r["doc_id"]: r["split"] for r in docs.select("doc_id", split.alias("split")).collect()}
    assert a == b
    counts = {}
    for s in a.values():
        counts[s] = counts.get(s, 0) + 1
    assert counts["train"] > 0.9 * len(a)


def test_version_diff_statuses_partition_union(spark, sf_dir):
    """E40: every doc in v1 ∪ v2 appears exactly once, and statuses
    match the defining predicates (removed = dropped from v2, added =
    absent from v1, changed = revised in v2)."""
    rows = _q("corpus_version_diff")(spark, sf_dir).collect()
    by_id = {r["doc_id"]: r["status"] for r in rows}
    assert len(by_id) == len(rows)  # one row per doc
    for doc_id, status in by_id.items():
        in_v1 = doc_id % 7 != 2
        in_v2 = doc_id % 5 != 4
        revised = doc_id % 11 == 0
        expect = (
            "added" if not in_v1
            else "removed" if not in_v2
            else "changed" if revised
            else "unchanged"
        )
        assert status == expect, (doc_id, status, expect)
