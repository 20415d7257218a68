"""Semantic tests for the fifth round-8 batch (E192-E195): RAKE,
transition entropy, dedup degree profile, aging buckets."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import iceberg_aws_event_based_table_management_spark.queries as q
from iceberg_aws_event_based_table_management_spark import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def loaded():
    q.load()


def _fn(name):
    return registry.QUERIES[name].fn


def test_rake_hand_corpus(spark):
    """RAKE on a tiny hand corpus: the multi-word technical phrase
    must outscore single common words (the algorithm's defining
    behavior), phrases never contain stopwords, and a hand recompute
    of one phrase's score matches."""
    from iceberg_aws_event_based_table_management_spark.operators.text import STOPWORDS
    from iceberg_aws_event_based_table_management_spark.queries import pipeline_ext22 as M

    docs = spark.createDataFrame(
        [
            (1, "linear diophantine equations and strict inequations"),
            (2, "minimal supporting set of solutions for linear diophantine equations"),
            (3, "solutions and criteria of compatibility"),
        ],
        "doc_id long, text string",
    )
    import unittest.mock as mock

    with mock.patch.object(M.io, "table", lambda spark, sf, name: docs):
        rows = _fn("text_rake_keyphrases")(spark, "ignored").collect()
    assert rows
    for r in rows:
        for w in r.phrase.split():
            assert w not in STOPWORDS
    top = rows[0]
    assert " " in top.phrase  # a multi-word phrase wins
    # hand recompute for 'linear diophantine equations' (occurs twice)
    phrases = [
        ["linear", "diophantine", "equations"],
        ["strict", "inequations"],
        ["minimal", "supporting", "set"],
        ["solutions"],
        ["linear", "diophantine", "equations"],
        ["solutions"],
        ["criteria"],
        ["compatibility"],
    ]
    freq, deg = {}, {}
    for ph in phrases:
        for w in ph:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(ph)
    want = sum(deg[w] / freq[w] for w in ["linear", "diophantine", "equations"])
    got = {r.phrase: r for r in rows}["linear diophantine equations"]
    assert got.n_occurrences == 2
    assert got.score_ppm == math.floor(want * 1_000_000)


def test_transition_entropy_bounds_and_python_match(spark):
    """Entropy per type recomputed in python matches ppm-exactly and
    respects 0 <= H <= log2(n_successors)."""
    from iceberg_aws_event_based_table_management_spark import io

    ev = sorted(
        io.table(spark, SF, "events").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    from collections import Counter, defaultdict

    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r.event_type)
    trans = Counter()
    for seq in by_user.values():
        for a, b in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    got = {r.cur: r for r in _fn("transition_entropy")(spark, SF).collect()}
    by_cur = defaultdict(dict)
    for (a, b), c in trans.items():
        by_cur[a][b] = c
    for cur, nxts in by_cur.items():
        n = sum(nxts.values())
        sclogc = sum(c * math.log2(c) for _, c in sorted(nxts.items()))
        h = math.log2(n) - sclogc / n
        r = got[cur]
        assert (r.n_transitions, r.n_successors) == (n, len(nxts))
        assert r.entropy_bits_ppm == math.floor(h * 1_000_000)
        assert 0 <= r.entropy_bits_ppm <= math.ceil(math.log2(len(nxts)) * 1_000_000)


def test_degree_profile_accounts_every_pair_end(spark):
    """Σ degree·n_docs = 2·|pairs| (every pair contributes two
    endpoints), and example docs really have the stated degree."""
    from iceberg_aws_event_based_table_management_spark import io
    from iceberg_aws_event_based_table_management_spark.operators import dedup as D

    docs = io.table(spark, SF, "documents").select("doc_id", "text")
    pairs = D.jaccard_pairs(D.shingles(docs, 3), threshold=0.5).collect()
    from collections import Counter

    deg = Counter()
    for p in pairs:
        deg[p.doc_id_a] += 1
        deg[p.doc_id_b] += 1
    rows = _fn("dedup_degree_profile")(spark, SF).collect()
    assert sum(r.degree * r.n_docs for r in rows) == 2 * len(pairs)
    for r in rows:
        assert deg[r.example_doc_id] == r.degree


def test_aging_buckets_partition_open_orders(spark):
    """Buckets partition exactly the status-'O' orders, values are
    cent-exact sums, and bucket labels match the age arithmetic."""
    from iceberg_aws_event_based_table_management_spark import io

    orders = io.table(spark, SF, "orders").collect()
    mx = max(r.o_orderdate for r in orders)
    rows = _fn("orders_aging_buckets")(spark, SF).collect()
    open_orders = [r for r in orders if r.o_orderstatus == "O"]
    assert sum(r.n_orders for r in rows) == len(open_orders)
    import collections

    want = collections.defaultdict(lambda: [0, 0])
    for r in open_orders:
        age = (mx - r.o_orderdate).days
        b = "0-30" if age <= 30 else "31-90" if age <= 90 else "91-180" if age <= 180 else "180+"
        w = want[(r.o_orderpriority, b)]
        w[0] += 1
        w[1] += round(r.o_totalprice * 100)
    for r in rows:
        n, cents = want[(r.o_orderpriority, r.age_bucket)]
        assert r.n_orders == n
        assert abs(r.open_value - cents / 100.0) < 1e-9
