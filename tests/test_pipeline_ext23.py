"""Semantic tests for the sixth round-8 batch (E196-E198): bigram
perplexity, MinHash calibration, MDE power."""

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


def test_perplexity_matches_python_lm(spark):
    """Train the same add-one bigram LM in python and match every test
    doc's perplexity to the milli output."""
    from iceberg_aws_event_based_table_management_spark import io

    docs = io.table(spark, SF, "documents").select("doc_id", "text").collect()
    from collections import Counter

    uni, bi = Counter(), Counter()
    vocab = set()
    for r in docs:
        if r.doc_id % 2 == 0:
            ws = [w for w in r.text.lower().split() if w]
            vocab.update(ws)
            uni.update(ws)
            bi.update(zip(ws, ws[1:]))
    V = len(vocab)
    got = {r.doc_id: r for r in _fn("text_bigram_perplexity")(spark, SF).collect()}
    checked = 0
    for r in docs:
        if r.doc_id % 2 == 0:
            continue
        ws = [w for w in r.text.lower().split() if w]
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            assert r.doc_id not in got
            continue
        slogp = 0.0
        for w1, w2 in pairs:  # position order — the fold's order
            slogp += math.log((bi[(w1, w2)] + 1.0) / (uni[w1] + float(V)))
        ppl = math.exp(-slogp / len(pairs))
        out = got[r.doc_id]
        assert out.n_bigrams == len(pairs)
        assert out.ppl_milli == math.floor(ppl * 1000)
        checked += 1
    assert checked > 100


def test_perplexity_separates_indomain_from_gibberish(spark):
    """An LM trained on english-like text must score a shuffled-
    charset gibberish doc higher-perplexity than an in-domain doc —
    the filtering property the operator exists for.  Built directly
    from the query's own formula on a hand corpus."""
    from collections import Counter

    train = ["the quick brown fox jumps over the lazy dog"] * 5
    uni, bi = Counter(), Counter()
    vocab = set()
    for t in train:
        ws = t.split()
        vocab.update(ws)
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    V = len(vocab)

    def ppl(text):
        ws = text.split()
        pairs = list(zip(ws, ws[1:]))
        s = sum(
            math.log((bi[(a, b)] + 1.0) / (uni[a] + float(V))) for a, b in pairs
        )
        return math.exp(-s / len(pairs))

    assert ppl("the quick brown fox") < ppl("zqx gkj wvu pqm rrt")


def test_minhash_estimate_unbiased_shape(spark):
    """Estimates sit in [0, 1e6], |err| is bounded by the k-component
    resolution envelope, and identical docs estimate exactly 1e6."""
    rows = _fn("dedup_minhash_estimate_audit")(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.est_ppm <= 1_000_000
        assert r.est_ppm == r.n_match * 62_500  # 1e6 / 16
        assert r.err_ppm == r.est_ppm - r.jaccard_ppm
        if r.jaccard_ppm == 1_000_000:  # identical shingle sets
            assert r.n_match == 16
    # the estimator should be roughly centered: mean |err| well under
    # half the resolution + sampling envelope at k=16 (~125k ppm)
    mean_abs = sum(abs(r.err_ppm) for r in rows) / len(rows)
    assert mean_abs < 200_000


def test_mde_formula_and_consistency_with_ztest(spark):
    """MDE recomputed from the same cells matches ppm-exactly, and any
    observed |lift| above the MDE must have been flagged significant
    by E176 (power/test consistency on the same data)."""
    r = _fn("ab_minimum_detectable_effect")(spark, SF).collect()[0]
    p = (r.base_rate_ppm / 1_000_000)
    # recompute from output fields (p floored to ppm introduces <1ppm
    # drift vs internal double; recompute from raw cells instead)
    z = _fn("conversion_lift_ztest")(spark, SF).collect()[0]
    x = z.x_a + z.x_b
    n = z.n_a + z.n_b
    pp = x / n
    mde = (1.959964 + 0.841621) * math.sqrt(
        pp * (1 - pp) * (1.0 / r.n_a + 1.0 / r.n_b)
    )
    assert (r.n_a, r.n_b) == (z.n_a, z.n_b)
    assert r.mde_abs_ppm == math.floor(mde * 1_000_000)
    lift = abs(z.x_a / z.n_a - z.x_b / z.n_b)
    if lift * 1_000_000 >= r.mde_abs_ppm:
        assert z.significant
