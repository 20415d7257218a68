"""Property-based tests for the round-8 operator batch: each
declarative formulation must match a literal python mirror on
randomized inputs.  One DataFrame per example (many groups packed in)
so each hypothesis case costs one Spark job."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

# series of daily counts per group: (group, [counts...])
series_strategy = st.lists(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=2, max_size=40),
    min_size=1,
    max_size=6,
)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(series_strategy)
def test_theilsen_median_slope_matches_bruteforce(spark, series):
    """The pairwise-slope ×2-scaled sorted-pick median equals a python
    brute force on random integer series (gaps included via index
    doubling to exercise unequal x deltas)."""
    rows = [
        (g, 2 * i + (i % 3 == 0), n)  # irregular x spacing
        for g, counts in enumerate(series)
        for i, n in enumerate(counts)
    ]
    df = spark.createDataFrame(rows, "g int, x long, n long")
    a, b = df.alias("a"), df.alias("b")
    slopes = a.join(
        b, (F.col("a.g") == F.col("b.g")) & (F.col("a.x") < F.col("b.x"))
    ).select(
        F.col("a.g").alias("g"),
        (
            (F.col("b.n") - F.col("a.n")).cast("double")
            / (F.col("b.x") - F.col("a.x")).cast("double")
        ).alias("slope"),
    )
    agg = slopes.groupBy("g").agg(F.array_sort(F.collect_list("slope")).alias("s"))
    ln = F.size("s")
    med_x2 = F.element_at("s", ((ln + 1) / 2).cast("int")) + F.element_at(
        "s", (ln / 2).cast("int") + 1
    )
    got = {r.g: r.m for r in agg.select("g", med_x2.alias("m")).collect()}
    for g, counts in enumerate(series):
        xs = [2 * i + (i % 3 == 0) for i in range(len(counts))]
        sl = sorted(
            (counts[j] - counts[i]) / (xs[j] - xs[i])
            for i in range(len(counts))
            for j in range(i + 1, len(counts))
        )
        want = sl[(len(sl) + 1) // 2 - 1] + sl[len(sl) // 2]
        assert got[g] == want


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(series_strategy)
def test_drawdown_matches_linear_walk(spark, series):
    """runmax-of-runsum drawdown equals the one-pass python walk on
    random signed daily deltas."""
    rows = [
        (g, i, n - 5_000)  # signed deltas
        for g, counts in enumerate(series)
        for i, n in enumerate(counts)
    ]
    df = spark.createDataFrame(rows, "g int, d int, v long")
    w = Window.partitionBy("g").orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = df.select("g", "d", F.sum("v").over(w).alias("cum")).select(
        "g", "d", "cum", F.max("cum").over(w).alias("runmax")
    )
    got = {
        r.g: r.dd
        for r in cum.groupBy("g")
        .agg(F.max(F.col("runmax") - F.col("cum")).alias("dd"))
        .collect()
    }
    for g, counts in enumerate(series):
        cum = peak = 0
        first = True
        dd = 0
        for n in counts:
            v = n - 5_000
            cum = v if first else cum + v
            peak = cum if first else max(peak, cum)
            first = False
            dd = max(dd, peak - cum)
        assert got[g] == dd


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(st.integers(0, 1), st.integers(min_value=1, max_value=5000)),
        min_size=4,
        max_size=120,
    )
)
def test_weighted_median_matches_walk(spark, rows_in):
    """2·cumweight ≥ total picks exactly the walk's value on random
    (value, weight) populations (weights = value buckets here)."""
    rows = [(int(grp), i, v, 1 + v % 7) for i, (grp, v) in enumerate(rows_in)]
    df = spark.createDataFrame(rows, "g int, id int, v long, wt long")
    wc = Window.partitionBy("g").orderBy("v", "id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.partitionBy("g")
    cum = df.select(
        "g", "v", F.sum("wt").over(wc).alias("cw"), F.sum("wt").over(wt).alias("tw")
    )
    got = {
        r.g: r.m
        for r in cum.groupBy("g")
        .agg(F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("v"))).alias("m"))
        .collect()
    }
    by = {}
    for g, i, v, w in rows:
        by.setdefault(g, []).append((v, i, w))
    for g, vals in by.items():
        vals.sort(key=lambda t: (t[0], t[1]))
        tw = sum(w for _, _, w in vals)
        cw = 0
        for v, _, w in vals:
            cw += w
            if 2 * cw >= tw:
                assert got[g] == v
                break


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.integers(min_value=0, max_value=300), min_size=20, max_size=200),
    st.integers(min_value=0, max_value=290),
)
def test_psi_zero_for_identical_populations_and_positive_for_shift(spark, pop, shift):
    """PSI of a population against itself is ~0 (only Laplace-smoothing
    noise); shifting the current population strictly increases it.
    Pure python property of the exact formula the query implements."""

    def psi(ref, cur):
        ref_s = sorted(ref)
        edges = [ref_s[math.ceil(k * len(ref_s) / 10.0) - 1] for k in range(1, 10)]

        def bins(p):
            c = [0] * 10
            for x in p:
                c[sum(1 for e in edges if x > e)] += 1
            return c

        rb, cb = bins(ref), bins(cur)
        out = 0.0
        for i in range(10):
            p = (rb[i] + 0.5) / (len(ref) + 5.0)
            q = (cb[i] + 0.5) / (len(cur) + 5.0)
            out += (p - q) * math.log(p / q)
        return out

    same = psi(pop, pop)
    assert abs(same) < 1e-9
    shifted = [x + shift + 500 for x in pop]  # guaranteed past every edge
    assert psi(pop, shifted) > same
