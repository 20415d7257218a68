"""Tier D (part 17) — distribution distances on the value grid
(SURVEY.md §2-E E167-E168).

Sixteenth batch: the exact two-sample Kolmogorov-Smirnov statistic
and the exact 1-D earth-mover's (Wasserstein-1) distance between two
sources' document-length distributions.  With E135 (chi-square,
categorical), E136 (Mann-Whitney, location) these complete the drift
toolbox: KS detects ANY shape difference (sup-norm of the CDF gap),
EMD measures HOW MUCH mass must move (the integral of the gap) — the
two standard answers to "did the distribution change".

Both compute on the VALUE GRID with cross-multiplied integer CDFs
(cs_a·t_b vs cs_b·t_a — no ratio ever forms), the E130/E136/E139
device, so both engines agree bit-for-bit; the KS significance test
cross-multiplies the critical value into a pure integer comparison.

All built-in-function formulations (no Python UDFs); exact DuckDB
oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import io
from ..registry import register

_DD_SRC_A = "src0"
_DD_SRC_B = "src1"

# Shared oracle CTE: inclusive CDF counts on the merged length grid.
_DD_GRID_CTE = f"""
    grid AS (
      SELECT n_chars AS v,
             CAST(SUM(CASE WHEN source = '{_DD_SRC_A}' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN source = '{_DD_SRC_B}' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM documents
      WHERE source IN ('{_DD_SRC_A}', '{_DD_SRC_B}')
      GROUP BY 1
    ),
    cum AS (
      SELECT v,
             CAST(SUM(ca) OVER (ORDER BY v) AS BIGINT) AS cs_a,
             CAST(SUM(cb) OVER (ORDER BY v) AS BIGINT) AS cs_b,
             CAST(SUM(ca) OVER () AS BIGINT) AS t_a,
             CAST(SUM(cb) OVER () AS BIGINT) AS t_b,
             LEAD(v) OVER (ORDER BY v) AS v_next
      FROM grid
    )"""


@register(
    "ks_two_sample_lengths",
    tier="D",
    oracle="WITH "
    + _DD_GRID_CTE
    + """
    SELECT MIN(t_a) AS n1, MIN(t_b) AS n2,
           CAST(MAX(abs(cs_a * t_b - cs_b * t_a)) AS BIGINT) AS d_num,
           CAST(FLOOR((CAST(MAX(abs(cs_a * t_b - cs_b * t_a)) AS DOUBLE)
                       / CAST(MIN(t_a) * MIN(t_b) AS DOUBLE)) * 1000000)
                AS BIGINT) AS ks_ppm,
           (10000.0 * CAST(MAX(abs(cs_a * t_b - cs_b * t_a)) AS DOUBLE)
                    * CAST(MAX(abs(cs_a * t_b - cs_b * t_a)) AS DOUBLE)
            > 18496.0 * CAST(MIN(t_a) + MIN(t_b) AS DOUBLE)
                      * CAST(MIN(t_a) AS DOUBLE) * CAST(MIN(t_b) AS DOUBLE))
             AS is_significant
    FROM cum
    """,
)
def ks_two_sample_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E167: exact two-sample Kolmogorov-Smirnov — D = sup|F_a − F_b|
    between two sources' length distributions, the shape-sensitive
    drift test (E136's Mann-Whitney sees location shifts; KS sees ANY
    CDF divergence).  D's numerator is max|cs_a·t_b − cs_b·t_a| over
    the merged value grid — exact int64 — and the α=0.05 decision
    D > 1.36·√((n+m)/nm) cross-multiplies to
    10⁴·D_num² > 18496·(n+m)·n·m, compared in doubles (bit-identical
    across IEEE engines; the all-int64 form overflows past
    d_num ≈ 3e7 and would THROW under ANSI mode at scale).

    Scale shape: one agg to the length grid (the E62/E130/E136
    metadata allowance), one cumulative window, a 1-row reduction."""
    docs = io.table(spark, sf_dir, "documents").filter(
        F.col("source").isin(_DD_SRC_A, _DD_SRC_B)
    )
    grid = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.sum(F.when(F.col("source") == _DD_SRC_A, 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("source") == _DD_SRC_B, 1).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = grid.select(
        F.sum("ca").over(wv).alias("cs_a"),
        F.sum("cb").over(wv).alias("cs_b"),
        F.sum("ca").over(wall).alias("t_a"),
        F.sum("cb").over(wall).alias("t_b"),
    )
    diff = F.abs(F.col("cs_a") * F.col("t_b") - F.col("cs_b") * F.col("t_a"))
    u = cum.agg(
        F.min("t_a").cast("long").alias("n1"),
        F.min("t_b").cast("long").alias("n2"),
        F.max(diff).cast("long").alias("d_num"),
    )
    return u.select(
        "n1",
        "n2",
        "d_num",
        F.floor(
            (
                F.col("d_num").cast("double")
                / (F.col("n1") * F.col("n2")).cast("double")
            )
            * 1000000
        )
        .cast("long")
        .alias("ks_ppm"),
        # Double-side comparison (both engines IEEE, left-assoc, so
        # the rounding is bit-identical): the all-int64 form overflows
        # once d_num passes ~3e7 — d_num can reach n1*n2 — and under
        # ANSI mode that's a throw at scale, not a wrong bit.  The
        # ~1e-16 relative slack only matters within 1 ulp of the
        # alpha=0.05 boundary, far below statistical meaning.
        (
            F.lit(10000.0) * F.col("d_num").cast("double") * F.col("d_num").cast("double")
            > F.lit(18496.0)
            * (F.col("n1") + F.col("n2")).cast("double")
            * F.col("n1").cast("double")
            * F.col("n2").cast("double")
        ).alias("is_significant"),
    )


@register(
    "emd_lengths",
    tier="D",
    oracle="WITH "
    + _DD_GRID_CTE
    + """
    SELECT MIN(t_a) AS n1, MIN(t_b) AS n2,
           CAST(SUM(CASE WHEN v_next IS NULL THEN 0
                         ELSE (v_next - v) * abs(cs_a * t_b - cs_b * t_a)
                    END) AS BIGINT) AS emd_num,
           CAST(FLOOR((CAST(SUM(CASE WHEN v_next IS NULL THEN 0
                                     ELSE (v_next - v)
                                          * abs(cs_a * t_b - cs_b * t_a)
                                END) AS DOUBLE)
                       / CAST(MIN(t_a) * MIN(t_b) AS DOUBLE)) * 1000)
                AS BIGINT) AS emd_milli
    FROM cum
    """,
)
def emd_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E168: exact 1-D earth-mover's (Wasserstein-1) distance between
    two sources' length distributions — EMD₁ = ∫|F_a − F_b| dv,
    computed as Σ (v_next − v)·|cs_a·t_b − cs_b·t_a| over the merged
    grid, normalized by t_a·t_b.  KS (E167) answers IF the shapes
    differ; EMD answers BY HOW MUCH mass must move (in characters) —
    the magnitude every drift dashboard wants beside the verdict.
    The stepwise-constant CDF makes the integral a finite sum of
    exact int64 terms; only the final normalization crosses IEEE
    (two ops, identically parenthesized).  Overflow headroom: the
    terms are non-negative, so each is bounded by the emd_num total —
    int64 arithmetic here can only overflow when the declared BIGINT
    output itself cannot hold the answer (unlike E167's internal
    square, which outgrew int64 while the answer still fit).

    Scale shape: identical to E167 — grid agg, one cumulative window
    carrying a LEAD for gap widths, 1-row reduction."""
    docs = io.table(spark, sf_dir, "documents").filter(
        F.col("source").isin(_DD_SRC_A, _DD_SRC_B)
    )
    grid = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.sum(F.when(F.col("source") == _DD_SRC_A, 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("source") == _DD_SRC_B, 1).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    wv = Window.orderBy("v")
    wcum = wv.rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = grid.select(
        "v",
        F.sum("ca").over(wcum).alias("cs_a"),
        F.sum("cb").over(wcum).alias("cs_b"),
        F.sum("ca").over(wall).alias("t_a"),
        F.sum("cb").over(wall).alias("t_b"),
        F.lead("v").over(wv).alias("v_next"),
    )
    term = F.when(F.col("v_next").isNull(), 0).otherwise(
        (F.col("v_next") - F.col("v"))
        * F.abs(F.col("cs_a") * F.col("t_b") - F.col("cs_b") * F.col("t_a"))
    )
    u = cum.agg(
        F.min("t_a").cast("long").alias("n1"),
        F.min("t_b").cast("long").alias("n2"),
        F.sum(term).cast("long").alias("emd_num"),
    )
    return u.select(
        "n1",
        "n2",
        "emd_num",
        F.floor(
            (
                F.col("emd_num").cast("double")
                / (F.col("n1") * F.col("n2")).cast("double")
            )
            * 1000
        )
        .cast("long")
        .alias("emd_milli"),
    )
