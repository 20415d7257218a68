"""Tier D (part 24) — LM perplexity filtering, sketch calibration,
experiment power (SURVEY.md §2-E E196-E198).

Twenty-third batch, registered in round 8 and STAGED with E171-E195
for the round-9 grading window: bigram language-model perplexity
scoring (the model-based corpus-quality filter — E69's heuristic
classifier upgraded to an actual LM, trained and applied wholly
in-engine), a MinHash Jaccard-estimate calibration audit (how far the
32-component estimate sits from exact Jaccard on real candidate
pairs — the dedup counterpart of E68's ANN recall audit), and the
minimum detectable effect for the E176 experiment design (the power
analysis every A/B review asks for next).

Same exactness discipline; log/exp cross-engine per the E86
precedent; every multi-term float sum folds in a pinned order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import io
from ..operators import gates
from ..registry import register

# ---------------------------------------------------------------------------
# E196: bigram LM perplexity scoring
# ---------------------------------------------------------------------------


@register(
    "text_bigram_perplexity",
    tier="D",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, i AS pos, w[i] AS word,
             CASE WHEN i > 1 THEN w[i-1] END AS prev
      FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w
            FROM documents),
           UNNEST(generate_series(1, len(w))) AS t(i)
      WHERE w[i] <> ''
    ),
    train_bi AS (
      SELECT prev AS w1, word AS w2, CAST(COUNT(*) AS BIGINT) AS c2
      FROM toks WHERE doc_id % 2 = 0 AND prev IS NOT NULL AND prev <> ''
      GROUP BY 1, 2
    ),
    train_uni AS (
      SELECT word AS w1, CAST(COUNT(*) AS BIGINT) AS c1
      FROM toks WHERE doc_id % 2 = 0 GROUP BY 1
    ),
    vocab AS (
      SELECT CAST(COUNT(DISTINCT word) AS BIGINT) AS v
      FROM toks WHERE doc_id % 2 = 0
    ),
    test_bi AS (
      SELECT t.doc_id, t.pos, t.prev AS w1, t.word AS w2
      FROM toks t
      WHERE t.doc_id % 2 <> 0 AND t.prev IS NOT NULL AND t.prev <> ''
    ),
    scored AS (
      SELECT b.doc_id, b.pos,
             ln((CAST(COALESCE(tb.c2, 0) AS DOUBLE) + 1.0)
                / (CAST(COALESCE(tu.c1, 0) AS DOUBLE) + CAST(v.v AS DOUBLE)))
               AS logp
      FROM test_bi b
      LEFT JOIN train_bi tb ON b.w1 = tb.w1 AND b.w2 = tb.w2
      LEFT JOIN train_uni tu ON b.w1 = tu.w1
      CROSS JOIN vocab v
    ),
    folded AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                      list(logp ORDER BY pos)),
                         (a, x) -> a + x) AS slogp
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, n_bigrams,
           CAST(FLOOR(exp(-slogp / CAST(n_bigrams AS DOUBLE)) * 1000) AS BIGINT)
             AS ppl_milli
    FROM folded
    """,
)
def text_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E196: bigram language-model perplexity per document — train an
    add-one-smoothed bigram LM on the even-doc_id half of the corpus,
    score every odd-half document with exp(−(Σ ln p(w₂|w₁))/n).
    Perplexity filtering IS the canonical model-based corpus-quality
    gate (a KenLM score in every major web-corpus pipeline:
    CCNet/RefinedWeb-style curation); E69 scores with hand-coded
    heuristics, this trains and applies an actual LM wholly in-engine
    — gibberish and boilerplate score high-perplexity and low-
    perplexity-degenerate respectively, and the score feeds the same
    E37/E56 quality gates.

    Exactness: counts and the vocabulary size are exact integers;
    each bigram's ln((c₂+1)/(c₁+V)) crosses IEEE once; the per-doc
    log-sum — the one order-luck float sum — folds in POSITION order
    (the E133 device); ln/exp match cross-engine per the E86
    precedent.

    Scale shape: the model is two vocabulary-keyed partial-agg count
    tables (never doc-keyed); scoring joins the test bigram stream on
    those tables (AQE broadcast-converts a pruned vocab; at open-web
    scale both sides bucket on the hash of w1); the fold is per-doc
    bounded.  Train/test by doc parity keeps the whole thing one
    deterministic query — production swaps the split for a corpus
    version boundary (E40's shape)."""
    toks = (
        io.table(spark, sf_dir, "documents")
        .select("doc_id", F.posexplode(F.split(F.lower("text"), r"\s+")).alias("pos0", "word"))
        .filter(F.col("word") != "")
        .select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            "word",
            F.lag("word").over(Window.partitionBy("doc_id").orderBy(F.col("pos0"))).alias(
                "prev"
            ),
        )
    )
    train = toks.filter(F.col("doc_id") % 2 == 0)
    train_bi = (
        train.filter(F.col("prev").isNotNull() & (F.col("prev") != ""))
        .groupBy(F.col("prev").alias("w1"), F.col("word").alias("w2"))
        .agg(F.count("*").cast("long").alias("c2"))
    )
    train_uni = train.groupBy(F.col("word").alias("w1")).agg(
        F.count("*").cast("long").alias("c1")
    )
    vocab = train.agg(F.countDistinct("word").cast("long").alias("v"))
    test_bi = toks.filter(
        (F.col("doc_id") % 2 != 0) & F.col("prev").isNotNull() & (F.col("prev") != "")
    ).select("doc_id", "pos", F.col("prev").alias("w1"), F.col("word").alias("w2"))
    scored = (
        test_bi.join(train_bi, ["w1", "w2"], "left")
        .join(train_uni, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "pos",
            F.log(
                (F.coalesce("c2", F.lit(0)).cast("double") + 1.0)
                / (F.coalesce("c1", F.lit(0)).cast("double") + F.col("v").cast("double"))
            ).alias("logp"),
        )
    )
    folded = scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "logp"))),
                lambda s: s["logp"],
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("slogp"),
    )
    return folded.select(
        "doc_id",
        "n_bigrams",
        F.floor(
            F.exp(-F.col("slogp") / F.col("n_bigrams").cast("double")) * 1000
        )
        .cast("long")
        .alias("ppl_milli"),
    )


# ---------------------------------------------------------------------------
# E197: MinHash Jaccard-estimate calibration audit
# ---------------------------------------------------------------------------

_MH_AUDIT_K = 16


def _neutral_seeded_hash(col, seed: int):
    """Engine-neutral 60-bit seeded hash (the E106 device, seeded):
    first 15 hex chars of md5(shingle || ':' || seed), parsed base-16.
    Production MinHash runs xxhash64 (operators/dedup.py) — this audit
    swaps in the md5 form so the DuckDB oracle reproduces the
    signature bit-for-bit; the estimator's geometry is hash-agnostic."""
    return F.conv(
        F.substring(F.md5(F.concat(col, F.lit(f":{seed}"))), 1, 15), 16, 10
    ).cast("long")


@register(
    "dedup_minhash_estimate_audit",
    tier="D",
    oracle=rf"""
    WITH ws AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
      FROM ws, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
      WHERE array_to_string(w[i:i+2], ' ') <> ''
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS n_common
      FROM grams a JOIN grams b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    prs AS (
      SELECT doc_id_a, doc_id_b,
             CAST(FLOOR(CAST(n_common AS DOUBLE)
                        / (sa.n + sb.n - n_common) * 1000000) AS BIGINT)
               AS jaccard_ppm
      FROM inter
      JOIN sizes sa ON doc_id_a = sa.doc_id
      JOIN sizes sb ON doc_id_b = sb.doc_id
      WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.5
    ),
    sigs AS (
      SELECT doc_id,
             {", ".join(
               "MIN(CAST(list_reduce(string_split("
               f"'0' || substr(md5(shingle || ':{i}'), 1, 15), ''),"
               " (acc, c) -> CAST(acc AS BIGINT) * 16"
               f" + strpos('0123456789abcdef', c) - 1) AS BIGINT)) AS h{i}"
               for i in range(_MH_AUDIT_K)
             )}
      FROM grams GROUP BY doc_id
    ),
    audited AS (
      SELECT p.doc_id_a, p.doc_id_b, p.jaccard_ppm,
             CAST({" + ".join(
               f"(CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END)"
               for i in range(_MH_AUDIT_K)
             )} AS BIGINT) AS n_match
      FROM prs p
      JOIN sigs a ON p.doc_id_a = a.doc_id
      JOIN sigs b ON p.doc_id_b = b.doc_id
    )
    SELECT doc_id_a, doc_id_b, jaccard_ppm, n_match,
           n_match * {1_000_000 // _MH_AUDIT_K} AS est_ppm,
           n_match * {1_000_000 // _MH_AUDIT_K} - jaccard_ppm AS err_ppm
    FROM audited
    """,
)
def dedup_minhash_estimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E197: MinHash calibration — for every verified Jaccard≥0.5
    pair, the {k}-component MinHash ESTIMATE (matching-minima fraction)
    next to the exact Jaccard, with the signed error.  The dedup
    counterpart of E68's ANN recall audit: D2's banding decides from
    the signature alone, and this query measures, in-engine, how far
    that signature's estimate strays on the corpus's own near-dup
    pairs (E[match/k] = J exactly; per-pair spread ~ √(J(1−J)/k)).

    The audit signature uses the engine-neutral seeded md5 hash (the
    E106 device) so the DuckDB oracle reproduces every minimum
    bit-for-bit — production MinHash (operators/dedup.py) runs seeded
    xxhash64, whose estimator geometry is identical (the docstring
    contract C20 could never give its HLL sketch).

    Exactness: minima over 60-bit integers; est_ppm = n_match ×
    (10⁶/k) in pure integer arithmetic; no IEEE anywhere.

    Scale shape: signatures are one partial-agg over the shingle
    table ({k} min-accumulators, the D2 shape); the audit joins
    signature rows only for the verified-pair set (duplicate-count-
    sized)."""
    from ..operators import dedup as D

    docs = io.table(spark, sf_dir, "documents").select("doc_id", "text")
    # Footer gate (the E116 device): past ~200k docs the corpus-sized
    # signature/size tables must never be planned as static broadcasts
    # — the r12 sf10 smoke (500k docs) watched those builds die under
    # GC pressure; below it the broadcast plans stay byte-identical.
    big = gates.corpus_exceeds(sf_dir)
    sh = D.shingles(docs, 3).localCheckpoint(eager=False)
    pairs = D.jaccard_pairs(sh, threshold=0.5, broadcast_sizes=not big).select(
        "doc_id_a",
        "doc_id_b",
        F.floor(F.col("jaccard") * 1000000).cast("long").alias("jaccard_ppm"),
    )
    sigs = sh.groupBy("doc_id").agg(
        *[
            F.min(_neutral_seeded_hash(F.col("shingle"), i)).alias(f"h{i}")
            for i in range(_MH_AUDIT_K)
        ]
    )
    if big:
        sigs = sigs.hint("shuffle_hash")
    a = sigs.select(
        F.col("doc_id").alias("doc_id_a"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(_MH_AUDIT_K)],
    )
    b = sigs.select(
        F.col("doc_id").alias("doc_id_b"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(_MH_AUDIT_K)],
    )
    n_match = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(_MH_AUDIT_K)
    ).cast("long")
    per = 1_000_000 // _MH_AUDIT_K
    return (
        pairs.join(a, "doc_id_a")
        .join(b, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            "jaccard_ppm",
            n_match.alias("n_match"),
            (n_match * per).alias("est_ppm"),
            (n_match * per - F.col("jaccard_ppm")).alias("err_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# E198: minimum detectable effect (experiment power)
# ---------------------------------------------------------------------------

# z_{alpha/2} for two-sided 5% and z_beta for 80% power, as exact
# decimal literals (the standard constants every power calculator uses)
_Z_ALPHA = 1.959964
_Z_BETA = 0.841621


@register(
    "ab_minimum_detectable_effect",
    tier="D",
    oracle=f"""
    WITH v AS (
      SELECT event_id, user_id, ts, user_id % 2 AS cohort
      FROM events WHERE event_type = 'view'
    ),
    conv AS (
      SELECT v.event_id, v.cohort,
             EXISTS (
               SELECT 1 FROM events p
               WHERE p.event_type = 'purchase' AND p.user_id = v.user_id
                 AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
             ) AS converted
      FROM v
    ),
    g AS (
      SELECT
        CAST(SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        CAST(SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT) AS x,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM conv
    )
    SELECT n_a, n_b,
           CAST(FLOOR((CAST(x AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000)
                AS BIGINT) AS base_rate_ppm,
           CAST(FLOOR((({_Z_ALPHA} + {_Z_BETA})
                       * sqrt((CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                              * (1.0 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                              * (1.0 / CAST(n_a AS DOUBLE)
                                 + 1.0 / CAST(n_b AS DOUBLE))))
                      * 1000000) AS BIGINT) AS mde_abs_ppm
    FROM g
    """,
)
def ab_minimum_detectable_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E198: minimum detectable effect for the E176 experiment — given
    the realized cohort sizes and pooled base conversion rate, the
    smallest absolute rate difference a two-sided 5% test would detect
    with 80% power: MDE = (z_{α/2}+z_β)·√(p̂(1−p̂)(1/n_a+1/n_b)).
    The question every A/B review asks right after E176's verdict —
    'was this experiment even POWERED to see the effect we care
    about?' — answered from the same cell counts, in-engine.

    Exactness: the four counts are exact integers; the z constants
    are exact decimal literals; one identically-parenthesized IEEE
    expression through the correctly-rounded sqrt, floored to ppm.

    Scale shape: the same bounded interval join as E176 reduced to a
    single 4-integer row."""
    ev = io.table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", (F.col("user_id") % 2).alias("cohort")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    converted = views.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("ts"))
        & (F.col("p_ts") <= F.col("ts") + F.expr("INTERVAL 30 MINUTES")),
        "left_semi",
    ).select("event_id")
    conv = views.join(
        converted.withColumn("converted", F.lit(True)), "event_id", "left"
    ).select("cohort", F.coalesce("converted", F.lit(False)).alias("converted"))
    g = conv.agg(
        F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(F.col("converted"), 1).otherwise(0)).cast("long").alias("x"),
        F.count("*").cast("long").alias("n"),
    )
    p = F.col("x").cast("double") / F.col("n").cast("double")
    mde = (F.lit(_Z_ALPHA) + F.lit(_Z_BETA)) * F.sqrt(
        p
        * (F.lit(1.0) - p)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    return g.select(
        "n_a",
        "n_b",
        F.floor(p * 1000000).cast("long").alias("base_rate_ppm"),
        F.floor(mde * 1000000).cast("long").alias("mde_abs_ppm"),
    )
