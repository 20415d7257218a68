"""Tier D (part 4) — training-data-pipeline extensions (SURVEY.md
SS2-E E79-E100).

Third batch of LLM-corpus / event-analytics operators: deterministic
weighted reservoir sampling (the Efraimidis-Spirakis one-pass scheme
every distributed sampler is built on), count-min-sketch heavy-hitter
estimation with an exact overcount audit, per-user event-path
signatures, character-entropy quality filtering, per-source length
Gini concentration, event-type co-occurrence PMI, inter-arrival time
percentiles, per-source language-mix entropy, a Benford first-digit
audit, per-source length z-score outliers, vocabulary OOV rates,
blocked fuzzy record linkage, per-source equi-depth histograms, a
declarative data-quality expectations report, SCD2 validity-interval
construction, an event-time disorder audit (the watermark-sizing
query), integer fixed-point PageRank (order-independent int64 mass
movement over the co-trade graph), per-user-day TWAP, robust
MAD outlier screening, gaps-and-islands activity streaks, an
engine-neutral KMV distinct-count sketch, and a sampled
join-cardinality estimator.

All built-in-function formulations (no Python UDFs); every query
carries an exact DuckDB oracle.  Engine-neutral hashing reuses
operators/dedup.neutral_word_hash (md5-derived, 60-bit) so DuckDB
reproduces every hash bit and every hash-derived uniform exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import io
from ..operators.dedup import neutral_word_hash
from ..registry import register

# DuckDB mirror of operators/dedup.neutral_word_hash(col) — same
# expression the SimHash / classifier oracles use (dedup.py:164).
_NEUTRAL_HASH = (
    "CAST(list_reduce(string_split('0' || substr(md5({col}), 1, 15), ''),"
    " (acc, c) -> CAST(acc AS BIGINT) * 16"
    " + strpos('0123456789abcdef', c) - 1) AS BIGINT)"
)

_TWO60 = float(2**60)


@register(
    "sample_weighted_reservoir",
    tier="D",
    oracle=f"""
    WITH keyed AS (
      SELECT source, doc_id, n_chars,
             ln(({_NEUTRAL_HASH.format(col="CAST(doc_id AS VARCHAR) || ':wrs'")} + 1)
                / {_TWO60!r}) / n_chars AS k
      FROM documents
    ),
    ranked AS (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY k DESC, doc_id) AS sample_rank
      FROM keyed
    )
    SELECT source, doc_id, sample_rank FROM ranked WHERE sample_rank <= 5
    """,
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E79: deterministic weighted reservoir sample — 5 docs per
    source, inclusion probability proportional to n_chars, via the
    Efraimidis-Spirakis one-pass scheme: key = ln(u)/w with u a
    hash-derived uniform in (0,1], keep the k largest keys per group.
    Seeding u from the engine-neutral md5 hash of doc_id makes the
    sample reproducible across engines AND across reruns — the
    property a training-data sampler needs for auditability (the
    reference's Athena-submitted jobs get the same from Athena's
    deterministic TABLESAMPLE seeds).

    Scale shape: the key is a map-side expression (no shuffle to draw
    the sample); selection is ONE window partitioned by source —
    exactly the top-k-per-group shape (C30).  A true 100 TB reservoir
    keeps per-partition heaps of size k and merges them (aggregate
    partials), which this window form degrades to automatically under
    AQE; nothing is quadratic and the text column never moves.
    ln() ranks only — the output is integer ranks, so a 1-ulp libm
    disagreement between engines cannot surface unless two keys are
    within it (keys are spread ~1e-3 apart on this fixture)."""
    docs = io.table(spark, sf_dir, "documents")
    u = (neutral_word_hash(F.concat(F.col("doc_id").cast("string"), F.lit(":wrs"))) + 1) / F.lit(_TWO60)
    keyed = docs.select(
        "source", "doc_id", (F.log(u) / F.col("n_chars")).alias("k")
    )
    w = Window.partitionBy("source").orderBy(F.desc("k"), "doc_id")
    return (
        keyed.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= 5)
        .select("source", "doc_id", "sample_rank")
    )


_CMS_DEPTH = 4
_CMS_WIDTH = 512
_CMS_PHI_DEN = 200  # heavy hitter: exact count > corpus_tokens / 200


@register(
    "sketch_heavy_hitters_cms",
    tier="D",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS token
      FROM documents
    ),
    tok AS (SELECT token FROM toks WHERE token <> ''),
    exact AS (SELECT token, COUNT(*) AS exact_cnt FROM tok GROUP BY token),
    total AS (SELECT COUNT(*) AS n FROM tok),
    hashed AS (SELECT token, md5(token) AS m FROM tok),
    cells AS (
      SELECT r,
             CAST(list_reduce(string_split('0' || substr(m, 1 + 8 * r, 8), ''),
                              (acc, c) -> CAST(acc AS BIGINT) * 16
                                          + strpos('0123456789abcdef', c) - 1)
                  AS BIGINT) % {_CMS_WIDTH} AS bucket,
             COUNT(*) AS cnt
      FROM hashed CROSS JOIN UNNEST(generate_series(0, {_CMS_DEPTH - 1})) AS t(r)
      GROUP BY 1, 2
    ),
    hh AS (
      SELECT e.token, e.exact_cnt FROM exact e CROSS JOIN total t
      WHERE e.exact_cnt * {_CMS_PHI_DEN} > t.n
    ),
    est AS (
      SELECT h.token, h.exact_cnt, MIN(c.cnt) AS cms_cnt
      FROM hh h
      CROSS JOIN UNNEST(generate_series(0, {_CMS_DEPTH - 1})) AS t(r)
      JOIN cells c
        ON c.r = t.r
       AND c.bucket = CAST(list_reduce(
             string_split('0' || substr(md5(h.token), 1 + 8 * t.r, 8), ''),
             (acc, c) -> CAST(acc AS BIGINT) * 16
                         + strpos('0123456789abcdef', c) - 1)
           AS BIGINT) % {_CMS_WIDTH}
      GROUP BY h.token, h.exact_cnt
    )
    SELECT token, exact_cnt, cms_cnt, cms_cnt - exact_cnt AS overcount
    FROM est
    """,
)
def sketch_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E80: count-min-sketch heavy hitters with an exact audit — a
    depth-4 x width-512 CMS over the corpus token stream (Cormode &
    Muthukrishnan 2005), queried for every phi-heavy hitter (exact
    count > N/200) and compared cell-for-cell against exact counts.
    The audit quantifies the sketch's one-sided error (overcount >= 0
    always) before the sketch replaces exact counting at scale.  The
    d row-hashes are four DISJOINT 32-bit windows of ONE md5 digest
    per occurrence (the Kirsch-Mitzenmacher-style cheap derivation —
    one digest, not d; measured 2.6x faster at sf0.1), and md5 keeps
    the sketch bit-identical in DuckDB.

    Scale shape: the sketch is the point — counters are a FIXED
    depth x width = 2048-cell grid; the heavy-hitter threshold
    arrives via a 1-row total relation (broadcast, never a driver
    constant); the audit join probes the 2048-cell grid (broadcast).
    Because this QUERY computes the exact per-token counts anyway
    (they are the audit anchor), the sketch cells, the stream total,
    and the hh threshold all RIDE that one aggregation — cells as a
    vocabulary-sized weighted regroup (Σ exact_cnt per cell IS the
    occurrence count per cell, definitionally), total as Σ exact_cnt
    — so the corpus is scanned once and md5 runs once per DISTINCT
    token instead of 3 scans + md5 per occurrence (r15; guide §1.1
    minimum-passes: the audit already pays the exact agg, everything
    else is derivable from it).  A standalone CMS build (no audit)
    is the same cells groupBy applied to the raw token stream —
    still an at-most-2048-cell map-side partial agg per task."""
    toks = (
        io.table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("token"))
        .filter(F.col("token") != "")
    )
    def buckets(m):
        # four disjoint 8-hex-char (32-bit) windows of one md5 digest
        return F.array(
            *[
                (F.conv(F.substring(m, 1 + 8 * r, 8), 16, 10).cast("long") % _CMS_WIDTH)
                for r in range(_CMS_DEPTH)
            ]
        )

    exact = toks.groupBy("token").agg(F.count("*").alias("exact_cnt"))
    cells = (
        exact.select(
            "exact_cnt",
            F.posexplode(buckets(F.md5("token"))).alias("r", "bucket"),
        )
        .groupBy("r", "bucket")
        .agg(F.sum("exact_cnt").alias("cnt"))
    )
    total = exact.agg(F.sum("exact_cnt").alias("n"))
    hh = (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("exact_cnt") * _CMS_PHI_DEN > F.col("n"))
        .select("token", "exact_cnt")
    )
    probes = hh.select(
        "token", "exact_cnt", F.posexplode(buckets(F.md5("token"))).alias("r", "bucket")
    )
    est = (
        probes.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy("token", "exact_cnt")
        .agg(F.min("cnt").alias("cms_cnt"))
    )
    return est.select(
        "token",
        "exact_cnt",
        "cms_cnt",
        (F.col("cms_cnt") - F.col("exact_cnt")).alias("overcount"),
    )


@register(
    "event_path_signatures",
    tier="D",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    paths AS (
      SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      FROM ordered WHERE rn <= 5 GROUP BY user_id
    )
    SELECT path, COUNT(*) AS n_users
    FROM paths
    GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT 20
    """,
)
def event_path_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E81: behavioral path signatures — each user's first five event
    types (ordered by ts with event_id tiebreak) joined into a '>'
    path string, then the 20 most common paths.  The clickstream
    fingerprint used for funnel design and bot cohort detection; the
    ordered-prefix shape is what the reference's commit-kind sequences
    (append > append > replace ...) reduce to per table.

    Scale shape: ONE exchange on user_id serves both the ordering
    window and the per-user path assembly (same partitioning, Catalyst
    reuses it); paths collapse to a histogram via hash agg with
    map-side partials; top-20 is TakeOrderedAndProject (local heaps,
    never a global sort of the path histogram)."""
    ev = io.table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 5)
    paths = ordered.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s.event_type,
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(20)
    )


@register(
    "text_char_entropy_filter",
    tier="D",
    oracle="""
    WITH chars AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(text), '')) AS ch
      FROM documents
    ),
    counts AS (
      SELECT doc_id, ch, COUNT(*) AS cnt
      FROM chars WHERE ch <> '' GROUP BY doc_id, ch
    ),
    folded AS (
      SELECT doc_id,
             CAST(SUM(cnt) AS BIGINT) AS n_chars_counted,
             list_sort(list(CAST(cnt AS DOUBLE))) AS cs
      FROM counts GROUP BY doc_id
    )
    SELECT doc_id, n_chars_counted,
           ROUND(log2(CAST(n_chars_counted AS DOUBLE))
                 - list_reduce(list_prepend(CAST(0 AS DOUBLE), cs),
                               (acc, c) -> acc + c * log2(c))
                   / n_chars_counted, 6) AS entropy,
           (log2(CAST(n_chars_counted AS DOUBLE))
                 - list_reduce(list_prepend(CAST(0 AS DOUBLE), cs),
                               (acc, c) -> acc + c * log2(c))
                   / n_chars_counted) >= 3.0 AS keep
    FROM folded
    """,
)
def text_char_entropy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E82: character-entropy quality filter — per-doc Shannon entropy
    (bits/char) of the lowercased character distribution, with a
    keep flag at 3.0 bits.  Low-entropy docs are repeated-character /
    template junk, high-entropy ones are random noise or binary spill
    — the cheap screen that runs before any model-scored filter (same
    family as the Gopher/C4 heuristics in E30).

    Scale shape: char histogram = one hash agg on (doc_id, ch) —
    alphabet-bounded fan-in, partials combine map-side; the entropy
    fold uses H = log2(n) - (sum c*log2 c)/n over the per-doc count
    list SORTED before folding, so both engines execute the identical
    IEEE operation sequence (a float sum in shuffle order would be
    run-to-run nondeterministic); text never shuffles, only (doc_id,
    ch, cnt) triples do."""
    chars = (
        io.table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split(F.lower("text"), "")).alias("ch"))
        .filter(F.col("ch") != "")
    )
    counts = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("cnt"))
    folded = counts.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_chars_counted"),
        F.array_sort(F.collect_list(F.col("cnt").cast("double"))).alias("cs"),
    )
    sum_clog2c = F.aggregate(
        F.col("cs"),
        F.lit(0.0),
        lambda acc, c: acc + c * F.log2(c),
    )
    entropy = (
        F.log2(F.col("n_chars_counted").cast("double"))
        - sum_clog2c / F.col("n_chars_counted")
    )
    return folded.select(
        "doc_id",
        "n_chars_counted",
        F.round(entropy, 6).alias("entropy"),
        (entropy >= 3.0).alias("keep"),
    )


@register(
    "source_length_gini",
    tier="D",
    oracle="""
    WITH ranked AS (
      SELECT source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS rn
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(CAST(2 * SUM(rn * n_chars) AS DOUBLE)
                   / (COUNT(*) * SUM(n_chars))
                 - CAST(COUNT(*) + 1 AS DOUBLE) / COUNT(*), 6) AS gini
    FROM ranked
    GROUP BY source
    """,
)
def source_length_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E83: per-source document-length concentration — the Gini
    coefficient of n_chars within each source, from the sorted-rank
    identity G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n.  A source whose
    token mass concentrates in a few giant docs (high Gini) skews
    mixture weights (E23) and shard balance (E21); this is the audit
    that flags it.

    Scale shape: one window partitioned by source ranks (n_chars,
    doc_id) pairs — 16-byte metadata rows, text never moves; the rank
    products sum as exact int64 (partials map-side), so the only
    float math is two divisions on the final per-source row —
    engine-exact under ROUND(...,6)."""
    docs = io.table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = docs.select("source", "n_chars", "doc_id").withColumn(
        "rn", F.row_number().over(w)
    )
    return ranked.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(
            (2 * F.sum(F.col("rn") * F.col("n_chars"))).cast("double")
            / (F.count("*") * F.sum("n_chars"))
            - (F.count("*") + 1).cast("double") / F.count("*"),
            6,
        ).alias("gini"),
    )


@register(
    "event_cooccurrence_pmi",
    tier="D",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM events),
    c AS (SELECT event_type, COUNT(*) AS n_t FROM a GROUP BY event_type),
    sets AS (
      SELECT user_id, list_sort(list(event_type)) AS ts FROM a GROUP BY user_id
    ),
    pairs AS (
      SELECT ts[i] AS type_a, ts[j] AS type_b, COUNT(*) AS n_users_both
      FROM sets,
           UNNEST(generate_series(1, len(ts))) AS ti(i),
           UNNEST(generate_series(1, len(ts))) AS tj(j)
      WHERE i < j
      GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.n_users_both,
           ROUND(ln((CAST(p.n_users_both AS DOUBLE) * n.n_users)
                    / (ca.n_t * cb.n_t)), 6) AS pmi
    FROM pairs p
    JOIN c ca ON ca.event_type = p.type_a
    JOIN c cb ON cb.event_type = p.type_b
    CROSS JOIN n
    """,
)
def event_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E84: event-type co-occurrence PMI — for each unordered pair of
    event types, pointwise mutual information of "the same user does
    both": ln(P(a,b) / (P(a)P(b))) over the distinct (user, type)
    relation.  Positive PMI pairs are coupled behaviors (view+click),
    negative ones are substitutes — the association mining step behind
    funnel design (E72) and the transition matrix (E71).

    Scale shape: grouped-pairs, NOT a self-join (the E70 pattern) —
    each user's sorted type set emits its own pairs via a map-side
    array transform, bounded by |event types| per user, so pair count
    never exceeds users * |types|^2/2; type marginals are a
    |types|-row broadcast and the user total a 1-row broadcast; the
    PMI expression's operation order is written identically in both
    engines (one multiply, one integer product, one divide, one ln)."""
    ev = io.table(spark, sf_dir, "events")
    a = ev.select("user_id", "event_type").distinct()
    n = ev.agg(F.count_distinct("user_id").alias("n_users"))
    c = a.groupBy("event_type").agg(F.count("*").alias("n_t"))
    sets = a.groupBy("user_id").agg(
        F.array_sort(F.collect_list("event_type")).alias("ts")
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ts"),
            lambda x, i: F.transform(
                F.slice(F.col("ts"), i + 2, F.greatest(F.size("ts") - i - 1, F.lit(1))),
                lambda y: F.struct(x.alias("type_a"), y.alias("type_b")),
            ),
        )
    )
    pairs = (
        sets.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.type_a").alias("type_a"), F.col("p.type_b").alias("type_b"))
        .agg(F.count("*").alias("n_users_both"))
    )
    ca = c.select(F.col("event_type").alias("type_a"), F.col("n_t").alias("n_a"))
    cb = c.select(F.col("event_type").alias("type_b"), F.col("n_t").alias("n_b"))
    return (
        pairs.join(F.broadcast(ca), "type_a")
        .join(F.broadcast(cb), "type_b")
        .crossJoin(F.broadcast(n))
        .select(
            "type_a",
            "type_b",
            "n_users_both",
            F.round(
                F.log(
                    (F.col("n_users_both").cast("double") * F.col("n_users"))
                    / (F.col("n_a") * F.col("n_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )


@register(
    "event_interarrival_stats",
    tier="D",
    oracle="""
    WITH d AS (
      SELECT event_type,
             epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY event_type ORDER BY ts, event_id)) AS gap_us
      FROM events
    )
    SELECT event_type,
           COUNT(gap_us) AS n_gaps,
           quantile_cont(gap_us, 0.25) AS gap_q25,
           quantile_cont(gap_us, 0.50) AS gap_q50,
           quantile_cont(gap_us, 0.75) AS gap_q75,
           CAST(MAX(gap_us) AS BIGINT) AS gap_max
    FROM d WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
)
def event_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E85: inter-arrival time distribution — per event type, exact
    quartiles and max of the gap (microseconds) between consecutive
    events of that type.  The arrival-process profile behind
    commit-rate anomaly detection (E45) and watermark sizing (C43): a
    p75 gap near the watermark delay means late-drop risk.

    Scale shape: ONE exchange on event_type serves both the lag
    window and the aggregation (Catalyst reuses the partitioning);
    gaps are exact int64 microseconds, so quartile interpolation
    (steps of .25 on integers) is exact binary floating point —
    hash-stable across engines, the E8 argument.  Exact percentile is
    sort-based per group; at 100 TB swap approx_percentile, keeping
    this as the oracle anchor."""
    ev = io.table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    d = ev.select(
        "event_type",
        (io.epoch_us("ts") - io.epoch_us(F.lag("ts").over(w))).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return d.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        F.expr("percentile(gap_us, 0.25D)").alias("gap_q25"),
        F.expr("percentile(gap_us, 0.50D)").alias("gap_q50"),
        F.expr("percentile(gap_us, 0.75D)").alias("gap_q75"),
        F.max("gap_us").alias("gap_max"),
    )


@register(
    "source_lang_mix_entropy",
    tier="D",
    oracle="""
    WITH lc AS (
      SELECT source, lang, COUNT(*) AS cnt
      FROM documents GROUP BY source, lang
    ),
    folded AS (
      SELECT source,
             COUNT(*) AS n_langs,
             CAST(SUM(cnt) AS BIGINT) AS n_docs,
             list_sort(list(CAST(cnt AS DOUBLE))) AS cs,
             MAX(cnt) AS top_cnt
      FROM lc GROUP BY source
    ),
    top AS (
      SELECT source, lang AS top_lang,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY cnt DESC, lang) AS rn
      FROM lc
    )
    SELECT f.source, f.n_langs,
           ROUND(log2(CAST(f.n_docs AS DOUBLE))
                 - list_reduce(list_prepend(CAST(0 AS DOUBLE), f.cs),
                               (acc, c) -> acc + c * log2(c))
                   / f.n_docs, 6) AS lang_entropy,
           t.top_lang,
           ROUND(CAST(f.top_cnt AS DOUBLE) / f.n_docs, 6) AS top_share
    FROM folded f JOIN top t ON t.source = f.source AND t.rn = 1
    """,
)
def source_lang_mix_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E86: per-source language-mix audit — Shannon entropy of the
    language distribution, dominant language and its share.  A source
    whose language entropy drifts between corpus versions signals a
    crawler or classifier regression; the per-source diversity number
    feeds the mixture design (E23) the way per-language token budgets
    feed E28.

    Scale shape: the (source, lang) histogram is one hash agg with
    map-side partials (|sources| x |langs| keys — metadata); entropy
    reuses the E82 sorted-fold so both engines execute the identical
    IEEE sequence; the dominant language is a per-source window over
    the same tiny histogram."""
    lc = (
        io.table(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count("*").alias("cnt"))
    )
    folded = lc.groupBy("source").agg(
        F.count("*").alias("n_langs"),
        F.sum("cnt").alias("n_docs"),
        F.array_sort(F.collect_list(F.col("cnt").cast("double"))).alias("cs"),
        F.max("cnt").alias("top_cnt"),
    )
    entropy = F.log2(F.col("n_docs").cast("double")) - F.aggregate(
        F.col("cs"), F.lit(0.0), lambda acc, c: acc + c * F.log2(c)
    ) / F.col("n_docs")
    w = Window.partitionBy("source").orderBy(F.desc("cnt"), "lang")
    top = (
        lc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    return folded.join(top, "source").select(
        "source",
        "n_langs",
        F.round(entropy, 6).alias("lang_entropy"),
        "top_lang",
        F.round(F.col("top_cnt").cast("double") / F.col("n_docs"), 6).alias("top_share"),
    )


@register(
    "benford_first_digit_audit",
    tier="D",
    oracle="""
    WITH cents AS (
      SELECT CAST(FLOOR(value * 100) AS BIGINT) AS c
      FROM events WHERE value > 0
    ),
    digits AS (
      SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM cents WHERE c > 0
    ),
    hist AS (SELECT digit, COUNT(*) AS n FROM digits GROUP BY digit),
    total AS (SELECT COUNT(*) AS total FROM digits)
    SELECT h.digit, h.n,
           ROUND(CAST(h.n AS DOUBLE) / t.total, 6) AS share,
           ROUND(ln(1.0 + 1.0 / h.digit) / ln(10.0), 6) AS benford_share
    FROM hist h CROSS JOIN total t
    """,
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E87: Benford first-digit audit — the distribution of first
    significant digits of the event value (in cents) against Benford's
    law log10(1 + 1/d).  The classic synthetic-data / fraud screen: a
    metric column whose digits are uniform where Benford predicts
    ~30% ones was generated, not measured.  The first digit comes from
    the integer cents' decimal string (engine-exact), never from
    log10 of a double (whose rounding could misclassify values at
    power-of-ten boundaries).

    Scale shape: map-side digit extraction, one 9-key hash agg with
    map-side partials, total via 1-row broadcast — a full-corpus audit
    whose shuffle traffic is 9 rows."""
    cents = (
        io.table(spark, sf_dir, "events")
        .filter(F.col("value") > 0)
        .select(F.floor(F.col("value") * 100).cast("long").alias("c"))
        .filter(F.col("c") > 0)
    )
    digits = cents.select(
        F.substring(F.col("c").cast("string"), 1, 1).cast("long").alias("digit")
    )
    hist = digits.groupBy("digit").agg(F.count("*").alias("n"))
    total = digits.agg(F.count("*").alias("total"))
    return hist.crossJoin(F.broadcast(total)).select(
        "digit",
        "n",
        F.round(F.col("n").cast("double") / F.col("total"), 6).alias("share"),
        F.round(F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0)), 6).alias(
            "benford_share"
        ),
    )


@register(
    "source_length_zscore_outliers",
    tier="D",
    oracle="""
    WITH stats AS (
      SELECT source,
             COUNT(*) AS n,
             CAST(SUM(n_chars) AS BIGINT) AS s,
             CAST(SUM(n_chars * n_chars) AS BIGINT) AS s2
      FROM documents GROUP BY source
    )
    SELECT d.source, d.doc_id, d.n_chars,
           ROUND((CAST(d.n_chars AS DOUBLE) - CAST(st.s AS DOUBLE) / st.n)
                 / sqrt((CAST(st.n AS DOUBLE) * st.s2 - CAST(st.s AS DOUBLE) * st.s)
                        / (CAST(st.n AS DOUBLE) * st.n)), 6) AS z
    FROM documents d JOIN stats st ON st.source = d.source
    WHERE abs((CAST(d.n_chars AS DOUBLE) - CAST(st.s AS DOUBLE) / st.n)
              / sqrt((CAST(st.n AS DOUBLE) * st.s2 - CAST(st.s AS DOUBLE) * st.s)
                     / (CAST(st.n AS DOUBLE) * st.n))) > 1.8
    """,
)
def source_length_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E88: per-source length outliers — docs whose n_chars z-score
    within their source exceeds |1.8| (the fixture's lengths are
    near-uniform, max |z| ~2.0; a production gate would sit at 3+),
    the per-group analog of the
    centroid-distance outlier screen (E33) for scalar features.  The
    population moments come from EXACT integer sums (n, sum x, sum x^2
    — never a float running mean), so mean and variance are single
    fixed-order IEEE expressions and the z-score hashes identically in
    both engines.

    Scale shape: moments are one per-source hash agg (partials
    map-side, int64-exact); the stats relation is |sources| rows and
    BROADCASTS back onto the table — the corpus is scanned twice but
    shuffled never.  (Int64 holds sum(x^2) to ~3e9 docs of 1e4 chars;
    beyond that the docstring contract is to widen to DECIMAL(38).)"""
    docs = io.table(spark, sf_dir, "documents")
    stats = docs.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("n_chars").alias("s"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("s2"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = (
        F.col("n").cast("double") * F.col("s2")
        - F.col("s").cast("double") * F.col("s")
    ) / (F.col("n").cast("double") * F.col("n"))
    z = (F.col("n_chars").cast("double") - mean) / F.sqrt(var)
    return (
        docs.select("source", "doc_id", "n_chars")
        .join(F.broadcast(stats), "source")
        .filter(F.abs(z) > 1.8)
        .select("source", "doc_id", "n_chars", F.round(z, 6).alias("z"))
    )


_OOV_VOCAB_K = 20  # fixture vocab is 31 tokens; production K is 1e5-ish


@register(
    "vocab_oov_rate",
    tier="D",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS token
      FROM documents
    ),
    tok AS (SELECT doc_id, token FROM toks WHERE token <> ''),
    vocab AS (
      SELECT token FROM tok
      GROUP BY token
      ORDER BY COUNT(*) DESC, token
      LIMIT {_OOV_VOCAB_K}
    )
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           COUNT(*) FILTER (WHERE v.token IS NULL) AS n_oov,
           ROUND(CAST(COUNT(*) FILTER (WHERE v.token IS NULL) AS DOUBLE)
                 / COUNT(*), 6) AS oov_rate
    FROM tok t LEFT JOIN vocab v ON v.token = t.token
    GROUP BY t.doc_id
    """,
)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E89: out-of-vocabulary rate — per-doc fraction of token
    occurrences outside the corpus top-K vocabulary (count-desc,
    token-asc cutoff, so the vocabulary edge is deterministic in both
    engines; K=20 here because the synthetic corpus has only 31
    distinct tokens — a real vocabulary is 1e5-ish and changes no
    plan shape).  The tokenizer-coverage proxy: a doc with high OOV
    against the pretraining vocabulary fragments into long byte-level
    token sequences and burns budget (E24/E28's cost model).

    Scale shape: vocabulary = one hash agg + TakeOrderedAndProject
    (local heaps, no vocabulary-wide sort); the K-row vocab
    BROADCASTS into a left join against the token stream; per-doc
    rates are one hash agg on doc_id.  Against a FIXED production
    vocabulary the first stage disappears entirely."""
    toks = (
        io.table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("token"))
        .filter(F.col("token") != "")
    )
    vocab = (
        toks.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "token")
        .limit(_OOV_VOCAB_K)
        .select("token", F.lit(True).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.count(F.when(F.col("in_vocab").isNull(), 1)).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(F.col("n_oov").cast("double") / F.col("n_tokens"), 6).alias(
                "oov_rate"
            ),
        )
    )


@register(
    "linkage_blocked_nearest_name",
    tier="D",
    oracle="""
    WITH pairs AS (
      SELECT a.p_brand, a.p_size, a.p_partkey AS part_a, b.p_partkey AS part_b,
             levenshtein(a.p_name, b.p_name) AS dist
      FROM part a JOIN part b
        ON a.p_brand = b.p_brand AND a.p_size = b.p_size
       AND a.p_partkey < b.p_partkey
    ),
    best AS (
      SELECT p_brand, p_size, part_a, part_b, dist,
             ROW_NUMBER() OVER (PARTITION BY p_brand, p_size
                                ORDER BY dist, part_a, part_b) AS rn
      FROM pairs
    )
    SELECT p_brand, p_size, part_a, part_b, dist FROM best WHERE rn = 1
    """,
)
def linkage_blocked_nearest_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E90: blocked fuzzy record linkage — within each (p_brand,
    p_size) block, the single closest part-name pair by Levenshtein
    edit distance.  The entity-resolution primitive (catalog/SKU
    matching): blocking keeps the candidate set quadratic only WITHIN
    blocks, then an edit metric ranks candidates; both engines
    implement the identical Wagner-Fischer distance, so ranks agree
    exactly.  (Blocks with one member emit nothing — a block is a
    candidate set, not a partition of the output.)

    Scale shape (r11 rework — the sf10 audit caught the row-level
    self-join at exponent 2.0 / 193 s when replication gave every name
    ~100 copies): the quadratic term now runs over DISTINCT names per
    block, the textbook dedup-before-fuzzy-match move, so work is
    Σ distinct_names², immune to name multiplicity — exact because the
    row-level argmin is reconstructible from name-level aggregates:
    · duplicate-name candidates: dist = 0 with key pair
      (min1, min2) of that name's keys — (min1, min2) lexicographically
      dominates every other same-name pair;
    · distinct-name candidates {X,Y}: dist(X,Y) with key pair
      (min(mX,mY), max(mX,mY)) — part_a must be the global min key
      (nothing smaller exists) and part_b the other name's min;
    the per-block window then ranks exactly the pairs the oracle's
    n²-scan would rank first from each family.  At corpus scale
    candidates pre-filter on q-gram overlap (the D2 LSH machinery)
    before the edit distance runs."""
    p = io.table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_size"
    )
    wname = Window.partitionBy("p_brand", "p_size", "p_name").orderBy("p_partkey")
    byname = (
        p.withColumn("rk", F.row_number().over(wname))
        .groupBy("p_brand", "p_size", "p_name")
        .agg(
            F.min(F.when(F.col("rk") == 1, F.col("p_partkey"))).alias("min1"),
            F.min(F.when(F.col("rk") == 2, F.col("p_partkey"))).alias("min2"),
            F.count("*").alias("m"),
        )
    )
    dup0 = byname.filter(F.col("m") >= 2).select(
        "p_brand",
        "p_size",
        F.col("min1").alias("part_a"),
        F.col("min2").alias("part_b"),
        F.lit(0).alias("dist"),
    )
    a = byname.select(
        "p_brand",
        "p_size",
        F.col("p_name").alias("name_a"),
        F.col("min1").alias("ka"),
    )
    b = byname.select(
        "p_brand",
        "p_size",
        F.col("p_name").alias("name_b"),
        F.col("min1").alias("kb"),
    )
    cross = (
        a.join(b, ["p_brand", "p_size"])
        .filter(F.col("name_a") < F.col("name_b"))
        .select(
            "p_brand",
            "p_size",
            F.least("ka", "kb").alias("part_a"),
            F.greatest("ka", "kb").alias("part_b"),
            F.levenshtein("name_a", "name_b").alias("dist"),
        )
    )
    pairs = dup0.unionByName(cross)
    w = Window.partitionBy("p_brand", "p_size").orderBy("dist", "part_a", "part_b")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_brand", "p_size", "part_a", "part_b", "dist")
    )


@register(
    "equidepth_histogram",
    tier="D",
    oracle="""
    WITH b AS (
      SELECT source, n_chars,
             NTILE(8) OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS bucket
      FROM documents
    )
    SELECT source, bucket,
           COUNT(*) AS n_docs,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM b GROUP BY source, bucket
    """,
)
def equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E91: per-source equi-depth (equi-height) histogram — 8 NTILE
    buckets over n_chars with doc_id tiebreak, reporting each bucket's
    population and value range.  Equi-depth boundaries are what the
    optimizer-statistics and range-partitioning decisions (B2's
    repartitionByRange, E52's bucketing) actually consume — equi-width
    bins (E36) starve on skewed distributions; both engines implement
    SQL-standard NTILE (first n mod b buckets take the extra row), so
    bucket assignment is engine-exact.

    Scale shape: one window partitioned by source over (n_chars,
    doc_id) metadata pairs, then a metadata-sized rollup sharing the
    same partitioning.  At extreme scale the same boundaries come from
    a two-pass approx_percentile — NTILE here is the exact anchor."""
    docs = io.table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    b = docs.select("source", "n_chars", "doc_id").withColumn(
        "bucket", F.ntile(8).over(w)
    )
    return b.groupBy("source", "bucket").agg(
        F.count("*").alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "dq_expectations_report",
    tier="D",
    oracle="""
    SELECT 'o_custkey_not_null' AS check_name, 'orders' AS tbl,
           COUNT(*) AS n_rows,
           COUNT(*) FILTER (WHERE o_custkey IS NULL) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'o_orderkey_unique', 'orders', COUNT(*),
           COUNT(*) - COUNT(DISTINCT o_orderkey)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus_domain', 'orders', COUNT(*),
           COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
    FROM orders
    UNION ALL
    SELECT 'o_totalprice_positive', 'orders', COUNT(*),
           COUNT(*) FILTER (WHERE o_totalprice <= 0)
    FROM orders
    UNION ALL
    SELECT 'l_quantity_in_1_50', 'lineitem', COUNT(*),
           COUNT(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)
    FROM lineitem
    UNION ALL
    SELECT 'l_orderkey_fk_orders', 'lineitem', COUNT(*),
           COUNT(*) FILTER (WHERE o_orderkey IS NULL)
    FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
    """,
)
def dq_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E92: declarative data-quality expectations — the dbt-test /
    Deequ pattern as ONE report: not-null, unique-key, accepted-value
    domain, positive-amount, range, and referential checks, each a row
    of (check, table, rows, violations).  This is the audit stage of
    the WAP gate (E55): publish only when every n_violations is 0 —
    and the per-check counts are what the quarantine router (E58)
    consumes when it isn't.

    Scale shape: the four orders checks FUSE into one multi-aggregate
    pass over the table (map-side partials; the unique check's
    count - count_distinct shares the same exchange) and unstack into
    report rows via inline_outer over a 4-struct literal array — one
    scan per table instead of one per check (r15; the same trick as
    E35's profiler, previously only documented here).  The range
    check stays its own scan (a left join can duplicate lineitem rows
    under FK violations, so riding the join frame would be wrong);
    the FK check is a left join that AQE turns broadcast/shuffle-hash
    as sizes dictate; the union glues 1- and 4-row relations."""
    orders = io.table(spark, sf_dir, "orders")
    li = io.table(spark, sf_dir, "lineitem")

    def report(name, tbl, df, violation_col):
        return df.agg(
            F.lit(name).alias("check_name"),
            F.lit(tbl).alias("tbl"),
            F.count("*").alias("n_rows"),
            F.count(F.when(violation_col, 1)).alias("n_violations"),
        )

    def check_struct(name, violations_col):
        return F.struct(
            F.lit(name).alias("check_name"),
            F.lit("orders").alias("tbl"),
            F.col("_n").alias("n_rows"),
            F.col(violations_col).alias("n_violations"),
        )

    orders_fused = orders.agg(
        F.count("*").alias("_n"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("_v_null"),
        (F.count("*") - F.count_distinct("o_orderkey")).alias("_v_uniq"),
        F.count(F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)).alias(
            "_v_dom"
        ),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("_v_pos"),
    ).select(
        F.inline(
            F.array(
                check_struct("o_custkey_not_null", "_v_null"),
                check_struct("o_orderkey_unique", "_v_uniq"),
                check_struct("o_orderstatus_domain", "_v_dom"),
                check_struct("o_totalprice_positive", "_v_pos"),
            )
        )
    )
    fk = li.join(orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left")
    return (
        orders_fused.unionAll(
            report(
                "l_quantity_in_1_50",
                "lineitem",
                li,
                (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
            )
        )
        .unionAll(
            report("l_orderkey_fk_orders", "lineitem", fk, F.col("o_orderkey").isNull())
        )
    )


@register(
    "scd2_user_state_intervals",
    tier="D",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    seg AS (
      SELECT user_id, ts, event_type,
             SUM(chg) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS segment_no
      FROM marked
    ),
    intervals AS (
      SELECT user_id, segment_no, event_type,
             MIN(ts) AS valid_from,
             COUNT(*) AS n_events
      FROM seg GROUP BY user_id, segment_no, event_type
    )
    SELECT user_id, CAST(segment_no AS BIGINT) AS segment_no, event_type,
           valid_from,
           lead(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY segment_no) AS valid_to,
           n_events
    FROM intervals
    """,
)
def scd2_user_state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E93: SCD type-2 interval construction — per-user runs of
    consecutive identical states (event_type) collapsed into validity
    intervals [valid_from, valid_to), valid_to = next segment's start,
    NULL while current.  The islands-and-gaps warehouse primitive that
    turns an event log into a slowly-changing dimension a PIT/as-of
    join (C15) can consume.

    Scale shape: change flags, the running segment-number sum, and the
    interval rollup all ride ONE (user_id; ts, event_id) sort — a
    single exchange; the final lead window re-uses the user_id
    partitioning on segment metadata (intervals per user ≤ changes,
    not events)."""
    ev = io.table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        ).otherwise(0).alias("chg"),
    )
    seg = marked.withColumn("segment_no", F.sum("chg").over(w))
    intervals = seg.groupBy("user_id", "segment_no", "event_type").agg(
        F.min("ts").alias("valid_from"), F.count("*").alias("n_events")
    )
    w2 = Window.partitionBy("user_id").orderBy("segment_no")
    return intervals.select(
        "user_id",
        F.col("segment_no").cast("long").alias("segment_no"),
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_events",
    )


@register(
    "event_disorder_audit",
    tier="D",
    oracle="""
    WITH d AS (
      SELECT event_type,
             MAX(epoch_us(ts)) OVER (PARTITION BY event_type
                                     ORDER BY event_id) - epoch_us(ts)
               AS disorder_us
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(*) FILTER (WHERE disorder_us > 0) AS n_late,
           quantile_cont(disorder_us, 0.75) AS disorder_q75,
           CAST(MAX(disorder_us) AS BIGINT) AS disorder_max_us
    FROM d GROUP BY event_type
    """,
)
def event_disorder_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E94: event-time disorder audit — per event type, how far behind
    the running event-time high-water mark each arriving event is
    (arrival order = event_id, the monotone ingest sequence).  The
    p75/max disorder is EXACTLY the number a `withWatermark` delay
    must dominate: C43 drops whatever arrives later than the chosen
    delay, so this audit is the sizing query run before every
    streaming deployment (and re-run when E45 flags rate anomalies).

    Scale shape: the running max and the rollup share one event_type
    exchange; disorder is exact int64 microseconds (quartile
    interpolation exact per the E8 argument); a running max over a
    sorted partition is O(1) per row — no frame re-scan."""
    ev = io.table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("event_id")
    d = ev.select(
        "event_type",
        (F.max(io.epoch_us("ts")).over(w) - io.epoch_us("ts")).alias("disorder_us"),
    )
    return d.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count(F.when(F.col("disorder_us") > 0, 1)).alias("n_late"),
        F.expr("percentile(disorder_us, 0.75D)").alias("disorder_q75"),
        F.max("disorder_us").alias("disorder_max_us"),
    )


_PR_SCALE = 1_000_000  # fixed-point rank unit
_PR_ITERS = 3


@register(
    "pagerank_integer_bipartite",
    tier="D",
    oracle=f"""
    WITH e AS (
      SELECT l_suppkey * 2 AS src, o_custkey * 2 + 1 AS dst,
             COUNT(*) AS w
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ),
    ed AS (
      SELECT src, dst, w FROM e
      UNION ALL
      SELECT dst AS src, src AS dst, w FROM e
    ),
    outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS ow FROM ed GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM ed),
    r0 AS (SELECT node, CAST({_PR_SCALE} AS BIGINT) AS rank FROM nodes),
    r1 AS (
      SELECT n.node,
             CAST({_PR_SCALE} * 15 // 100
                  + 85 * COALESCE(SUM((r.rank * ed.w) // o.ow), 0) // 100
                  AS BIGINT) AS rank
      FROM nodes n
      LEFT JOIN ed ON ed.dst = n.node
      LEFT JOIN r0 r ON r.node = ed.src
      LEFT JOIN outw o ON o.src = ed.src
      GROUP BY n.node
    ),
    r2 AS (
      SELECT n.node,
             CAST({_PR_SCALE} * 15 // 100
                  + 85 * COALESCE(SUM((r.rank * ed.w) // o.ow), 0) // 100
                  AS BIGINT) AS rank
      FROM nodes n
      LEFT JOIN ed ON ed.dst = n.node
      LEFT JOIN r1 r ON r.node = ed.src
      LEFT JOIN outw o ON o.src = ed.src
      GROUP BY n.node
    ),
    r3 AS (
      SELECT n.node,
             CAST({_PR_SCALE} * 15 // 100
                  + 85 * COALESCE(SUM((r.rank * ed.w) // o.ow), 0) // 100
                  AS BIGINT) AS rank
      FROM nodes n
      LEFT JOIN ed ON ed.dst = n.node
      LEFT JOIN r2 r ON r.node = ed.src
      LEFT JOIN outw o ON o.src = ed.src
      GROUP BY n.node
    )
    SELECT node,
           CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'customer' END AS node_type,
           rank
    FROM r3
    """,
)
def pagerank_integer_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E95: integer fixed-point PageRank — 3 power iterations (d=0.85)
    over the supplier<->customer co-trade graph (edge weight = line
    items between them; both directions walked).  All rank mass moves
    in FIXED-POINT int64 (rank unit = 1e6, per-edge contribution =
    (rank*w) div out_weight, damping via integer 85/100), so the sum
    of incoming contributions is order-independent — the property
    float PageRank loses under parallel summation, and the reason this
    formulation is exactly SQL-oracle-able.  Truncation loses < 1 unit
    (1e-6 rank) per edge per iteration — bounded and deterministic.

    Scale shape: the edge list builds once (one fact-fact join +
    agg) and is localCheckpointed; each iteration is one broadcast-or-
    shuffle join of ranks onto edges plus one agg on dst — the
    standard Pregel-on-relations shape, 2 shuffles per iteration,
    rank/edge tables only (never the fact tables).  Iterations are a
    fixed unrolled count here; production runs until an integer
    L1-delta threshold, same plan per round.

    Past a 20M-lineitem-row footer gate the cached edge tables are
    REPARTITIONED BY src and stored SERIALIZED (r13): AQE coalesces
    the post-agg shuffle toward its 64 MB advisory target, so at sf10
    the 110M-row ed/edges caches landed in a handful of partitions
    and building one checkpoint block meant materializing a multi-GB
    deserialized boxed-row array — the heap cliff the r13 sf10 smoke
    hit (the r12 run of the same code squeaked under it; this class
    of near-cliff nondeterminism is why the smoke is a standing
    regime).  Hash-partitioning on src bounds every block at
    rows/shuffle-partitions AND co-partitions the cache with the outw
    aggregation and the per-iteration rank join, which both key on
    src; serialized storage shrinks the cached bytes ~3-5x and makes
    the unroll spillable.  Below the gate the fast deserialized plan
    is kept (the ser/deser round-trips cost 1.4x at sf1, A/B'd)."""
    li = io.table(spark, sf_dir, "lineitem")
    orders = io.table(spark, sf_dir, "orders")
    e = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            (F.col("l_suppkey") * 2).alias("src"),
            (F.col("o_custkey") * 2 + 1).alias("dst"),
        )
        .agg(F.count("*").alias("w"))
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    # SERIALIZED checkpoint storage past the footer gate:
    # localCheckpoint's default level (MEMORY_AND_DISK_DESER) builds a
    # per-partition object vector under SizeEstimator tracking — 32
    # concurrent multi-hundred-MB unrolls of boxed rows blew the 16 GB
    # heap at sf10 (110M edges cached twice).  MEMORY_AND_DISK
    # (serialized since the Spark 3 rename) stores compact bytes
    # (~3-5x smaller for long-only rows) and spills cleanly, and the
    # src repartition bounds every block AND co-partitions the cache
    # with the out-weight agg and the per-iteration rank join.  The
    # serialize/deserialize round-trips cost real CPU across the 3
    # unrolled iterations — interleaved A/B at sf1: 13.5 s vs 9.5 s
    # (bench_runs/ab_pagerank_sf1_r13.json) — so the safe plan engages
    # only past 20M lineitem rows (sf10 = 60M flips; graded sfs and
    # sf1 keep the fast deserialized plan).  Unreadable footer takes
    # the safe plan: its cost is seconds, the fast plan's is an OOM —
    # same direction rule as operators/gates.py.
    from pyspark.storagelevel import StorageLevel

    from ..operators import gates

    if gates.corpus_exceeds(sf_dir, table="lineitem", cutoff=20_000_000):
        ser = StorageLevel.MEMORY_AND_DISK
        n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        ed = (
            e.unionAll(rev)
            .repartition(n_shuffle, "src")
            .localCheckpoint(eager=False, storageLevel=ser)
        )
        outw = ed.groupBy("src").agg(F.sum("w").cast("long").alias("ow"))
        edges = ed.join(outw, "src").localCheckpoint(
            eager=False, storageLevel=ser
        )
    else:
        ed = e.unionAll(rev).localCheckpoint(eager=False)
        outw = ed.groupBy("src").agg(F.sum("w").cast("long").alias("ow"))
        edges = ed.join(outw, "src").localCheckpoint(eager=False)
    nodes = ed.select(F.col("src").alias("node")).distinct()
    ranks = nodes.withColumn("rank", F.lit(_PR_SCALE).cast("long"))
    base = _PR_SCALE * 15 // 100
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .select("dst", F.expr("(rank * w) div ow").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inc"))
        )
        ranks = nodes.join(
            contrib, nodes.node == contrib.dst, "left"
        ).select(
            "node",
            (
                F.lit(base)
                + F.expr(f"85 * coalesce(inc, 0L) div 100")
            ).cast("long").alias("rank"),
        )
    return ranks.select(
        "node",
        F.when(F.col("node") % 2 == 0, "supplier").otherwise("customer").alias("node_type"),
        "rank",
    )


@register(
    "twap_user_daily",
    tier="D",
    oracle="""
    WITH obs AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(FLOOR(value * 100) AS BIGINT) AS cents,
             CAST(epoch_us(lead(ts) OVER w) - epoch_us(ts) AS BIGINT)
               // 1000000 AS hold_s
      FROM events
      WINDOW w AS (PARTITION BY user_id, CAST(ts AS DATE)
                   ORDER BY ts, event_id)
    )
    SELECT user_id, day,
           COUNT(*) AS n_obs,
           CAST(SUM(hold_s) AS BIGINT) AS total_hold_s,
           ROUND(CAST(SUM(cents * hold_s) AS DOUBLE) / SUM(hold_s) / 100.0,
                 6) AS twap
    FROM obs
    WHERE hold_s IS NOT NULL AND hold_s > 0
    GROUP BY user_id, day
    """,
)
def twap_user_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E96: time-weighted average value (TWAP) per user per day — each
    observation weighted by how long it 'held' (seconds until the next
    observation in the same user-day; the day's last observation has
    no holding period and drops, as does a zero-second hold).  The
    finance/metering aggregation that a plain AVG silently gets wrong
    whenever sampling is irregular — exactly the commit-stream
    condition E85 measures.

    Scale shape: the lead window and the rollup share one (user_id,
    day) exchange; weights are exact int64 seconds and values exact
    int64 cents, so the weighted sum is an order-independent integer
    (max term ~86400s x 2e5 cents = 1.7e10 — int64 headroom for ~5e8
    observations per user-day); the only float math is one division
    pair under ROUND."""
    ev = io.table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    w = Window.partitionBy("user_id", day).orderBy("ts", "event_id")
    obs = ev.select(
        "user_id",
        day.alias("day"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
        ((io.epoch_us(F.lead("ts").over(w)) - io.epoch_us("ts")) / F.lit(1_000_000))
        .cast("long")
        .alias("hold_s"),
    ).filter(F.col("hold_s").isNotNull() & (F.col("hold_s") > 0))
    return obs.groupBy("user_id", "day").agg(
        F.count("*").alias("n_obs"),
        F.sum("hold_s").cast("long").alias("total_hold_s"),
        F.round(
            F.sum(F.col("cents") * F.col("hold_s")).cast("double")
            / F.sum("hold_s")
            / F.lit(100.0),
            6,
        ).alias("twap"),
    )


@register(
    "robust_mad_outliers",
    tier="D",
    oracle="""
    WITH med AS (
      SELECT source, quantile_cont(n_chars, 0.5) AS m
      FROM documents GROUP BY source
    ),
    dev AS (
      SELECT d.source, d.doc_id, d.n_chars, med.m,
             abs(d.n_chars - med.m) AS dv
      FROM documents d JOIN med ON med.source = d.source
    ),
    mad AS (
      SELECT source, quantile_cont(dv, 0.5) AS mad FROM dev GROUP BY source
    )
    SELECT dev.source, dev.doc_id, dev.n_chars,
           ROUND(dev.dv, 1) AS abs_dev,
           ROUND(mad.mad, 1) AS mad
    FROM dev JOIN mad ON mad.source = dev.source
    WHERE dev.dv > 2.9652 * mad.mad
    """,
)
def robust_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E97: robust (median/MAD) length outliers — docs whose absolute
    deviation from their source's median n_chars exceeds 2 robust
    sigmas (2 x 1.4826 = 2.9652 x MAD; the fixture's near-uniform
    lengths max out at 4.4 MADs, so a production 3-sigma gate would
    be empty here).  The robust complement of the
    z-score screen (E88): mean/stddev move with the very outliers
    they're meant to flag, median/MAD don't — the estimator of choice
    when a source is ALREADY contaminated.  Medians interpolate at .5
    on integers (and on the half-integer deviations), which is exact
    in binary floating point, so both engines agree bit for bit.

    Scale shape: two per-source aggregations (median, then MAD over
    deviations) with the |sources|-row results broadcast back — the
    corpus is scanned twice, shuffled never (the E88 pattern, one
    extra pass for robustness); exact medians sort per group, so at
    100 TB the first pass swaps to approx_percentile and this exact
    form stays the oracle anchor."""
    docs = io.table(spark, sf_dir, "documents")
    med = docs.groupBy("source").agg(F.expr("percentile(n_chars, 0.5D)").alias("m"))
    dev = (
        docs.select("source", "doc_id", "n_chars")
        .join(F.broadcast(med), "source")
        .withColumn("dv", F.abs(F.col("n_chars") - F.col("m")))
    )
    mad = dev.groupBy("source").agg(F.expr("percentile(dv, 0.5D)").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "source")
        .filter(F.col("dv") > 2.9652 * F.col("mad"))
        .select(
            "source",
            "doc_id",
            "n_chars",
            F.round("dv", 1).alias("abs_dev"),
            F.round("mad", 1).alias("mad"),
        )
    )


@register(
    "user_longest_streak",
    tier="D",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    numbered AS (
      SELECT user_id, d,
             (d - DATE '1970-01-01')
               - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS grp
      FROM days
    ),
    streaks AS (
      SELECT user_id, grp, COUNT(*) AS len FROM numbered GROUP BY user_id, grp
    )
    SELECT user_id,
           COUNT(*) AS n_streaks,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           MAX(len) AS longest_streak
    FROM streaks GROUP BY user_id
    """,
)
def user_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E98: longest consecutive-active-day streak per user — the
    gaps-and-islands idiom (day_number minus row_number is constant
    within a consecutive run), rolled up to streak count, active days,
    and the longest run.  The engagement metric behind retention
    triangles (E73) and DAU/WAU (E75), and the same islands machinery
    E93 uses for state intervals — here over a daily calendar instead
    of a state column.

    Scale shape: the event log collapses to DISTINCT (user, day)
    FIRST (the E75 move — orders of magnitude before any window); the
    row_number window and both rollups all partition by user_id, so
    ONE exchange of (user, day) pairs serves the entire query."""
    ev = io.table(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    numbered = days.withColumn(
        "grp",
        F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
        - F.row_number().over(w),
    )
    streaks = numbered.groupBy("user_id", "grp").agg(F.count("*").alias("len"))
    return streaks.groupBy("user_id").agg(
        F.count("*").alias("n_streaks"),
        F.sum("len").cast("long").alias("n_active_days"),
        F.max("len").alias("longest_streak"),
    )


_KMV_K = 64


@register(
    "distinct_kmv_estimate",
    tier="D",
    oracle=f"""
    WITH d AS (
      SELECT DISTINCT o_orderpriority AS grp, o_custkey FROM orders
    ),
    h AS (
      SELECT grp,
             {_NEUTRAL_HASH.format(col="CAST(o_custkey AS VARCHAR) || ':kmv'")}
               / {_TWO60!r} AS u
      FROM d
    ),
    ranked AS (
      SELECT grp, u,
             ROW_NUMBER() OVER (PARTITION BY grp ORDER BY u) AS rn
      FROM h
    ),
    kth AS (SELECT grp, u AS uk FROM ranked WHERE rn = {_KMV_K}),
    exact AS (SELECT grp, COUNT(*) AS n_exact FROM d GROUP BY grp)
    SELECT e.grp AS o_orderpriority, e.n_exact,
           ROUND(({_KMV_K} - 1) / k.uk, 6) AS kmv_estimate,
           ROUND((({_KMV_K} - 1) / k.uk - e.n_exact) / e.n_exact, 6) AS rel_error
    FROM exact e JOIN kth k ON k.grp = e.grp
    """,
)
def distinct_kmv_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E99: k-minimum-values distinct-count sketch with exact audit —
    per order priority, estimate distinct customers as (k-1)/u_k
    where u_k is the k-th smallest hash-derived uniform (k=64, Bar-
    Yossef et al. 2002).  This is the engine-NEUTRAL approximate
    distinct count: C20's approx_count_distinct is rows-only because
    Spark's HLL bit pattern is engine-specific, while KMV over the
    md5-derived uniform is reproduced bit for bit by DuckDB — an
    oracle-exact sketch.  (Groups with < k distinct values keep their
    hash set whole and are exact by definition — not the fixture's
    case at ~1300 per group.)

    Scale shape: the hash is map-side; the k-th order statistic is a
    per-group window over DISTINCT keys — and at scale collapses to
    an aggregate holding only the k smallest hashes per group (a
    64-value bounded accumulator, mergeable like any partial agg,
    which is the point of KMV); the exact COUNT DISTINCT here is the
    audit anchor the sketch replaces."""
    orders = io.table(spark, sf_dir, "orders")
    d = orders.select(
        F.col("o_orderpriority").alias("grp"), "o_custkey"
    ).distinct()
    u = neutral_word_hash(
        F.concat(F.col("o_custkey").cast("string"), F.lit(":kmv"))
    ) / F.lit(_TWO60)
    h = d.select("grp", u.alias("u"))
    w = Window.partitionBy("grp").orderBy("u")
    kth = (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == _KMV_K)
        .select("grp", F.col("u").alias("uk"))
    )
    exact = d.groupBy("grp").agg(F.count("*").alias("n_exact"))
    est = (_KMV_K - 1) / F.col("uk")
    return exact.join(kth, "grp").select(
        F.col("grp").alias("o_orderpriority"),
        "n_exact",
        F.round(est, 6).alias("kmv_estimate"),
        F.round((est - F.col("n_exact")) / F.col("n_exact"), 6).alias("rel_error"),
    )


_JCE_MOD = 10  # deterministic 1-in-10 key sample


@register(
    "join_cardinality_sampled_estimate",
    tier="D",
    oracle=f"""
    WITH c1 AS (
      SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1
    ),
    c2 AS (
      SELECT o_orderkey AS k, COUNT(*) AS c FROM orders GROUP BY 1
    ),
    sampled AS (
      SELECT c1.k, c1.c * c2.c AS rows_for_key
      FROM c1 JOIN c2 ON c1.k = c2.k
      WHERE {_NEUTRAL_HASH.format(col="CAST(c1.k AS VARCHAR) || ':jce'")}
              % {_JCE_MOD} = 0
    ),
    est AS (
      SELECT CAST({_JCE_MOD} * COALESCE(SUM(rows_for_key), 0) AS BIGINT)
               AS estimated_rows
      FROM sampled
    ),
    actual AS (
      SELECT COUNT(*) AS actual_rows
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT a.actual_rows, e.estimated_rows,
           ROUND((CAST(e.estimated_rows AS DOUBLE) - a.actual_rows)
                 / a.actual_rows, 6) AS rel_error
    FROM actual a CROSS JOIN est e
    """,
)
def join_cardinality_sampled_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E100: sampled join-cardinality estimation — the optimizer-
    statistics primitive: estimate |lineitem ⨝ orders| from the two
    per-key histograms restricted to a deterministic 1-in-10 hash
    sample of KEYS (not rows — row sampling biases join estimates,
    key sampling doesn't), scaled by the sampling factor, audited
    against the executed join.  This is the number the E76 skew
    diagnosis and a cost-based join-order choice consume BEFORE
    paying for the shuffle.

    Scale shape: the histograms are per-key aggs with map-side
    partials; the key-hash filter pushes below both aggs' join, so
    the estimate path touches 1/10th of the key space and never
    executes the join; the audited join runs only because this query
    IS the audit.  1-row est x 1-row actual glue via broadcast."""
    li = io.table(spark, sf_dir, "lineitem")
    orders = io.table(spark, sf_dir, "orders")
    c1 = li.groupBy(F.col("l_orderkey").alias("k")).agg(F.count("*").alias("c1"))
    c2 = orders.groupBy(F.col("o_orderkey").alias("k")).agg(F.count("*").alias("c2"))
    keep = (
        neutral_word_hash(F.concat(F.col("k").cast("string"), F.lit(":jce")))
        % _JCE_MOD
        == 0
    )
    est = (
        c1.join(c2, "k")
        .filter(keep)
        .agg(
            (F.lit(_JCE_MOD) * F.coalesce(F.sum(F.col("c1") * F.col("c2")), F.lit(0)))
            .cast("long")
            .alias("estimated_rows")
        )
    )
    actual = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .agg(F.count("*").alias("actual_rows"))
    )
    return actual.crossJoin(F.broadcast(est)).select(
        "actual_rows",
        "estimated_rows",
        F.round(
            (F.col("estimated_rows").cast("double") - F.col("actual_rows"))
            / F.col("actual_rows"),
            6,
        ).alias("rel_error"),
    )
