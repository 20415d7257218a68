"""Tier B/D (part 6) — lakehouse-observability and sketch extensions
(SURVEY.md §2-E E107-E112).

Fifth batch: a per-file Bloom-index pruning estimate (the secondary-
index counterpart to E74's min/max skipping and E105's overlap
audit), a table-freshness SLA report over the commit log, KMV sketch
SET operations (union/intersection estimates across source pairs,
extending E99's single-set sketch), per-source OLS length trends from
exact integer sums, a partitioned parquet sink proving partition-
pruned reads end-to-end, and a commit-seasonality profile (day-of-
week baselines + anomalous-day counts, the seasonal refinement of
E45's flat rate anomaly).

All built-in-function formulations (no Python UDFs); every query
carries an exact DuckDB oracle.  Engine-neutral hashing reuses
operators/dedup.neutral_word_hash (md5-derived, 60-bit) so DuckDB
reproduces every hash bit, Bloom bit index, and KMV uniform exactly.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import config, io
from ..operators.dedup import neutral_word_hash
from ..registry import register

# DuckDB mirror of operators/dedup.neutral_word_hash(col) — same
# template as pipeline_ext3/4 (kept local; query modules don't import
# each other so registration order stays the rotation's call).
_NEUTRAL_HASH = (
    "CAST(list_reduce(string_split('0' || substr(md5({col}), 1, 15), ''),"
    " (acc, c) -> CAST(acc AS BIGINT) * 16"
    " + strpos('0123456789abcdef', c) - 1) AS BIGINT)"
)

_TWO60 = float(2**60)

_BLOOM_FILE_BITS = 256
_BLOOM_FILE_SEEDS = ("b0:", "b1:")
_BLOOM_N_PROBES = 8


@register(
    "file_bloom_pruning_estimate",
    tier="B",
    oracle=f"""
    WITH fk AS (
      SELECT DISTINCT
             't' || CAST(l_orderkey % {config.FILES_TABLE_COUNT} AS VARCHAR)
               AS table_name,
             l_orderkey // 100 AS file_no,
             l_partkey
      FROM lineitem
    ),
    filebits AS (
      SELECT DISTINCT table_name, file_no,
             {_NEUTRAL_HASH.format(col="seed || CAST(l_partkey AS VARCHAR)")}
               % {_BLOOM_FILE_BITS} AS bit
      FROM fk, (SELECT unnest(['b0:', 'b1:']) AS seed)
    ),
    probes AS (
      SELECT DISTINCT l_partkey FROM lineitem
      ORDER BY l_partkey LIMIT {_BLOOM_N_PROBES}
    ),
    probebits AS (
      SELECT DISTINCT l_partkey,
             {_NEUTRAL_HASH.format(col="seed || CAST(l_partkey AS VARCHAR)")}
               % {_BLOOM_FILE_BITS} AS bit
      FROM probes, (SELECT unnest(['b0:', 'b1:']) AS seed)
    ),
    nbits AS (SELECT l_partkey, COUNT(*) AS need FROM probebits GROUP BY 1),
    cand AS (
      SELECT p.l_partkey, f.table_name, f.file_no
      FROM probebits p JOIN filebits f ON p.bit = f.bit
      GROUP BY 1, 2, 3
      HAVING COUNT(DISTINCT p.bit) = (SELECT need FROM nbits n
                                      WHERE n.l_partkey = p.l_partkey)
    ),
    truth AS (
      SELECT p.l_partkey, fk.table_name, fk.file_no
      FROM probes p JOIN fk ON p.l_partkey = fk.l_partkey
      GROUP BY 1, 2, 3
    )
    SELECT c.l_partkey,
           COUNT(*) AS n_bloom_candidates,
           CAST(SUM(CASE WHEN t.file_no IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_true_files,
           CAST(SUM(CASE WHEN t.file_no IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_false_positives
    FROM cand c
    LEFT JOIN truth t ON c.l_partkey = t.l_partkey
                     AND c.table_name = t.table_name AND c.file_no = t.file_no
    GROUP BY c.l_partkey
    """,
)
def file_bloom_pruning_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E107: per-file Bloom-index pruning estimate — Iceberg/Parquet
    attach per-file Bloom filters so POINT lookups on unclustered keys
    skip files that min/max ranges cannot (E105 shows l_partkey ranges
    overlap ~everything; a Bloom prunes anyway).  Each emulated file
    (E74's 100-order slices) gets a {m}-bit filter over l_partkey
    (k=2 engine-neutral hash functions); for {p} deterministic probe
    keys the query reports Bloom candidate files vs files truly
    containing the key — the false-positive overhead that sizes m.
    Candidates require ALL the probe's bits present (probes whose two
    hashes collide need just that one bit — the HAVING counts the
    probe's own distinct bits).

    Scale shape: the filter build is one DISTINCT (file, bit) pass
    (in a real lake it's already in the file footer — zero scan); the
    probe join moves probe-bit rows (p×k) against the bit index, all
    metadata-sized.  Truth is one semi-join of probes against the key
    inventory, the audit a production index doesn't run."""
    li = io.table(spark, sf_dir, "lineitem")
    fk = li.select(
        F.concat(
            F.lit("t"), (F.col("l_orderkey") % config.FILES_TABLE_COUNT).cast("string")
        ).alias("table_name"),
        (F.col("l_orderkey") / 100).cast("long").alias("file_no"),
        "l_partkey",
    ).distinct()

    def bits(df: DataFrame, key_cols: list[str]) -> DataFrame:
        seeded = df.withColumn(
            "seed", F.explode(F.array(*[F.lit(s) for s in _BLOOM_FILE_SEEDS]))
        )
        return seeded.select(
            *key_cols,
            (
                neutral_word_hash(
                    F.concat(F.col("seed"), F.col("l_partkey").cast("string"))
                )
                % _BLOOM_FILE_BITS
            ).alias("bit"),
        ).distinct()

    filebits = bits(fk, ["table_name", "file_no"])
    probes = li.select("l_partkey").distinct().orderBy("l_partkey").limit(_BLOOM_N_PROBES)
    probebits = bits(probes, ["l_partkey"])
    nbits = probebits.groupBy("l_partkey").agg(F.count("*").alias("need"))
    cand = (
        probebits.join(filebits, "bit")
        .groupBy("l_partkey", "table_name", "file_no")
        .agg(F.countDistinct("bit").alias("got"))
        .join(nbits, "l_partkey")
        .filter(F.col("got") == F.col("need"))
        .select("l_partkey", "table_name", "file_no")
    )
    truth = probes.join(fk, "l_partkey").select(
        "l_partkey", "table_name", "file_no"
    ).distinct()
    return (
        cand.join(truth.withColumn("is_true", F.lit(1)), ["l_partkey", "table_name", "file_no"], "left")
        .groupBy("l_partkey")
        .agg(
            F.count("*").alias("n_bloom_candidates"),
            F.sum(F.coalesce("is_true", F.lit(0))).cast("long").alias("n_true_files"),
            F.sum(F.when(F.col("is_true").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_false_positives"),
        )
    )


@register(
    "table_freshness_sla",
    tier="A",
    oracle=f"""
    WITH snaps AS ({io.SNAPSHOTS_CTE}),
    now_ts AS (SELECT MAX(ts) AS now FROM snaps),
    gaps AS (
      SELECT table_name, ts, snapshot_id,
             epoch_ms(ts) - epoch_ms(LAG(ts) OVER (
               PARTITION BY table_name ORDER BY ts, snapshot_id)) AS gap_ms
      FROM snaps
    ),
    per_table AS (
      SELECT table_name,
             COUNT(*) AS n_commits,
             MAX(ts) AS last_commit_ts,
             quantile_cont(gap_ms, 0.5) AS median_gap_ms
      FROM gaps GROUP BY table_name
    )
    SELECT p.table_name, p.n_commits, p.last_commit_ts,
           epoch_ms(n.now) - epoch_ms(p.last_commit_ts) AS staleness_ms,
           p.median_gap_ms,
           (epoch_ms(n.now) - epoch_ms(p.last_commit_ts))
             > 2 * p.median_gap_ms AS sla_breach
    FROM per_table p CROSS JOIN now_ts n
    """,
)
def table_freshness_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E108: table-freshness SLA report — per managed table: commit
    count, last-commit time, staleness against the fleet's newest
    commit (the deterministic 'now'), the median inter-commit gap,
    and a breach flag when staleness exceeds 2x the table's own
    cadence.  This is the freshness dashboard a table-management
    service (the reference's event consumer) publishes alongside its
    optimize decisions: A8/A9 threshold on commit COUNTS; freshness
    thresholds on commit RECENCY, catching dead producers that
    commit-count triggers never see (a stalled table stops generating
    events — only a scan of last-known state finds it).

    Exactness: gaps are integer epoch-ms; the median's 0.5
    interpolation is exact binary FP on integers (the E8 argument).
    Scale shape: snapshots are metadata; one lag window + one agg
    share the per-table partitioning; 'now' is a 1-row broadcast."""
    snaps = io.snapshots(spark, sf_dir)
    w = Window.partitionBy("table_name").orderBy("ts", "snapshot_id")
    gaps = snaps.select(
        "table_name",
        "ts",
        (io.epoch_ms("ts") - io.epoch_ms(F.lag("ts").over(w))).alias("gap_ms"),
    )
    per_table = gaps.groupBy("table_name").agg(
        F.count("*").alias("n_commits"),
        F.max("ts").alias("last_commit_ts"),
        F.expr("percentile(gap_ms, 0.5D)").alias("median_gap_ms"),
    )
    now_ts = snaps.agg(F.max("ts").alias("now"))
    staleness = io.epoch_ms("now") - io.epoch_ms("last_commit_ts")
    return per_table.crossJoin(F.broadcast(now_ts)).select(
        "table_name",
        "n_commits",
        "last_commit_ts",
        staleness.alias("staleness_ms"),
        "median_gap_ms",
        (staleness > 2 * F.col("median_gap_ms")).alias("sla_breach"),
    )


_KMV_SET_K = 32


@register(
    "distinct_kmv_set_ops",
    tier="D",
    oracle=f"""
    WITH dw AS (
      SELECT DISTINCT source,
             unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
      FROM documents
    ),
    dwf AS (SELECT source, word FROM dw WHERE word <> ''),
    h AS (
      SELECT DISTINCT source,
             {_NEUTRAL_HASH.format(col="word || ':kmvset'")} AS hv
      FROM dwf
    ),
    smalls AS (
      SELECT source, hv
      FROM (SELECT source, hv,
                   ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv) AS rn
            FROM h)
      WHERE rn <= {_KMV_SET_K}
    ),
    prs AS (
      SELECT a.source AS source_a, b.source AS source_b
      FROM (SELECT DISTINCT source FROM documents) a
      JOIN (SELECT DISTINCT source FROM documents) b ON a.source < b.source
    ),
    merged AS (
      SELECT source_a, source_b, s.hv
      FROM prs JOIN smalls s ON s.source = prs.source_a
      UNION
      SELECT source_a, source_b, s.hv
      FROM prs JOIN smalls s ON s.source = prs.source_b
    ),
    ranked AS (
      SELECT source_a, source_b, hv,
             ROW_NUMBER() OVER (PARTITION BY source_a, source_b
                                ORDER BY hv) AS rn
      FROM merged
    ),
    topk AS (
      SELECT r.source_a, r.source_b, r.hv, r.rn,
             CASE WHEN sa.hv IS NOT NULL AND sb.hv IS NOT NULL
                  THEN 1 ELSE 0 END AS in_both
      FROM ranked r
      LEFT JOIN smalls sa ON sa.source = r.source_a AND sa.hv = r.hv
      LEFT JOIN smalls sb ON sb.source = r.source_b AND sb.hv = r.hv
      WHERE r.rn <= {_KMV_SET_K}
    ),
    sketch AS (
      SELECT source_a, source_b,
             MAX(hv) AS uk_scaled,
             CAST(SUM(in_both) AS BIGINT) AS n_shared
      FROM topk GROUP BY 1, 2
    ),
    exact_n AS (SELECT source, COUNT(*) AS n FROM h GROUP BY source),
    exact_i AS (
      SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_inter
      FROM dwf a JOIN dwf b ON a.word = b.word AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT s.source_a, s.source_b,
           ea.n AS exact_a, eb.n AS exact_b,
           ea.n + eb.n - COALESCE(ei.n_inter, 0) AS exact_union,
           COALESCE(ei.n_inter, 0) AS exact_inter,
           ROUND(({_KMV_SET_K} - 1) / (s.uk_scaled / {_TWO60!r}), 4)
             AS union_est,
           ROUND((CAST(s.n_shared AS DOUBLE) / {_KMV_SET_K})
                 * (({_KMV_SET_K} - 1) / (s.uk_scaled / {_TWO60!r})), 4)
             AS inter_est
    FROM sketch s
    JOIN exact_n ea ON ea.source = s.source_a
    JOIN exact_n eb ON eb.source = s.source_b
    LEFT JOIN exact_i ei ON ei.source_a = s.source_a
                        AND ei.source_b = s.source_b
    """,
)
def distinct_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E109: KMV sketch SET operations — for every source pair,
    estimate |A∪B| and |A∩B| from the two k-minimum-value sketches
    alone (Beyer et al. 2007): merge the sketches, re-take the k
    smallest, union-estimate = (k-1)/u_k, Jaccard ρ = fraction of the
    merged top-k present in BOTH sketches, intersection = ρ·union.
    E99 estimates ONE set's cardinality; the point of KMV over HLL
    (E106) is exactly that sketches compose under set algebra —
    vocabulary-overlap matrices across 10⁴ sources from k values per
    source, no word-level joins.  Exact union/intersection ride along
    as the audit the sketch replaces.

    Scale shape: sketches are one window over per-source DISTINCT
    hashes (at scale: a k-value bounded mergeable accumulator, E99's
    argument); all pairwise math runs on |sources|²·k SKETCH rows —
    independent of corpus size.  The exact-audit join is the only
    word-level pairwise work and exists only for the oracle."""
    docs = io.table(spark, sf_dir, "documents")
    dwf = (
        docs.select(
            "source", F.explode(F.split(F.lower("text"), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .distinct()
    )
    h = dwf.select(
        "source",
        neutral_word_hash(F.concat(F.col("word"), F.lit(":kmvset"))).alias("hv"),
    ).distinct()
    rnw = Window.partitionBy("source").orderBy("hv")
    smalls = (
        h.withColumn("rn", F.row_number().over(rnw))
        .filter(F.col("rn") <= _KMV_SET_K)
        .select("source", "hv")
    )
    srcs = docs.select("source").distinct()
    prs = (
        srcs.alias("a")
        .join(srcs.alias("b"), F.col("a.source") < F.col("b.source"))
        .select(F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b"))
    )
    merged = (
        prs.join(smalls, F.col("source") == F.col("source_a"))
        .select("source_a", "source_b", "hv")
        .union(
            prs.join(smalls, F.col("source") == F.col("source_b")).select(
                "source_a", "source_b", "hv"
            )
        )
        .distinct()
    )
    prw = Window.partitionBy("source_a", "source_b").orderBy("hv")
    ranked = merged.withColumn("rn", F.row_number().over(prw)).filter(
        F.col("rn") <= _KMV_SET_K
    )
    sa = smalls.select(F.col("source").alias("source_a"), "hv", F.lit(1).alias("fa"))
    sb = smalls.select(F.col("source").alias("source_b"), "hv", F.lit(1).alias("fb"))
    topk = (
        ranked.join(sa, ["source_a", "hv"], "left")
        .join(sb, ["source_b", "hv"], "left")
        .withColumn(
            "in_both",
            F.when(F.col("fa").isNotNull() & F.col("fb").isNotNull(), 1).otherwise(0),
        )
    )
    sketch = topk.groupBy("source_a", "source_b").agg(
        F.max("hv").alias("uk_scaled"),
        F.sum("in_both").cast("long").alias("n_shared"),
    )
    exact_n = h.groupBy("source").agg(F.count("*").alias("n"))
    exact_i = (
        dwf.alias("a")
        .join(
            dwf.alias("b"),
            (F.col("a.word") == F.col("b.word"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    union_est = F.lit(_KMV_SET_K - 1) / (F.col("uk_scaled") / F.lit(_TWO60))
    return (
        sketch.join(
            exact_n.select(F.col("source").alias("source_a"), F.col("n").alias("exact_a")),
            "source_a",
        )
        .join(
            exact_n.select(F.col("source").alias("source_b"), F.col("n").alias("exact_b")),
            "source_b",
        )
        .join(exact_i, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            "exact_a",
            "exact_b",
            (F.col("exact_a") + F.col("exact_b") - F.coalesce("n_inter", F.lit(0))).alias(
                "exact_union"
            ),
            F.coalesce("n_inter", F.lit(0)).alias("exact_inter"),
            F.round(union_est, 4).alias("union_est"),
            F.round(
                (F.col("n_shared").cast("double") / _KMV_SET_K) * union_est, 4
            ).alias("inter_est"),
        )
    )


@register(
    "source_length_trend",
    tier="D",
    oracle="""
    WITH xy AS (
      SELECT source, n_chars AS y,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS x
      FROM documents
    ),
    sums AS (
      SELECT source,
             COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM xy GROUP BY source
      HAVING COUNT(*) >= 2
    )
    SELECT source, n,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
           ROUND((CAST(sy AS DOUBLE)
                  - (CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE), 6) AS intercept
    FROM sums
    """,
)
def source_length_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E110: per-source document-length trend — OLS slope/intercept of
    n_chars over the source's doc_id-ordered sequence (ingest order),
    the drift detector for 'this crawl's documents are getting
    shorter' that E57's term-level drift can't see.  All five
    sufficient statistics (n, Σx, Σy, Σxy, Σx²) are EXACT int64 sums
    (x is the in-source rank — bounded; n·Σxy < 2^53 through sf0.1 by
    orders of magnitude), so the slope is integer-ratio-exact: one
    double division per output, identical IEEE ops in both engines —
    no float accumulation order anywhere.

    Scale shape: the rank window and the sums agg share one
    per-source exchange; sufficient statistics ARE the mergeable
    state (this is streaming-regression partial aggregation — at
    100 TB each partition contributes its five sums).  Rank-as-x
    assumes per-source ingest order = doc_id order, the fixture's
    contract (TESTDATA.md)."""
    docs = io.table(spark, sf_dir, "documents")
    xw = Window.partitionBy("source").orderBy("doc_id")
    xy = docs.select(
        "source",
        F.col("n_chars").alias("y"),
        F.row_number().over(xw).cast("long").alias("x"),
    )
    sums = xy.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    ).filter(F.col("n") >= 2)  # single-doc sources have a degenerate (0/0) fit
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    return sums.select(
        "source",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double"),
            6,
        ).alias("intercept"),
    )


@register(
    "sink_partitioned_pruning",
    tier="C",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
    FROM documents WHERE lang = 'en'
    GROUP BY source
    """,
)
def sink_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E111: partitioned parquet sink + partition-pruned read, end to
    end — write the documents table `partitionBy("lang")` to scratch
    (the layout every lakehouse corpus table ships with: partition
    columns become directories, readable by any engine), then read it
    back with a `lang = 'en'` predicate and aggregate.  Correctness
    proves the round-trip preserves every row and value through the
    hive-style layout; the PLAN is the real point — the filter must
    resolve at PLANNING time into reading only the `lang=en`
    directory (PartitionFilters, locked by tests/test_pipeline_ext5's
    plan assertion), which at 100 TB is the difference between
    scanning one partition and scanning the lake.  C1-C4 prove scan
    pushdown WITHIN files; this proves pruning ACROSS the directory
    tree, the layer Iceberg manifests replace with metadata.

    Scratch lives under spark.local.dir-adjacent /tmp, one dir per
    invocation (same pattern as the C5/E14 source round-trips)."""
    scratch = os.path.join("/tmp", f"ebtm-partsink-{uuid.uuid4().hex}")
    docs = io.table(spark, sf_dir, "documents")
    docs.write.mode("overwrite").partitionBy("lang").parquet(scratch)
    back = spark.read.parquet(scratch).filter(F.col("lang") == "en")
    return back.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars_total"),
    )


@register(
    "commit_seasonality_profile",
    tier="A",
    oracle=f"""
    WITH snaps AS ({io.SNAPSHOTS_CTE}),
    daily AS (
      SELECT table_name, CAST(ts AS DATE) AS day, COUNT(*) AS n_commits
      FROM snaps GROUP BY 1, 2
    ),
    dowd AS (
      SELECT table_name, day, n_commits,
             CAST(dayofweek(day) AS BIGINT) AS dow
      FROM daily
    ),
    profile AS (
      SELECT table_name, dow,
             COUNT(*) AS n_days,
             CAST(SUM(n_commits) AS BIGINT) AS total_commits,
             CAST(SUM(n_commits) AS DOUBLE) / COUNT(*) AS avg_raw
      FROM dowd GROUP BY 1, 2
    ),
    flagged AS (
      SELECT p.table_name, p.dow, p.n_days, p.total_commits, p.avg_raw,
             CAST(SUM(CASE WHEN d.n_commits > 2 * p.avg_raw THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_anomalous_days
      FROM profile p
      JOIN dowd d ON d.table_name = p.table_name AND d.dow = p.dow
      GROUP BY 1, 2, 3, 4, 5
    )
    SELECT table_name, dow, n_days, total_commits,
           ROUND(avg_raw, 6) AS avg_commits, n_anomalous_days
    FROM flagged
    """,
)
def commit_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E112: commit-seasonality profile — per (table, day-of-week):
    days observed, total and average commits, and how many days ran
    hotter than 2x that weekday's own baseline.  E45 flags anomalies
    against a FLAT per-table rate; real commit streams are seasonal
    (batch jobs land Mondays, backfills on weekends), so the flat
    model pages on every Monday.  Conditioning the baseline on
    day-of-week is the smallest seasonal model that stops that — the
    trigger-tuning input for the reference's threshold knobs
    (AwsManageProperties.java:11-18).  Spark's dayofweek is 1-based
    Sunday; DuckDB's is 0-based — the Spark side subtracts 1 so both
    emit 0=Sunday.

    Exactness: the baseline is one integer-ratio division (ROUND 6),
    and the anomaly comparison uses the raw double both engines
    compute with the same single IEEE op.  Scale shape: snapshots are
    metadata; daily rollup, weekday profile, and the flag-count join
    all key on (table, dow) — bounded keys, broadcastable profile."""
    snaps = io.snapshots(spark, sf_dir)
    daily = snaps.groupBy(
        "table_name", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("n_commits"))
    dowd = daily.select(
        "table_name",
        "day",
        "n_commits",
        (F.dayofweek("day") - 1).cast("long").alias("dow"),
    )
    profile = dowd.groupBy("table_name", "dow").agg(
        F.count("*").alias("n_days"),
        F.sum("n_commits").cast("long").alias("total_commits"),
        (F.sum("n_commits").cast("double") / F.count("*")).alias("avg_raw"),
    )
    return (
        profile.join(dowd.select("table_name", "dow", "n_commits"), ["table_name", "dow"])
        .groupBy("table_name", "dow", "n_days", "total_commits", "avg_raw")
        .agg(
            F.sum(
                F.when(F.col("n_commits") > 2 * F.col("avg_raw"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_anomalous_days")
        )
        .select(
            "table_name",
            "dow",
            "n_days",
            "total_commits",
            F.round("avg_raw", 6).alias("avg_commits"),
            "n_anomalous_days",
        )
    )
