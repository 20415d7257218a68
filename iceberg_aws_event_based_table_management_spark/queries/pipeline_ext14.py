"""Tier B (part 15) — Iceberg v2 read/maintenance semantics: merge-on-
read deletes, ref-aware expiry, two-tier manifest pruning, and
partition-spec evolution (SURVEY.md §2-E E161-E164).

Fourteenth batch, all four deepening the TABLE-FORMAT tier the
reference manages: applying position AND equality delete files at
read time (the Iceberg v2 merge-on-read path — B1's compaction exists
precisely to fold these back in), snapshot expiry that honors branch
heads and tags (refs make naive age-based expiry unsafe; E1/E61 cover
age/count policies, this adds reachability), the two-tier scan-
planning walk (manifest-level min/max prunes whole manifests BEFORE
any file entry is read — the actual InclusiveMetricsEvaluator
hierarchy E74 flattens), and a partition-spec-evolution scan (files
written under an old month-only spec prune worse than files under the
evolved month+bucket spec — per-spec read amplification, the question
"should I rewrite old files into the new spec" is answered by).

Same emulation substrate as the rest of Tier B: files are orderkey
slices of lineitem with real min/max stats (the E74 modeling),
snapshots come from the event log (io.snapshots), and delete files
are deterministic arithmetic subsets — every engine-side decision is
integer/date comparisons, so both engines agree exactly.

All built-in-function formulations (no Python UDFs); every query
carries an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import config, io
from ..registry import register

_NT = config.FILES_TABLE_COUNT

# ---------------------------------------------------------------------------
# E161: merge-on-read position + equality deletes
# ---------------------------------------------------------------------------


@register(
    "mor_deletes_read",
    tier="B",
    oracle=f"""
    WITH base AS (
      SELECT 't' || CAST(l_orderkey % {_NT} AS VARCHAR) AS table_name,
             l_orderkey // 100 AS file_no,
             l_orderkey, l_linenumber, l_partkey
      FROM lineitem
    ),
    pos_hit AS (
      SELECT *, ((l_orderkey * 7 + l_linenumber) % 13 = 0) AS pos_del
      FROM base
    ),
    eq_keys AS (
      SELECT DISTINCT l_partkey FROM lineitem WHERE l_partkey % 101 = 0
    ),
    judged AS (
      SELECT p.table_name, p.pos_del,
             (NOT p.pos_del AND e.l_partkey IS NOT NULL) AS eq_del
      FROM pos_hit p LEFT JOIN eq_keys e USING (l_partkey)
    )
    SELECT table_name,
           CAST(COUNT(*) AS BIGINT) AS n_base,
           CAST(SUM(CASE WHEN pos_del THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pos_deleted,
           CAST(SUM(CASE WHEN eq_del THEN 1 ELSE 0 END) AS BIGINT)
             AS n_eq_deleted,
           CAST(SUM(CASE WHEN pos_del OR eq_del THEN 0 ELSE 1 END) AS BIGINT)
             AS n_live,
           CAST(FLOOR((CAST(SUM(CASE WHEN pos_del OR eq_del THEN 0 ELSE 1 END)
                            AS DOUBLE) / COUNT(*)) * 1000000) AS BIGINT)
             AS live_ppm
    FROM judged GROUP BY table_name
    """,
)
def mor_deletes_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E161: Iceberg v2 merge-on-read — apply POSITION deletes
    ((file, position) tombstones) and EQUALITY deletes (key
    tombstones) to the base files at read time, the way a v2 scan
    merges delete files into every query until compaction (B1)
    rewrites them away.  Attribution is Iceberg's: position deletes
    bind first; equality deletes claim surviving rows whose key
    matches.  Per table: base rows, rows claimed by each delete
    flavor, live rows, live ppm — the delete-debt report that decides
    WHEN to trigger the rewrite (the v2 analogue of the reference's
    commit-count trigger).

    Scale shape: position deletes are an arithmetic flag here (a real
    reader anti-joins (file, pos) — bounded by delete-file size);
    equality deletes join a DISTINCT key set (broadcast — equality
    delete files are small by contract); one rollup per table.
    Integer/boolean end to end."""
    li = io.table(spark, sf_dir, "lineitem")
    base = li.select(
        F.concat(F.lit("t"), (F.col("l_orderkey") % _NT).cast("string")).alias(
            "table_name"
        ),
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        ((F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 13 == 0).alias(
            "pos_del"
        ),
    )
    eq_keys = (
        li.filter(F.col("l_partkey") % 101 == 0)
        .select("l_partkey")
        .distinct()
        .withColumn("eq_hit", F.lit(True))
    )
    judged = base.join(F.broadcast(eq_keys), "l_partkey", "left").select(
        "table_name",
        "pos_del",
        (~F.col("pos_del") & F.col("eq_hit").isNotNull()).alias("eq_del"),
    )
    live = F.when(F.col("pos_del") | F.col("eq_del"), 0).otherwise(1)
    return judged.groupBy("table_name").agg(
        F.count("*").cast("long").alias("n_base"),
        F.sum(F.when(F.col("pos_del"), 1).otherwise(0))
        .cast("long")
        .alias("n_pos_deleted"),
        F.sum(F.when(F.col("eq_del"), 1).otherwise(0))
        .cast("long")
        .alias("n_eq_deleted"),
        F.sum(live).cast("long").alias("n_live"),
        F.floor((F.sum(live).cast("double") / F.count("*")) * 1000000)
        .cast("long")
        .alias("live_ppm"),
    )


# ---------------------------------------------------------------------------
# E162: refs-aware snapshot expiry
# ---------------------------------------------------------------------------

_TAG_MOD = 101  # snapshots with id % 101 == 0 carry a tag


@register(
    "refs_aware_snapshot_expiry",
    tier="B",
    oracle=f"""
    WITH snaps AS ({io.SNAPSHOTS_CTE}),
    m AS (
      SELECT table_name, snapshot_id, epoch_us(ts) AS t,
             (snapshot_id % {_TAG_MOD} = 0) AS is_tag,
             MAX(epoch_us(ts)) OVER (PARTITION BY table_name) AS t_head,
             MIN(epoch_us(ts)) OVER (PARTITION BY table_name) AS t_min
      FROM snaps
    ),
    judged AS (
      SELECT table_name, snapshot_id, is_tag,
             (t = t_head) AS is_head,
             (t >= t_min + (t_head - t_min) * 3 // 5) AS young
      FROM m
    )
    SELECT table_name,
           CAST(COUNT(*) AS BIGINT) AS n_snapshots,
           CAST(SUM(CASE WHEN young OR is_head OR is_tag THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN NOT (young OR is_head OR is_tag) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_expired,
           CAST(SUM(CASE WHEN (is_head OR is_tag) AND NOT young THEN 1 ELSE 0 END)
                AS BIGINT) AS n_ref_saved
    FROM judged GROUP BY table_name
    """,
)
def refs_aware_snapshot_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E162: snapshot expiry that honors REFS — age-based expiry
    (keep the newest 40% of each table's history) must NOT drop
    snapshots a branch head or tag still references: refs are the
    Iceberg feature that makes naive expireSnapshots unsafe (a tag
    pins its snapshot indefinitely; the branch head is always live).
    E1/E61 model the age/count policies; this adds reachability —
    per table: total, kept, expired, and `n_ref_saved`, the snapshots
    that survive ONLY because a ref points at them (the storage-cost
    line item refs create).

    Scale shape: the lineage table is commit-count-sized metadata;
    two per-table windows (head/min instants) share one exchange with
    the rollup.  Cutoff arithmetic is integer epoch-µs — exact."""
    snaps = io.snapshots(spark, sf_dir).select(
        "table_name",
        "snapshot_id",
        io.epoch_us(F.col("ts")).alias("t"),
        (F.col("snapshot_id") % _TAG_MOD == 0).alias("is_tag"),
    )
    wt = Window.partitionBy("table_name")
    judged = snaps.select(
        "table_name",
        "is_tag",
        (F.col("t") == F.max("t").over(wt)).alias("is_head"),
        (
            F.col("t")
            >= F.min("t").over(wt)
            + F.floor((F.max("t").over(wt) - F.min("t").over(wt)) * 3 / 5)
        ).alias("young"),
    )
    keep = F.col("young") | F.col("is_head") | F.col("is_tag")
    return judged.groupBy("table_name").agg(
        F.count("*").cast("long").alias("n_snapshots"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(keep, 0).otherwise(1)).cast("long").alias("n_expired"),
        F.sum(
            F.when((F.col("is_head") | F.col("is_tag")) & ~F.col("young"), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_ref_saved"),
    )


# ---------------------------------------------------------------------------
# E163: two-tier manifest → file pruning
# ---------------------------------------------------------------------------

_SKIP_LO = "1995-03-01"
_SKIP_HI = "1995-08-31"
_FILES_PER_MANIFEST = 10


@register(
    "two_tier_manifest_skipping",
    tier="B",
    oracle=f"""
    WITH fstats AS (
      SELECT 't' || CAST(l_orderkey % {_NT} AS VARCHAR) AS table_name,
             l_orderkey // 100 AS file_no,
             (l_orderkey // 100) // {_FILES_PER_MANIFEST} AS manifest_no,
             MIN(l_shipdate) AS f_min, MAX(l_shipdate) AS f_max,
             COUNT(*) AS record_count
      FROM lineitem GROUP BY 1, 2, 3
    ),
    mstats AS (
      SELECT table_name, manifest_no,
             MIN(f_min) AS m_min, MAX(f_max) AS m_max
      FROM fstats GROUP BY 1, 2
    ),
    mjudged AS (
      SELECT table_name, manifest_no,
             (m_max < DATE '{_SKIP_LO}' OR m_min > DATE '{_SKIP_HI}')
               AS m_pruned
      FROM mstats
    ),
    fjudged AS (
      SELECT f.table_name, m.m_pruned, f.record_count,
             (f.f_max < DATE '{_SKIP_LO}' OR f.f_min > DATE '{_SKIP_HI}')
               AS f_pruned
      FROM fstats f JOIN mjudged m USING (table_name, manifest_no)
    )
    SELECT table_name,
           CAST((SELECT COUNT(*) FROM mjudged m2
                 WHERE m2.table_name = fjudged.table_name) AS BIGINT)
             AS n_manifests,
           CAST((SELECT SUM(CASE WHEN m_pruned THEN 1 ELSE 0 END)
                 FROM mjudged m2 WHERE m2.table_name = fjudged.table_name)
                AS BIGINT) AS n_manifests_pruned,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(CASE WHEN m_pruned THEN 1 ELSE 0 END) AS BIGINT)
             AS n_files_unexamined,
           CAST(SUM(CASE WHEN NOT m_pruned AND f_pruned THEN 1 ELSE 0 END)
                AS BIGINT) AS n_files_pruned_file_level,
           CAST(SUM(CASE WHEN NOT m_pruned AND NOT f_pruned
                         THEN record_count ELSE 0 END) AS BIGINT)
             AS rows_scanned
    FROM fjudged GROUP BY table_name
    """,
)
def two_tier_manifest_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E163: the two-tier scan-planning walk — Iceberg prunes at the
    MANIFEST level first (each manifest's partition/stats summary can
    discard its whole file list without reading a single entry), then
    at the file level inside surviving manifests.  E74 flattens this
    to one tier; the hierarchy is what makes planning O(surviving
    entries) instead of O(all files) on a million-file table.  Per
    table: manifests and manifests pruned, files never examined
    (inside pruned manifests), files pruned individually, and rows
    actually scanned for the ship-date range predicate.

    Scale shape: file stats = one groupBy (manifest-free in a real
    lake); manifest stats = a second, manifest-count-sized rollup;
    judgments are metadata comparisons.  The manifest grouping is
    write-order (orderkey slices), exactly how unclustered ingest
    lays out manifests — the skip ratios HERE are the before-picture
    that B2's z-order rewrite improves."""
    li = io.table(spark, sf_dir, "lineitem")
    fstats = li.groupBy(
        F.concat(F.lit("t"), (F.col("l_orderkey") % _NT).cast("string")).alias(
            "table_name"
        ),
        (F.col("l_orderkey") / 100).cast("long").alias("file_no"),
    ).agg(
        F.min("l_shipdate").alias("f_min"),
        F.max("l_shipdate").alias("f_max"),
        F.count("*").alias("record_count"),
    ).withColumn(
        "manifest_no", (F.col("file_no") / _FILES_PER_MANIFEST).cast("long")
    )
    lo, hi = F.lit(_SKIP_LO).cast("date"), F.lit(_SKIP_HI).cast("date")
    wm = Window.partitionBy("table_name", "manifest_no")
    fj = fstats.select(
        "table_name",
        "manifest_no",
        "record_count",
        ((F.col("f_max") < lo) | (F.col("f_min") > hi)).alias("f_pruned"),
        (
            (F.max("f_max").over(wm) < lo) | (F.min("f_min").over(wm) > hi)
        ).alias("m_pruned"),
    )
    manifests = fj.groupBy("table_name", "manifest_no").agg(
        F.max("m_pruned").alias("m_pruned")
    )
    mcounts = manifests.groupBy("table_name").agg(
        F.count("*").cast("long").alias("n_manifests"),
        F.sum(F.when(F.col("m_pruned"), 1).otherwise(0))
        .cast("long")
        .alias("n_manifests_pruned"),
    )
    fcounts = fj.groupBy("table_name").agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum(F.when(F.col("m_pruned"), 1).otherwise(0))
        .cast("long")
        .alias("n_files_unexamined"),
        F.sum(F.when(~F.col("m_pruned") & F.col("f_pruned"), 1).otherwise(0))
        .cast("long")
        .alias("n_files_pruned_file_level"),
        F.sum(
            F.when(~F.col("m_pruned") & ~F.col("f_pruned"), F.col("record_count"))
            .otherwise(0)
        )
        .cast("long")
        .alias("rows_scanned"),
    )
    return mcounts.join(fcounts, "table_name").select(
        "table_name",
        "n_manifests",
        "n_manifests_pruned",
        "n_files",
        "n_files_unexamined",
        "n_files_pruned_file_level",
        "rows_scanned",
    )


# ---------------------------------------------------------------------------
# E164: partition-spec evolution scan
# ---------------------------------------------------------------------------

# Query: ship-date months 1995-03..05, part bucket 2 (of 4).
_EVO_LO_MONTH = 1995 * 12 + 2  # 1995-03 as year*12 + (month-1)
_EVO_HI_MONTH = 1995 * 12 + 4  # 1995-05
_EVO_BUCKET = 2


@register(
    "partition_evolution_scan",
    tier="B",
    oracle=f"""
    WITH rows_tagged AS (
      SELECT CASE WHEN l_orderkey % 10 < 5 THEN 1 ELSE 2 END AS spec_id,
             CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT)
               AS mon,
             CAST(l_partkey % 4 AS BIGINT) AS bucket
      FROM lineitem
    ),
    parts AS (
      SELECT spec_id, mon,
             CASE WHEN spec_id = 2 THEN bucket ELSE -1 END AS pkey_bucket,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN mon BETWEEN {_EVO_LO_MONTH} AND {_EVO_HI_MONTH}
                            AND bucket = {_EVO_BUCKET}
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_matched
      FROM rows_tagged GROUP BY 1, 2, 3
    ),
    judged AS (
      SELECT spec_id, n_rows, n_matched,
             (mon BETWEEN {_EVO_LO_MONTH} AND {_EVO_HI_MONTH}
              AND (spec_id = 1 OR pkey_bucket = {_EVO_BUCKET})) AS scanned
      FROM parts
    )
    SELECT spec_id,
           CAST(COUNT(*) AS BIGINT) AS n_partitions,
           CAST(SUM(CASE WHEN scanned THEN 1 ELSE 0 END) AS BIGINT)
             AS n_partitions_scanned,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows_total,
           CAST(SUM(CASE WHEN scanned THEN n_rows ELSE 0 END) AS BIGINT)
             AS rows_scanned,
           CAST(SUM(n_matched) AS BIGINT) AS rows_matched
    FROM judged GROUP BY spec_id
    """,
)
def partition_evolution_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E164: partition-spec evolution — half the files were written
    under spec 1 (month(shipdate) only), half under the evolved
    spec 2 (month, bucket(partkey, 4)); Iceberg plans each file
    against the spec it was WRITTEN under, so one query prunes
    differently per spec epoch.  For a month-range + part-bucket
    predicate: spec-1 partitions prune by month only (the bucket
    predicate degrades to a row-level residual — rows_scanned ≈
    4× rows_matched), spec-2 partitions prune on both (rows_scanned
    ≈ rows_matched).  The per-spec read-amplification gap IS the
    business case for B2-rewriting old files into the current spec.

    Scale shape: one pass tags rows with (spec, partition tuple);
    one partition-count-sized rollup judges pruning; everything
    after is metadata.  Month/bucket math is pure integers."""
    li = io.table(spark, sf_dir, "lineitem")
    tagged = li.select(
        F.when(F.col("l_orderkey") % 10 < 5, 1).otherwise(2).alias("spec_id"),
        (
            F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1
        )
        .cast("long")
        .alias("mon"),
        (F.col("l_partkey") % 4).cast("long").alias("bucket"),
    )
    parts = tagged.groupBy(
        "spec_id",
        "mon",
        F.when(F.col("spec_id") == 2, F.col("bucket"))
        .otherwise(F.lit(-1))
        .alias("pkey_bucket"),
    ).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(
            F.when(
                F.col("mon").between(_EVO_LO_MONTH, _EVO_HI_MONTH)
                & (F.col("bucket") == _EVO_BUCKET),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_matched"),
    )
    scanned = F.col("mon").between(_EVO_LO_MONTH, _EVO_HI_MONTH) & (
        (F.col("spec_id") == 1) | (F.col("pkey_bucket") == _EVO_BUCKET)
    )
    return parts.groupBy("spec_id").agg(
        F.count("*").cast("long").alias("n_partitions"),
        F.sum(F.when(scanned, 1).otherwise(0))
        .cast("long")
        .alias("n_partitions_scanned"),
        F.sum("n_rows").cast("long").alias("n_rows_total"),
        F.sum(F.when(scanned, F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("rows_scanned"),
        F.sum("n_matched").cast("long").alias("rows_matched"),
    )
