"""Fixture IO layer (SURVEY.md SS7 M0) + derived control tables.

Loads the driver-generated parquet tables and builds the two derived
Iceberg-metadata analogs (FIXTURES.md):

- ``_snapshots``  : snapshot lineage, from ``events``
- ``_files``      : data-file inventory, from ``lineitem``

Both are plain DataFrame projections, so the DuckDB oracle rebuilds
them as CTEs (see ``SNAPSHOTS_CTE`` / ``FILES_CTE``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import config

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE_SF_DIR = "/root/testdata/sf0.001"
ORACLE_SF_DIR = "/root/testdata/sf0.01"


def parquet_num_rows(sf_dir: str, name: str) -> int | None:
    """Exact row count of a fixture table from parquet FOOTER metadata —
    pure driver-side file metadata, no Spark job, so query construction
    stays lazy (the _pf_estimated_shingles discipline).  None when the
    footer is unreadable (remote path, not-yet-written table); callers
    must fall back to a scale-safe default, never force a plan off an
    unknown size."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            files = [
                os.path.join(root, f)
                for root, _, fs in os.walk(path)
                for f in fs
                if f.endswith(".parquet")
            ]
        else:
            files = [path]
        return sum(pq.read_metadata(f).num_rows for f in files)
    except Exception:
        return None


#: Per-session memo of the fixture-table DataFrame HANDLES (lazy plans,
#: zero rows held): repeated io.table calls were paying a fresh parquet
#: file-listing + footer schema read per query build (~40-80 ms each,
#: profiled r15 — ~2-4 s of the 40-query bench was re-listing the same
#: ten static fixture paths).  The memo returns the same immutable
#: DataFrame object, exactly like resolving a registered catalog table
#: twice; every action against it still scans parquet from disk.  Keyed
#: weakly by session so stopped sessions drop their entries, and by
#: absolute path so relative/absolute spellings share one handle.
_TABLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = None  # type: ignore[assignment]


def _table_cache_for(spark: SparkSession) -> dict:
    global _TABLE_CACHE
    if _TABLE_CACHE is None:
        import weakref

        _TABLE_CACHE = weakref.WeakKeyDictionary()
    per = _TABLE_CACHE.get(spark)
    if per is None:
        per = {}
        _TABLE_CACHE[spark] = per
    return per


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}")
    cache = _table_cache_for(spark)
    # Memo key includes the table file's mtime (one os.stat, no Spark
    # job): a REBUILT fixture (scratch dirs populated in stages — the
    # r11 ADVICE events_max_ts contract, tests/test_streaming.py) must
    # not come back as the prior build's stale file listing (r15: the
    # mtime-less memo returned plans whose resolved files no longer
    # existed).  Missing path -> mtime None; the read below raises its
    # own clear error.
    path = f"{sf_dir}/{name}.parquet"
    try:
        mtime = os.stat(path).st_mtime_ns
    except OSError:
        mtime = None
    key = (os.path.abspath(sf_dir), name, mtime)
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS).  Spark <= 4.0 rejects it
        # unless nanosAsLong is set; Spark >= 4.1 ignores the (removed) conf
        # and reads it natively as TIMESTAMP_NTZ truncated to micros.  Callers
        # may hand us an externally built session (the evaluator runs inside
        # the host's session, AwsTableManagementMetricsEvaluator.java:64-85),
        # so set the legacy conf defensively and branch on what the read
        # actually produced rather than assuming either behavior.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
        # The always-NTZ ts contract and io.epoch_ms/epoch_us (which
        # cast NTZ->LTZ before unix_millis) are only correct in a UTC
        # session.  The package factory pins UTC, but the evaluator may
        # run inside an externally built host session — pin it here too
        # (runtime-settable SQL conf) rather than silently shifting
        # every epoch-derived value.
        try:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        except Exception:
            pass
    # Cache check sits BELOW the events conf pins so an externally
    # built session that drifts its timezone mid-run is re-pinned on
    # every events read, cached handle or not.
    if key in cache:
        return cache[key]
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            # Legacy long-ns surface: truncate to us exactly as DuckDB does.
            # Integer div — double division would lose precision at
            # 2^63-scale nanos.  Cast to NTZ so both read paths agree with
            # the DuckDB oracle's naive micros timestamps.
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
            )
        elif ts_type.startswith("timestamp"):
            # A host session with inferTimestampNTZ disabled surfaces the
            # micros/isAdjustedToUTC=false fixture as plain LTZ timestamp;
            # normalize unconditionally so EVERY read path honors the NTZ
            # contract (no-op when the read already produced NTZ).  In the
            # UTC session pinned above the wall-clock value is preserved.
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        else:
            raise TypeError(f"unexpected events.ts type {ts_type!r}")
    cache[key] = df
    return df


def epoch_ms(col) -> F.Column:
    """NTZ-safe epoch milliseconds.

    ``unix_millis()`` is strict about TIMESTAMP input in Spark >= 4.1
    and rejects the TIMESTAMP_NTZ that events.ts now reads as.  The
    cast interprets the wall clock in the session timezone — UTC both
    in this engine's session factory and in the driver's session (the
    datetime-suite oracle hash-matched under it) — which matches
    DuckDB's naive epoch math.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_millis(c.cast("timestamp"))


def epoch_us(col) -> F.Column:
    """NTZ-safe epoch microseconds (see epoch_ms)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-lineage table (SURVEY SS1.1): one row per commit event.

    Models ``SnapshotUtil.currentAncestors`` input
    (AwsTableManagementMetricsEvaluator.java:74): table identity from
    user_id, snapshot id from event_id, operation from event_type.
    """
    return table(spark, sf_dir, "events").select(
        F.concat(F.lit("t"), F.col("user_id").cast("string")).alias("table_name"),
        F.col("event_id").alias("snapshot_id"),
        F.col("ts"),
        F.col("event_type").alias("operation"),
    )


# Exact oracle equivalent of snapshots() — keep in lockstep.
SNAPSHOTS_CTE = """
  SELECT 't' || CAST(user_id AS VARCHAR) AS table_name,
         event_id AS snapshot_id,
         ts,
         event_type AS operation
  FROM events
"""


def files(spark: SparkSession, sf_dir: str, n_tables: int = config.FILES_TABLE_COUNT) -> DataFrame:
    """Data-file inventory analog of the Iceberg `<table>.files` metadata
    table, derived deterministically from lineitem (FIXTURES.md).

    NB: double->bigint casts use an explicit FLOOR because Spark
    truncates while DuckDB rounds; FLOOR makes both engines agree.
    """
    return files_from(table(spark, sf_dir, "lineitem"), n_tables)


def files_from(li: DataFrame, n_tables: int = config.FILES_TABLE_COUNT) -> DataFrame:
    """The `_files` projection over an arbitrary lineitem subset — used
    both for the full inventory and for 'live manifest' slices
    (lifecycle orphan-file planning).

    file_path is UNIQUE per row (a real file inventory never has two
    files at one path): the synthetic lineitem is NOT unique on
    (l_orderkey, l_linenumber) — 45,832 distinct of 60,000 at sf0.01 —
    so the path folds in l_partkey, l_suppkey, and floor(l_quantity),
    which disambiguates every duplicate at all generated scale factors
    (verified sf0.001/0.01/0.1/1).  Uniqueness also makes the binpack
    ORDER BY (file_size_bytes DESC, file_path) tie-break total, so
    group ids are deterministic.  Map-side only — no shuffle.
    """
    return li.select(
        F.concat(F.lit("t"), (F.col("l_orderkey") % n_tables).cast("string")).alias("table_name"),
        F.concat(
            F.lit("f"),
            F.col("l_orderkey").cast("string"),
            F.lit("-"),
            F.col("l_linenumber").cast("string"),
            F.lit("-"),
            F.col("l_partkey").cast("string"),
            F.lit("-"),
            F.col("l_suppkey").cast("string"),
            F.lit("-"),
            F.floor(F.col("l_quantity")).cast("long").cast("string"),
        ).alias("file_path"),
        F.floor(F.col("l_extendedprice") * 1000).cast("long").alias("file_size_bytes"),
        F.floor(F.col("l_quantity")).cast("long").alias("record_count"),
    )


# The file_path expression, shared by FILES_CTE and any oracle that
# rebuilds a manifest slice from a lineitem subset — keep in lockstep
# with files_from above.
FILES_PATH_SQL = (
    "'f' || CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)"
    " || '-' || CAST(l_partkey AS VARCHAR) || '-' || CAST(l_suppkey AS VARCHAR)"
    " || '-' || CAST(CAST(FLOOR(l_quantity) AS BIGINT) AS VARCHAR)"
)

FILES_CTE = f"""
  SELECT 't' || CAST(l_orderkey % {config.FILES_TABLE_COUNT} AS VARCHAR) AS table_name,
         {FILES_PATH_SQL} AS file_path,
         CAST(FLOOR(l_extendedprice * 1000) AS BIGINT) AS file_size_bytes,
         CAST(FLOOR(l_quantity) AS BIGINT) AS record_count
  FROM lineitem
"""
