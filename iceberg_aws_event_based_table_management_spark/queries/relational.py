"""Tier C (part 1) — scans, projections, filters, joins (SURVEY.md SS2-C C1-C17).

The reference ships whole SQL scripts to a Spark engine
(EmrOnEc2OptimizeDataExecutor.java:88-94, EMRSparkUtil.java:27); these
queries implement that delegated relational surface natively.

Determinism rules (SURVEY SS5.1): per-row arithmetic stays in exact
IEEE doubles (identical across engines); only aggregates get the
decimal-sum treatment; every top-k has a total-order tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import io
from ..registry import register

# ---------------------------------------------------------------------------
# Scans (C1-C3).  C4 (parquet sink) and C5 (streaming source/sink) are
# side-effecting — exercised by operators/maintenance.py + streaming/.
# ---------------------------------------------------------------------------


@register(
    "scan_parquet",
    tier="C",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem
    """,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: full parquet scan of the fact table + count/sum — the most
    basic delegated operation (vectorized parquet read, whole-stage
    codegen aggregate)."""
    return io.table(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.floor("l_quantity").cast("long")).cast("long").alias("total_qty"),
    )


@register(
    "scan_projection",
    tier="C",
    oracle="SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem",
)
def scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: column-pruned scan — ReadSchema carries only 3 of 11 columns
    (verify with .explain: parquet scan lists the pruned schema)."""
    return io.table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )


@register(
    "scan_pushdown_filter",
    tier="C",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_quantity < 10
    """,
)
def scan_pushdown_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: predicate-pushdown scan — both conjuncts reach the parquet
    reader as PushedFilters (row-group pruning via min/max stats)."""
    li = io.table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("l_quantity") < 10)
    ).select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")


# ---------------------------------------------------------------------------
# Projections / predicates (C6-C8)
# ---------------------------------------------------------------------------


@register(
    "project_arithmetic",
    tier="C",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
    FROM lineitem
    """,
)
def project_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6: computed-column projection (lineitem revenue) — exact IEEE
    per-row arithmetic, no rounding needed for oracle parity."""
    li = io.table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        rev.alias("revenue"),
        (rev * (1 + F.col("l_tax"))).alias("charged"),
    )


@register(
    "filter_predicates",
    tier="C",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_totalprice BETWEEN 1000 AND 50000 AND o_orderstatus IN ('O', 'F'))
       OR (o_orderpriority LIKE '1%' AND o_totalprice > 200000)
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7: conjunctive/disjunctive predicate mix — between, isin, like."""
    o = io.table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_totalprice").between(1000, 50000) & F.col("o_orderstatus").isin("O", "F"))
        | (F.col("o_orderpriority").like("1%") & (F.col("o_totalprice") > 200000))
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@register(
    "case_when_bucket",
    tier="C",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS price_bucket,
           COUNT(*) AS n_orders
    FROM orders GROUP BY 1
    """,
)
def case_when_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8: CASE WHEN bucketing + count."""
    o = io.table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return o.groupBy(bucket.alias("price_bucket")).agg(F.count("*").alias("n_orders"))


# ---------------------------------------------------------------------------
# Joins (C9-C17)
# ---------------------------------------------------------------------------


@register(
    "join_inner_orders_customer",
    tier="C",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_custkey, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_inner_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9: inner equi-join fact->dim.  Catalyst picks broadcast-hash at
    this dim size; at 100 TB the same plan holds as long as customer
    fits the broadcast threshold, else AQE falls back to SMJ on the
    shuffled key."""
    o = io.table(spark, sf_dir, "orders")
    c = io.table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "join_broadcast_nation_region",
    tier="C",
    oracle="""
    SELECT n.n_nationkey, n.n_name, r.r_name
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def join_broadcast_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10: explicit broadcast (map-side) join of two small dims — the
    broadcast hint eliminates the shuffle entirely."""
    n = io.table(spark, sf_dir, "nation")
    r = io.table(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )


@register(
    "join_outer_customer_orders",
    tier="C",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    """,
)
def join_outer_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C11: left outer join — customers with no orders surface with
    null order columns."""
    c = io.table(spark, sf_dir, "customer")
    o = io.table(spark, sf_dir, "orders")
    return c.join(o, o.o_custkey == c.c_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "join_semi_customers_with_orders",
    tier="C",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C12: left-semi join (EXISTS)."""
    c = io.table(spark, sf_dir, "customer")
    o = io.table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti_customers_without_orders",
    tier="C",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C13: left-anti join (NOT EXISTS)."""
    c = io.table(spark, sf_dir, "customer")
    o = io.table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


_BANDS = [
    ("b1", 0.0, 50_000.0),
    ("b2", 50_000.0, 150_000.0),
    ("b3", 150_000.0, 300_000.0),
    ("b4", 300_000.0, 1_000_000.0),
]
_BANDS_SQL = ", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in _BANDS)


@register(
    "join_range_events_windows",
    tier="C",
    oracle=f"""
    WITH bands(band_id, lo, hi) AS (VALUES {_BANDS_SQL})
    SELECT b.band_id, COUNT(*) AS n_orders,
           CAST(SUM(CAST(FLOOR(o.o_totalprice) AS BIGINT)) AS BIGINT) AS floor_total
    FROM orders o JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band_id
    """,
)
def join_range_events_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C14: theta/range (non-equi) join — orders banded by price range.
    The band table is tiny, so Spark plans BroadcastNestedLoopJoin;
    that is exactly the right physical plan at any scale (bands side is
    constant-size)."""
    o = io.table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(_BANDS, "band_id string, lo double, hi double")
    cond = (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi)
    return (
        o.join(F.broadcast(bands), cond)
        .groupBy("band_id")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.floor("o_totalprice").cast("long")).cast("long").alias("floor_total"),
        )
    )


@register(
    "join_asof_latest_snapshot",
    tier="C",
    oracle="""
    WITH points AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) + INTERVAL 1 DAY AS as_of
      FROM events
    ),
    latest AS (
      SELECT p.user_id, p.as_of, MAX(e.ts) AS latest_ts
      FROM points p JOIN events e ON e.user_id = p.user_id AND e.ts < p.as_of
      GROUP BY p.user_id, p.as_of
    )
    SELECT l.user_id, l.as_of, l.latest_ts,
           MAX(e.event_id) AS latest_event_id
    FROM latest l
    JOIN events e ON e.user_id = l.user_id AND e.ts = l.latest_ts
    GROUP BY l.user_id, l.as_of, l.latest_ts
    """,
)
def join_asof_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C15: as-of join — for each (user, day-end) point, the latest
    event at-or-before that point.  Composed as join + max + resolve
    (deterministic tie-break on event_id); the scale path keys the
    shuffle on user_id so each group is bounded."""
    ev = io.table(spark, sf_dir, "events")
    points = ev.select(
        "user_id",
        # date_trunc yields LTZ even for NTZ input; cast back so the
        # as-of axis matches the NTZ event time (and the naive oracle)
        (F.date_trunc("day", F.col("ts")) + F.expr("INTERVAL 1 DAY"))
        .cast("timestamp_ntz")
        .alias("as_of"),
    ).distinct()
    e = ev.select("user_id", "ts", "event_id")
    latest = (
        points.join(e, ["user_id"])
        .filter(F.col("ts") < F.col("as_of"))
        .groupBy("user_id", "as_of")
        .agg(F.max("ts").alias("latest_ts"))
    )
    return (
        latest.join(e.withColumnRenamed("ts", "latest_ts"), ["user_id", "latest_ts"])
        .groupBy("user_id", "as_of", "latest_ts")
        .agg(F.max("event_id").alias("latest_event_id"))
    )


@register(
    "join_self_snapshot_gaps",
    tier="C",
    oracle=f"""
    WITH snapshots AS ({io.SNAPSHOTS_CTE}),
    ranked AS (
      SELECT table_name, snapshot_id, ts,
             ROW_NUMBER() OVER (PARTITION BY table_name ORDER BY ts, snapshot_id) AS rn
      FROM snapshots
    )
    SELECT cur.table_name, cur.snapshot_id, prev.snapshot_id AS prev_snapshot_id,
           epoch_ms(cur.ts) - epoch_ms(prev.ts) AS gap_ms
    FROM ranked cur JOIN ranked prev
      ON cur.table_name = prev.table_name AND cur.rn = prev.rn + 1
    """,
)
def join_self_snapshot_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C17: self-join of the snapshot lineage with itself (rank = rank+1)
    computing inter-commit gaps — the commit-cadence signal behind the
    reference's time threshold (AwsTableManagementMetricsEvaluator.java:119)."""
    from pyspark.sql import Window

    snaps = io.snapshots(spark, sf_dir)
    w = Window.partitionBy("table_name").orderBy("ts", "snapshot_id")
    ranked = snaps.withColumn("rn", F.row_number().over(w)).select(
        "table_name", "snapshot_id", "ts", "rn"
    )
    cur = ranked.alias("cur")
    prev = ranked.alias("prev")
    return cur.join(
        prev,
        (F.col("cur.table_name") == F.col("prev.table_name"))
        & (F.col("cur.rn") == F.col("prev.rn") + 1),
    ).select(
        F.col("cur.table_name").alias("table_name"),
        F.col("cur.snapshot_id").alias("snapshot_id"),
        F.col("prev.snapshot_id").alias("prev_snapshot_id"),
        (io.epoch_ms(F.col("cur.ts")) - io.epoch_ms(F.col("prev.ts"))).alias("gap_ms"),
    )


@register(
    "agg_pivot_status_matrix",
    tier="C",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_pivot_status_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (crosstab): order counts by priority x status.  The value
    list is passed explicitly — at scale an unlisted pivot needs a
    distinct pass first; pinning the columns keeps it one aggregation
    with no extra job."""
    return (
        io.table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("status_f"),
            F.coalesce("O", F.lit(0)).alias("status_o"),
            F.coalesce("P", F.lit(0)).alias("status_p"),
        )
    )


@register(
    "filter_scalar_subquery",
    tier="C",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT AVG(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) / 100.0 FROM orders)
    """,
)
def filter_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate: orders above 1.5x the mean price.
    Catalyst plans the subquery as its own tiny aggregate and reuses
    the scalar — no per-row recomputation.  (The mean is computed on
    cent-longs so both engines compare against the identical double.)"""
    o = io.table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_orders_ssq")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM _orders_ssq
        WHERE o_totalprice > 1.5 * (SELECT AVG(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) / 100.0 FROM _orders_ssq)
        """
    )


@register(
    "filter_correlated_exists",
    tier="C",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    )
    """,
)
def filter_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS subquery — Catalyst decorrelates it into a
    left-semi join on the correlation key (the same plan
    join_semi_customers_with_orders builds by hand), so it scales as a
    plain shuffled semi-join."""
    io.table(spark, sf_dir, "customer").createOrReplaceTempView("_cust_ce")
    io.table(spark, sf_dir, "orders").createOrReplaceTempView("_ord_ce")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM _cust_ce c
        WHERE EXISTS (
          SELECT 1 FROM _ord_ce o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
        )
        """
    )


def _scratch_dir(tag: str) -> str:
    """Process-lifetime scratch dir so a written-then-reread dataset
    stays readable for the caller's lazy plan (a TemporaryDirectory
    context would vanish before the driver's collect, forcing an eager
    collect+createDataFrame here — the anti-pattern at scale)."""
    import atexit
    import shutil
    import tempfile

    path = tempfile.mkdtemp(prefix=f"ebtm-{tag}-")
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


@register(
    "source_csv_roundtrip",
    tier="C",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source/sink: write the nation dim as CSV with header, read
    it back with an EXPLICIT schema (schema-on-read inference drifts —
    never inferSchema in production), return the LAZY read.  Values
    must round-trip losslessly vs the parquet original (the oracle)."""
    nation = io.table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    path = f"{_scratch_dir('csv')}/nation_csv"
    nation.write.option("header", True).mode("overwrite").csv(path)
    return spark.read.option("header", True).schema(
        "n_nationkey long, n_name string, n_regionkey long"
    ).csv(path)


@register(
    "source_json_roundtrip",
    tier="C",
    oracle="""
    SELECT r_regionkey, r_name FROM region
    """,
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source/sink round-trip of the region dim, explicit
    schema on read (same rule as CSV: inference is for exploration,
    schemas are for pipelines)."""
    region = io.table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    path = f"{_scratch_dir('json')}/region_json"
    region.write.mode("overwrite").json(path)
    return spark.read.schema("r_regionkey long, r_name string").json(path)


@register(
    "source_orc_roundtrip",
    tier="C",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal FROM supplier
    """,
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink round-trip of the supplier dim (the third
    columnar format Spark ships natively alongside parquet/csv/json),
    explicit schema on read; doubles must survive losslessly vs the
    parquet original (the oracle)."""
    supplier = io.table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    path = f"{_scratch_dir('orc')}/supplier_orc"
    supplier.write.mode("overwrite").orc(path)
    return spark.read.schema("s_suppkey long, s_name string, s_acctbal double").orc(path)
