"""Skew-mitigation operators (SURVEY.md SS2 '100 TB design rule';
BASELINE.json scale posture).

At 100 TB a handful of hot keys (one giant table in the commit stream,
one viral document cluster) can stall a whole stage: every row of the
hot key lands on one reducer.  Two standard moves, both expressed as
plain DataFrame transforms so Catalyst/AQE still optimize around them:

- two-stage salted aggregation: groupBy(key, salt) partial -> groupBy
  (key) final.  Always safe for algebraic aggregates (sum/count/min/
  max); turns one hot reducer into `salt_buckets` warm ones.
- salted broadcast of the skewed side of a join is left to AQE
  (spark.sql.adaptive.skewJoin.enabled, on in session.py) — hand-
  salting a join is only needed for non-AQE engines.

The salted aggregation is oracle-checked (agg_salted_two_stage must
equal the plain one-stage result exactly — long counters, no float
order sensitivity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    key: str | list[str],
    value: Column | str,
    *,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage skew-proof sum/count per key.

    Stage 1 shuffles on (key, salt) — the hot key's rows spread over
    `salt_buckets` reducers; stage 2 shuffles the tiny partial rows on
    key alone.  Output: key, total (sum of value), n_rows.
    """
    keys = [key] if isinstance(key, str) else list(key)
    v = F.col(value) if isinstance(value, str) else value
    salt = (F.spark_partition_id() % F.lit(salt_buckets)).alias("_salt")
    partial = (
        df.select(*keys, v.alias("_v"), salt)
        .groupBy(*keys, "_salt")
        .agg(F.sum("_v").alias("_psum"), F.count("*").alias("_pcnt"))
    )
    return partial.groupBy(*keys).agg(
        F.sum("_psum").alias("total"), F.sum("_pcnt").cast("long").alias("n_rows")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof shuffle equi-join: salt the big/skewed side, replicate
    the small side across the salt domain, join on (key, salt).

    A hot key on a plain shuffle join lands every one of its rows on a
    single reducer; salting spreads them over `salt_buckets` reducers
    at the cost of replicating the SMALL side `salt_buckets` times
    (bounded — the small side must be dimension-sized, just not small
    enough to broadcast outright).  The left salt is a hash of the
    whole row modulo the bucket count: deterministic, and the join
    result is salt-invariant because every (key, salt) pair on the
    right exists.

    Production default is AQE's skew-join split
    (spark.sql.adaptive.skewJoin.enabled, on in session.py), which
    achieves the same spread at runtime without replication; this
    operator is for non-AQE engines, for skew AQE's size heuristics
    miss (many medium-hot keys just under the split threshold), and as
    the measurable yardstick tests/test_skew_e2e.py holds AQE against.

    Only left-preserving keyed joins are supported: the salt scheme is
    correct for inner/left/left_semi/left_anti because every
    (key, salt) pair exists on the exploded right.  right/full would
    null-extend each UNMATCHED right row once per salt copy —
    salt_buckets phantom rows — and 'cross' is rejected because a true
    cross join has no key: joining on [key, _salt] would silently
    degenerate it to an inner join.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "leftsemi",
               "left_semi", "semi", "leftanti", "left_anti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — an unmatched right "
            f"row would be replicated salt_buckets times; use one of "
            f"{sorted(allowed)}"
        )
    # pmod, not abs(...)%: abs(Long.MIN_VALUE) stays negative in the
    # JVM, and a negative salt matches no exploded right copy (the row
    # would silently drop on inner / null-extend on left).
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt_buckets)
    ).alias("_salt")
    salted_left = left.withColumn("_salt", salt)
    exploded_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    out = salted_left.join(exploded_right, [key, "_salt"], how)
    return out.drop("_salt")


def _default_partitions(df: DataFrame) -> int:
    """Range-partition count for the global-rank devices: the larger
    of 2x the cluster's core-derived parallelism and the user-tuned
    `spark.sql.shuffle.partitions`.  On a big cluster the shuffle-
    partition conf is the knob operators already size proportionally
    to data volume (the same setting bounds every other shuffle's
    per-task state), so honoring it keeps the device's per-task sort
    at the cluster's intended granularity instead of pinning it to
    core count; locally the two agree.  A per-partition slice that
    still exceeds memory spills through ExternalSorter — slow but
    correct — which is strictly better than the single-task plan the
    device replaces."""
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism * 2
    try:
        shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        shuffle = 0  # e.g. "auto" under some AQE configs
    return max(cores, shuffle)


def _range_ranked(df: DataFrame, order_cols: list, partitions: int | None):
    """Shared first half of the global-rank device: range-partition on
    the order columns, rank locally, and compute the per-partition
    cumulative offsets as a `partitions`-row broadcastable frame.

    Returns (local, offs): `local` carries `_pid` (range-partition id)
    and `_lrn` (rank within the partition under `order_cols`); `offs`
    carries one row per non-empty partition with `_off` (rows in all
    earlier partitions) and `_n` (total rows).  The offset window runs
    over AT MOST `partitions` count rows — bounded metadata, never
    data — which is what makes the device safe where a bare
    `Window.orderBy(...)` (one task sorting the whole relation) is
    not.  The `_pid` order column doubles as the plan-sweep sentinel:
    tests/test_plan_sweep.py exempts unpartitioned window nodes that
    order on `_pid` because they can only be this bounded pass.
    """
    from pyspark.sql import Window

    if partitions is None:
        partitions = _default_partitions(df)
    keyed = df.repartitionByRange(partitions, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("_pid").orderBy(*order_cols)
    local = keyed.withColumn("_lrn", F.row_number().over(w_local))
    counts = local.groupBy("_pid").agg(F.count("*").alias("_c"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.select(
        "_pid",
        F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_c").over(Window.orderBy("_pid").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )).alias("_n"),
    )
    return local, offs


def global_row_number(
    df: DataFrame,
    order_cols: list,
    rn_col: str = "rn",
    partitions: int | None = None,
) -> DataFrame:
    """Exact `row_number() OVER (ORDER BY ...)` WITHOUT the
    single-partition sort.  The bare window form funnels the whole
    relation through ONE task (Exchange SinglePartition -> Sort ->
    Window) — fine at test scale, a stall-then-OOM at 100 TB.  This
    computes the identical rank distributedly: range-partition on the
    order columns, rank locally (~n/partitions rows per task), add the
    broadcast cumulative count of earlier partitions.

    Exact-parity caveat shared with the window form: ranks are unique
    only when `order_cols` is a total (unique) order; rows tied on the
    FULL key get arbitrary relative rank in either formulation.

    At 100 TB: 2 bounded shuffles (range + pid-hash for the counts)
    and a `partitions`-row broadcast — no stage holds more than
    ~n/partitions rows.
    """
    local, offs = _range_ranked(df, order_cols, partitions)
    return (
        local.join(F.broadcast(offs), "_pid")
        .withColumn(rn_col, (F.col("_lrn") + F.col("_off")).cast("long"))
        .drop("_pid", "_lrn", "_off", "_n")
    )


def grouped_global_row_number(
    df: DataFrame,
    group_cols: list,
    order_cols: list,
    rn_col: str = "rn",
    partitions: int | None = None,
) -> DataFrame:
    """Exact `row_number() OVER (PARTITION BY group_cols ORDER BY
    order_cols)` for LOW-CARDINALITY groups whose per-group size is
    data-proportional — the shape where the plain partitioned window
    is as dangerous as an unpartitioned one: with 10 strata over 10^10
    documents, each window task holds 10^9 rows.

    Same decomposition as global_row_number, but the range partition
    is on the ORDER columns alone (each task holds ~n/partitions rows
    of ALL groups interleaved), the local rank is within (_pid, group),
    and the broadcast offsets frame carries one row per non-empty
    (_pid, group) pair — at most `partitions * |groups|` rows, bounded
    metadata whenever the group count is (deciles, languages, arms).
    The offsets window is PARTITIONED by the group columns ordering on
    `_pid`, so no unpartitioned window node appears at all.

    Exact-parity caveat shared with the window form: ranks are unique
    only when order_cols is a total order within each group.
    `group_cols` must be plain column NAMES (they key the offsets
    join); order_cols may be arbitrary sort expressions.
    """
    from pyspark.sql import Window

    if partitions is None:
        partitions = _default_partitions(df)
    keyed = df.repartitionByRange(partitions, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("_pid", *group_cols).orderBy(*order_cols)
    local = keyed.withColumn("_lrn", F.row_number().over(w_local))
    counts = keyed.groupBy("_pid", *group_cols).agg(F.count("*").alias("_c"))
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = counts.select(
        "_pid",
        *group_cols,
        F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off"),
    )
    return (
        local.join(F.broadcast(offs), ["_pid", *group_cols])
        .withColumn(rn_col, (F.col("_lrn") + F.col("_off")).cast("long"))
        .drop("_pid", "_lrn", "_off")
    )


def global_cumsum(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    cum_col: str = "cum",
    partitions: int | None = None,
) -> DataFrame:
    """Exact running `sum(value) OVER (ORDER BY ... ROWS UNBOUNDED
    PRECEDING)` without the single-partition sort — the same
    decomposition as global_row_number but carrying per-partition
    VALUE totals instead of row counts: range-partition on the order
    columns, local running sum per partition, add the broadcast sum of
    all earlier partitions' totals.

    Ties on a non-total `order_cols` are frame-sensitive in the window
    form too (ROWS frames split ties arbitrarily); pass a total order
    for engine-exact parity.  The value column must be an
    overflow-safe type for a FULL-relation sum (cast to long/decimal
    upstream) — the device sums every row's value into `_n`-like
    partition totals exactly like the window form would.
    """
    from pyspark.sql import Window

    if partitions is None:
        partitions = _default_partitions(df)
    keyed = df.repartitionByRange(partitions, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = keyed.withColumn("_lcum", F.sum(value_col).over(w_local))
    totals = local.groupBy("_pid").agg(F.sum(value_col).alias("_t"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = totals.select(
        "_pid", F.coalesce(F.sum("_t").over(w_off), F.lit(0)).alias("_voff")
    )
    return (
        local.join(F.broadcast(offs), "_pid")
        .withColumn(cum_col, F.col("_lcum") + F.col("_voff"))
        .drop("_pid", "_lcum", "_voff")
    )


def global_ntile(
    df: DataFrame,
    n_buckets: int,
    order_cols: list,
    bucket_col: str = "bucket",
    partitions: int | None = None,
) -> DataFrame:
    """Exact NTILE over a global order WITHOUT the single-partition
    sort.  `ntile(k) OVER (ORDER BY ...)` plans as one task sorting
    the whole table — 459 s / exponent 1.3 for 60M rows in the r12
    sf10 smoke (the E203 grid rollup's only super-linear stage).  This
    computes the identical bucket number distributedly:

    1. repartitionByRange on the order columns — non-overlapping,
       ascending ranges per partition id (boundary placement does not
       affect correctness, only balance);
    2. per-partition row_number (each task sorts ~n/partitions rows);
    3. global rank = local rank + the cumulative count of earlier
       partitions (a `partitions`-row broadcast);
    4. the SQL-standard NTILE formula on the rank: with q = n div k,
       rem = n mod k, the first rem buckets hold q+1 rows —
       bucket(r) = (r-1) div (q+1) + 1          for r <= rem*(q+1)
                   rem + (r-1-rem*(q+1)) div q + 1   otherwise.

    Exact-parity caveat shared with the window form: ranks are unique
    only when `order_cols` is a total (unique) order; rows tied on the
    FULL key get arbitrary relative rank in either formulation.

    At 100 TB this is 2 bounded shuffles (range + pid-hash) and a
    `partitions`-row broadcast — no stage ever holds more than
    ~n/partitions rows."""
    local, offs = _range_ranked(df, order_cols, partitions)

    def intdiv(a, b):
        # exact for nonnegative longs: (a - a mod b) is a multiple of
        # b, and an integer-valued double quotient <= 2^53 is exact —
        # a bare double divide can round a/b up across a bucket edge
        return ((a - F.pmod(a, b)) / b).cast("long")

    r = F.col("_lrn") + F.col("_off")
    k = F.lit(n_buckets)
    q = intdiv(F.col("_n"), k)
    rem = F.col("_n") % k
    # q == 0 (n < k) makes the otherwise-branch divisor zero, but the
    # branch is unreachable then (r <= rem*(q+1) = n always holds);
    # greatest(q, 1) keeps ANSI mode from raising on the dead branch.
    bucket = F.when(
        r <= rem * (q + 1), intdiv(r - 1, q + 1) + 1
    ).otherwise(rem + intdiv(r - 1 - rem * (q + 1), F.greatest(q, F.lit(1))) + 1)
    return (
        local.join(F.broadcast(offs), "_pid")
        .withColumn(bucket_col, bucket.cast("int"))
        .drop("_pid", "_lrn", "_off", "_n")
    )
