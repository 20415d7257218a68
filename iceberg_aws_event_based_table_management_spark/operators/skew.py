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
