"""Tier C (part 3) — sorts, limits, top-k, set operations (C28-C33).

The driver compares results order-insensitively, so sort queries
materialize their order as an explicit rank column; every limit is
preceded by a total order (SURVEY SS5.1 tiebreak rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import io
from ..registry import register


@register(
    "sort_global_topcustomers",
    tier="C",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal,
           ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey) AS wealth_rank
    FROM customer
    """,
)
def sort_global_topcustomers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C28: global sort (range-partitioned in Spark) — order captured as
    a rank column so the order-insensitive hash still checks it.
    NOTE: the unpartitioned window is the *verification* form; the sort
    itself (orderBy) distributes fine via range partitioning."""
    c = io.table(spark, sf_dir, "customer")
    w = Window.orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        c.orderBy(F.desc("c_acctbal"), "c_custkey")
        .select("c_custkey", "c_name", "c_acctbal")
        .withColumn("wealth_rank", F.row_number().over(w))
    )


@register(
    "topk_orders_by_price",
    tier="C",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def topk_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C29: top-k (TakeOrderedAndProject — per-partition heaps then a
    driver-side merge of k*partitions rows, never a full global sort)."""
    o = io.table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(100)
    )


@register(
    "topk_per_group",
    tier="C",
    oracle="""
    SELECT * FROM (
      SELECT c.c_nationkey, c.c_custkey, c.c_name, c.c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c.c_nationkey ORDER BY c.c_acctbal DESC, c.c_custkey) AS rk
      FROM customer c
    ) WHERE rk <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C30: per-group top-k via window rank + filter (Spark pushes the
    rank<=k limit into the window sort as a group-limit)."""
    c = io.table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        c.select("c_nationkey", "c_custkey", "c_name", "c_acctbal")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )


@register(
    "setop_union_events",
    tier="C",
    oracle="""
    SELECT user_id, event_id FROM events WHERE event_type = 'purchase'
    UNION
    SELECT user_id, event_id FROM events WHERE value > 150
    """,
)
def setop_union_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C31: union distinct of two event subsets (overlapping, so the
    distinct matters)."""
    ev = io.table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id", "event_id")
    b = ev.filter(F.col("value") > 150).select("user_id", "event_id")
    return a.unionByName(b).distinct()


@register(
    "setop_intersect_keys",
    tier="C",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def setop_intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C32: intersect — customers holding both open and finished orders."""
    o = io.table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b)


@register(
    "setop_except_keys",
    tier="C",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def setop_except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C33: except (set semantics — `subtract`; `exceptAll` is the
    multiset variant and would keep keys whose 'O' count merely exceeds
    their 'F' count)."""
    o = io.table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.subtract(b)
