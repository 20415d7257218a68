"""Tier C (composite) — multi-join + aggregation pipelines in the
classic TPC-H shapes (Q3 / Q5 / Q18).  The reference ships arbitrary
SQL to a full spark-sql engine (EmrOnEc2OptimizeDataExecutor.java:88-94,
EMRSparkUtil.java:27,36-40), so representative decision-support join
trees are part of the delegated surface (SURVEY.md SS2-C).

These exercise what the single-operator queries can't: join ORDER
(fact-to-fact vs fact-to-dim), partial aggregation under multi-level
joins, and top-k over an aggregated join tree.  All money sums use the
unscaled-long accumulator (see aggregates.py) so results are exact and
partition-order-independent at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import io
from ..registry import register
from .aggregates import _dec_sum_sql, dec_sum

def _rev():
    return F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)


_REV_SQL = "ROUND(l_extendedprice * (1 - l_discount), 4)"


@register(
    "composite_shipping_priority",
    tier="C",
    oracle=f"""
    SELECT l_orderkey,
           {_dec_sum_sql(_REV_SQL, 4)} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def composite_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, filtered on both fact and dim sides,
    aggregated revenue, top-10.  The customer filter prunes before the
    join (predicate pushdown); the final top-k is
    TakeOrderedAndProject, not a global sort."""
    cust = io.table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = io.table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = io.table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dec_sum(_rev(), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "composite_local_supplier_volume",
    tier="C",
    oracle=f"""
    SELECT n_name, {_dec_sum_sql(_REV_SQL, 4)} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def composite_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join tree with a fact-fact-dim mix and a
    same-nation correlation (c_nationkey = s_nationkey).  nation/region
    are broadcast (tiny forever); customer/supplier joins shuffle on
    their keys and AQE picks broadcast when a side fits."""
    cust = io.table(spark, sf_dir, "customer")
    orders = io.table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = io.table(spark, sf_dir, "lineitem")
    supp = io.table(spark, sf_dir, "supplier")
    nation = io.table(spark, sf_dir, "nation")
    region = io.table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dec_sum(_rev(), 4).alias("revenue"))
    )


@register(
    "composite_large_volume_customers",
    tier="C",
    oracle="""
    WITH big AS (
      SELECT l_orderkey AS okey, CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(FLOOR(l_quantity) AS BIGINT)) > 300
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
    FROM big
    JOIN orders ON o_orderkey = okey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def composite_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate-then-join — the HAVING filter on the
    grouped fact table runs FIRST, so only the few qualifying orders
    ever reach the join (at 100 TB this ordering is the difference
    between joining 10^3 rows and 10^11)."""
    li = io.table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy(F.col("l_orderkey").alias("okey"))
        .agg(F.sum(F.floor("l_quantity").cast("long")).cast("long").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    orders = io.table(spark, sf_dir, "orders")
    cust = io.table(spark, sf_dir, "customer")
    return (
        big.join(orders, F.col("o_orderkey") == F.col("okey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@register(
    "composite_nation_trade_volume",
    tier="C",
    oracle=f"""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           {_dec_sum_sql(_REV_SQL, 4)} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
           OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3'))
    GROUP BY 1, 2, 3
    """,
)
def composite_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations, per
    supplier-nation x customer-nation x ship-year.  Exercises the one
    composite pattern the Q3/Q5/Q18 trio misses — the SAME dimension
    (nation) joined twice under different roles, with a disjunctive
    cross-role predicate.

    Scale shape: both nation joins broadcast (25 rows each, distinct
    aliases so Catalyst treats them as independent builds); the
    nation-pair predicate semi-filters supplier and customer BEFORE
    their fact joins (Catalyst pushes each disjunct's IN-set through
    its own role), so the fact-fact l_orderkey/o_custkey shuffles
    carry only the two nations' rows; the final agg is |pairs| x
    |years| keys — metadata."""
    li = io.table(spark, sf_dir, "lineitem")
    orders = io.table(spark, sf_dir, "orders")
    cust = io.table(spark, sf_dir, "customer")
    supp = io.table(spark, sf_dir, "supplier")
    sn = io.table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = io.table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(dec_sum(_rev(), 4).alias("revenue"))
    )


@register(
    "composite_top_supplier",
    tier="C",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {_dec_sum_sql(_REV_SQL, 4)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, r.total_revenue
    FROM supplier
    JOIN revenue r ON s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def composite_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the revenue 'view' (per-supplier quarter
    revenue) consumed twice — once for its rows, once for its MAX —
    returning EVERY supplier that attains the maximum (ties included,
    which a top-1 LIMIT would silently drop).  The reference's Athena
    path runs views exactly this way (EMRSparkUtil.java:36-40 ships
    arbitrary multi-reference SQL).

    Scale shape: revenue aggregates once and is reused for both
    consumers (the exact dec_sum makes the MAX comparison safe —
    float-summed revenue would make 'equals the max' partition-order-
    dependent); the MAX arrives as a 1-row broadcast; the supplier
    join shuffles only the |suppliers| aggregated rows, never
    lineitem."""
    li = io.table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dec_sum(_rev(), 4).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = io.table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )
