"""Tier C (part 4) — scalar function family suites (C34-C39).

One query per family, each tied to semantics the reference actually
exercises (string splitting for identifiers, epoch-ms time math,
ceil-division for file counts, map/JSON config handling).  All per-row
expressions — exact across engines, no rounding games except where
noted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import io
from ..registry import register


@register(
    "scalar_string_suite",
    tier="C",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           lower(p_type) AS type_lower,
           substr(p_name, 1, 8) AS name_prefix,
           length(p_name) AS name_len,
           strpos(p_name, 'a') AS first_a,
           regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
           CASE WHEN p_type LIKE 'PROMO%' THEN TRUE ELSE FALSE END AS is_promo,
           concat_ws('|', p_brand, p_type) AS brand_type,
           trim(' ' || p_brand || ' ') AS trimmed,
           reverse(p_brand) AS brand_rev,
           replace(p_name, ' ', '_') AS name_snake
    FROM part
    """,
)
def scalar_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C34: string family — upper/lower/substr/length/instr/regexp/
    startswith/concat_ws/trim/reverse/replace (the ops behind A4
    identifier parsing and A12 prefix selection)."""
    p = io.table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.instr(F.col("p_name"), "a").alias("first_a"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.col("p_type").startswith("PROMO").alias("is_promo"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.concat(F.lit(" "), F.col("p_brand"), F.lit(" "))).alias("trimmed"),
        F.reverse("p_brand").alias("brand_rev"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
    )


@register(
    "scalar_datetime_suite",
    tier="C",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_mon,
           CAST(day(o_orderdate) AS INT) AS order_day,
           epoch_ms(o_orderdate) AS order_epoch_ms,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_epoch_start,
           CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS month_str
    FROM orders
    """,
)
def scalar_datetime_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C35: date/time family — trunc/extract/epoch-ms (the A8 age math,
    unix_millis), interval arithmetic, datediff, formatting."""
    o = io.table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_mon"),
        F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
        # o_orderdate is TIMESTAMP_NTZ (parquet isAdjustedToUTC=false);
        # cast to TIMESTAMP is identity under the UTC session timezone.
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("order_epoch_ms"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit("1995-01-01")))
        .cast("long")
        .alias("days_since_epoch_start"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month_str"),
    )


@register(
    "scalar_math_suite",
    tier="C",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice / 100) AS price_hundreds,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           CAST(ceil(l_extendedprice / 10000) AS BIGINT) AS file_groups,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(power(1 + l_tax, 2) AS DOUBLE) AS tax_sq,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
           CAST(greatest(l_quantity, 25.0) AS DOUBLE) AS qty_hi,
           CAST(least(l_quantity, 25.0) AS DOUBLE) AS qty_lo,
           CAST(sqrt(l_quantity) AS DOUBLE) AS qty_sqrt
    FROM lineitem
    """,
)
def scalar_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C36: math family — incl. the `ceil(bytes/target)` shape that
    sizes binpack output file counts (B1)."""
    li = io.table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") / 100).alias("price_hundreds"),
        F.floor("l_quantity").cast("long").alias("qty_floor"),
        F.ceil(F.col("l_extendedprice") / 10000).cast("long").alias("file_groups"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.pow(1 + F.col("l_tax"), 2).cast("double").alias("tax_sq"),
        (F.col("l_orderkey") % 7).cast("long").alias("key_mod"),
        F.greatest(F.col("l_quantity"), F.lit(25.0)).cast("double").alias("qty_hi"),
        F.least(F.col("l_quantity"), F.lit(25.0)).cast("double").alias("qty_lo"),
        F.sqrt("l_quantity").cast("double").alias("qty_sqrt"),
    )


@register(
    "scalar_array_suite",
    tier="C",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           CAST(embedding[len(embedding)] AS DOUBLE) AS last_val,
           len(list_filter(embedding, x -> x > 0)) AS n_positive,
           CAST(list_sort(embedding)[1] AS DOUBLE) AS min_val,
           CAST(list_sort(embedding)[len(embedding)] AS DOUBLE) AS max_val,
           CAST(embedding[1] + embedding[2] AS DOUBLE) AS head2_sum
    FROM embeddings
    """,
)
def scalar_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C37: array family — size/element_at/filter/sort/slice over the
    embedding column (the A15 map-rendering + D3 dot-product toolkit).
    Float elements are compared directly (no re-accumulation), so the
    check is exact."""
    e = io.table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.element_at(emb, 1).cast("double").alias("first_val"),
        F.element_at(emb, -1).cast("double").alias("last_val"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
        F.array_min(emb).cast("double").alias("min_val"),
        F.array_max(emb).cast("double").alias("max_val"),
        (F.element_at(emb, 1) + F.element_at(emb, 2)).cast("double").alias("head2_sum"),
    )


@register(
    "scalar_map_suite",
    tier="C",
    oracle="""
    WITH kinds AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           string_agg(event_type || ':' || CAST(n AS VARCHAR), ',' ORDER BY event_type) AS kind_counts,
           COUNT(*) AS n_keys,
           MAX(CASE WHEN event_type = 'click' THEN n END) AS click_count
    FROM kinds GROUP BY user_id
    """,
)
def scalar_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C38: map family — build map<string,bigint> of per-user event-kind
    counts, then map_keys/element_at/map_entries (the A11/A12 config-map
    toolkit), rendered sorted for engine-neutral hashing."""
    ev = io.table(spark, sf_dir, "events")
    kinds = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    m = kinds.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("kind_map")
    )
    return m.select(
        "user_id",
        F.array_join(
            F.transform(
                F.map_entries("kind_map"),
                lambda e: F.concat(e["key"], F.lit(":"), e["value"].cast("string")),
            ),
            ",",
        ).alias("kind_counts"),
        F.size(F.map_keys("kind_map")).alias("n_keys"),
        F.element_at(F.col("kind_map"), "click").alias("click_count"),
    )


@register(
    "scalar_json_extract",
    tier="C",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS prop_k_mod,
           CAST(json_extract_string(props, '$.missing') AS BIGINT) AS prop_missing
    FROM events
    """,
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C39: JSON family — get_json_object over the commit-report payload
    analog (`events.props`; CommitReportParser.toJson,
    AwsTableManagementMetricsEvaluator.java:70)."""
    ev = io.table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select(
        "event_id",
        k.alias("prop_k"),
        (k % 10).alias("prop_k_mod"),
        F.get_json_object("props", "$.missing").cast("long").alias("prop_missing"),
    )
