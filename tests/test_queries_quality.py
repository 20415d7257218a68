"""Quality bounds for rows-only (non-oracle) queries."""

from __future__ import annotations

from pyspark.sql import functions as F

import iceberg_aws_event_based_table_management_spark as engine
from iceberg_aws_event_based_table_management_spark import io


def _q(name):
    engine.load_all_queries()
    return engine.query_map()[name]


def test_approx_distinct_within_rsd(spark, sf_dir):
    approx = {
        r["l_returnflag"]: r["approx_orders"]
        for r in _q("agg_approx_distinct")(spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in io.table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) / n < 0.1, (k, approx[k], n)


def test_stream_ingest_matches_batch_counts(spark, sf_dir):
    stream_counts = {
        r["event_type"]: r["n_events"] for r in _q("stream_events_ingest")(spark, sf_dir).collect()
    }
    batch_counts = {
        r["event_type"]: r["n"]
        for r in io.table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert stream_counts == batch_counts


def test_simhash_is_deterministic_across_runs(spark, sf_dir):
    a = sorted(tuple(r) for r in _q("dedup_simhash_buckets")(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in _q("dedup_simhash_buckets")(spark, sf_dir).collect())
    assert a == b
