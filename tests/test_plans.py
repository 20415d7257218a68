"""Physical-plan assertions — the 100 TB posture, locked in as tests.

These don't check results (the oracle does); they check that Catalyst
produces the plan shape that survives a 1000-executor scale-up:
filters pushed to the scan, columns pruned, small dims broadcast,
top-k as TakeOrderedAndProject, the flagship in one shuffle, and no
accidental cartesian joins in the pairwise operators.
"""

from __future__ import annotations

import pytest

import iceberg_aws_event_based_table_management_spark as engine


@pytest.fixture(scope="module")
def qmap():
    engine.load_all_queries()
    return engine.query_map()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_filter_pushdown_reaches_scan(spark, sf_dir, qmap):
    plan = _formatted(qmap["scan_pushdown_filter"](spark, sf_dir))
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_quantity" in plan


def test_projection_prunes_columns(spark, sf_dir, qmap):
    plan = _plan(qmap["scan_projection"](spark, sf_dir))
    scan_line = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "l_orderkey" in scan_line and "l_extendedprice" in scan_line
    assert "l_shipdate" not in scan_line, "scan reads columns the query never uses"


def test_dim_join_broadcasts(spark, sf_dir, qmap):
    plan = _plan(qmap["join_inner_orders_customer"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    plan2 = _plan(qmap["join_broadcast_nation_region"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan2


def test_topk_avoids_global_sort(spark, sf_dir, qmap):
    plan = _plan(qmap["topk_orders_by_price"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_flagship_single_shuffle(spark, sf_dir, qmap):
    """decide_optimize: both windows + the aggregation must share one
    hash exchange on table_name."""
    plan = _plan(qmap["should_optimize_decision"](spark, sf_dir))
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"expected 1 shuffle, plan has {n_exchanges}:\n{plan}"


def test_pairwise_ops_never_cartesian(spark, sf_dir, qmap):
    for name in ("similarity_threshold_pairs", "dedup_ngram_jaccard", "topk_per_group"):
        plan = _plan(qmap[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, f"{name} went cartesian"


def test_range_join_broadcasts_band_side(spark, sf_dir, qmap):
    """Non-equi join against the constant-size band table must be a
    broadcast nested loop (small side broadcast), never a cartesian
    shuffle."""
    plan = _plan(qmap["join_range_events_windows"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_bucketed_join_needs_no_shuffle(spark, sf_dir, tmp_path):
    """Bucketing both sides of a recurring join on the join key makes
    the join shuffle-free — the 100 TB move for repeated fact-dim
    joins: pay the partitioned write once, skip the exchange on every
    subsequent join.  Locked in: the bucketed join plan must contain
    NO hash exchange; the same join unbucketed must contain some."""
    from iceberg_aws_event_based_table_management_spark import io as eio

    orders = eio.table(spark, sf_dir, "orders")
    cust = eio.table(spark, sf_dir, "customer")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    (orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", str(tmp_path / "b_orders")).saveAsTable("b_orders"))
    (cust.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", str(tmp_path / "b_customer")).saveAsTable("b_customer"))
    # force the shuffle-join path so the assertion is about bucketing,
    # not about AQE choosing broadcast on toy-sized inputs
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bo, bc = spark.table("b_orders"), spark.table("b_customer")
        joined = bo.join(bc, bo.o_custkey == bc.c_custkey).groupBy("c_mktsegment").count()
        joined.write.format("noop").mode("overwrite").save()
        plan = _plan(joined)
        assert "Bucketed: true" in plan
        assert "SortMergeJoin" in plan
        join_section = plan.split("HashAggregate")[-1]  # below the agg: the join + scans
        assert "Exchange" not in join_section, f"bucketed join still shuffles:\n{plan}"
        # control: the same join over the raw parquet must shuffle both sides
        plain = orders.join(cust, orders.o_custkey == cust.c_custkey).groupBy(
            "c_mktsegment"
        ).count()
        assert _plan(plain).count("Exchange hashpartitioning") >= 2
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_merge_is_single_shuffle_join(spark, sf_dir, qmap):
    # MERGE = one full-outer SortMergeJoin on the key; never a
    # cartesian/nested-loop, never more than one join for the upsert.
    from iceberg_aws_event_based_table_management_spark import io
    from iceberg_aws_event_based_table_management_spark.operators.lifecycle import merge_upsert
    from pyspark.sql import functions as F

    orders = io.table(spark, sf_dir, "orders")
    src = orders.filter(F.col("o_orderkey") % 7 == 0)
    plan = _plan(merge_upsert(orders, src, keys=["o_orderkey"], update_cols=["o_totalprice"]))
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") == 1


def test_orphan_files_is_anti_join(spark, sf_dir, qmap):
    plan = _plan(qmap["maintenance_orphan_files"](spark, sf_dir))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_knn_join_shuffles_only_local_winners(spark, sf_dir, qmap):
    # The GEMM scorer must emit local top-k BEFORE the exchange: the
    # only wide shuffle in the plan is the final per-query rank window.
    plan = _plan(qmap["similarity_knn_join"](spark, sf_dir))
    assert "MapInPandas" in plan
    pre, _, post = plan.partition("MapInPandas")
    # exactly one hash exchange downstream (the rank window), none upstream
    assert pre.count("Exchange hashpartitioning") == 1  # plan prints top-down: window above scorer
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_join_family_broadcasts_dim_side(spark, sf_dir, qmap):
    """Outer/semi/anti joins against the customer dim must broadcast
    the small side and never shuffle either input — at 100 TB the fact
    side streams map-side through the broadcast join."""
    for name in (
        "join_outer_customer_orders",
        "join_semi_customers_with_orders",
        "join_anti_customers_without_orders",
    ):
        plan = _plan(qmap[name](spark, sf_dir))
        assert "BroadcastHashJoin" in plan, f"{name} lost the broadcast"
        assert "CartesianProduct" not in plan, f"{name} went cartesian"
        assert plan.count("Exchange hashpartitioning") == 0, f"{name} shuffles:\n{plan}"


def test_asof_join_single_shuffle(spark, sf_dir, qmap):
    """The as-of join resolves with one hash exchange (the per-key
    latest-event reduction), not a shuffle per stage."""
    plan = _plan(qmap["join_asof_latest_snapshot"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_scalar_and_text_suites_are_map_side(spark, sf_dir, qmap):
    """Per-row function suites must stay in the scan stage: zero
    shuffles, zero Python UDFs — pure codegen'd projections (plus at
    most a broadcast for a dim)."""
    for name in (
        "scalar_string_suite",
        "scalar_datetime_suite",
        "scalar_math_suite",
        "text_token_stats",
        "text_pii_redact",
        "text_repetition_stats",
        "text_heuristic_filter",
        "text_chunk_overlap",
        "embedding_normalize_quantize",
    ):
        plan = _plan(qmap[name](spark, sf_dir))
        assert plan.count("Exchange hashpartitioning") == 0, f"{name} shuffles:\n{plan}"
        assert "BatchEvalPython" not in plan, f"{name} fell off codegen into Python"


def test_rag_pipeline_single_shuffle_no_explode(spark, sf_dir, qmap):
    """pipeline_rag_corpus computes chunk accounting as a map-side fold:
    exactly ONE exchange (the per-source agg), no generator node, no
    count-distinct Expand."""
    plan = _plan(qmap["pipeline_rag_corpus"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Generate" not in plan, plan
    assert "Expand" not in plan, plan


def test_histogram_buckets_map_side_single_agg(spark, sf_dir, qmap):
    """corpus_length_histogram buckets map-side (no min/max pre-pass =
    no extra job/exchange): one agg exchange, nothing else."""
    plan = _plan(qmap["corpus_length_histogram"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_profiler_single_aggregation_job(spark, sf_dir, qmap):
    """profile_table_stats profiles every column in ONE aggregation
    (single scan, single exchange) — not a job per column."""
    plan = _plan(qmap["profile_table_stats"](spark, sf_dir))
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Exchange SinglePartition") == 1, plan


def test_fk_audit_no_cartesian_all_branches(spark, sf_dir, qmap):
    """audit_referential_integrity: four independent left-join branches,
    no cartesian products, dims distinct-projected before joining."""
    plan = _plan(qmap["audit_referential_integrity"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert plan.count("Union") >= 1, plan


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    # Hive-style partitioned sink + filter on the partition column:
    # the read plan must prune to one partition directory (the scan's
    # PartitionFilters), not filter post-scan — this is what makes
    # date/flag-partitioned 100 TB tables scannable.
    from iceberg_aws_event_based_table_management_spark import io

    li = io.table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    path = str(tmp_path / "li_part")
    li.write.partitionBy("l_returnflag").mode("overwrite").parquet(path)
    back = spark.read.parquet(path).filter("l_returnflag = 'R'")
    plan = _formatted(back)
    assert "PartitionFilters: [isnotnull(l_returnflag" in plan
    n_all = li.count()
    n_r = back.count()
    assert 0 < n_r < n_all


def test_pipeline_ext_plan_shapes(spark, sf_dir, qmap):
    """E18-E22 at 100 TB: eval/vocab sides broadcast, top-k never
    global-sorts, and the shard ranker moves metadata columns only."""
    # contamination: eval shingles broadcast; the corpus side never
    # participates in a cartesian or a sort-merge against the eval set
    plan = _plan(qmap["text_contamination_eval_overlap"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # vocabulary top-k: local heaps + single reduce, not a global sort
    plan = _plan(qmap["corpus_token_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    # tf-idf: df (vocabulary) side broadcast into the tf table
    plan = _plan(qmap["tfidf_top_terms"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # shard ranker: the one global sort ranks (n_chars, doc_id) pairs;
    # the text column must never reach the scan output
    plan = _plan(qmap["shard_assignment_balanced"](spark, sf_dir))
    scan_line = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "text" not in scan_line, "shard ranker scans document text"
    # stratified sample: per-stratum windows — no global range partition
    plan = _plan(qmap["sample_stratified_by_lang"](spark, sf_dir))
    assert "rangepartitioning" not in plan.lower() or "lang" in plan


def test_pipeline_ext2_plan_shapes(spark, sf_dir, qmap):
    """E50-E55 at 100 TB: centroids/bit-sets broadcast, argmin stays a
    partial agg, no op goes cartesian on the corpus side."""
    # k-means: the k-row centroid side broadcasts (explicit hint) and
    # the per-vector argmin is an aggregate, not a window sort
    plan = _plan(qmap["kmeans_assign_step"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # bloom: the bounded bit set broadcasts into the probe side
    plan = _plan(qmap["bloom_membership_audit"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # pair counts: top-k behind a total order, no global sort
    plan = _plan(qmap["vocab_pair_merge_counts"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    # bucketing: single aggregation, no join anywhere
    plan = _plan(qmap["seqlen_bucket_padding"](spark, sf_dir))
    assert "Join" not in plan
    # boilerplate: doc-frequency join stays on the shingle key — the
    # document text never reaches the shingle-join scan output
    plan = _plan(qmap["text_boilerplate_ngrams"](spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_pipeline_ext2_more_plan_shapes(spark, sf_dir, qmap):
    """E56-E59: routing and drift stay join-light; dedup accounting
    reuses the dedup window shape; no cartesian anywhere."""
    # quarantine routing: map-side signals + one bounded agg, no join
    plan = _plan(qmap["route_quarantine"](spark, sf_dir))
    assert "Join" not in plan
    # term drift: word-key join only, totals broadcast, top-k ordered
    plan = _plan(qmap["corpus_term_drift"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    # dedup savings: a window over the content hash, no self-join
    plan = _plan(qmap["dedup_token_savings"](spark, sf_dir))
    assert "Window" in plan
    assert plan.count("FileScan parquet") == 1, "documents scanned more than once"
    # decile sampling: per-lang window, no global range partition
    plan = _plan(qmap["sample_quality_deciles"](spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_funnel_runs_on_one_exchange(spark, sf_dir, qmap):
    """E72's whole funnel — two stacked running-min windows, the
    per-user agg, and the final rollup — must plan exactly ONE data
    exchange and ONE sort: the windows share a (user_id; ts,event_id)
    sort and everything downstream rides that partitioning."""
    plan = _plan(qmap["event_funnel_conversion"](spark, sf_dir))
    n_ex = plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )
    assert n_ex == 1, plan
    assert plan.count("Sort [") == 1, plan


def test_prefix_filter_broadcast_is_size_conditional(spark, sf_dir, qmap, monkeypatch):
    """E116's verification joins broadcast the per-doc shingle-set
    table only while its MEASURED payload fits (r5 verdict #2): with
    the cap pinned to 0 (simulating a 100 TB corpus) no broadcast
    hint may be forced anywhere in the plan — Catalyst is free to
    pick its own build sides from estimates, but the corpus-sized set
    table must not be pinned to one — and the shuffle path must
    return the identical pair set."""
    from iceberg_aws_event_based_table_management_spark.queries import pipeline_ext6

    q = qmap["dedup_prefix_filter_pairs"]

    # Construction must be LAZY (round-7 ADVICE): the broadcast gate
    # reads file metadata, never runs a Spark action — building the
    # DataFrame with actions forbidden must succeed.
    import pyspark.sql as _psql

    def _no_action(self, *a, **k):  # pragma: no cover - should never run
        raise AssertionError("query construction triggered a Spark action")

    for action in ("count", "collect", "take", "head"):
        monkeypatch.setattr(_psql.DataFrame, action, _no_action)
    lazy_df = q(spark, sf_dir)
    monkeypatch.undo()
    assert lazy_df is not None

    baseline = {
        (r.doc_id_a, r.doc_id_b): (r.n_common, r.jaccard) for r in q(spark, sf_dir).collect()
    }
    analyzed = q(spark, sf_dir)._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("strategy=broadcast") == 3, (
        "small corpus: both set joins + the prefix self-join broadcast-hinted"
    )
    # r15 quiet-box re-measurement CONFIRMED the r10 "re-derive,
    # don't materialize" posture for the small branch: a mid-r15
    # session measured a shingle-table checkpoint 0.78x under heavy
    # CPU steal, but the interleaved ABBA reversed hard once steal
    # hit 0% — checkpoint-on 1.62x SLOWER (the materialization
    # barrier serializes the three shingle consumers that otherwise
    # run as independent parallel subtrees;
    # bench_runs/ab_pf_third.json, ab_pf_ckptoff_vs_base.json).  So
    # the small branch must checkpoint NOTHING: no LogicalRDD leaf
    # (a checkpointed table surfaces as one in the analyzed plan).
    assert "LogicalRDD" not in analyzed, (
        "small corpus must re-derive (no checkpoint barriers)"
    )

    monkeypatch.setattr(pipeline_ext6, "_PF_BCAST_MAX_SHINGLES", 0)
    big = q(spark, sf_dir)
    analyzed = big._jdf.queryExecution().analyzed().toString()
    assert "strategy=broadcast" not in analyzed, (
        "oversized set table still force-broadcast"
    )
    # ...and the gate going off must PIN the shuffle plan — for the
    # verification joins AND the prefix self-join — rather than leave
    # Catalyst free to re-broadcast from its own post-window /
    # collect_list estimates, which are unreliable in both directions
    # (measured at x30: Catalyst broadcast the whole corpus-sized
    # prefix table from a bogus-small estimate, the r9 verdict's
    # cliff; the shuffle_hash pin restored the sublinear curve,
    # bench_runs/scale_probe_r10_ppjoin_x30_fixed.json).
    assert analyzed.count("strategy=shuffle_hash") >= 3, (
        "oversized corpus joins not pinned to shuffle"
    )
    # ...and the big branch must KEEP the checkpoints (shingle + prefix
    # tables are multi-consumer; without materialization the ranking
    # chain executes once per alias — the r10 x30 5x cliff).
    assert analyzed.count("LogicalRDD") >= 2, (
        "oversized corpus lost the shingle/prefix localCheckpoints"
    )
    got = {(r.doc_id_a, r.doc_id_b): (r.n_common, r.jaccard) for r in big.collect()}
    assert got == baseline


def test_round8_batch_plan_shapes(spark, sf_dir, qmap):
    """The round-8 operator batch's 100 TB postures, locked:

    - basket_triples_apriori: no cartesian/nested-loop anywhere — the
      A-priori candidate generation is all equi-joins;
    - dedup_pair_span_align: no cartesian — positional matching rides
      pair/shingle equi-joins only;
    - composite_returned_item_revenue: returnflag + orderdate filters
      reach the scans (pushed), top-20 is TakeOrdered, nation side is
      a broadcast;
    - ccf_event_lead_lag / cuped_adjusted_lift: exactly one
      nested-loop each, and it is the INTENDED bounded broadcast
      (8-row lag frame / 1-row global-stats frame);
    - markov_next_event_accuracy: the types²-bounded model joins the
      test stream as a broadcast, never a shuffle."""
    plan = _plan(qmap["basket_triples_apriori"](spark, sf_dir))
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan

    plan = _plan(qmap["dedup_pair_span_align"](spark, sf_dir))
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan

    q10 = qmap["composite_returned_item_revenue"](spark, sf_dir)
    fmt = _formatted(q10)
    plan = _plan(q10)
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastHashJoin") >= 1
    assert "PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)" in fmt
    assert "IsNotNull(o_orderdate)" in fmt

    for name in ("ccf_event_lead_lag", "cuped_adjusted_lift"):
        plan = _plan(qmap[name](spark, sf_dir))
        assert plan.count("BroadcastNestedLoop") == 1, name
        assert "Cartesian" not in plan, name

    plan = _plan(qmap["markov_next_event_accuracy"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_round9_batch_plan_shapes(spark, sf_dir, qmap):
    """The round-9 operator batch's 100 TB postures, locked:

    - partial_corr_controls: ONE aggregation over the scan — no join,
      no window, a single exchange (the pure mergeable-statistics
      shape);
    - price_elasticity_ols: the part dim joins as a BROADCAST hash
      join (never a shuffle of lineitem on partkey);
    - kendall_tau_price_qty: the only nested-loop is the bounded
      grid self-join plus 1-row stat glue — the lineitem scan itself
      never cross-joins;
    - text_yule_k / text_hapax_ratio: no joins at all — two stacked
      rollups;
    - lorenz_curve_points / lift_curve_deciles: the final curve is
      assembled from broadcast glue, with zero Cartesian products;
    - bag_bootstrap_ci: the x100 replica frame enters as a BROADCAST
      nested loop on the scan side (map-side explode), and replica
      means partial-aggregate: no data-sized shuffle."""
    plan = _plan(qmap["partial_corr_controls"](spark, sf_dir))
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("Exchange") == 1

    plan = _plan(qmap["price_elasticity_ols"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan

    plan = _plan(qmap["kendall_tau_price_qty"](spark, sf_dir))
    assert "Cartesian" not in plan

    for name in ("text_yule_k", "text_hapax_ratio"):
        plan = _plan(qmap[name](spark, sf_dir))
        assert "Join" not in plan, name

    for name in ("lorenz_curve_points", "lift_curve_deciles"):
        plan = _plan(qmap[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name

    plan = _plan(qmap["bag_bootstrap_ci"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
