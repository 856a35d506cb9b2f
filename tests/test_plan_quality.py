"""Physical-plan regression tests: the scale posture (pushdown,
broadcast, partial aggregation, shuffle discipline) asserted
mechanically so a refactor can't silently regress it."""

from __future__ import annotations

import pytest

from udacity_data_engineering_capstone_project_spark.plans.queries import REGISTRY


def _plan(spark, sf_dir, name: str) -> str:
    return REGISTRY[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushdown_and_partial_agg(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pricing_summary")
    # filter reaches the parquet scan
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # map-side combine before the exchange
    assert "partial_sum" in plan
    # column pruning: unused columns (l_partkey etc.) never read
    assert "l_partkey" not in plan


def test_star_fact_build_broadcasts_all_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "star_schema_fact")
    # every dim join is broadcast-hash; the fact side is never
    # exchange-partitioned for a join
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_left_dim_join_broadcasts(spark, sf_dir):
    # row-preserving left dim join (J3-J8 shape) stays broadcast-hash
    from pyspark.sql import functions as F

    from udacity_data_engineering_capstone_project_spark.sources.readers import read_table

    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    joined = o.join(
        F.broadcast(c), o["o_custkey"] == c["c_custkey"], "left"
    ).select("o_orderkey", "c_name")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan


def test_filter_project_prunes_columns(spark, sf_dir):
    plan = _plan(spark, sf_dir, "filter_project")
    assert "PushedFilters" in plan
    # only 4 columns read (3 projected + filter column)
    scan_line = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "o_comment" not in scan_line and "o_custkey" not in scan_line


def test_ann_topk_no_corpus_shuffle_before_score(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ann_topk")
    # queries broadcast into a nested-loop join; the only exchange is
    # the per-query top-k window partitioned by query_id
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_sessionize_single_shuffle_on_user(spark, sf_dir):
    # batch sessionize is unregistered (streaming twin carries the
    # oracle) but its plan discipline stays pinned here
    from udacity_data_engineering_capstone_project_spark.plans.queries import sessionize

    plan = sessionize(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    # lag + running-sum + final group all reuse the user_id partitioning
    assert plan.count("Exchange hashpartitioning") == 1


def test_window_funcs_single_exchange(spark, sf_dir):
    # both window specs partition by o_custkey -> one hash exchange
    # serves every window function (two sorts, zero extra shuffles)
    plan = _plan(spark, sf_dir, "window_funcs")
    assert plan.count("Exchange hashpartitioning") == 1


def test_text_profile_is_shuffle_free(spark, sf_dir):
    # the merged text tier is a pure projection: no exchange, no join
    plan = _plan(spark, sf_dir, "text_profile")
    assert "Exchange" not in plan and "Join" not in plan


def test_argmax_join_works_without_broadcast(spark, sf_dir):
    # argmax_join must not force-broadcast the per-group max table
    # (one row per group, unbounded at scale). With auto-broadcast
    # disabled the plan must fall back to a shuffle join AND still
    # produce the tie-preserving result.
    thresholds = {
        "spark.sql.autoBroadcastJoinThreshold": None,
        "spark.sql.adaptive.autoBroadcastJoinThreshold": None,
    }
    for k in thresholds:
        thresholds[k] = spark.conf.get(k, None)
        spark.conf.set(k, "-1")
    try:
        df = REGISTRY["argmax_ties"].fn(spark, sf_dir)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        from tests.oracle_utils import compare_frames, run_oracle

        compare_frames(
            df.toPandas(),
            run_oracle(REGISTRY["argmax_ties"].oracle, sf_dir),
            "argmax_ties_no_broadcast",
        )
    finally:
        for k, v in thresholds.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_minhash_signature_stage_is_parallel(spark, sf_dir):
    from udacity_data_engineering_capstone_project_spark.operators.dedup import (
        minhash_signatures,
    )
    from udacity_data_engineering_capstone_project_spark.sources.readers import read_table

    sigs = minhash_signatures(read_table(spark, sf_dir, "documents"), "doc_id", "text")
    # the CPU-heavy hash stage must not run on a single input split
    assert sigs.rdd.getNumPartitions() > 1


@pytest.mark.parametrize(
    "name", ["pricing_summary", "analyst_top_segments", "date_parts_agg"]
)
def test_aggregations_are_codegen(spark, sf_dir, name):
    # AQE finalizes the plan only on execution; materialize first.
    df = REGISTRY[name].fn(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark WholeStageCodegen stages in the final plan
    assert "*(1)" in plan, f"{name}: aggregation fell out of codegen:\n{plan[:800]}"


def test_contamination_benchmark_side_broadcasts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "contamination_check")
    # the benchmark n-gram set (bounded) broadcasts; the unbounded
    # corpus side must NOT be exchange-partitioned for the join — its
    # only shuffle is the final per-doc count
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # bench distinct + final agg


def test_corpus_sample_partial_topk_before_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "corpus_sample")
    # Spark 4's WindowGroupLimit prunes each partition to the quota
    # BEFORE the exchange — per-source shuffle volume is O(quota), not
    # O(rows); the md5-sample predicate is a row-local filter (no join,
    # no RNG partitioning dependency)
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "md5" in plan


def test_repetition_signals_partial_aggregation(spark, sf_dir):
    plan = _plan(spark, sf_dir, "repetition_signals")
    # both explode->count passes combine map-side before shuffling
    assert "partial_count" in plan or "partial_sum" in plan
    assert "CartesianProduct" not in plan


def test_bm25_filters_terms_before_aggregation(spark, sf_dir):
    plan = _plan(spark, sf_dir, "bm25_retrieval")
    # the query-term IN-filter must run before any aggregation so only
    # query-term rows shuffle on the tf branch
    assert "term#" in plan and "INSET" in plan or "term" in plan
    assert "SortMergeJoin" not in plan


def test_profile_is_single_scan_per_table(spark, sf_dir):
    # profiling 3 orders columns must read orders ONCE for the profile
    # (plus once for its rows:<table> count) — k-column profiling with
    # k scans would read 100 TB k times
    plan = _plan(spark, sf_dir, "data_quality_profile")
    assert plan.count("orders.parquet") == 2
