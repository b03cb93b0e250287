"""Physical-plan regression guards: the properties that make these plans
survive 100× scale-ups (broadcast dims, scan pushdown, bounded shuffles) are
asserted here so a refactor can't silently lose them."""

from __future__ import annotations

import pytest

from kafka_flow_spark.plans.registry import all_queries
from tests.conftest import SF_SMALL

QUERIES = all_queries()


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_SMALL)
    return df._jdf.queryExecution().executedPlan().toString()


def test_dimension_joins_broadcast(spark):
    for name in ("q3_shipping_priority", "q5_region_revenue", "q_broadcast_brand_qty"):
        plan = plan_of(spark, name)
        assert "BroadcastHashJoin" in plan, f"{name} lost its broadcast join"
        assert "CartesianProduct" not in plan, f"{name} degenerated to a cross join"


def test_filters_reach_parquet_scan(spark):
    plan = plan_of(spark, "q3_shipping_priority")
    assert "PushedFilters: [" in plan
    # the segment filter must be in the scan, not only a post-scan Filter node
    assert "EqualTo(c_mktsegment,BUILDING)" in plan


def test_column_pruning_in_scan(spark):
    plan = plan_of(spark, "q2_filter_projection")
    # lineitem has 7+ columns; the scan must read only what the query needs
    scan_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_schemas and all("l_comment" not in s for s in scan_schemas)


def test_minhash_pipeline_is_single_aggregate_shape(spark):
    """The signature pipeline must stay: window over (doc_id) + one hash
    aggregate — not k HOF transforms (the 64× regression this guards)."""
    from kafka_flow_spark.operators.dedup import minhash_signatures
    from kafka_flow_spark.tables import load

    df = minhash_signatures(load(spark, SF_SMALL, "documents"), "doc_id", "text")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrayMin" not in plan  # the old per-row shape
    assert plan.count("Exchange") <= 2  # window shuffle (+AQE artifacts at most)


def test_asof_join_has_no_pair_explosion(spark):
    plan = plan_of(spark, "q_asof_purchase_click")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan  # the union+carry shape


def test_keyed_fold_is_sort_merge_streamed(spark):
    """The fold is one key-hash shuffle + in-partition sort feeding a single
    Arrow-batched MapInPandas — no per-group dispatch, no Python RDD map."""
    plan = plan_of(spark, "q_fold_running_totals")
    assert "MapInPandas" in plan
    assert "hashpartitioning(user_id" in plan  # key co-location shuffle
    assert "Sort [user_id" in plan  # contiguous ordered runs per key
    assert plan.count("Exchange") <= 1  # exactly the key shuffle


def test_exists_is_semi_join_not_aggregate_dedup(spark):
    plan = plan_of(spark, "q4_late_order_priority")
    assert "LeftSemi" in plan  # EXISTS stays a semi join — no probe-side dedup
    assert "CartesianProduct" not in plan


def test_promo_share_broadcasts_part_dim(spark):
    plan = plan_of(spark, "q14_promo_revenue_share")
    assert "BroadcastHashJoin" in plan  # fact side never shuffles for the dim


def test_cosine_matmul_path_is_arrow_batched(spark):
    plan = plan_of(spark, "q_dedup_embedding_cosine")
    assert "MapInPandas" in plan  # BLAS block compute, not per-pair expressions
    assert "CartesianProduct" not in plan
