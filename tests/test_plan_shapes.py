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
    """The fold machinery is one key-hash shuffle + in-partition sort feeding
    a single Arrow-batched MapInPandas — no per-group dispatch, no Python RDD
    map.  (The registered q_fold_* plans are Window/agg built-ins; the fold
    executor itself is exercised via the *_via_fold differential variants.)"""
    from kafka_flow_spark.plans.events import fold_running_totals_via_fold

    df = fold_running_totals_via_fold(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "hashpartitioning(user_id" in plan  # key co-location shuffle
    assert "Sort [user_id" in plan  # contiguous ordered runs per key
    assert plan.count("Exchange") <= 1  # exactly the key shuffle


def test_fold_registry_plans_are_window_builtins(spark):
    """The registered fold-semantic queries must stay JVM-side Window/agg —
    a Python fold in the registry plan is the 100×-scale bottleneck the
    round-1 verdict flagged."""
    for name in ("q_fold_running_totals", "q_fold_reset_on_error", "q_fold_final_state"):
        plan = plan_of(spark, name)
        assert "MapInPandas" not in plan and "EvalPython" not in plan, name


def test_exists_is_semi_join_not_aggregate_dedup(spark):
    plan = plan_of(spark, "q4_late_order_priority")
    assert "LeftSemi" in plan  # EXISTS stays a semi join — no probe-side dedup
    assert "CartesianProduct" not in plan


def test_promo_share_broadcasts_part_dim(spark):
    plan = plan_of(spark, "q14_promo_revenue_share")
    assert "BroadcastHashJoin" in plan  # fact side never shuffles for the dim


def test_simhash_is_jvm_side_single_aggregate(spark):
    """SimHash must stay md5 + 64 bit-vote aggregates in codegen — no Python
    worker round-trip in a dedup hot path."""
    plan = plan_of(spark, "q_simhash_fingerprints")
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert "HashAggregate" in plan
    assert plan.count("Exchange") <= 1  # one map-side-combinable shuffle


def test_winnowing_is_jvm_side(spark):
    plan = plan_of(spark, "q_winnowing_fingerprints")
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_cosine_matmul_path_is_arrow_batched(spark):
    plan = plan_of(spark, "q_dedup_embedding_cosine")
    assert "MapInPandas" in plan  # BLAS block compute, not per-pair expressions
    assert "CartesianProduct" not in plan


def test_funnel_windows_share_one_exchange(spark):
    """All N conditional-min step windows must ride ONE key exchange — a
    per-step shuffle would multiply funnel cost by its depth."""
    plan = plan_of(spark, "q_funnel_view_click_purchase")
    assert plan.count("Window") == 3
    assert plan.count("Exchange") <= 2  # key exchange (+ the final-agg reuse)


def test_chunk_documents_is_narrow(spark):
    """The chunker must never shuffle the corpus — tokenize, sequence,
    posexplode, slice are all narrow."""
    plan = plan_of(spark, "q_chunk_documents")
    assert "Exchange" not in plan
    assert "Generate" in plan  # the posexplode


def test_resample_window_input_is_bucket_reduced(spark):
    """The fill window must consume bucket survivors (one max_by aggregate
    per (key, bucket)), not raw event volume."""
    plan = plan_of(spark, "q_resample_ffill_hourly")
    assert "max_by" in plan or "maxby" in plan.lower()
    assert plan.count("Window") == 1


# --- round-6 operators -----------------------------------------------------


def test_rolling_stats_is_one_exchange_one_window(spark):
    """The RANGE-frame rolling plan must stay: scan -> ONE exchange on the
    key -> ONE window operator (no join, no second shuffle)."""
    plan = plan_of(spark, "q_rolling_user_value_7d")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") >= 1
    assert "Join" not in plan


def test_dsir_model_join_is_broadcast(spark):
    """The <=4096-row bucket model must broadcast onto the gram stream —
    a shuffle join here would shuffle the whole exploded-gram volume."""
    plan = plan_of(spark, "q_dsir_sample")
    assert "BroadcastHashJoin" in plan
    # top-k select is TakeOrdered, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_mad_outlier_stat_joins_broadcast(spark):
    """Per-group median/MAD tables (|groups| rows) broadcast back onto the
    row stream; both percentile windows run over distinct values only."""
    plan = plan_of(spark, "q_mad_outliers")
    assert plan.count("BroadcastHashJoin") >= 2


def test_table_diff_is_single_full_outer_join(spark):
    plan = plan_of(spark, "q_table_diff")
    assert plan.count("FullOuter") == 1
    assert plan.count("Join") == 1


def test_session_paths_windows_share_one_exchange(spark):
    """Boundary window + cumulative-session window + lead window all
    partition by the same key — ONE corpus exchange (the pair-count agg's
    exchange is over the tiny label-pair domain)."""
    plan = plan_of(spark, "q_session_paths")
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_windowed_drift_reference_is_broadcast(spark):
    plan = plan_of(spark, "q_windowed_drift")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_classifier_is_broadcast_model_plus_one_agg(spark):
    """The hashed-linear classifier must broadcast its <=4096-row weight
    table onto the exploded-token stream (a shuffle join would carry the
    whole token volume) and aggregate once."""
    plan = plan_of(spark, "q_quality_classifier")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cluster_canonical_has_no_cartesian(spark):
    """Survivor selection = score join + ONE max_by aggregate + join-back;
    nothing quadratic may appear regardless of cluster shape."""
    plan = plan_of(spark, "q_cluster_canonical")
    assert "CartesianProduct" not in plan
    assert "max_by" in plan.lower() or "HashAggregate" in plan


def test_knn_hamming_is_topk_pushdown_over_broadcast_codes(spark):
    """The Hamming plan's scale properties: queries broadcast (no shuffle of
    the corpus for the join), quantization below the join (the join reads
    sig projections, embeddings never cross it), and the per-query top-k
    runs as WindowGroupLimit partial+final — the exchange carries at most
    k rows per (query, partition), never the 2M-candidate relation."""
    plan = plan_of(spark, "q_knn_hamming")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert plan.count("WindowGroupLimit") >= 2  # Partial + Final
    assert plan.count("Exchange hashpartitioning") == 1


def test_scd2_shares_one_key_exchange(spark):
    """All three SCD2 windows (boundary lag, run-id running sum, valid_to
    lead) plus the per-run aggregate must reuse ONE hashpartitioning
    exchange on the key — the subset-clustering rule; a second exchange
    would reshuffle event volume."""
    plan = plan_of(spark, "q_scd2_history")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_apply_changes_is_anti_join_plus_union(spark):
    """MERGE = one full-outer diff join + one anti join + union; no
    cartesian, no extra exchanges beyond the key hashes."""
    plan = plan_of(spark, "q_apply_changes")
    assert "CartesianProduct" not in plan
    assert "Union" in plan


def test_random_projection_is_narrow(spark):
    """JL projection is one map-side codegen projection — no shuffle, no
    join, no Python worker."""
    plan = plan_of(spark, "q_random_projection")
    assert "Exchange" not in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_group_trend_is_two_aggregates_no_window(spark):
    """Trend = daily rollup agg + broadcast min-x + one moment aggregate —
    no window, no sort, nothing quadratic."""
    plan = plan_of(spark, "q_user_spend_trend")
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_weighted_reservoir_is_takeordered(spark):
    """The k-smallest-score select must be TakeOrderedAndProject (bounded-k
    partial top-k per partition), never a global sort."""
    plan = plan_of(spark, "q_weighted_reservoir")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_novelty_reference_set_is_broadcast(spark):
    """The reference gram-hash set (post-distinct, tiny vs the corpus gram
    stream) must broadcast — shuffling 100M corpus gram rows for it is the
    failure mode."""
    plan = plan_of(spark, "q_ngram_novelty")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_per_group_reservoir_is_windowgrouplimit(spark):
    plan = plan_of(spark, "q_reservoir_per_lang")
    assert plan.count("WindowGroupLimit") >= 2  # Partial + Final
    assert "Join" not in plan


def test_token_budget_mix_totals_join_no_cartesian(spark):
    plan = plan_of(spark, "q_token_budget_mix")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan or "SortMergeJoin" in plan


def test_interval_overlap_is_hash_join_not_bnlj(spark):
    """The overlap join must plan as a (user, bin)-keyed hash join — a
    BroadcastNestedLoopJoin here is the quadratic trap the operator exists
    to avoid."""
    plan = plan_of(spark, "q_interval_overlap_attribution")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_curation_pipeline_is_one_shuffle(spark):
    """Gate -> exact-dedup survivors -> split, fused: the quality gate is a
    scan projection, the split a map-side hash — the content-hash dedup
    aggregate's ONE exchange must be the whole pipeline's only shuffle."""
    plan = plan_of(spark, "q_curation_pipeline")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
