"""Broadcast-gate degradation: the same queries, same answers, zero broadcasts.

The `_bc` size gate (plans/relational.py) promises that at 100 TB — where
dims outgrow the broadcast limit — every hinted join silently degrades to a
stats/AQE shuffle join with identical results.  This test FORCES that regime
at test scale (gate reports every table as huge + autoBroadcastJoinThreshold
off) and asserts (a) the plans really contain no broadcast joins and (b) the
results still hash-match the DuckDB oracle.  Without this, the degradation
path is a docstring claim that no test has ever executed.
"""

from __future__ import annotations

import pytest

from kafka_flow_spark.plans.registry import all_oracles, all_queries
from tests.conftest import SF_SMALL
from tests.oracle import compare, run_oracle

# Multi-join queries whose plans lean on _bc hints at test scale.
GATED = [
    "q3_shipping_priority",
    "q5_region_revenue",
    "q7_volume_shipping",
    "q9_product_profit",
]


@pytest.fixture()
def no_broadcast_regime(spark, monkeypatch):
    import pyspark.sql.functions as PF

    import kafka_flow_spark.plans.relational as R

    # tpch.py imports _bc from relational, so one patch covers both modules;
    # fixed-cardinality dims (nation/region) are hinted with F.broadcast
    # directly — neutralize that too so EVERY join must run as a shuffle join.
    monkeypatch.setattr(R, "table_bytes", lambda *a, **k: 1 << 60, raising=True)
    monkeypatch.setattr(PF, "broadcast", lambda df: df, raising=True)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    if old_aqe is None:
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    else:
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)


@pytest.mark.parametrize("name", GATED)
def test_shuffle_join_fallback_matches_oracle(no_broadcast_regime, name):
    spark = no_broadcast_regime
    df = all_queries()[name](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan, f"{name}: broadcast survived the gate"
    assert "BroadcastNestedLoopJoin" not in plan
    cols, rows = run_oracle(all_oracles()[name], SF_SMALL)
    problems = compare(df, cols, rows)
    assert not problems, f"{name} (shuffle-join regime): " + "; ".join(problems)
