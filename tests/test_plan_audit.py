"""Registry-wide physical-plan audit: scale anti-patterns are banned EVERYWHERE.

test_plan_shapes.py pins positive shapes for specific flagship queries; this
sweep enforces the negative invariants across the ENTIRE registry, so a new
query can't quietly ship with a plan that dies at 100 TB:

- no ``BatchEvalPython`` — row-at-a-time Python UDFs are never acceptable;
  Python is allowed only through Arrow-batched nodes (ArrowEvalPython,
  MapInPandas, FlatMapGroupsInPandas).
- no ``CartesianProduct`` — an un-broadcast cross join is quadratic shuffle
  I/O.  ``BroadcastNestedLoopJoin`` is allowed where one side is a bounded
  probe set (kNN queries broadcast ≤10 query vectors by construction).
"""

from __future__ import annotations

import pytest

from kafka_flow_spark.plans.registry import all_queries
from tests.conftest import SF_SMALL

QUERIES = all_queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_scale_antipatterns(spark, name):
    plan = _plan(QUERIES[name](spark, SF_SMALL))
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in plan — use built-ins or a Pandas UDF"
    )
    assert "CartesianProduct" not in plan, (
        f"{name}: un-broadcast cartesian product — broadcast the bounded side "
        f"or add an equi-join key"
    )
