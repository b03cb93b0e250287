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

from kafka_flow_spark.plans.registry import all_oracles, all_queries
from tests.conftest import SF_SMALL

QUERIES = all_queries()
ORACLES = all_oracles()


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


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_outputs_are_scalar(spark, name):
    """Every oracle-gated query must emit SCALAR top-level columns only.

    The driver's correctness harness canonicalizes results by sorting and
    hashing through pandas, which dies with ``unhashable type: 'list'`` on
    array/map cells and has no stable ordering for structs — q_pq_codes
    shipped an ``array<int>`` column in r6 and its (value-exact) driver row
    read as an ERROR.  Flatten containers to strings (array_join) or explode
    to rows before returning.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    schema = QUERIES[name](spark, SF_SMALL).schema
    bad = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name}: oracle-gated output has non-scalar column(s) {bad} — the "
        f"driver canonicalizer can only hash scalars; array_join or explode"
    )
