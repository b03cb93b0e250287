"""Every oracle-gated query must hash-match its DuckDB oracle (driver's t2 gate,
mirrored locally at sf0.001 for speed; the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from kafka_flow_spark.plans.registry import all_oracles, all_queries
from tests.conftest import SF_SMALL
from tests.oracle import compare, run_oracle

ORACLES = all_oracles()
QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF_SMALL)
    cols, rows = run_oracle(ORACLES[name], SF_SMALL)
    problems = compare(df, cols, rows)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_runs(spark, name):
    df = QUERIES[name](spark, SF_SMALL)
    assert df.count() >= 0
