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


def test_no_oracle_emits_decimal_columns():
    """The driver's hasher canonicalizes DuckDB DECIMAL/HUGEINT differently
    from Spark's BIGINT/DOUBLE (exactly the two r3 hash-fails: integer-SUM
    columns typed decimal128(38,0)), while the local mirror's fetchall()
    coerces both to Python numbers and hides the mismatch.  Guard the whole
    registry: no oracle result column may be decimal-typed — CAST integer
    SUMs to BIGINT and decimal literals to DOUBLE in the oracle SQL."""
    import duckdb

    from kafka_flow_spark.tables import TABLE_NAMES

    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_SMALL}/{name}.parquet'"
        )
    offenders = []
    for name, sql in sorted(ORACLES.items()):
        schema = con.execute(f"SELECT * FROM ({sql}) LIMIT 0").arrow().schema
        bad = [
            f"{f.name}:{f.type}" for f in schema if str(f.type).startswith("decimal")
        ]
        if bad:
            offenders.append(f"{name} -> {', '.join(bad)}")
    assert not offenders, "decimal-typed oracle columns (driver hash landmine): " + "; ".join(
        offenders
    )
