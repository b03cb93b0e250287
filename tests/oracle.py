"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL over the same parquet tables,
sorts columns by name and rows by value, and asserts exact equality (floats
compared exactly — query design is responsible for determinism, see
plans/registry.py docstring).
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from kafka_flow_spark.tables import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str) -> list[tuple]:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    res = con.sql(sql)
    cols = res.columns
    return cols, res.fetchall()


def _norm(v: Any) -> Any:
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    from decimal import Decimal

    if isinstance(v, Decimal):
        return float(v)
    return v


def compare(spark_df, oracle_cols, oracle_rows) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    spark_cols = spark_df.columns
    if sorted(spark_cols) != sorted(c.lower() for c in oracle_cols) and sorted(
        spark_cols
    ) != sorted(oracle_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}")
        return problems

    def sort_key(t: tuple) -> tuple:
        return tuple((v is None, str(v)) for v in t)

    order = sorted(range(len(oracle_cols)), key=lambda i: oracle_cols[i].lower())
    o_rows = sorted(
        (tuple(_norm(r[i]) for i in order) for r in oracle_rows), key=sort_key
    )
    s_collected = spark_df.collect()
    s_order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i].lower())
    s_rows = sorted(
        (tuple(_norm(r[i]) for i in s_order) for r in s_collected), key=sort_key
    )

    if len(o_rows) != len(s_rows):
        problems.append(f"row count: spark={len(s_rows)} oracle={len(o_rows)}")
    n_bad = 0
    for sr, orow in zip(s_rows, o_rows):
        if sr != orow:
            n_bad += 1
            if n_bad <= 3:
                problems.append(f"row diff: spark={sr} oracle={orow}")
    if n_bad > 3:
        problems.append(f"... {n_bad} differing rows total")
    return problems
