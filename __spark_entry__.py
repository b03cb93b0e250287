"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (decimal-exact TPC-H-Q1-style pricing summary)
on sf0.001.  ``queries()`` / ``oracle_sql()`` — the full oracle-gated registry
from kafka_flow_spark.plans (see SURVEY.md §2 and plans/*.py for citations).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_flow_spark.plans import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry.load_all_plans()
    return registry.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    return registry.all_oracles()


def rows_only() -> list[str]:
    """Queries WITHOUT an oracle entry, each rows-only BY DESIGN (ANN
    retrieval, k-means semantic dedup, HLL estimates, iterative BPE — see
    registry.rows_only_queries for the per-query rationale).  Their driver
    rows read `no_oracle`; that is the expected result, not a failure —
    each has a pytest recall/differential/property gate instead."""
    return registry.rows_only_queries()
