"""tables.load must work in ANY SparkSession, not just ours.

The driver's harness builds a vanilla SparkSession without
``spark.sql.legacy.parquet.nanosAsLong``; events.parquet carries
TIMESTAMP(NANOS) which Spark rejects without that conf. ``load`` sets it at
runtime, so the read succeeds even when the session builder never did.
"""

from __future__ import annotations

import pytest

from kafka_flow_spark.tables import TABLE_NAMES, load
from tests.conftest import SF_SMALL


def test_events_loads_without_preconfigured_nanos_conf(spark):
    # Simulate a foreign session: drop the conf load() depends on.
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    df = load(spark, SF_SMALL, "events")
    assert df.count() > 0
    # Version matrix for TIMESTAMP(NANOS) parquet:
    #   Spark 3.x:   errors without nanosAsLong; with it reads bigint, which
    #                tables.load converts to timestamp (µs truncation).
    #   Spark 4.1+:  nanosAsLong is a no-op; the nanos column reads natively
    #                as timestamp_ntz (ns truncated to µs, same as DuckDB).
    # Either way the column must land as a usable timestamp type.
    assert dict(df.dtypes)["ts"] in ("timestamp", "timestamp_ntz")


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_every_table_loads(spark, name):
    df = load(spark, SF_SMALL, name)
    assert df.count() > 0
