"""transformWithStateInPandas path: golden counter equivalence with the
applyInPandasWithState path, on the RocksDB state store.

Environment-gated: the TWS Python worker protocol needs google.protobuf,
which this container lacks — the tests skip there and the engine falls back
to the applyInPandasWithState executor (the documented runtime selection,
SURVEY.md §7)."""

from __future__ import annotations

import pytest

pytest.importorskip(
    "google.protobuf", reason="transformWithStateInPandas needs protobuf (absent here)"
)

from kafka_flow_spark.streaming.flow import run_to_parquet_sink
from kafka_flow_spark.streaming.tws import ROCKSDB_PROVIDER, stateful_flow_tws
from tests.test_streaming_flow import SCHEMA, counter_spec, write_inputs

PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


@pytest.fixture()
def rocksdb(spark):
    prev = spark.conf.get(PROVIDER_KEY, None)
    spark.conf.set(PROVIDER_KEY, ROCKSDB_PROVIDER)
    yield spark
    if prev is None:
        spark.conf.unset(PROVIDER_KEY)
    else:
        spark.conf.set(PROVIDER_KEY, prev)


def run_once(spark, input_dir, checkpoint, spec):
    out_dir = checkpoint + "__out"
    records = spark.readStream.schema(SCHEMA).parquet(input_dir)
    run_to_parquet_sink(stateful_flow_tws(records, spec), checkpoint, out_dir)
    return sorted(
        (tuple(r) for r in spark.read.parquet(out_dir).collect()),
        key=lambda t: (t[0], t[2]),
    )


def test_tws_golden_counter_recovery(rocksdb, tmp_path):
    spark = rocksdb
    input_dir, chk = str(tmp_path / "in"), str(tmp_path / "chk")
    spec = counter_spec()

    write_inputs(spark, input_dir, [(1, "a", 1), (2, "a", 2), (3, "a", 3)])
    out1 = run_once(spark, input_dir, chk, spec)
    assert out1 == [("a", None, 1), ("a", 1, 2), ("a", 2, 3)]

    # recovery continues from State(3); 0 deletes; 9 sees empty state
    write_inputs(spark, input_dir, [(4, "a", 4), (5, "a", 0), (6, "a", 9)])
    out2 = run_once(spark, input_dir, chk, spec)
    assert [t for t in out2 if t not in out1] == [("a", 3, 4), ("a", 4, 0), ("a", None, 9)]


def test_tws_multi_key_order(rocksdb, tmp_path):
    spark = rocksdb
    input_dir, chk = str(tmp_path / "in"), str(tmp_path / "chk")
    rows = [(1, "a", 1), (2, "b", 5), (3, "a", 2), (4, "b", 6), (5, "a", 3)]
    write_inputs(spark, input_dir, rows)
    out = run_once(spark, input_dir, chk, counter_spec())
    assert out == [
        ("a", None, 1),
        ("a", 1, 2),
        ("a", 2, 3),
        ("b", None, 5),
        ("b", 5, 6),
    ]
