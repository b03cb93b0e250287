"""Env-gated stateful-flush throughput (the reference's Experiment B analog:
2000 keys × 10 KiB snapshots flushed concurrently, docs/kafka-single-writer-
design.md:336-349; baseline shared-producer flush 282 ms on single-node
localhost Kafka).

Run: SPARK_FLOW_PERF=1 python -m pytest tests/test_perf_stateful.py -s
(the same env-gating pattern as the reference's KAFKA_FLOW_PERF spec,
TransactionalWriteThroughputSpec).  Numbers are recorded in BASELINE.md.
"""

from __future__ import annotations

import os
import time

import pytest

from kafka_flow_spark.operators.fold import fold_option
from kafka_flow_spark.operators.keyed import keyed_fold_final
from kafka_flow_spark.persistence import snapshots
from kafka_flow_spark.persistence.compression import compressed_json_codec

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_FLOW_PERF") != "1", reason="perf spec (set SPARK_FLOW_PERF=1)"
)

N_KEYS = 2000
STATE_BYTES = 10 * 1024


def test_flush_2000_keys_10kib(spark, tmp_path):
    # 2000 keys × 5 events each; the fold builds a ~10 KiB state per key
    rows = [(k, i, "x" * 2048) for k in range(N_KEYS) for i in range(5)]
    df = spark.createDataFrame(rows, "key BIGINT, offset BIGINT, chunk STRING").cache()
    df.count()

    fold = fold_option(lambda s, rec: ((s or "") + rec["chunk"])[:STATE_BYTES])
    states = keyed_fold_final(
        df,
        key_cols=["key"],
        order_col="offset",
        fold=fold,
        output_schema="key BIGINT, offset BIGINT, value STRING",
        finish=lambda key, s: {"key": key["key"], "offset": 5, "value": s},
    )

    # Experiment B times the *flush* of already-computed states — materialize
    # the fold first, then time the snapshot write alone
    states = states.cache()
    states.count()
    t0 = time.perf_counter()
    snapshots.append_snapshots(states, str(tmp_path / "snap"))
    flush_s = time.perf_counter() - t0
    n = spark.read.parquet(str(tmp_path / "snap")).count()
    assert n == N_KEYS
    print(f"\nstateful flush {N_KEYS} keys x {STATE_BYTES}B: {flush_s:.3f}s "
          f"({N_KEYS / flush_s:.0f} keys/s)")
    states.unpersist()

    # compressed-codec envelope roundtrip at the same payload size
    enc, dec, _schema = compressed_json_codec()
    t0 = time.perf_counter()
    blobs = [enc("y" * STATE_BYTES) for _ in range(N_KEYS)]
    states2 = [dec(b) for b in blobs]
    codec_s = time.perf_counter() - t0
    assert states2[0] == "y" * STATE_BYTES
    print(f"codec 2×{N_KEYS} envelopes of {STATE_BYTES}B: {codec_s:.3f}s")
    df.unpersist()
