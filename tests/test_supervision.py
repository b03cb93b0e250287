"""Retry-wrapped run loop (#2) and query health probe (#41)."""

from __future__ import annotations

import pytest

from kafka_flow_spark.streaming import supervision
from kafka_flow_spark.streaming.flow import stateful_flow, run_to_parquet_sink
from tests.test_streaming_flow import SCHEMA, counter_spec, write_inputs


class FakeQuery:
    def __init__(self, fail: bool):
        self.fail = fail

    def awaitTermination(self):  # noqa: N802 (Spark API)
        if self.fail:
            raise RuntimeError("boom")


def test_retry_restarts_until_success():
    calls = []
    sleeps = []

    def start():
        calls.append(1)
        return FakeQuery(fail=len(calls) < 4)  # 3 failures, then clean

    supervision.run_with_retry(start, _sleep=sleeps.append)
    assert len(calls) == 4
    assert len(sleeps) == 3
    # exponential-from-100ms envelope with full jitter: attempt i < 0.1 * 2^i
    for i, s in enumerate(sleeps):
        assert 0 <= s <= min(60.0, 0.1 * 2**i)


def test_retry_gives_up_after_max_restarts():
    calls = []

    def start():
        calls.append(1)
        return FakeQuery(fail=True)

    with pytest.raises(RuntimeError):
        supervision.run_with_retry(start, max_restarts=2, _sleep=lambda s: None)
    assert len(calls) == 3  # initial + 2 restarts


def test_backoff_resets_after_healthy_period():
    clock = {"t": 0.0}
    attempts_seen = []

    def start():
        clock["t"] += 400.0  # each run is "healthy" for > 5 min before failing
        if len(attempts_seen) >= 3:
            return FakeQuery(fail=False)
        return FakeQuery(fail=True)

    supervision.run_with_retry(
        start,
        on_error=lambda attempt, e: attempts_seen.append(attempt),
        _sleep=lambda s: None,
        _clock=lambda: clock["t"],
    )
    assert attempts_seen == [0, 0, 0]  # reset every time — never escalates


def test_retry_resumes_real_query_from_checkpoint(spark, tmp_path):
    """The restart path IS the recovery path: a query wrapped in run_with_retry
    picks up from the checkpoint on each attempt."""
    input_dir, chk = str(tmp_path / "in"), str(tmp_path / "chk")
    out_dir = str(tmp_path / "out")
    write_inputs(spark, input_dir, [(1, "a", 1), (2, "a", 2)])

    attempts = []

    def start():
        # fail the first attempt before the query even starts (worst case)
        attempts.append(1)
        if len(attempts) == 1:
            raise RuntimeError("startup failure")
        records = spark.readStream.schema(SCHEMA).parquet(input_dir)
        run_to_parquet_sink(stateful_flow(records, counter_spec()), chk, out_dir)
        return FakeQuery(fail=False)

    supervision.run_with_retry(start, _sleep=lambda s: None)
    rows = sorted((r["key"], r["n"]) for r in spark.read.parquet(out_dir).collect())
    assert rows == [("a", 1), ("a", 2)]


def test_is_healthy(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    write_inputs(spark, input_dir, [(1, "a", 1)])
    records = spark.readStream.schema(SCHEMA).parquet(input_dir)
    q = (
        stateful_flow(records, counter_spec())
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .start()
    )
    try:
        assert supervision.is_healthy(q)
    finally:
        q.stop()
    assert not supervision.is_healthy(q)
