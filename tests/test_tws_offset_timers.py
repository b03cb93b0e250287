"""Offset timers on the transformWithStateInPandas path.

The full TWS streaming e2e is environment-gated (the TWS Python worker
protocol needs google.protobuf, absent here — see tests/test_tws.py), but
the processor itself is plain Python: these tests drive
``_make_processor``'s handleInputRows directly with fake handle/state
objects and differentially compare against the applyInPandasWithState
executor's function on the SAME golden offset-timer scenario
(tests/test_timers_sinks.py::test_offset_timer_ticks_on_lag), including
the persisted state envelope — the two paths must be able to restart from
each other's state."""

from __future__ import annotations

import pandas as pd
import pytest

pytest.importorskip(
    "pyspark.sql.streaming.stateful_processor",
    reason="StatefulProcessor API unavailable",
)

from kafka_flow_spark.operators.fold import fold_option
from kafka_flow_spark.operators.tick import TickOption
from kafka_flow_spark.streaming.flow import FlowSpec, _make_with_state_fn
from kafka_flow_spark.streaming.tws import _make_processor


def _offset_spec() -> FlowSpec:
    return FlowSpec(
        key_cols=["key"],
        order_col="seq",
        fold=fold_option(lambda s, rec: (s or 0) + rec["n"]),
        output_schema="key STRING, n INT, kind STRING",
        emit=lambda key, rec, before, after: {
            "key": key["key"], "n": after, "kind": "fold",
        },
        tick=TickOption(lambda s: 0),  # reset on offset-lag tick
        tick_emit=lambda key, before, after: {
            "key": key["key"], "n": before, "kind": "tick",
        },
        offset_timer_threshold=10,
    )


class _FakeValueState:
    def __init__(self):
        self.stored = None

    def get(self):
        return self.stored

    def update(self, t):
        self.stored = tuple(t)

    def clear(self):
        self.stored = None


class _FakeHandle:
    def __init__(self):
        self.value_state = _FakeValueState()

    def getValueState(self, name, schema, ttl_ms=None):
        return self.value_state

    def listTimers(self):
        return []

    def registerTimer(self, ts):
        pass

    def deleteTimer(self, ts):
        pass


class _FakeGroupState:
    """Just enough of pyspark's GroupState for _make_with_state_fn."""

    def __init__(self):
        self.stored = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self.stored is not None

    @property
    def get(self):
        return self.stored

    def update(self, t):
        self.stored = tuple(t)

    def remove(self):
        self.stored = None

    def setTimeoutDuration(self, ms):
        pass

    def setTimeoutTimestamp(self, ms):
        pass


GOLDEN = pd.DataFrame(
    {"seq": [1, 12, 13], "key": ["a", "a", "a"], "n": [5, 7, 1]}
)


def _run_tws(spec, pdf, state=None):
    proc = _make_processor(spec)
    handle = _FakeHandle()
    if state is not None:
        handle.value_state.stored = state
    proc.init(handle)
    out = pd.concat(list(proc.handleInputRows(("a",), iter([pdf]), None)))
    return out, handle.value_state.stored


def _run_apws(spec, pdf, state=None):
    fn = _make_with_state_fn(spec)
    gs = _FakeGroupState()
    if state is not None:
        gs.stored = state
    out = pd.concat(list(fn(("a",), iter([pdf]), gs)))
    return out, gs.stored


def test_tws_offset_timer_matches_apws_on_golden_scenario(spark):
    spec = _offset_spec()
    tws_out, tws_state = _run_tws(spec, GOLDEN)
    apws_out, apws_state = _run_apws(spec, GOLDEN)
    assert tws_out.to_dict("records") == apws_out.to_dict("records")
    # seq 1 registers; 12 crosses the 10-offset gap -> tick fires on the
    # pre-tick state (5+7), then 13 folds onto the reset state
    kinds = [(r["kind"], r["n"]) for r in tws_out.to_dict("records")]
    assert ("tick", 12) in kinds and ("fold", 1) in kinds
    # identical persisted envelope: the paths restart from each other
    assert tws_state == apws_state
    assert '"reg": 12' in tws_state[0]


def test_tws_restarts_from_apws_state_and_vice_versa(spark):
    spec = _offset_spec()
    first = GOLDEN.iloc[:1]  # seq 1: registers at 1, state 5
    rest = GOLDEN.iloc[1:]  # seq 12 crosses the gap, 13 folds post-reset
    _, apws_state = _run_apws(spec, first)
    tws_out, _ = _run_tws(spec, rest, state=apws_state)
    kinds = [(r["kind"], r["n"]) for r in tws_out.to_dict("records")]
    assert kinds == [("fold", 12), ("tick", 12), ("fold", 1)]

    _, tws_state = _run_tws(spec, first)
    apws_out, _ = _run_apws(spec, rest, state=tws_state)
    assert [(r["kind"], r["n"]) for r in apws_out.to_dict("records")] == kinds


def test_best_stateful_flow_no_longer_rejects_offset_timers():
    """stateful_flow_tws accepts offset-timer specs (the r3
    NotImplementedError is gone) — compile-level check only; execution is
    env-gated on protobuf."""
    import inspect

    from kafka_flow_spark.streaming import tws

    src = inspect.getsource(tws.stateful_flow_tws)
    assert "NotImplementedError" not in src
