"""transformWithStateInPandas executor — the Spark 4-native stateful path.

Same FlowSpec semantics as ``streaming.flow.stateful_flow`` (which compiles
to ``applyInPandasWithState``, available since Spark 3.4); this path targets
the modern ``transformWithState`` operator (SPARK-40434 successor, Spark 4.x)
and is preferred when available because it adds:
- typed state primitives (ValueState here; ListState/MapState for compound
  states) with native **state TTL** (``state_ttl_ms``) — the built-in
  ``unloadOrphaned`` analog (TimerFlowOf.scala:36-77) with zero tick code;
- first-class multi-timer registration per key (``handle.registerTimer``),
  matching the reference's per-key ``Set[Instant]`` timer model
  (Timers.scala:23-30) more directly than the single timeout of
  ``applyInPandasWithState``;
- timer evaluation without input for the key in every batch (empty-poll
  semantics, ConsumerFlow.scala:103-104) under the same micro-batch triggers.

Requires the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass = …RocksDBStateStoreProvider``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from kafka_flow_spark.streaming.flow import FlowSpec, _schema_cols, stateful_flow

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def tws_available() -> bool:
    """transformWithState's Python worker protocol needs google.protobuf."""
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def best_stateful_flow(records: DataFrame, spec: FlowSpec) -> DataFrame:
    """Runtime operator selection (SURVEY.md §7): transformWithStateInPandas
    when the environment supports it; otherwise the applyInPandasWithState
    executor.  Both paths carry the full timer surface (clock/watermark
    native, offset emulated in the state envelope)."""
    if tws_available():
        return stateful_flow_tws(records, spec)
    return stateful_flow(records, spec)


def _make_processor(spec: FlowSpec):
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    off_thresh = spec.offset_timer_threshold

    class _FlowProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            # native state TTL — the built-in unloadOrphaned analog
            # (TimerFlowOf.scala:36-77): idle state evicts with zero tick code
            self.state = handle.getValueState(
                "flow_state", spec.state_schema, spec.state_ttl_ms
            )

        # offset timers (KafkaTimer.Offset, KafkaTimer.scala:16-37) ride
        # inside the state blob as {"v": user_state, "reg": offset} — the
        # exact envelope stateful_flow's applyInPandasWithState executor
        # uses, so the two paths restart from each other's journal output
        def _decode(self):
            stored = self.state.get()
            if stored is None:
                return None, None
            raw = spec.decode_state(tuple(stored))
            if off_thresh is not None:
                return raw["v"], raw["reg"]
            return raw, None

        def _encode(self, s, reg):
            return spec.encode_state(
                {"v": s, "reg": reg} if off_thresh is not None else s
            )

        def _register(self, timer_values, pdf: pd.DataFrame | None) -> None:
            if spec.timeout_ms is None:
                return
            if spec.timeout_mode == "event":
                if pdf is None or not len(pdf):
                    return
                expiry = (
                    int(pd.Timestamp(pdf[spec.event_time_col].max()).timestamp() * 1000)
                    + spec.timeout_ms
                )
            else:
                expiry = timer_values.getCurrentProcessingTimeInMs() + spec.timeout_ms
            # idle-gap semantics: the new registration SUPERSEDES any pending
            # timer, matching applyInPandasWithState's setTimeoutDuration
            # (which resets the single timeout on new data).  Without this,
            # timers accumulate one per batch and tick fires on active keys.
            for ts in self.handle.listTimers():
                if ts != expiry:
                    self.handle.deleteTimer(ts)
            self.handle.registerTimer(expiry)

        def _run_tick(self, key_dict, s, out):
            """Tick + tick_emit (the timer path); returns new state."""
            s2 = spec.tick(s) if spec.tick is not None else s
            if spec.tick_emit is not None:
                row = spec.tick_emit(key_dict, s, s2)
                if row is not None:
                    out.append(row)
            return s2

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            from kafka_flow_spark.operators.keyed import _iter_records

            key_dict = dict(zip(spec.key_cols, key))
            pdf = pd.concat(list(rows), ignore_index=True).sort_values(
                spec.order_col, kind="mergesort"
            )
            s, reg = self._decode()
            out = []
            for rec in _iter_records(pdf):
                if spec.filter_record is not None and not spec.filter_record(rec):
                    continue
                before = s
                s = spec.fold(s, rec)
                row = spec.emit(key_dict, rec, before, s)
                if row is not None:
                    out.append(row)
                if off_thresh is not None:
                    # offset timer: register at first record, tick on
                    # order-column advance >= threshold, re-register —
                    # identical to streaming.flow's emulation
                    cur = rec[spec.order_col]
                    if reg is None:
                        reg = cur
                    elif cur - reg >= off_thresh:
                        s = self._run_tick(key_dict, s, out)
                        reg = cur
            if s is None:
                self.state.clear()  # delete-on-None (FoldToState.scala:83-89)
            else:
                self.state.update(self._encode(s, reg))
                self._register(timerValues, pdf)
            yield pd.DataFrame(out, columns=_schema_cols(spec.output_schema))

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo) -> Iterator[pd.DataFrame]:
            key_dict = dict(zip(spec.key_cols, key))
            s, reg = self._decode()
            out = []
            s2 = self._run_tick(key_dict, s, out)
            if s2 is None:
                self.state.clear()
            else:
                self.state.update(self._encode(s2, reg))
                if spec.timeout_mode != "event":
                    self._register(timerValues, None)
            yield pd.DataFrame(out, columns=_schema_cols(spec.output_schema))

        def close(self) -> None:
            pass

    return _FlowProcessor()


def stateful_flow_tws(records: DataFrame, spec: FlowSpec) -> DataFrame:
    """Compile a FlowSpec to ``transformWithStateInPandas``.

    Interchangeable with ``stateful_flow`` — one processor interface, two
    physical operators (SURVEY.md §7 'abstract behind one interface, pick at
    runtime').
    """
    if spec.timeout_ms is None:
        time_mode = "None"
        event_col = ""
    elif spec.timeout_mode == "event":
        if spec.event_time_col is None:
            raise ValueError("timeout_mode='event' requires event_time_col")
        time_mode = "EventTime"
        event_col = spec.event_time_col
        records = records.withWatermark(spec.event_time_col, spec.watermark_delay)
    else:
        time_mode = "ProcessingTime"
        event_col = ""
    return records.groupBy(*spec.key_cols).transformWithStateInPandas(
        _make_processor(spec),
        outputStructType=spec.output_schema,
        outputMode="Append",
        timeMode=time_mode,
        eventTimeColumnName=event_col,
    )
