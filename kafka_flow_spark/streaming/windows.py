"""Event-time windowed aggregation with watermark-based late-data handling.

The reference has *no* windowing operator — sessions/tumbling aggregation are
hand-built from fold + tick (docs/overview.md:303-306 names session expiry as
the canonical Tick use), and its per-record ``Timestamp.watermark``
(core/.../timer/Timestamp.scala:8) never drops late data.  Spark-first these
are first-class: ``window``/``session_window`` + ``withWatermark`` give
tumbling/sliding/session aggregation with bounded state and deterministic
late-data semantics (SIGMOD'18 Structured Streaming paper, PAPERS.md).

State scale: windowed aggregates keep one row of state per (key, window) in
the state store, evicted when the watermark passes — the built-in equivalent
of the reference's unloadOrphaned eviction (#19).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _flatten(agged: DataFrame, start_alias: str, end_alias: str) -> DataFrame:
    others = [c for c in agged.columns if c != "w"]
    return agged.select(
        F.col("w.start").alias(start_alias), F.col("w.end").alias(end_alias), *others
    )


def tumbling(
    records: DataFrame,
    ts_col: str,
    duration: str,
    key_cols: Sequence[str],
    aggs: Sequence[Column],
    watermark: str = "0 seconds",
) -> DataFrame:
    """Tumbling event-time window aggregate; late rows beyond ``watermark`` drop."""
    agged = (
        records.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, duration).alias("w"), *key_cols)
        .agg(*aggs)
    )
    return _flatten(agged, "window_start", "window_end")


def sliding(
    records: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    key_cols: Sequence[str],
    aggs: Sequence[Column],
    watermark: str = "0 seconds",
) -> DataFrame:
    """Sliding event-time window aggregate (overlapping windows)."""
    agged = (
        records.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, duration, slide).alias("w"), *key_cols)
        .agg(*aggs)
    )
    return _flatten(agged, "window_start", "window_end")


def session(
    records: DataFrame,
    ts_col: str,
    gap: str,
    key_cols: Sequence[str],
    aggs: Sequence[Column],
    watermark: str = "0 seconds",
) -> DataFrame:
    """Session window aggregate: windows merge while events are within ``gap``.

    The built-in replacement for the reference's fold-plus-expiry-tick session
    pattern — the state store merges/evicts sessions as the watermark moves.
    """
    agged = (
        records.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), *key_cols)
        .agg(*aggs)
    )
    return _flatten(agged, "session_start", "session_end")
