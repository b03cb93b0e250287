"""Stream-stream joins with watermark-bounded state.

Absent in the reference (SURVEY.md §2.2 — its only "join" is each key's
records meeting their own state); Spark provides true stream-stream joins
when both sides carry watermarks and the condition bounds event-time skew,
so the join state is evicted as watermarks advance (SIGMOD'18 §4.3).

State bound: each side buffers only rows within the interval against the
other side's watermark — O(rate × window), independent of stream length.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    lower: str,
    upper: str,
    left_watermark: str,
    right_watermark: str,
    how: str = "inner",
) -> DataFrame:
    """Join rows with equal keys whose event times satisfy
    ``left_time - lower <= right_time <= left_time + upper``.

    Both sides get watermarks; the time-range predicate is what lets Spark
    evict join state (without it the buffers grow forever — the planner
    rejects outer joins lacking it).
    """
    lw = left.withWatermark(left_time, left_watermark)
    rw = right.withWatermark(right_time, right_watermark)
    key_eq = [lw[c] == rw[c] for c in on]
    bound = (rw[right_time] >= lw[left_time] - F.expr(f"INTERVAL {lower}")) & (
        rw[right_time] <= lw[left_time] + F.expr(f"INTERVAL {upper}")
    )
    cond = key_eq[0]
    for c in key_eq[1:]:
        cond = cond & c
    joined = lw.join(rw, cond & bound, how)
    # drop the duplicated key columns from the right side
    for c in on:
        joined = joined.drop(rw[c])
    return joined
