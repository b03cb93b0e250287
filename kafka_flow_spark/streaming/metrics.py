"""Flow metrics — per-query progress collection (reference #40).

The reference decorates each component with timing summaries
(metrics/.../FlowMetrics.scala:23-84: ``topic_flow_add_duration_seconds``,
``partition_flow_apply_duration_seconds``, fold/database timings).  Spark
already measures the equivalents per micro-batch in
``StreamingQueryProgress``; this listener aggregates them into the same
shape: per-query counters and duration summaries, inspectable live and
cheap enough to leave attached in production.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class QueryMetrics:
    """Aggregated per-query counters (the FlowMetrics summary analog)."""

    batches: int = 0
    input_rows: int = 0
    state_rows: int = 0
    batch_duration_ms: list[int] = field(default_factory=list)

    @property
    def total_duration_ms(self) -> int:
        return sum(self.batch_duration_ms)

    @property
    def max_batch_ms(self) -> int:
        return max(self.batch_duration_ms, default=0)


class FlowMetricsListener(StreamingQueryListener):
    """Collects progress for every streaming query on the session.

    ``summary()`` returns {query_name: QueryMetrics}; metric names map to the
    reference's: batch duration ⇔ partition_flow_apply_duration_seconds,
    input_rows ⇔ fold invocation count, state_rows ⇔ entity registry size.
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._metrics: dict[str, QueryMetrics] = {}

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        name = p.name or p.id
        with self._lock:
            m = self._metrics.setdefault(str(name), QueryMetrics())
            m.batches += 1
            m.input_rows += int(p.numInputRows)
            m.batch_duration_ms.append(int(p.batchDuration))
            for op in p.stateOperators or []:
                m.state_rows = int(op.numRowsTotal)

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def summary(self) -> dict[str, QueryMetrics]:
        with self._lock:
            return dict(self._metrics)


def attach_metrics(spark) -> FlowMetricsListener:
    """Attach a fresh listener to the session's streams and return it."""
    listener = FlowMetricsListener()
    spark.streams.addListener(listener)
    return listener
