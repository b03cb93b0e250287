"""As-of join — for each left row, the latest right row with time <= left time.

The reference has no joins at all (SURVEY.md §2.2); this is a stream-to-table
pattern Spark also lacks as a primitive.  Implementation is the scalable
union+window trick, NOT a range cross-join:

1. tag right rows side=0 with their payload, left rows side=1 with NULL payload,
2. union by name, window over (key) ordered by (time, side, tiebreak),
3. ``last(payload, ignorenulls=True)`` over an unbounded-preceding frame carries
   the most recent right payload onto every left row,
4. filter side=1.

Cost: ONE shuffle on the join key (same as any shuffle join) and a per-key
sort — no pair explosion, skew handled by AQE.  At 100 TB this beats
broadcast-range strategies whenever the right side is large; the equal-time
tie goes to the right row (inclusive <=), matching DuckDB's ASOF JOIN.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    payload_cols: Sequence[str],
    right_order: Sequence[str] = (),
) -> DataFrame:
    """Left as-of join: every left row, plus the payload of the latest right row
    (same ``on`` key, ``right_time`` <= ``left_time``); NULL payload if none.

    ``right_order``: extra right-side columns to break equal-time ties
    deterministically (last one wins).
    """
    on = list(on)
    payload_cols = list(payload_cols)
    left_cols = left.columns

    rt = right.select(
        *[F.col(c) for c in on],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
        *[F.col(c).alias(f"__o_{i}") for i, c in enumerate(right_order)],
    )
    lt = left.select(
        *left_cols,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
    )
    # align schemas for unionByName
    for c in payload_cols:
        lt = lt.withColumn(f"__p_{c}", F.lit(None).cast(dict(rt.dtypes)[f"__p_{c}"]))
    for i in range(len(right_order)):
        lt = lt.withColumn(f"__o_{i}", F.lit(None).cast(dict(rt.dtypes)[f"__o_{i}"]))
    for c in left_cols:
        if c not in on:  # join keys are real on both sides
            rt = rt.withColumn(c, F.lit(None).cast(dict(lt.dtypes)[c]))

    unioned = lt.unionByName(rt.select(*lt.columns))
    order: list[Column] = [F.col("__t"), F.col("__side")] + [
        F.col(f"__o_{i}") for i in range(len(right_order))
    ]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *left_cols,
        F.col("__side"),
        *[F.last(f"__p_{c}", ignorenulls=True).over(w).alias(c) for c in payload_cols],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")
