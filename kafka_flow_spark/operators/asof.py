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
    direction: str = "backward",
    tolerance: Column | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the payload of one right row with
    the same ``on`` key — the latest with ``right_time <= left_time``
    (``direction="backward"``, default) or the earliest with ``right_time >=
    left_time`` (``"forward"``); NULL payload if none.  The pandas
    ``merge_asof`` surface, built on the same single-shuffle union+window
    plan in both directions (forward just traverses the per-key timeline
    descending).

    ``right_order``: extra right-side columns to break equal-time ties
    deterministically (last one wins).
    ``tolerance``: optional maximum |right_time - left_time| as an interval
    Column (e.g. ``F.expr("INTERVAL 1 HOUR")``); matches farther away have
    their payload nulled, exactly like pandas' tolerance.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    on = list(on)
    payload_cols = list(payload_cols)
    left_cols = left.columns

    rt = right.select(
        *[F.col(c) for c in on],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(right_time).alias("__prt"),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
        *[F.col(c).alias(f"__o_{i}") for i, c in enumerate(right_order)],
    )
    lt = left.select(
        *left_cols,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
    )
    # align schemas for unionByName
    lt = lt.withColumn("__prt", F.lit(None).cast(dict(rt.dtypes)["__prt"]))
    for c in payload_cols:
        lt = lt.withColumn(f"__p_{c}", F.lit(None).cast(dict(rt.dtypes)[f"__p_{c}"]))
    for i in range(len(right_order)):
        lt = lt.withColumn(f"__o_{i}", F.lit(None).cast(dict(rt.dtypes)[f"__o_{i}"]))
    for c in left_cols:
        if c not in on:  # join keys are real on both sides
            rt = rt.withColumn(c, F.lit(None).cast(dict(lt.dtypes)[c]))

    unioned = lt.unionByName(rt.select(*lt.columns))
    # Forward traverses each key's timeline DESCENDING, so "last right row
    # carried so far" = earliest right row with time >= the left row's.
    t_order = F.col("__t") if direction == "backward" else F.col("__t").desc()
    order: list[Column] = [t_order, F.col("__side")] + [
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
        F.col("__t"),
        F.last("__prt", ignorenulls=True).over(w).alias("__crt"),
        *[F.last(f"__p_{c}", ignorenulls=True).over(w).alias(c) for c in payload_cols],
    )
    out = carried.filter(F.col("__side") == 1)
    if tolerance is not None:
        in_tol = (
            F.col("__t") <= F.col("__crt") + tolerance
            if direction == "backward"
            else F.col("__t") >= F.col("__crt") - tolerance
        )
        valid = F.col("__crt").isNotNull() & in_tol
        out = out.select(
            *left_cols,
            F.col("__side"),
            F.col("__t"),
            F.col("__crt"),
            *[F.when(valid, F.col(c)).otherwise(F.lit(None)).alias(c) for c in payload_cols],
        )
    return out.drop("__side", "__t", "__crt")
