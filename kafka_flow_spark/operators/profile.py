"""Table profiling: the per-column data card (null counts, cardinality,
value range) a corpus release ships with.

No counterpart in the reference (kafka-flow never inspects schemas —
SURVEY.md §1.2: values are opaque bytes); this is pipeline-observability
surface for the curation chain.

Scale shape: one aggregate LEG PER COLUMN, unioned — deliberately not a
single Expand-based multi-distinct pass, because each leg's scan prunes to
exactly one parquet column (ReadSchema shows a single field), so the total
I/O equals one full-width scan while each task stays narrow and
map-combinable.  Exact distinct counts are the audit-grade default; swap
``approx=True`` for HLL sketches when the profile is advisory and the table
is wide."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """One row per column: (column, n_rows, n_nonnull, n_distinct,
    min_value, max_value) — min/max computed on the native type, then cast
    to string for a uniform schema (so numeric ranges are numeric, not
    lexicographic)."""
    cols = df.columns if cols is None else cols
    if not cols:
        raise ValueError("no columns to profile")
    distinct_of = (
        (lambda c: F.approx_count_distinct(c).alias("n_distinct"))
        if approx
        else (lambda c: F.count_distinct(F.col(c)).alias("n_distinct"))
    )
    legs = [
        df.select(F.col(c)).agg(
            F.lit(c).alias("column"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.col(c)).alias("n_nonnull"),
            distinct_of(c),
            F.min(F.col(c)).cast("string").alias("min_value"),
            F.max(F.col(c)).cast("string").alias("max_value"),
        )
        for c in cols
    ]
    return reduce(DataFrame.unionByName, legs)
