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


def equiwidth_histogram(
    df,
    value_col: str,
    group_cols: list[str] | None = None,
    n_buckets: int = 20,
    bounds: tuple | None = None,
) -> "DataFrame":
    """Equi-width histogram of ``value_col`` (optionally per group):
    (group..., bucket, lo, hi, n) for the ``n_buckets`` equal slices of
    [min, max], the max value folded into the last bucket.

    Equi-WIDTH rather than equi-depth on purpose: bucket assignment is
    ``floor((x - lo) · n / span)`` — exact integer-and-double arithmetic
    both engines reproduce bit-identically — while equi-depth boundaries
    ride interpolated quantiles whose engine-specific interpolation breaks
    oracle parity (the same reason the HLL query is rows-only).

    Scale shape: one bounds aggregate (or pass ``bounds`` from table stats)
    + one map-combinable groupBy over at most |groups|·n_buckets cells.
    """
    from pyspark.sql import functions as F

    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    group_cols = group_cols or []
    if bounds is None:
        row = df.agg(
            F.min(value_col).alias("lo"), F.max(value_col).alias("hi")
        ).collect()[0]
        if row["lo"] is None:
            raise ValueError(f"equiwidth_histogram: {value_col!r} is empty/all-null")
        bounds = (float(row["lo"]), float(row["hi"]))
    lo, hi = bounds
    span = hi - lo
    if span <= 0:
        bucket = F.lit(0)
    else:
        bucket = F.least(
            F.floor(
                (F.col(value_col) - F.lit(lo)) * F.lit(float(n_buckets)) / F.lit(span)
            ).cast("int"),
            F.lit(n_buckets - 1),
        )
    width = span / n_buckets if span > 0 else 0.0
    return (
        df.groupBy(*group_cols, bucket.alias("bucket"))
        .agg(F.count("*").alias("n"))
        .select(
            *group_cols,
            "bucket",
            (F.lit(lo) + F.col("bucket") * F.lit(width)).alias("lo"),
            (F.lit(lo) + (F.col("bucket") + 1) * F.lit(width)).alias("hi"),
            "n",
        )
    )
