"""Scalar/vector helper expressions shared across plans and operators.

All helpers stay JVM-side (pyspark.sql.functions built-ins) so they run inside
whole-stage codegen; none of them are Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money(c: Column | str) -> Column:
    """Cast a 2-decimal monetary/quantity double to exact DECIMAL(18,2).

    The testdata generates doubles with exactly 2 decimal digits; decimal
    arithmetic makes aggregate sums order-insensitive-exact so Spark and the
    DuckDB oracle produce bit-identical results after the final cast to double.
    """
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(18,2)")


def dsum(col: Column, alias: str) -> Column:
    """SUM in decimal, surfaced as DOUBLE (matches oracle CAST(SUM(..) AS DOUBLE))."""
    return F.sum(col).cast("double").alias(alias)


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns, JVM-side.

    zip_with + aggregate keeps this inside Catalyst (no Python round trip);
    the per-element order is the array order, so the fold is deterministic and
    bit-identical to an equivalent ordered summation in the oracle.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns (JVM-side, deterministic)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
