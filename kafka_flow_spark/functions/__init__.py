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


def cents(c: Column | str, frac_digits: int = 2) -> Column:
    """Exact unscaled-integer representation of a fixed-point double, as LONG.

    ``123.45`` → ``12345``.  The double is first cast to DECIMAL (HALF_UP, the
    same rounding DuckDB's CAST applies), then scale-shifted and narrowed to
    LONG.  Every step stays long-backed (precision ≤ 18), so downstream
    arithmetic and SUMs run as plain 64-bit integer ops inside whole-stage
    codegen instead of per-row java.math.BigDecimal — measured ~2× on TPC-H Q1.

    This is the same design DuckDB/Vectorwise use for decimal aggregation
    (sum the unscaled integer, rescale once per group).  Exactness bound: a
    LONG sum holds while n_rows_per_group × max_unscaled < 2^63; under Spark's
    ANSI mode an overflow THROWS rather than wrapping, so the failure mode at
    extreme scale is loud — switch the affected aggregate to ``dsum`` (decimal,
    128-bit path) if a single group can exceed ~9.2e18 unscaled units.

    Fast path: ``signum(x)·floor(|x|·10^f + 0.5)`` is round-HALF-UP (away from
    zero) in pure double ALU ops — no per-row java.math.BigDecimal at all.  It
    equals the decimal cast whenever the double was *generated as* an f-dp
    fixed-point value (x = nearest double to k/10^f ⇒ |x|·10^f lands within
    ~1e-9 of the integer k, never near a .5 tie), which is the testdata money
    contract; ``cents_exact`` is the general-double fallback and a property
    test pins their agreement.
    """
    col = F.col(c) if isinstance(c, str) else c
    shift = float(10**frac_digits)
    return (F.signum(col) * F.floor(F.abs(col) * F.lit(shift) + F.lit(0.5))).cast("long")


def cents_exact(c: Column | str, frac_digits: int = 2) -> Column:
    """Decimal-cast variant of ``cents`` — correct for arbitrary doubles (ties
    round exactly like CAST(x AS DECIMAL)), at ~100 ns/row BigDecimal cost."""
    col = F.col(c) if isinstance(c, str) else c
    # cast precision chosen so (p,f) * (f+1,0) → (p+f+2, f) stays ≤ 18
    p = 16 - frac_digits
    shift = F.lit(10**frac_digits).cast(f"decimal({frac_digits + 1},0)")
    return (col.cast(f"decimal({p},{frac_digits})") * shift).cast("long")


def unscaled(col: Column, scale: int) -> Column:
    """Rescale an unscaled-LONG aggregate back to its true value, as DOUBLE.

    The long → decimal(38,0) → ÷10^scale route is exact (the quotient has at
    most ``scale`` fractional digits, below the division's result scale), so
    the final cast yields the correctly-rounded double of the true rational
    value — bit-identical to the oracle's CAST(SUM(decimal) AS DOUBLE).  Going
    through decimal instead of double division avoids the 2^53 precision cliff
    of casting a large long straight to double.
    """
    return (col.cast("decimal(38,0)") / F.lit(10**scale).cast("decimal(8,0)")).cast("double")


def csum(col: Column, alias: str, scale: int = 2) -> Column:
    """SUM an unscaled-LONG column and surface the rescaled DOUBLE."""
    return unscaled(F.sum(col), scale).alias(alias)


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
    """Cosine similarity of two array<double> columns (JVM-side, deterministic).

    Formulation note (r13, measured): the zip_with+aggregate fold IS the
    fast JVM shape for array math here.  Unrolling a known-width dot into a
    flat ``element_at(a,1)*element_at(b,1) + …`` chain measured 2.3× SLOWER
    per pair (0.92 vs 0.40 s on the 40k-pair MMR pool scan), and an
    8-centroid × 64-dim unrolled assignment 15× slower — ``element_at``
    pays per-call ANSI/bounds overhead and giant expression trees drop out
    of whole-stage codegen.  What DOES pay is staging the per-vector norms
    once per row instead of once per pair (see mmr_rerank).
    """
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
