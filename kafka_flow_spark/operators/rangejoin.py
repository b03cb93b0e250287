"""Batch range (interval) join via binning — the equi-join scale path.

A naive ``value BETWEEN lo AND hi`` join is a BroadcastNestedLoopJoin (every
row × every interval) — quadratic work and no shuffle key, the classic 100 TB
range-join trap.  When intervals have bounded width, the standard rewrite
(the same idea as Databricks' range-join bin hints and interval trees in
kdb/QuestDB as-of machinery) maps both sides onto fixed-width bins:

- each LEFT row lands in exactly ONE bin: ``floor(value / w)``;
- each RIGHT interval explodes to the bins it covers (``~width/w`` rows);
- an **equi-join on the bin** (shuffle- or broadcast-hash, AQE-planned)
  followed by the exact residual predicate replaces the nested loop.

A (row, interval) match shares exactly the one bin containing ``value``, so
no dedup is needed even for overlapping intervals.  Work: |L| + Σ width/w per
interval + hash-join — linear, with a real shuffle key for co-partitioning.

No counterpart in the reference (its only join is per-key state lookup);
Spark itself plans BNLJ for this shape, which is exactly what this operator
exists to avoid (SURVEY.md §2.2 joins row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BIN_COL = "_rj_bin"


def bin_range_join(
    left: DataFrame,
    value_col: str | Column,
    right: DataFrame,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    how: str = "inner",
    broadcast_right: bool = True,
) -> DataFrame:
    """Join left rows to right intervals with ``lo <= value < hi`` as a
    binned equi-join.  ``bin_width`` should be on the order of the typical
    interval width (smaller bins → fewer residual false hits but more
    interval replication).  ``broadcast_right=False`` for large interval
    tables — the bin key then co-partitions both sides in a shuffle join."""
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    lbin = F.floor(val / F.lit(float(bin_width))).cast("long")
    # explode each interval across the bins it touches; hi is exclusive, so
    # an interval ending exactly on a bin edge does not enter that bin
    last_bin = F.floor(
        (F.col(hi_col) - F.lit(1e-12)) / F.lit(float(bin_width))
    ).cast("long")
    first_bin = F.floor(F.col(lo_col) / F.lit(float(bin_width))).cast("long")
    # drop empty intervals BEFORE the sequence: hi <= lo would make
    # sequence() run descending and replicate dead intervals into bins (the
    # residual predicate would still reject them, but why ship them)
    r = right.where(F.col(hi_col) > F.col(lo_col)).withColumn(
        BIN_COL, F.explode(F.sequence(first_bin, last_bin))
    )
    if broadcast_right:
        r = F.broadcast(r)
    joined = left.withColumn(BIN_COL, lbin).join(
        r, [BIN_COL], how
    )
    return joined.where((val >= F.col(lo_col)) & (val < F.col(hi_col))).drop(BIN_COL)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bin_width: int,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Interval × interval OVERLAP join (``a.lo < b.hi AND b.lo < a.hi``,
    half-open) as a binned equi-join — the two-sided sibling of
    ``bin_range_join``: both sides explode onto fixed-width integer bins and
    hash-join on (keys…, bin).

    Each qualifying pair would share EVERY bin their overlap spans; instead
    of a distinct pass, a pair is emitted only in the bin containing the
    OVERLAP START (``floor(greatest(a.lo, b.lo) / w)``) — exactly one bin
    per pair, so the join output is already duplicate-free (the standard
    allocate-to-first-overlap-bin rewrite of interval-tree joins).

    Integer bounds only (epoch micros, cents): binning is the exact pmod
    floor-div, no FP edges.  ``key_cols`` co-keys the join (overlap within
    user/device) — without keys the bin is the only shuffle key and hot
    bins skew (AQE splits them).

    Output: all left columns + all right columns (caller aliases clashes).
    """
    w = int(bin_width)
    if w <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    keys = key_cols or []

    def fdiv(col: Column) -> Column:
        # exact floor division: subtract the pmod remainder, then divide.
        # The / is double division, exact because the numerator is a
        # multiple of w and below 2^53 (epoch-µs values are ~1.7e15; the
        # bound holds until year ~2255) — documented rather than guarded,
        # matching the bigint-µs contract of the callers.
        return ((col - ((col % w + w) % w)) / w).cast("long")

    def binned(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.where(F.col(hi) > F.col(lo)).withColumn(
            BIN_COL, F.explode(F.sequence(fdiv(F.col(lo)), fdiv(F.col(hi) - 1)))
        )

    lb = binned(left, l_lo, l_hi).alias("l")
    rb = binned(right, r_lo, r_hi).alias("r")
    cond = F.col(f"l.{BIN_COL}") == F.col(f"r.{BIN_COL}")
    for k in keys:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    overlap_start = F.greatest(F.col(f"l.{l_lo}"), F.col(f"r.{r_lo}"))
    cond = (
        cond
        & (F.col(f"l.{l_lo}") < F.col(f"r.{r_hi}"))
        & (F.col(f"r.{r_lo}") < F.col(f"l.{l_hi}"))
        & (F.col(f"l.{BIN_COL}") == fdiv(overlap_start))
    )
    out = lb.join(rb, cond, "inner")
    drop_r = [f"r.{k}" for k in keys]
    return out.drop(F.col(f"l.{BIN_COL}")).drop(F.col(f"r.{BIN_COL}")).drop(
        *[F.col(c) for c in drop_r]
    )
