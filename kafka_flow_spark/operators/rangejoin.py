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
