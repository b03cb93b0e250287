"""Skew mitigation: salting for joins and two-stage aggregation.

The reference sidesteps skew by hashing its key space into 10000 Cassandra
segments (CassandraKeys.scala:112-118) — a static salt.  Spark-first the
first line of defense is AQE skew-join splitting (on by default in
session.get_spark); these explicit operators cover what AQE cannot:
- a *deterministic* salted join when one side's key histogram is so hot that
  even split subpartitions overwhelm a task;
- two-stage aggregation when the aggregate itself is per-key heavy (e.g.
  collect-like or high-cardinality distinct under one key).

Per-key *ordered folds* are deliberately not saltable: per-key ordering makes
each key a serial unit, same as the reference's per-key fiber — documented in
operators.keyed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def with_salt(df: DataFrame, n: int, deterministic_from: Sequence[str] | None = None) -> DataFrame:
    """Add a salt column in [0, n).

    Deterministic (hash of the given columns) so replays/retries land rows in
    the same salt bucket; fall back to all columns when unspecified.
    """
    cols = list(deterministic_from or df.columns)
    return df.withColumn(SALT_COL, F.pmod(F.xxhash64(*cols), F.lit(n)).cast("int"))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    n: int,
    how: str = "inner",
    left_salt_from: Sequence[str] | None = None,
) -> DataFrame:
    """Equi-join resilient to a hot key: left rows scatter across n salt
    buckets; right rows replicate n× (explode) so every bucket finds its
    match.  Shuffle volume: |left| + n·|right| — use when right is the small
    or moderate side and the hot key lives in left.
    """
    l_s = with_salt(left, n, left_salt_from)
    r_s = right.withColumn(SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n - 1)))).withColumn(
        SALT_COL, F.col(SALT_COL).cast("int")
    )
    return l_s.join(r_s, [*on, SALT_COL], how).drop(SALT_COL)


def two_stage_agg(
    df: DataFrame,
    keys: Sequence[str],
    n: int,
    partial: Sequence[Column],
    final: Sequence[Column],
) -> DataFrame:
    """Salted partial aggregation → final merge.

    ``partial`` aggregates within (keys, salt); ``final`` merges the partials
    per key — e.g. partial ``sum(x) AS s`` then final ``sum(s) AS s``.  Each
    hot key spreads over n tasks in stage one; stage two merges n rows/key.
    """
    staged = with_salt(df, n).groupBy(*keys, SALT_COL).agg(*partial)
    return staged.groupBy(*keys).agg(*final)
