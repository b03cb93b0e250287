"""Batch execution of per-key ordered folds — the reference's hot path, Spark-first.

Reference hot path (core/.../PartitionFlow.scala:151-194 + FoldToState.scala:44-90):
group records by key, left-fold each key's records *in offset order* through the
user fold; a ``None`` final state deletes the key.

Spark mapping: a **sort-merge fold** — ``repartition(key)`` hash-co-locates every
key's records in one partition, ``sortWithinPartitions(key, order)`` makes each
key a contiguous ordered run, and ``mapInPandas`` streams the partition's Arrow
batches through one generator that detects key changes and carries (key, state)
across batch boundaries.  Compared to ``groupBy().applyInPandas`` this costs one
in-partition sort but amortizes the Python/pandas overhead over whole Arrow
batches instead of paying it per key group — at 100 TB key groups are small and
plentiful, and per-group dispatch dominates.  The per-record Python loop is the
cost of arbitrary user state machines (same trade the reference makes — its
folds are arbitrary Scala closures).

Scale: the shuffle partitions by key hash, so 1000 executors each fold a
disjoint key range; state never leaves the task, nothing is collected to the
driver.  A single giant key streams through in bounded memory (only its state
and the current Arrow batch are resident — grouped-map would materialize the
whole group).  Skewed keys are single-task by semantic necessity (per-key
ordering), identical to the reference's per-key fiber serialization.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Sequence
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

from kafka_flow_spark.operators.fold import FoldOption, Record, State

# emit(key_dict, record, state_before, state_after) -> output row dict | None
EmitFn = Callable[[dict[str, Any], Record, State, State], dict[str, Any] | None]


def _iter_records(pdf: pd.DataFrame):
    """Row dicts via column-wise zip — several× faster than to_dict('records')."""
    cols = pdf.columns.tolist()
    arrays = [pdf[c].tolist() for c in cols]
    for vals in zip(*arrays):
        yield dict(zip(cols, vals))


def _sorted_runs(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    return df.repartition(*key_cols).sortWithinPartitions(*key_cols, order_col)


def keyed_fold(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    fold: FoldOption,
    output_schema: str,
    emit: EmitFn,
) -> DataFrame:
    """Fold each key's records in ``order_col`` order; emit one output row per record.

    ``emit`` sees (key, record, state_before, state_after) — the shape of the
    golden test's expected output (StatefulProcessingWithKafkaSpec.scala:123-161).
    Returning ``None`` from ``emit`` suppresses the row.
    """
    key_cols = list(key_cols)
    out_cols = [f.name for f in StructType.fromDDL(output_schema).fields]

    def run(batches: Iterable[pd.DataFrame]):
        cur_key: tuple | None = None
        key_dict: dict[str, Any] = {}
        state: State = None
        out: list[dict[str, Any]] = []
        for pdf in batches:
            for rec in _iter_records(pdf):
                k = tuple(rec[c] for c in key_cols)
                if k != cur_key:
                    cur_key = k
                    key_dict = dict(zip(key_cols, k))
                    state = None
                before = state
                state = fold(state, rec)
                row = emit(key_dict, rec, before, state)
                if row is not None:
                    out.append(row)
            if out:
                yield pd.DataFrame(out, columns=out_cols)
                out = []

    return _sorted_runs(df, key_cols, order_col).mapInPandas(run, schema=output_schema)


def keyed_fold_final(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    fold: FoldOption,
    output_schema: str,
    finish: Callable[[dict[str, Any], State], dict[str, Any]],
) -> DataFrame:
    """Fold each key's records and emit only the final state (snapshot semantics).

    The delete-on-None contract (FoldToState.scala:62-89): a key whose final
    state is ``None`` produces no row — the entity does not exist.
    """
    key_cols = list(key_cols)
    out_cols = [f.name for f in StructType.fromDDL(output_schema).fields]

    def run(batches: Iterable[pd.DataFrame]):
        cur_key: tuple | None = None
        key_dict: dict[str, Any] = {}
        state: State = None
        started = False
        out: list[dict[str, Any]] = []
        for pdf in batches:
            for rec in _iter_records(pdf):
                k = tuple(rec[c] for c in key_cols)
                if k != cur_key:
                    if started and state is not None:
                        out.append(finish(key_dict, state))
                    cur_key = k
                    key_dict = dict(zip(key_cols, k))
                    state = None
                    started = True
                state = fold(state, rec)
            if len(out) >= 1024:
                yield pd.DataFrame(out, columns=out_cols)
                out = []
        if started and state is not None:
            out.append(finish(key_dict, state))
        if out:
            yield pd.DataFrame(out, columns=out_cols)

    return _sorted_runs(df, key_cols, order_col).mapInPandas(run, schema=output_schema)
