"""State introspection — the EntityRegistry analog (reference #39).

The reference keeps a concurrent registry ``key → F[Option[S]]`` so operators
can inspect live entity state over HTTP (core/.../registry/EntityRegistry.
scala:23-121).  Spark already persists exactly that in the streaming state
store; the state-store *reader* exposes it as a batch DataFrame — queryable
with full SQL, no extra bookkeeping, and versioned (any committed batch can
be inspected, which the reference cannot do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_state(
    spark: SparkSession,
    checkpoint: str,
    batch_id: int | None = None,
    operator_id: int = 0,
) -> DataFrame:
    """Read the live (or historical) per-key state from a flow's checkpoint.

    Returns ``(key struct, value struct, partition_id)`` rows — ``getAll`` of
    the reference registry.  ``batch_id`` selects a committed epoch (time
    travel); default is the latest.
    """
    reader = spark.read.format("statestore").option("operatorId", operator_id)
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    return reader.load(checkpoint)


def entities(
    spark: SparkSession,
    checkpoint: str,
    batch_id: int | None = None,
) -> DataFrame:
    """Flattened ``getAll``: one row per live entity, ``(…key cols, …state cols)``.

    ``applyInPandasWithState`` checkpoints nest the state struct under
    ``value.groupState``; this unnests both sides.
    """
    st = read_state(spark, checkpoint, batch_id)
    return st.select("key.*", "value.groupState.*")


def get_entity(
    spark: SparkSession,
    checkpoint: str,
    key_col: str,
    key_value,
) -> list:
    """``get(key)`` of the reference registry: state rows for one entity."""
    return (
        entities(spark, checkpoint).filter(F.col(key_col) == key_value).collect()
    )
