"""Streaming deduplication — the streaming form of the batch dedup family.

The reference's only dedup machinery is per-key offset/seqNr replay guards
(core/.../snapshot/SnapshotFold.scala:13-23,
kafka-journal/.../journal/JournalFold.scala:16-33 — skip already-folded
records); CONTENT dedup of a record stream has no reference counterpart but
is the streaming half of the Phase-4 pipeline (a training corpus is ingested
as a stream; exact dedup belongs at ingest, before anything is stored).

Spark-first this is ``dropDuplicates[WithinWatermark]`` over a content
fingerprint:

- ``dedup_exact_stream``: keep the FIRST record per fingerprint, forever.
  State: one row per distinct fingerprint — unbounded; right when the corpus
  itself is the dedup domain (checkpointed, scales with the state store).
- ``dedup_exact_stream_windowed``: same, but state is evicted once the
  watermark passes ``horizon`` — the bounded-state form for infinite streams
  where duplicates arrive close together (retries, replays, crawler
  re-fetches).  Uses ``dropDuplicatesWithinWatermark`` so a duplicate is
  dropped whenever it arrives within the watermark horizon of the original,
  exactly-bounded state either way.

The fingerprint is the same md5-of-normalized-text used by the batch
``operators.dedup.exact_duplicates`` / ``operators.text.fingerprint``, so
batch and streaming dedup agree on what "identical" means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from kafka_flow_spark.operators.text import fingerprint

FP_COL = "_fp"


def dedup_exact_stream(records: DataFrame, text_col: str) -> DataFrame:
    """First-wins exact content dedup over the whole stream history."""
    return (
        records.withColumn(FP_COL, fingerprint(text_col))
        .dropDuplicates([FP_COL])
        .drop(FP_COL)
    )


def dedup_exact_stream_windowed(
    records: DataFrame, text_col: str, ts_col: str, horizon: str
) -> DataFrame:
    """Exact content dedup with watermark-bounded state: duplicates arriving
    within ``horizon`` of the original are dropped; state for fingerprints
    older than the watermark is evicted (#19-style eviction, built in)."""
    return (
        records.withWatermark(ts_col, horizon)
        .withColumn(FP_COL, fingerprint(text_col))
        .dropDuplicatesWithinWatermark([FP_COL])
        .drop(FP_COL)
    )
