"""kafka-journal integration: decode journal Append actions into typed events.

Reference (#28, kafka-journal/.../journal/JournalParser.scala:16-88): a
journal record's value is an ``Action.Append`` carrying a ``SeqRange`` and a
payload of events, each ``(seqNr, payload JSON)``; the parser exposes
``toSeqRange`` / ``toPayloads`` / ``toEvents[T: Reads]`` (typed decode of each
event's JSON).

Spark-first: the journal payload is declared as a JSON document
``{"range": {"from": i, "to": j}, "events": [{"seqNr": n, "payload": {...}}]}``
and decoded with ``from_json`` + ``explode`` — schema-ful, JVM-side, no UDF.
A user event type is a Spark schema for the inner payload instead of a
Play-JSON ``Reads``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ACTION_SCHEMA_FMT = (
    "STRUCT<range: STRUCT<from: BIGINT, to: BIGINT>, "
    "events: ARRAY<STRUCT<seqNr: BIGINT, payload: {payload_schema}>>>"
)


def action_schema(payload_schema: str = "STRING") -> str:
    """DDL schema of one Append action; ``payload_schema`` types the event body."""
    return ACTION_SCHEMA_FMT.format(payload_schema=payload_schema)


def parse_actions(
    records: DataFrame, value_col: str = "value", payload_schema: str = "STRING"
) -> DataFrame:
    """Decode each record's JSON value into an ``action`` struct column."""
    value = F.col(value_col).cast("string")
    return records.withColumn(
        "action", F.from_json(value, action_schema(payload_schema))
    )


def seq_range(records: DataFrame, **kw) -> DataFrame:
    """``toSeqRange`` (JournalParser.scala:16-28): the action's (from, to)."""
    return parse_actions(records, **kw).select(
        "*", F.col("action.range.from").alias("seq_from"), F.col("action.range.to").alias("seq_to")
    ).drop("action")


def events(records: DataFrame, payload_schema: str = "STRING", **kw) -> DataFrame:
    """``toEvents`` (JournalParser.scala:71-86): one row per event, typed payload.

    ``explode`` is the 1→N unnest; ordering within a journal key follows
    (offset, seqNr) — callers fold with ``order_col='seq_nr'`` after an
    offset-major sort, matching the reference's replay order.
    """
    parsed = parse_actions(records, payload_schema=payload_schema, **kw)
    ev = parsed.select("*", F.explode("action.events").alias("event")).drop("action")
    return ev.select(
        "*", F.col("event.seqNr").alias("seq_nr"), F.col("event.payload").alias("payload")
    ).drop("event")


def dead_letters(records: DataFrame, **kw) -> DataFrame:
    """Records whose value failed to decode as an Append action.

    ``from_json`` (PERMISSIVE) yields an all-null struct on malformed input,
    so the dead-letter predicate is "no events decoded" — route these to a
    side table instead of failing the job.
    """
    parsed = parse_actions(records, **kw)
    return parsed.filter(F.col("action.events").isNull()).drop("action")


def seqnr_dedup_filter(state_seqnr_col: Column, event_seqnr_col: Column) -> Column:
    """SeqNr replay guard (#27, kafka-journal/.../JournalFold.scala:16-33):
    keep events whose seqNr exceeds the state's — idempotent replay."""
    return event_seqnr_col > F.coalesce(state_seqnr_col, F.lit(0))
