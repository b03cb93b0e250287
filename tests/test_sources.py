"""Sources & record transforms: topic routing, key remap, record filter,
kafka-journal Append decoding."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from kafka_flow_spark import sources
from kafka_flow_spark.sources import kafka_journal


def records_df(spark):
    rows = [
        ("k1", "t1", 0, 10),
        ("k2", "t1", 1, 11),
        ("k3", "t2", 0, 12),
    ]
    return spark.createDataFrame(rows, "key STRING, topic STRING, partition INT, offset BIGINT")


def test_route_topics(spark):
    routed = sources.route_topics(
        records_df(spark),
        {
            "t1": lambda df: df.select("key"),
            "t2": lambda df: df.select("key"),
        },
    )
    assert sorted(r["key"] for r in routed["t1"].collect()) == ["k1", "k2"]
    assert [r["key"] for r in routed["t2"].collect()] == ["k3"]


def test_remap_key_regroups_across_partitions(spark):
    """RemapKey (#6): derived key groups records regardless of source partition
    — stronger than the reference's within-partition remap."""
    df = records_df(spark)
    remapped = sources.remap_key(df, "key", F.col("topic"))  # key := topic
    counts = {
        r["key"]: r["n"]
        for r in remapped.groupBy("key").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"t1": 2, "t2": 1}


def test_filter_records(spark):
    kept = sources.filter_records(records_df(spark), F.col("offset") > 10)
    assert sorted(r["key"] for r in kept.collect()) == ["k2", "k3"]


def journal_value(seq_from, events):
    return json.dumps(
        {
            "range": {"from": seq_from, "to": seq_from + len(events) - 1},
            "events": [
                {"seqNr": seq_from + i, "payload": p} for i, p in enumerate(events)
            ],
        }
    )


def test_kafka_journal_seq_range(spark):
    df = spark.createDataFrame(
        [("k1", journal_value(5, [{"a": 1}, {"a": 2}]))], "key STRING, value STRING"
    )
    out = kafka_journal.seq_range(df).collect()[0]
    assert (out["seq_from"], out["seq_to"]) == (5, 6)


def test_kafka_journal_typed_events(spark):
    df = spark.createDataFrame(
        [
            ("k1", journal_value(1, [{"amount": 10}, {"amount": 20}])),
            ("k2", journal_value(7, [{"amount": 5}])),
        ],
        "key STRING, value STRING",
    )
    ev = kafka_journal.events(df, payload_schema="STRUCT<amount: INT>")
    got = sorted(
        (r["key"], r["seq_nr"], r["payload"]["amount"]) for r in ev.collect()
    )
    assert got == [("k1", 1, 10), ("k1", 2, 20), ("k2", 7, 5)]


def test_seqnr_dedup_filter(spark):
    df = spark.createDataFrame(
        [(3, 2), (3, 3), (3, 4), (None, 1)], "state_seq INT, event_seq INT"
    )
    kept = df.filter(
        kafka_journal.seqnr_dedup_filter(F.col("state_seq"), F.col("event_seq"))
    )
    got = sorted(((r["state_seq"], r["event_seq"]) for r in kept.collect()), key=str)
    assert got == [(3, 4), (None, 1)]


def test_kafka_reader_builds_unstarted_plan(spark):
    """Broker-less check: the Kafka source builder must at least produce a
    well-formed unstarted streaming DataFrame (plumbing correctness)."""
    try:
        df = sources.kafka_records(spark, "localhost:9092", "t")
    except Exception as e:  # noqa: BLE001
        # acceptable only if the kafka connector jar is absent in this env
        assert "kafka" in str(e).lower()
        return
    assert df.isStreaming


def test_kafka_journal_malformed_value_yields_no_events(spark):
    """Corrupt journal payloads decode to null actions (from_json semantics) —
    they produce zero event rows instead of failing the job (dead-letter
    selection is a filter on action IS NULL)."""
    df = spark.createDataFrame(
        [("k1", "not json at all"), ("k2", journal_value(1, [{"a": 1}]))],
        "key STRING, value STRING",
    )
    ev = kafka_journal.events(df, payload_schema="STRUCT<a: INT>")
    assert [r["key"] for r in ev.collect()] == ["k2"]
    dead = kafka_journal.dead_letters(df)
    assert [r["key"] for r in dead.collect()] == ["k1"]
