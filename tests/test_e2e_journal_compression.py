"""End-to-end composites: kafka-journal decode → keyed fold, and the
compression-envelope state codec through a checkpointed flow restart."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from kafka_flow_spark.operators.fold import fold_option
from kafka_flow_spark.operators.keyed import keyed_fold_final
from kafka_flow_spark.persistence.compression import compressed_json_codec
from kafka_flow_spark.sources import kafka_journal
from kafka_flow_spark.streaming.flow import FlowSpec, run_to_parquet_sink, stateful_flow
from tests.test_sources import journal_value


def test_journal_decode_then_fold(spark):
    """The kafka-journal integration path (#28 + #9): decode Append actions,
    explode typed events, fold per key in (offset, seqNr) order."""
    records = spark.createDataFrame(
        [
            ("acct-1", 10, journal_value(1, [{"amount": 5}, {"amount": 7}])),
            ("acct-1", 11, journal_value(3, [{"amount": 2}])),
            ("acct-2", 10, journal_value(1, [{"amount": 100}])),
        ],
        "key STRING, offset BIGINT, value STRING",
    )
    events = kafka_journal.events(records, payload_schema="STRUCT<amount: INT>")
    # order within key: offset-major, seqNr-minor
    ordered = events.withColumn("ord", F.col("offset") * 1000 + F.col("seq_nr"))
    balances = keyed_fold_final(
        ordered,
        key_cols=["key"],
        order_col="ord",
        fold=fold_option(lambda s, rec: (s or 0) + rec["payload"]["amount"]),
        output_schema="key STRING, balance BIGINT",
        finish=lambda key, s: {"key": key["key"], "balance": s},
    )
    got = {r["key"]: r["balance"] for r in balances.collect()}
    assert got == {"acct-1": 14, "acct-2": 100}


def test_compressed_state_codec_roundtrips_through_restart(spark, tmp_path):
    """Large per-key state persisted through the compression envelope survives
    a checkpointed stop/restart (Compressor semantics on the state store)."""
    input_dir, chk = str(tmp_path / "in"), str(tmp_path / "chk")
    out_dir = str(tmp_path / "out")
    enc, dec, schema = compressed_json_codec(threshold=1000)

    def step(s, rec):
        s = s or {"blob": "", "n": 0}
        return {"blob": (s["blob"] + "z" * 4000)[:12000], "n": s["n"] + rec["n"]}

    spec = FlowSpec(
        key_cols=["key"],
        order_col="seq",
        fold=fold_option(step),
        output_schema="key STRING, n INT, blob_len INT",
        emit=lambda key, rec, before, after: {
            "key": key["key"],
            "n": after["n"],
            "blob_len": len(after["blob"]),
        },
        encode_state=enc,
        decode_state=dec,
        state_schema=schema,
    )

    def write(rows):
        spark.createDataFrame(rows, "seq BIGINT, key STRING, n INT").coalesce(1).write.mode(
            "append"
        ).parquet(input_dir)

    def run():
        records = spark.readStream.schema("seq BIGINT, key STRING, n INT").parquet(input_dir)
        run_to_parquet_sink(stateful_flow(records, spec), chk, out_dir)

    write([(1, "a", 1)])
    run()
    write([(2, "a", 10)])
    run()  # restart: state decoded from the compressed envelope
    rows = sorted(
        (r["n"], r["blob_len"]) for r in spark.read.parquet(out_dir).collect()
    )
    assert rows == [(1, 4000), (11, 8000)]  # counter continued; blob grew
