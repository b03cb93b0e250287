"""Stream-stream interval join: in-window matches join, out-of-window don't."""

from __future__ import annotations

from datetime import datetime

from kafka_flow_spark.streaming.joins import interval_join

CLICKS = "ts TIMESTAMP, key STRING, page STRING"
BUYS = "bts TIMESTAMP, key STRING, amount INT"


def t(minute, second=0):
    return datetime(2026, 1, 1, 12, minute, second)


def test_interval_join_streams(spark, tmp_path):
    cdir, bdir, chk = str(tmp_path / "c"), str(tmp_path / "b"), str(tmp_path / "chk")
    spark.createDataFrame(
        [(t(0), "u1", "home"), (t(30), "u1", "pricing"), (t(0), "u2", "docs")], CLICKS
    ).write.parquet(cdir)
    spark.createDataFrame(
        [(t(5), "u1", 100),   # within 10m of u1@12:00 -> joins
         (t(50), "u1", 200),  # 20m after u1@12:30 -> out of window
         (t(2), "u3", 300)],  # no matching click key
        BUYS,
    ).write.parquet(bdir)

    clicks = spark.readStream.schema(CLICKS).parquet(cdir)
    buys = spark.readStream.schema(BUYS).parquet(bdir)
    joined = interval_join(
        clicks, buys,
        on=["key"], left_time="ts", right_time="bts",
        lower="0 minutes", upper="10 minutes",
        left_watermark="1 minute", right_watermark="1 minute",
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", chk + "__out")
        .option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {(r["key"], r["page"], r["amount"]) for r in spark.read.parquet(chk + "__out").collect()}
    assert rows == {("u1", "home", 100)}
