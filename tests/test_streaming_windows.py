"""Streaming event-time windows: tumbling aggregation emits on watermark
advance; late data beyond the watermark is dropped; session windows merge."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from kafka_flow_spark.streaming import windows

SCHEMA = "ts TIMESTAMP, key STRING, v INT"


def ts(minute, second=0):
    return datetime(2026, 1, 1, 12, minute, second)


def write_batch(spark, d, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(d)


def run_stream(spark, input_dir, checkpoint, build, out_name):
    """Multi-run capable: parquet sink (memory sink cannot recover from a
    checkpoint); returns ALL rows emitted so far."""
    out_dir = checkpoint + "__out"
    records = spark.readStream.schema(SCHEMA).parquet(input_dir)
    q = (
        build(records)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).collect()


def test_tumbling_watermark_emits_closed_windows_and_drops_late(spark, tmp_path):
    input_dir, chk = str(tmp_path / "in"), str(tmp_path / "chk")
    build = lambda r: windows.tumbling(
        r, "ts", "5 minutes", ["key"], [F.sum("v").alias("sum_v")], watermark="1 minute"
    )
    # window [12:00,12:05): 1+2 ; then an event at 12:10 advances the watermark
    # far past it, closing it
    write_batch(spark, input_dir, [(ts(0), "a", 1), (ts(1), "a", 2), (ts(10), "a", 7)])
    out1 = run_stream(spark, input_dir, chk, build, "w1")
    got1 = {(r["window_start"].minute, r["sum_v"]) for r in out1}
    assert (0, 3) in got1  # [12:00,12:05) closed with sum 3

    # a late event for the already-closed 12:00 window arrives after the
    # watermark passed -> dropped, no corrected emission on the next run:
    # the 12:00 window still appears exactly once, still summing 3 (not 103)
    write_batch(spark, input_dir, [(ts(2), "a", 100), (ts(11), "a", 1)])
    out2 = run_stream(spark, input_dir, chk, build, "w2")
    minute0 = [r["sum_v"] for r in out2 if r["window_start"].minute == 0]
    assert minute0 == [3]


def test_session_windows_merge_within_gap(spark, tmp_path):
    input_dir, chk = str(tmp_path / "in"), str(tmp_path / "chk")
    build = lambda r: windows.session(
        r, "ts", "2 minutes", ["key"], [F.count("*").alias("n")], watermark="0 seconds"
    )
    # a: 12:00, 12:01, 12:02 chain into one session; 12:10 starts another;
    # the 12:30 event closes everything via the watermark
    write_batch(
        spark,
        input_dir,
        [(ts(0), "a", 1), (ts(1), "a", 1), (ts(2), "a", 1), (ts(10), "a", 1), (ts(30), "a", 1)],
    )
    out = run_stream(spark, input_dir, chk, build, "sess1")
    sessions = sorted(
        (r["session_start"].minute, r["n"]) for r in out if r["session_start"].minute < 30
    )
    assert sessions == [(0, 3), (10, 1)]


def test_sliding_windows_overlap(spark, tmp_path):
    input_dir, chk = str(tmp_path / "in"), str(tmp_path / "chk")
    build = lambda r: windows.sliding(
        r, "ts", "10 minutes", "5 minutes", ["key"], [F.sum("v").alias("sum_v")]
    )
    write_batch(spark, input_dir, [(ts(7), "a", 4), (ts(40), "a", 1)])
    out = run_stream(spark, input_dir, chk, build, "slide1")
    # event at 12:07 belongs to [12:00,12:10) and [12:05,12:15)
    got = {(r["window_start"].minute, r["sum_v"]) for r in out if r["sum_v"] == 4}
    assert {(0, 4), (5, 4)} <= got


def test_order_audit_sizes_the_watermark(spark, tmp_path):
    """Closing the loop between the BATCH out-of-orderness audit and the
    STREAMING config: event_order_audit's max_backstep is the minimum safe
    watermark delay.  A delay sized from the audit loses nothing (stream ==
    batch recompute); a delay below it demonstrably drops the late rows the
    audit counted."""
    from kafka_flow_spark.operators.profile import event_order_audit

    rows = [
        (ts(0), "a", 1),
        (ts(4), "a", 2),
        (ts(1, 30), "a", 10),   # 2.5 min backstep vs previous arrival
        (ts(6), "a", 3),
        (ts(5, 30), "a", 20),   # 0.5 min backstep
        (ts(12), "a", 4),       # advances the watermark past everything
    ]
    # arrival order = row order: index as the transport sequence
    seq = spark.createDataFrame(
        [(i, k, t, v) for i, (t, k, v) in enumerate(rows)],
        "seq BIGINT, key STRING, ts TIMESTAMP, v INT",
    )
    audit = event_order_audit(seq, "key", "seq", "ts").collect()[0]
    assert audit["n_backwards"] == 2
    assert audit["max_backstep_us"] == 150 * 1_000_000  # 2.5 minutes

    batch_truth = {
        (r["window_start"].minute, r["sum_v"])
        for r in spark.createDataFrame(
            [(t, k, v) for t, k, v in rows], SCHEMA
        )
        .groupBy(F.window("ts", "5 minutes").alias("w"), "key")
        .agg(F.sum("v").alias("sum_v"))
        .select(F.col("w.start").alias("window_start"), "sum_v")
        .collect()
    }

    def run(delay, name):
        input_dir, chk = str(tmp_path / f"in_{name}"), str(tmp_path / f"chk_{name}")
        write_batch(spark, input_dir, rows)
        build = lambda r: windows.tumbling(
            r, "ts", "5 minutes", ["key"], [F.sum("v").alias("sum_v")],
            watermark=delay,
        )
        out = run_stream(spark, input_dir, chk, build, name)
        return {(r["window_start"].minute, r["sum_v"]) for r in out}

    # audit-sized delay (>= 2.5 min): closed windows match the batch truth
    sized = run("3 minutes", "sized")
    assert sized <= batch_truth and (0, 13) in sized  # nothing lost in [0,5)
    # NOTE: single availableNow run delivers all rows in ONE batch, where
    # the watermark only advances BETWEEN batches — split the arrivals to
    # expose the drop: feed the first three rows, then the stragglers.
    input_dir, chk = str(tmp_path / "in_tight"), str(tmp_path / "chk_tight")
    build = lambda r: windows.tumbling(
        r, "ts", "5 minutes", ["key"], [F.sum("v").alias("sum_v")],
        watermark="1 minute",
    )
    write_batch(spark, input_dir, [(ts(0), "a", 1), (ts(4), "a", 2), (ts(12), "a", 99)])
    run_stream(spark, input_dir, chk, build, "tight1")
    # late arrival for [0,5) after the watermark passed: dropped under the
    # undersized 1-minute delay
    write_batch(spark, input_dir, [(ts(1, 30), "a", 10), (ts(13), "a", 1)])
    out = run_stream(spark, input_dir, chk, build, "tight1")
    minute0 = [r["sum_v"] for r in out if r["window_start"].minute == 0]
    assert minute0 == [3]  # the audit's counted backstep row (v=10) is LOST
