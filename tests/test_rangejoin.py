"""Binned range join must equal the nested-loop reference on every shape:
non-overlapping bands, OVERLAPPING intervals, edge-exclusive bounds, and
values outside every interval."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_flow_spark.operators.rangejoin import bin_range_join


def _reference(left, right):
    return left.join(
        right, (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi"))
    )


def _pairs(df):
    return sorted((r["row_id"], r["iv_id"]) for r in df.select("row_id", "iv_id").collect())


def test_matches_nested_loop_on_overlapping_intervals(spark):
    left = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0.0, 4.99, 5.0, 7.5, 10.0, 12.0, 99.0, -3.0])],
        "row_id: int, v: double",
    )
    right = spark.createDataFrame(
        [
            (0, 0.0, 5.0),
            (1, 5.0, 10.0),
            (2, 2.5, 7.5),   # overlaps both
            (3, 10.0, 10.0), # empty interval: matches nothing
            (4, -10.0, 0.5), # negative lo
        ],
        "iv_id: int, lo: double, hi: double",
    )
    for w in (0.7, 2.5, 5.0, 50.0):
        got = _pairs(bin_range_join(left, "v", right, "lo", "hi", bin_width=w))
        want = _pairs(_reference(left, right))
        assert got == want, f"bin_width={w}: {got} != {want}"


def test_shuffle_path_equals_broadcast_path(spark):
    left = spark.createDataFrame(
        [(i, float(i % 37)) for i in range(500)], "row_id: int, v: double"
    )
    right = spark.createDataFrame(
        [(j, j * 3.0, j * 3.0 + 4.0) for j in range(12)], "iv_id: int, lo: double, hi: double"
    )
    a = _pairs(bin_range_join(left, "v", right, "lo", "hi", 4.0, broadcast_right=True))
    b = _pairs(bin_range_join(left, "v", right, "lo", "hi", 4.0, broadcast_right=False))
    assert a == b and len(a) > 0
