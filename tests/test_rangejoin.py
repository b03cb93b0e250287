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


# --- interval x interval overlap join -----------------------------------------


def test_interval_overlap_hand_worked(spark):
    from kafka_flow_spark.operators.rangejoin import interval_overlap_join

    left = spark.createDataFrame(
        [(1, 0, 100), (2, 200, 300), (3, 150, 160)], "lid INT, lo BIGINT, hi BIGINT"
    )
    right = spark.createDataFrame(
        [(10, 50, 150), (11, 100, 200), (12, 250, 260), (13, 500, 600)],
        "rid INT, lo2 BIGINT, hi2 BIGINT",
    )
    got = {
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left, right, "lo", "hi", "lo2", "hi2", bin_width=64
        ).collect()
    }
    # half-open overlap: (1,10) yes; (1,11) touch at 100 -> NO; (2,12) yes;
    # (3,11) 150..160 vs 100..200 yes; (2,11) touch at 200 -> NO
    assert got == {(1, 10), (2, 12), (3, 11)}


def test_interval_overlap_no_duplicates_wide_spans(spark):
    """A pair overlapping across MANY bins must still be emitted once."""
    from kafka_flow_spark.operators.rangejoin import interval_overlap_join

    left = spark.createDataFrame([(1, 0, 1000)], "lid INT, lo BIGINT, hi BIGINT")
    right = spark.createDataFrame([(2, 1, 999)], "rid INT, lo2 BIGINT, hi2 BIGINT")
    rows = interval_overlap_join(
        left, right, "lo", "hi", "lo2", "hi2", bin_width=10
    ).collect()
    assert len(rows) == 1


def test_interval_overlap_matches_bruteforce_random(spark):
    import random

    from kafka_flow_spark.operators.rangejoin import interval_overlap_join

    rng = random.Random(99)
    L = [(i, rng.randrange(0, 5000), 0) for i in range(80)]
    L = [(i, lo, lo + rng.randrange(1, 400)) for i, lo, _ in L]
    R = [(i, rng.randrange(0, 5000), 0) for i in range(80)]
    R = [(i, lo, lo + rng.randrange(1, 400)) for i, lo, _ in R]
    lf = spark.createDataFrame(L, "lid INT, lo BIGINT, hi BIGINT")
    rf = spark.createDataFrame(R, "rid INT, lo2 BIGINT, hi2 BIGINT")
    got = {
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            lf, rf, "lo", "hi", "lo2", "hi2", bin_width=128
        ).collect()
    }
    want = {
        (li, ri)
        for li, llo, lhi in L
        for ri, rlo, rhi in R
        if llo < rhi and rlo < lhi
    }
    assert got == want
