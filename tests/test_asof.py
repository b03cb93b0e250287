"""Directional + tolerance semantics of the as-of join (pandas merge_asof
surface) on hand-checkable timelines.  The registry queries cover the
oracle-exact contract; these pin the corner semantics: inclusive equality,
direction, tolerance nulling, and missing-match behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_flow_spark.operators.asof import asof_join

import pytest


def _sides(spark):
    left = spark.createDataFrame(
        [("u", 100, "L1"), ("u", 205, "L2"), ("v", 50, "L3")],
        "k string, t long, lbl string",
    )
    right = spark.createDataFrame(
        [("u", 90, "A"), ("u", 100, "B"), ("u", 210, "C")],
        "k string, t long, p string",
    )
    return left, right


def test_backward_inclusive_latest(spark):
    left, right = _sides(spark)
    out = {r.lbl: r.p for r in asof_join(left, right, ["k"], "t", "t", ["p"]).collect()}
    assert out == {"L1": "B", "L2": "B", "L3": None}  # equal time matches; no future


def test_forward_inclusive_earliest(spark):
    left, right = _sides(spark)
    out = {
        r.lbl: r.p
        for r in asof_join(
            left, right, ["k"], "t", "t", ["p"], direction="forward"
        ).collect()
    }
    assert out == {"L1": "B", "L2": "C", "L3": None}


def test_tolerance_nulls_far_matches(spark):
    left, right = _sides(spark)
    out = {
        r.lbl: r.p
        for r in asof_join(
            left, right, ["k"], "t", "t", ["p"],
            direction="forward", tolerance=F.lit(4),
        ).collect()
    }
    # L2 (t=205) -> C (t=210) is 5 away: nulled by tolerance 4
    assert out == {"L1": "B", "L2": None, "L3": None}


def test_backward_tolerance(spark):
    left, right = _sides(spark)
    out = {
        r.lbl: r.p
        for r in asof_join(
            left, right, ["k"], "t", "t", ["p"], tolerance=F.lit(50)
        ).collect()
    }
    # L2 (t=205) matches B (t=100), 105 away: nulled
    assert out == {"L1": "B", "L2": None, "L3": None}


def test_bad_direction_raises(spark):
    left, right = _sides(spark)
    with pytest.raises(ValueError):
        asof_join(left, right, ["k"], "t", "t", ["p"], direction="nearest")
