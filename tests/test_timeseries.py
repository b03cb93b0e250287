"""resample_ffill / funnel_steps contracts on handmade series (oracle-parity
covers corpus-level equivalence at sf0.001/sf0.01)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from kafka_flow_spark.operators.timeseries import funnel_steps, resample_ffill


def _ts(h, m=0):
    return datetime(2024, 1, 1, h, m)


def test_resample_ffill_carries_latest_and_leads_null(spark):
    df = spark.createDataFrame(
        [(1, _ts(0, 10), 1.0, 100), (1, _ts(2, 40), 2.0, 101)],
        "user_id BIGINT, ts TIMESTAMP_NTZ, value DOUBLE, event_id BIGINT",
    )
    rows = resample_ffill(df, "user_id", "ts", "value", "1 hour", "event_id").orderBy(
        "grid_ts"
    ).collect()
    got = [(r["grid_ts"].hour, r["value"]) for r in rows]
    # grid 00:00 precedes the first observation -> NULL; 01:00 and 02:00 carry
    # the 00:10 value; the 02:40 event is after the last grid point.
    assert got == [(0, None), (1, 1.0), (2, 1.0)]


def test_resample_ffill_tiebreak_is_max_by(spark):
    df = spark.createDataFrame(
        [(1, _ts(1), 5.0, 7), (1, _ts(1), 9.0, 8), (1, _ts(3), 1.0, 9)],
        "user_id BIGINT, ts TIMESTAMP_NTZ, value DOUBLE, event_id BIGINT",
    )
    rows = resample_ffill(df, "user_id", "ts", "value", "1 hour", "event_id").orderBy(
        "grid_ts"
    ).collect()
    # at 01:00 the event with the larger event_id (value 9.0) wins the tie
    assert [(r["grid_ts"].hour, r["value"]) for r in rows] == [
        (1, 9.0), (2, 9.0), (3, 1.0),
    ]


def test_resample_ffill_grid_point_samples_after_coincident_event(spark):
    df = spark.createDataFrame(
        [(1, _ts(1), 4.0, 1), (1, _ts(2), 6.0, 2)],
        "user_id BIGINT, ts TIMESTAMP_NTZ, value DOUBLE, event_id BIGINT",
    )
    rows = resample_ffill(df, "user_id", "ts", "value", "1 hour", "event_id").orderBy(
        "grid_ts"
    ).collect()
    # events fall exactly ON grid points: the grid row samples the event
    assert [(r["grid_ts"].hour, r["value"]) for r in rows] == [(1, 4.0), (2, 6.0)]


def test_resample_ffill_boundary_event_survives_later_same_bucket_event(spark):
    # Regression: a later event in the SAME bucket must not evict the
    # boundary-coincident observation from the bucket reduction — grid 01:00
    # samples the 01:00 event even though 01:30 is the bucket's last event.
    df = spark.createDataFrame(
        [(1, _ts(1), 4.0, 1), (1, _ts(1, 30), 6.0, 2), (1, _ts(3), 9.0, 3)],
        "user_id BIGINT, ts TIMESTAMP_NTZ, value DOUBLE, event_id BIGINT",
    )
    rows = resample_ffill(df, "user_id", "ts", "value", "1 hour", "event_id").orderBy(
        "grid_ts"
    ).collect()
    assert [(r["grid_ts"].hour, r["value"]) for r in rows] == [
        (1, 4.0), (2, 6.0), (3, 9.0),
    ]


def test_resample_ffill_null_boundary_value_is_a_gap(spark):
    # A NULL-valued observation exactly on the grid point is a gap: the grid
    # row carries the previous value, and the bucket's later event still
    # feeds the next grid point.
    df = spark.createDataFrame(
        [(1, _ts(0, 30), 2.0, 1), (1, _ts(1), None, 2), (1, _ts(1, 45), 5.0, 3),
         (1, _ts(2, 10), 7.0, 4)],
        "user_id BIGINT, ts TIMESTAMP_NTZ, value DOUBLE, event_id BIGINT",
    )
    rows = resample_ffill(df, "user_id", "ts", "value", "1 hour", "event_id").orderBy(
        "grid_ts"
    ).collect()
    assert [(r["grid_ts"].hour, r["value"]) for r in rows] == [
        (0, None), (1, 2.0), (2, 5.0),
    ]


def test_cohort_retention_rejects_unsupported_period(spark):
    from kafka_flow_spark.operators.timeseries import cohort_retention

    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 2))], "user_id BIGINT, ts TIMESTAMP_NTZ"
    )
    with pytest.raises(ValueError, match="period"):
        cohort_retention(df, "user_id", "ts", "month")


def _funnel_df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id BIGINT, ts TIMESTAMP_NTZ, event_type STRING"
    )


def test_funnel_full_chain_and_strict_order(spark):
    df = _funnel_df(
        spark,
        [
            # user 1: proper view -> click -> purchase
            (1, _ts(1), "view"), (1, _ts(2), "click"), (1, _ts(3), "purchase"),
            # user 2: click BEFORE any view never counts; purchase without a
            # counted click never counts
            (2, _ts(1), "click"), (2, _ts(2), "view"), (2, _ts(3), "purchase"),
            # user 3: view only
            (3, _ts(5), "view"),
        ],
    )
    out = {
        r["user_id"]: r
        for r in funnel_steps(df, "user_id", "ts", "event_type",
                              ["view", "click", "purchase"]).collect()
    }
    assert out[1]["depth"] == 3 and out[1]["t3"] == _ts(3)
    # user 2: t1 = view@2, no click after 2 -> depth 1
    assert out[2]["depth"] == 1 and out[2]["t2"] is None and out[2]["t3"] is None
    assert out[3]["depth"] == 1


def test_funnel_earliest_qualifying_step_wins(spark):
    df = _funnel_df(
        spark,
        [
            (1, _ts(1), "view"), (1, _ts(4), "view"),
            (1, _ts(2), "click"), (1, _ts(6), "click"),
            (1, _ts(5), "purchase"),
        ],
    )
    r = funnel_steps(df, "user_id", "ts", "event_type",
                     ["view", "click", "purchase"]).collect()[0]
    # t1 = first view (1), t2 = first click after 1 (2), t3 = first purchase
    # after 2 (5) — the later view/click must not shift earlier anchors
    assert (r["t1"], r["t2"], r["t3"], r["depth"]) == (_ts(1), _ts(2), _ts(5), 3)


def test_funnel_requires_steps(spark):
    with pytest.raises(ValueError):
        funnel_steps(_funnel_df(spark, [(1, _ts(1), "view")]),
                     "user_id", "ts", "event_type", [])


def test_cohort_retention_hand_checked(spark):
    from kafka_flow_spark.operators.timeseries import cohort_retention

    # cohort of Mon Jan 1: users 1,2 first seen wk0; user 1 returns wk1.
    # cohort of Mon Jan 8: user 3 only.
    rows = [
        (1, datetime(2024, 1, 2)), (2, datetime(2024, 1, 3)),
        (1, datetime(2024, 1, 10)),
        (3, datetime(2024, 1, 9)),
    ]
    df = spark.createDataFrame(rows, "user_id BIGINT, ts TIMESTAMP_NTZ")
    out = {
        (r["cohort"].day, r["period_offset"]): (r["n_active"], r["n_cohort"], r["retention"])
        for r in cohort_retention(df, "user_id", "ts", "week").collect()
    }
    assert out[(1, 0)] == (2, 2, 1.0)
    assert out[(1, 1)] == (1, 2, 0.5)
    assert out[(8, 0)] == (1, 1, 1.0)
    assert len(out) == 3
