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


# --- ewma_anomaly ---


def _ewma(spark, vals, threshold=0, k=4):
    from kafka_flow_spark.operators.timeseries import ewma_anomaly

    rows = [(1, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key BIGINT, seq BIGINT, x BIGINT")
    out = ewma_anomaly(df, "key", ["seq"], "x", k=k, threshold=threshold)
    return sorted(
        (r["seq"], r["ewma"], r["deviation"], r["is_anomaly"])
        for r in out.collect()
    )


def test_ewma_hand_computed():
    # pure-python mirror of the weighting used in the asserts below
    def ewma_py(hist, k=4):
        hist = hist[-k:][::-1]  # most recent first
        w = [2 ** (k - j) for j in range(1, len(hist) + 1)]
        return sum(wi * xi for wi, xi in zip(w, hist)) // sum(w)

    assert ewma_py([100]) == 100
    assert ewma_py([100, 200]) == (8 * 200 + 4 * 100) // 12
    assert ewma_py([0, 0, 0, 0, 150]) == 150 * 8 // 15


def test_ewma_first_row_null_never_flags(spark):
    got = _ewma(spark, [1000], threshold=0)
    assert got == [(0, None, None, False)]


def test_ewma_ramp_in_renormalizes(spark):
    got = _ewma(spark, [100, 200, 50])
    # row1: only x1=100 -> den 8 -> ewma 100
    assert got[1] == (1, 100, 100, True)
    # row2: x1=200,x2=100 -> (8*200+4*100)//12 = 166
    assert got[2] == (2, 166, 50 - 166, True)


def test_ewma_full_window_and_threshold(spark):
    vals = [100, 100, 100, 100, 100, 175]
    got = _ewma(spark, vals, threshold=80)
    # row5 has 4 predecessors all 100 -> ewma (8+4+2+1)*100//15 = 100
    assert got[5] == (5, 100, 75, False)  # 75 <= 80: below the bar
    got_hot = _ewma(spark, [100, 100, 100, 100, 100, 300], threshold=80)
    assert got_hot[5] == (5, 100, 200, True)


def test_ewma_keys_are_independent(spark):
    from kafka_flow_spark.operators.timeseries import ewma_anomaly

    rows = [(1, 0, 10), (1, 1, 20), (2, 0, 9000)]
    df = spark.createDataFrame(rows, "key BIGINT, seq BIGINT, x BIGINT")
    out = ewma_anomaly(df, "key", ["seq"], "x", k=4, threshold=0)
    by = {(r["key"], r["seq"]): r["ewma"] for r in out.collect()}
    assert by[(2, 0)] is None  # key 2's first row ignores key 1's history
    assert by[(1, 1)] == 10


def test_ewma_validates_args(spark):
    import pytest as _pytest

    from kafka_flow_spark.operators.timeseries import ewma_anomaly

    df = spark.createDataFrame([(1, 0, 1)], "key BIGINT, seq BIGINT, x BIGINT")
    with _pytest.raises(ValueError, match="k must be"):
        ewma_anomaly(df, "key", ["seq"], "x", k=0)
    with _pytest.raises(ValueError, match="threshold must be"):
        ewma_anomaly(df, "key", ["seq"], "x", threshold=-1)
