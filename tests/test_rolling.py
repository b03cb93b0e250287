"""rolling_stats (operators/timeseries.py) — trailing time-RANGE frame.

Oracle gate: q_rolling_user_value_7d in tests/test_oracle_parity.py.
Here: hand-built frame-boundary semantics (inclusive both ends, µs
granularity) and the exact-average contract.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import Row

from kafka_flow_spark.operators.timeseries import rolling_stats

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(eid, us_offset, value, user=1):
    return Row(
        event_id=eid,
        user_id=user,
        ts=T0 + dt.timedelta(microseconds=us_offset),
        value=value,
    )


def test_frame_is_inclusive_both_ends_at_us_granularity(spark):
    window_s = 10
    rows = [
        _ev(0, 0, 1.0),
        _ev(1, 10 * 1_000_000, 2.0),  # exactly window_s after e0 -> includes e0
        _ev(2, 20 * 1_000_000, 4.0),  # frame [10s, 20s] -> includes e1, not e0
        _ev(3, 30 * 1_000_000 + 1, 8.0),  # frame [20.000001, 30.000001]:
        # e2 at 20.000000s is 1µs below the lower bound -> excluded
    ]
    df = spark.createDataFrame(rows)
    got = {
        r["event_id"]: (r["roll_n"], r["roll_sum"], r["roll_avg"])
        for r in rolling_stats(df, "user_id", "ts", "value", window_s).collect()
    }
    assert got[0] == (1, 1.0, 1.0)
    assert got[1] == (2, 3.0, 1.5)  # boundary event included (inclusive frame)
    assert got[2] == (2, 6.0, 3.0)  # e0 aged out, e1 on the boundary stays
    assert got[3] == (1, 8.0, 8.0)  # µs-exact exclusion just past the bound


def test_keys_are_independent_and_negative_values_average_exactly(spark):
    rows = [
        _ev(0, 0, -1.11, user=1),
        _ev(1, 1, -2.22, user=1),
        _ev(2, 0, 5.0, user=2),
    ]
    df = spark.createDataFrame(rows)
    got = {
        r["event_id"]: (r["roll_n"], r["roll_sum"], r["roll_avg"])
        for r in rolling_stats(df, "user_id", "ts", "value", 60).collect()
    }
    assert got[0] == (1, -1.11, -1.11)
    # -3.33 / 2 = -1.665 -> half-away-from-zero at 4dp = -1.665
    assert got[1] == (2, -3.33, -1.665)
    assert got[2] == (1, 5.0, 5.0)


# --- mad_outliers (operators/profile.py) ----------------------------------


def test_mad_outliers_hand_worked(spark):
    from pyspark.sql import Row

    from kafka_flow_spark.operators.profile import mad_outliers

    # group a: values 1..7 plus a wild 100 -> n=8, sorted [1..7,100]
    # med (disc, ceil(0.5*8)=4th) = 4; devs [3,2,1,0,1,2,3,96] sorted
    # [0,1,1,2,2,3,3,96] -> mad = 4th = 2; outliers: dev > 6 -> only 100
    rows = [Row(id=i, g="a", v=v) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 100])]
    # group b: constant -> mad 0, every off-median row flags (documented)
    rows += [Row(id=10, g="b", v=5), Row(id=11, g="b", v=5), Row(id=12, g="b", v=9)]
    out = mad_outliers(spark.createDataFrame(rows), "v", ["g"], k=3).collect()
    got = {(r["id"]): (r["med"], r["abs_dev"], r["mad"]) for r in out}
    assert got == {7: (4, 96, 2), 12: (5, 4, 0)}


# --- histogram_emd (operators/profile.py) ---------------------------------


def test_histogram_emd_hand_worked(spark):
    from pyspark.sql import Row

    from kafka_flow_spark.operators.profile import histogram_emd

    # group g: A = {0, 10, 10}, B = {20, 20, 30} at bin_width 10
    # bins: A -> {0:1, 1:2}, B -> {2:2, 3:1}; na = nb = 3
    # |cuma*nb - cumb*na| per bin: bin0 |1*3-0|=3, bin1 |3*3-0|=9,
    # bin2 |9-6|=3, bin3 |9-9|=0; spans 1,1,1,0 -> emd_num = 15
    # cross-check by optimal transport: 0->2 (2 bins) + 1->2 (1) + 1->3 (2)
    # = 5 bin-moves / 3 mass * 10 width = 10 * 15 / 9
    a = [Row(g="g", v=0), Row(g="g", v=10), Row(g="g", v=10)]
    b = [Row(g="g", v=20), Row(g="g", v=20), Row(g="g", v=30)]
    out = histogram_emd(
        spark.createDataFrame(a), spark.createDataFrame(b), "v", ["g"], 10
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_a"], r["n_b"], r["emd_num"]) == (3, 3, 15)
    assert r["emd"] == (10.0 * 15.0) / 9.0


def test_histogram_emd_identical_distributions_zero(spark):
    from pyspark.sql import Row

    from kafka_flow_spark.operators.profile import histogram_emd

    rows = [Row(g="x", v=int(i)) for i in [5, 17, 17, 92, 300]]
    df = spark.createDataFrame(rows)
    r = histogram_emd(df, df, "v", ["g"], 7).collect()[0]
    assert r["emd_num"] == 0 and r["emd"] == 0.0


def test_histogram_emd_empty_side_is_null(spark):
    from pyspark.sql import Row

    from kafka_flow_spark.operators.profile import histogram_emd

    a = spark.createDataFrame([Row(g="only_a", v=1)])
    b = spark.createDataFrame([Row(g="only_b", v=2)])
    got = {r["g"]: r["emd"] for r in histogram_emd(a, b, "v", ["g"], 10).collect()}
    assert got == {"only_a": None, "only_b": None}


# --- session_transitions (operators/timeseries.py) ------------------------


def test_session_transitions_hand_worked(spark):
    from kafka_flow_spark.operators.timeseries import session_transitions

    m = 60 * 1_000_000  # one minute in µs
    rows = [
        # user 1, session 1: A -> B -> A
        _ev(0, 0 * m, 0.0), _ev(1, 1 * m, 0.0), _ev(2, 2 * m, 0.0),
        # 45-min gap -> session 2: B -> B
        _ev(3, 47 * m, 0.0), _ev(4, 48 * m, 0.0),
        # user 2: single session A -> B
        _ev(5, 0, 0.0, user=2), _ev(6, 1 * m, 0.0, user=2),
    ]
    from pyspark.sql import functions as F

    labels = {0: "A", 1: "B", 2: "A", 3: "B", 4: "B", 5: "A", 6: "B"}
    lab = F.create_map(*[F.lit(x) for kv in labels.items() for x in kv])
    df = spark.createDataFrame(rows).withColumn("event_type", lab[F.col("event_id")])
    got = {
        (r["from_label"], r["to_label"]): (r["n"], r["rank"])
        for r in session_transitions(
            df, "user_id", "ts", "event_type", "event_id", gap_seconds=1800
        ).collect()
    }
    # transitions: u1s1 A->B, B->A ; u1s2 B->B ; u2 A->B  (no cross-gap pair)
    assert got == {
        ("A", "B"): (2, 1),
        ("B", "A"): (1, 2),
        ("B", "B"): (1, 3),
    }


def test_histogram_emd_negative_values_floor_binned(spark):
    from pyspark.sql import Row

    from kafka_flow_spark.operators.profile import histogram_emd

    # -60 -> bin -1, +60 -> bin 0 (floor division; truncation would merge
    # both into a double-width bin 0 and report zero drift)
    a = spark.createDataFrame([Row(g="g", v=-60)])
    b = spark.createDataFrame([Row(g="g", v=60)])
    r = histogram_emd(a, b, "v", ["g"], 100).collect()[0]
    assert r["emd_num"] == 1 and r["emd"] == 100.0


# --- winsorize (operators/profile.py) -------------------------------------


def test_winsorize_clamps_to_exact_band(spark):
    from pyspark.sql import Row

    from kafka_flow_spark.operators.profile import winsorize

    # 1..20: p_10 = 2 (cum 2 >= 0.1*20), p_90 = 18
    rows = [Row(g="x", id=i, v=i) for i in range(1, 21)]
    out = winsorize(
        spark.createDataFrame(rows), "v", ["g"], lo=0.10, hi=0.90
    ).collect()
    got = {r["id"]: r["value_w"] for r in out}
    assert all(r["p_lo"] == 2 and r["p_hi"] == 18 for r in out)
    assert got[1] == 2 and got[2] == 2
    assert got[10] == 10
    assert got[19] == 18 and got[20] == 18


def test_winsorize_rejects_bad_band(spark):
    from pyspark.sql import Row

    from kafka_flow_spark.operators.profile import winsorize

    df = spark.createDataFrame([Row(g="x", v=1)])
    with pytest.raises(ValueError, match="lo < hi"):
        winsorize(df, "v", ["g"], lo=0.9, hi=0.5)


# --- windowed_histogram / windowed_drift ----------------------------------


def test_windowed_drift_stream_matches_batch(spark, tmp_path):
    from datetime import datetime

    from kafka_flow_spark.operators.profile import (
        floor_bin_expr,
        windowed_drift,
        windowed_histogram,
    )
    from pyspark.sql import functions as F

    schema = "ts TIMESTAMP, vc BIGINT"
    rows = [
        (datetime(2026, 1, 1, 12, 0, 10), 100),
        (datetime(2026, 1, 1, 12, 0, 20), 250),
        (datetime(2026, 1, 1, 12, 1, 0), 250),
        (datetime(2026, 1, 1, 13, 7, 0), 900),   # second hour, shifted dist
        (datetime(2026, 1, 1, 15, 0, 0), 100),   # advances watermark
    ]
    input_dir, chk = str(tmp_path / "in"), str(tmp_path / "chk")
    out_dir = str(tmp_path / "out")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(input_dir)
    stream = spark.readStream.schema(schema).parquet(input_dir)
    q = (
        windowed_histogram(stream, "ts", "vc", 100, "1 hour", watermark="1 minute")
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.read.parquet(out_dir)
    batch_df = spark.createDataFrame(rows, schema)
    ref = (
        batch_df.select(floor_bin_expr("vc", 100).alias("_bin"))
        .groupBy("_bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # stream-emitted windows scored against the reference == batch pipeline
    # restricted to the same (watermark-closed) windows
    got = {
        r["window_start"].hour: (r["n_a"], r["n_b"], r["emd_num"], r["emd"])
        for r in windowed_drift(emitted, ref, 100).collect()
    }
    batch_wh = windowed_histogram(batch_df, "ts", "vc", 100, "1 hour")
    want = {
        r["window_start"].hour: (r["n_a"], r["n_b"], r["emd_num"], r["emd"])
        for r in windowed_drift(batch_wh, ref, 100).collect()
        if r["window_start"].hour in got
    }
    assert got == want and len(got) >= 2
    # the shifted 13:00 window must show MORE drift than the 12:00 one
    assert got[13][3] > got[12][3]


# --- cross-operator properties --------------------------------------------


def test_table_diff_self_is_all_unchanged(spark):
    from pyspark.sql import functions as F

    from kafka_flow_spark.operators.incremental import table_diff
    from kafka_flow_spark.tables import load
    from tests.conftest import SF_SMALL

    orders = load(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    d = table_diff(orders, orders, ["o_orderkey"])
    assert d.where(F.col("status") != "unchanged").count() == 0


def test_histogram_emd_is_symmetric(spark):
    import random

    from pyspark.sql import Row

    from kafka_flow_spark.operators.profile import histogram_emd

    rng = random.Random(11)
    a = spark.createDataFrame(
        [Row(g="g", v=rng.randrange(-500, 500)) for _ in range(300)]
    )
    b = spark.createDataFrame(
        [Row(g="g", v=rng.randrange(-200, 900)) for _ in range(200)]
    )
    ab = histogram_emd(a, b, "v", ["g"], 50).collect()[0]
    ba = histogram_emd(b, a, "v", ["g"], 50).collect()[0]
    assert ab["emd_num"] == ba["emd_num"]
    assert ab["emd"] == ba["emd"]
    assert (ab["n_a"], ab["n_b"]) == (ba["n_b"], ba["n_a"])


def test_rolling_stats_matches_pandas(spark):
    """Differential vs pandas' time-indexed rolling on random data."""
    import random

    import pandas as pd

    rng = random.Random(13)
    rows = []
    eid = 0
    for user in range(3):
        t = 0
        for _ in range(40):
            t += rng.randrange(1, 4 * 3600 * 1_000_000)  # 1µs .. 4h gaps
            rows.append(_ev(eid, t, round(rng.uniform(-50, 50), 2), user=user))
            eid += 1
    got = {
        r["event_id"]: (r["roll_n"], r["roll_sum"])
        for r in rolling_stats(
            spark.createDataFrame(rows), "user_id", "ts", "value", 6 * 3600
        ).collect()
    }
    pdf = pd.DataFrame([r.asDict() for r in rows])
    for user, grp in pdf.groupby("user_id"):
        g = grp.set_index("ts").sort_index()
        # pandas rolling on cents to mirror the exact integer contract
        cents = (g["value"] * 100).round().astype("int64")
        n = cents.rolling("6h").count()
        s = cents.rolling("6h").sum()
        for eid_, want_n, want_s in zip(g["event_id"], n, s):
            assert got[eid_][0] == int(want_n)
            # ours is the correctly-rounded double of the exact cents
            # rational; pandas' float division may differ in the last ulp
            assert abs(got[eid_][1] - want_s / 100.0) < 1e-9


# --- SCD2 interval history ---------------------------------------------------


def test_scd2_hand_worked(spark):
    from kafka_flow_spark.operators.timeseries import scd2_history

    rows = [
        # user 1: A A B A  -> three intervals (A x2, B, A)
        (1, 10, "A", 100),
        (1, 20, "A", 101),
        (1, 30, "B", 102),
        (1, 40, "A", 103),
        # user 2: one event -> single open interval
        (2, 15, "X", 200),
    ]
    df = spark.createDataFrame(rows, "user INT, us BIGINT, v STRING, eid INT")
    got = [
        (r["user"], r["v"], r["valid_from"], r["valid_to"], r["is_current"], r["n_events"])
        for r in scd2_history(df, "user", "us", "v", "eid")
        .orderBy("user", "valid_from")
        .collect()
    ]
    assert got == [
        (1, "A", 10, 30, False, 2),
        (1, "B", 30, 40, False, 1),
        (1, "A", 40, None, True, 1),
        (2, "X", 15, None, True, 1),
    ]


def test_scd2_intervals_tile_and_one_current(spark):
    """Property on real data: per key, intervals tile [first_ts, inf) with no
    gaps/overlaps (valid_to == next valid_from), exactly one open row, and
    n_events sums to the key's event count."""
    from pyspark.sql import functions as F

    from kafka_flow_spark.plans.registry import all_queries
    from kafka_flow_spark.tables import load
    from tests.conftest import SF_SMALL

    out = all_queries()["q_scd2_history"](spark, SF_SMALL)
    assert out.where(F.col("is_current")).groupBy("user_id").count().where(
        "count != 1"
    ).count() == 0
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("valid_from_us")
    gaps = out.withColumn("nxt", F.lead("valid_from_us").over(w)).where(
        F.col("valid_to_us").isNotNull() & (F.col("valid_to_us") != F.col("nxt"))
    )
    assert gaps.count() == 0
    ev = load(spark, SF_SMALL, "events").groupBy("user_id").count()
    tot = out.groupBy("user_id").agg(F.sum("n_events").alias("n"))
    assert ev.join(tot, "user_id").where("count != n").count() == 0


def test_scd2_null_values_form_runs(spark):
    from kafka_flow_spark.operators.timeseries import scd2_history

    rows = [(1, 10, None, 1), (1, 20, None, 2), (1, 30, "A", 3)]
    df = spark.createDataFrame(rows, "user INT, us BIGINT, v STRING, eid INT")
    got = [
        (r["v"], r["valid_from"], r["n_events"])
        for r in scd2_history(df, "user", "us", "v", "eid")
        .orderBy("valid_from")
        .collect()
    ]
    assert got == [(None, 10, 2), ("A", 30, 1)]


# --- per-group OLS trend ------------------------------------------------------


def test_group_trend_hand_worked(spark):
    from kafka_flow_spark.operators.timeseries import group_trend

    rows = [
        # key 1: y = 100 + 50x  -> slope 50, scaled 500000
        (1, 10, 100), (1, 11, 150), (1, 12, 200),
        # key 2: perfectly flat -> slope 0
        (2, 5, 70), (2, 6, 70),
        # key 3: single point -> den 0 -> NULL slope
        (3, 9, 40),
        # key 4: downward trend, negative numerator branch
        (4, 0, 100), (4, 1, 0),
    ]
    df = spark.createDataFrame(rows, "k INT, x INT, y INT")
    got = {
        r["k"]: (r["n_points"], r["slope_scaled"], r["avg_y_scaled"])
        for r in group_trend(df, "k", "x", "y").collect()
    }
    assert got[1] == (3, 50 * 10000, 150 * 10000)
    assert got[2] == (2, 0, 70 * 10000)
    assert got[3] == (1, None, 40 * 10000)
    assert got[4] == (2, -100 * 10000, 50 * 10000)


def test_group_trend_matches_numpy(spark):
    import numpy as np

    from kafka_flow_spark.operators.timeseries import group_trend

    rng = np.random.RandomState(17)
    rows = []
    for k in range(5):
        xs = sorted(rng.choice(1000, size=30, replace=False))
        for x in xs:
            rows.append((k, int(x), int(rng.randint(-500, 500))))
    df = spark.createDataFrame(rows, "k INT, x INT, y INT")
    got = {r["k"]: r["slope_scaled"] for r in group_trend(df, "k", "x", "y").collect()}
    for k in range(5):
        pts = [(x, y) for kk, x, y in rows if kk == k]
        n = len(pts)
        sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts); sxx = sum(x * x for x, _ in pts)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        want = (num * 10000) // den if num >= 0 else -((-num * 10000) // den)
        assert got[k] == want, k
        # and the truncated value brackets the float OLS slope
        float_slope = np.polyfit([x for x, _ in pts], [y for _, y in pts], 1)[0]
        assert abs(got[k] / 10000.0 - float_slope) < 1e-3


# --- PSI drift ----------------------------------------------------------------


def test_psi_hand_worked(spark):
    """Two-bin toy: identical distributions -> PSI 0; checked against a
    literal python computation of the smoothed formula."""
    import math

    from kafka_flow_spark.operators.profile import histogram_psi

    a = spark.createDataFrame([("g", v) for v in [0, 0, 10, 10]], "g STRING, v INT")
    same = histogram_psi(a, a, "v", ["g"], 10).collect()[0]
    assert same["psi_micro"] == 0 and same["n_bins"] == 2

    b = spark.createDataFrame([("g", v) for v in [0, 10, 10, 10]], "g STRING, v INT")
    got = histogram_psi(a, b, "v", ["g"], 10).collect()[0]
    # bins: a = {0: 2, 1: 2}, b = {0: 1, 1: 3}; B=2, na=nb=4
    want = 0
    for ca, cb in [(2, 1), (2, 3)]:
        p, q = (ca + 1) / 6, (cb + 1) / 6
        want += round((p - q) * math.log(p / q) * 1_000_000)
    assert got["psi_micro"] == want


def test_psi_symmetry_and_empty_side(spark):
    from pyspark.sql import functions as F

    from kafka_flow_spark.operators.profile import histogram_psi

    a = spark.createDataFrame([("g", v) for v in [0, 0, 10]], "g STRING, v INT")
    b = spark.createDataFrame([("g", v) for v in [0, 10, 10]], "g STRING, v INT")
    ab = histogram_psi(a, b, "v", ["g"], 10).collect()[0]["psi_micro"]
    ba = histogram_psi(b, a, "v", ["g"], 10).collect()[0]["psi_micro"]
    assert ab == ba and ab > 0  # PSI is symmetric in (p-q)ln(p/q)
    empty = a.where(F.lit(False))
    r = histogram_psi(a, empty, "v", ["g"], 10).collect()[0]
    assert r["psi_micro"] is None and r["n_b"] == 0
