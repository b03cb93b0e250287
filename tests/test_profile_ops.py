"""group_corr / cusum_changepoint / key_skew_report (operators/profile.py)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from kafka_flow_spark.operators.profile import (
    cusum_changepoint,
    group_corr,
    key_skew_report,
    seasonal_residuals,
)


def test_group_corr_matches_python_mirror(spark):
    rows = [
        ("a", 1, 10), ("a", 2, 19), ("a", 3, 31), ("a", 4, 42), ("a", 5, 48),
        ("b", 1, 50), ("b", 2, 40), ("b", 3, 28), ("b", 4, 22),
    ]
    df = spark.createDataFrame(rows, "g STRING, x BIGINT, y BIGINT")
    got = {r["g"]: (r["n_points"], r["corr"]) for r in group_corr(df, "g", "x", "y").collect()}

    def py_corr(pts):
        n = len(pts)
        sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts); syy = sum(y * y for _, y in pts)
        return round((n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)

    a = [(x, y) for g, x, y in rows if g == "a"]
    b = [(x, y) for g, x, y in rows if g == "b"]
    assert got["a"] == (5, py_corr(a))
    assert got["b"] == (4, py_corr(b))
    assert got["a"][1] > 0.99 and got["b"][1] < -0.99


def test_group_corr_degenerate_groups_null(spark):
    rows = [("const", 1, 7), ("const", 2, 7), ("single", 1, 3)]
    df = spark.createDataFrame(rows, "g STRING, x BIGINT, y BIGINT")
    got = {r["g"]: r["corr"] for r in group_corr(df, "g", "x", "y").collect()}
    assert got["const"] is None  # zero y-variance
    assert got["single"] is None  # n < 2


def test_cusum_finds_obvious_level_shift(spark):
    # level 10 for days 0..9, level 30 for days 10..19 -> changepoint day 9
    rows = [("m", d, 10 if d < 10 else 30) for d in range(20)]
    df = spark.createDataFrame(rows, "k STRING, day BIGINT, n BIGINT")
    [r] = cusum_changepoint(df, "k", "day", "n").collect()
    assert r["n_buckets"] == 20 and r["total"] == 400
    # S'_k = 20*cum_k - k*400 peaks (in |.|) at the last low-level day
    assert r["cp_time"] == 9
    # |S'| at k=10 (day 9): 20*100 - 10*400 = -2000
    assert r["cusum_scaled"] == 2000


def test_cusum_flat_series_ties_to_earliest(spark):
    rows = [("m", d, 5) for d in range(6)]
    df = spark.createDataFrame(rows, "k STRING, day BIGINT, n BIGINT")
    [r] = cusum_changepoint(df, "k", "day", "n").collect()
    # perfectly flat: every S'_k = 0, tie-break -> earliest day
    assert r["cusum_scaled"] == 0 and r["cp_time"] == 0


def test_key_skew_report_hand_worked(spark):
    rows = [(1,)] * 6 + [(2,)] * 3 + [(3,)] * 1
    df = spark.createDataFrame(rows, "k BIGINT")
    out = {r["rank"]: r for r in key_skew_report(df, "k", top_k=2).collect()}
    assert set(out) == {1, 2}
    assert out[1]["key"] == 1 and out[1]["key_count"] == 6
    assert out[2]["key"] == 2 and out[2]["key_count"] == 3
    assert out[1]["n_rows"] == 10 and out[1]["n_keys"] == 3
    # 6 * 3 * 1e6 div 10 = 1_800_000 (1.8x uniform)
    assert out[1]["skew_ppm"] == 1_800_000


def test_seasonal_residuals_hand_worked(spark):
    # weeks of flat 10s except day 8 (phase 1) spikes to 24
    rows = [("m", d, 24 if d == 8 else 10) for d in range(14)]
    df = spark.createDataFrame(rows, "k STRING, day BIGINT, n BIGINT")
    out = {
        r["day"]: r
        for r in seasonal_residuals(df, "k", "day", "n", period=7).collect()
    }
    # phase 1 holds days {1, 8}: total 34, m=2 -> resid(8) = 24*2-34 = 14
    assert out[8]["resid_scaled"] == 14
    assert out[1]["resid_scaled"] == 10 * 2 - 34
    # every other phase is flat -> residual 0
    assert all(r["resid_scaled"] == 0 for d, r in out.items() if d not in (1, 8))


def test_seasonal_residuals_negative_buckets_fold_by_pmod(spark):
    rows = [("m", -7, 5), ("m", 0, 7)]  # both phase 0
    df = spark.createDataFrame(rows, "k STRING, day BIGINT, n BIGINT")
    out = {r["day"]: r["phase"] for r in seasonal_residuals(df, "k", "day", "n").collect()}
    assert out[-7] == 0 and out[0] == 0


# --- embedding drift -----------------------------------------------------------


def test_embedding_drift_python_mirror(spark):
    import math

    from kafka_flow_spark.operators.profile import embedding_drift

    old_rows = [("a", [0.5, -0.25]), ("a", [0.1, 0.3]), ("b", [1.0, 1.0])]
    new_rows = [("a", [0.52, -0.2]), ("a", [0.0, 0.0]), ("a", [0.3, 0.3]),
                ("b", [1.0, 1.0])]
    old = spark.createDataFrame(old_rows, "label STRING, embedding ARRAY<DOUBLE>")
    new = spark.createDataFrame(new_rows, "label STRING, embedding ARRAY<DOUBLE>")
    got = {r["label"]: r for r in embedding_drift(old, new, "embedding", "label").collect()}

    def q(x):
        return math.floor(x * 1_000_000)

    for lbl, o_rows, n_rows in [
        ("a", [v for l, v in old_rows if l == "a"], [v for l, v in new_rows if l == "a"]),
        ("b", [v for l, v in old_rows if l == "b"], [v for l, v in new_rows if l == "b"]),
    ]:
        want = sum(
            abs(sum(q(v[d]) for v in o_rows) * len(n_rows)
                - sum(q(v[d]) for v in n_rows) * len(o_rows))
            for d in range(2)
        )
        assert got[lbl]["drift_l1_scaled"] == want
        assert (got[lbl]["n_old"], got[lbl]["n_new"]) == (len(o_rows), len(n_rows))
    # identical snapshots drift exactly 0
    same = {r["label"]: r["drift_l1_scaled"]
            for r in embedding_drift(old, old, "embedding", "label").collect()}
    assert set(same.values()) == {0}


def test_embedding_drift_detects_shift_and_drops_one_sided_groups(spark):
    from kafka_flow_spark.operators.profile import embedding_drift

    old = spark.createDataFrame(
        [("a", [0.0, 0.0]), ("a", [0.2, 0.2]), ("gone", [1.0, 1.0])],
        "label STRING, embedding ARRAY<DOUBLE>",
    )
    shifted = spark.createDataFrame(
        [("a", [0.5, 0.5]), ("a", [0.7, 0.7]), ("new", [1.0, 1.0])],
        "label STRING, embedding ARRAY<DOUBLE>",
    )
    out = {r["label"]: r["drift_l1_scaled"]
           for r in embedding_drift(old, shifted, "embedding", "label").collect()}
    assert set(out) == {"a"}  # inner-join contract: one-sided groups dropped
    assert out["a"] > 0


def test_embedding_drift_scale_guard(spark):
    import pytest as _pytest

    from kafka_flow_spark.operators.profile import embedding_drift

    df = spark.createDataFrame([("a", [1.0])], "label STRING, embedding ARRAY<DOUBLE>")
    with _pytest.raises(ValueError, match="scale"):
        embedding_drift(df, df, "embedding", "label", scale=0)


# --- fk_integrity_report / event_order_audit ---


def test_fk_integrity_hand_checked(spark):
    from kafka_flow_spark.operators.profile import fk_integrity_report

    fact = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None), (5, 10)], "id BIGINT, fk BIGINT"
    )
    dim = spark.createDataFrame(
        [(10, "a"), (20, "b"), (20, "b2"), (30, "c")], "pk BIGINT, val STRING"
    )
    r = fk_integrity_report(fact, dim, "fk", "pk").collect()[0]
    assert (r["n_fact"], r["n_null_fk"], r["n_orphans"]) == (5, 1, 1)  # fk=99
    assert r["orphan_rate_e6"] == 1 * 10**6 // 5
    # pk 20 duplicated: 1 value, 2 rows (join multiplication evidence)
    assert (r["n_dim"], r["n_dup_pk_values"], r["n_dup_pk_rows"]) == (3, 1, 2)


def test_fk_integrity_clean_reference_is_all_zero(spark):
    from kafka_flow_spark.operators.profile import fk_integrity_report

    fact = spark.createDataFrame([(1, 10), (2, 20)], "id BIGINT, fk BIGINT")
    dim = spark.createDataFrame([(10,), (20,)], "pk BIGINT")
    r = fk_integrity_report(fact, dim, "fk", "pk").collect()[0]
    assert (r["n_null_fk"], r["n_orphans"], r["orphan_rate_e6"],
            r["n_dup_pk_values"], r["n_dup_pk_rows"]) == (0, 0, 0, 0, 0)


def test_event_order_audit_hand_checked(spark):
    from kafka_flow_spark.operators.profile import event_order_audit

    rows = [
        ("a", 1, "2024-01-01 00:00:10"),
        ("a", 2, "2024-01-01 00:00:05"),   # 5s backwards
        ("a", 3, "2024-01-01 00:00:20"),
        ("a", 4, "2024-01-01 00:00:19.5"), # 0.5s backwards
        ("b", 1, "2024-01-01 00:00:01"),   # single predecessor-less key
    ]
    df = spark.createDataFrame(rows, "k STRING, seq BIGINT, t STRING").select(
        "k", "seq", F.col("t").cast("timestamp_ntz").alias("t")
    )
    got = {r["k"]: r for r in event_order_audit(df, "k", "seq", "t").collect()}
    a = got["a"]
    assert (a["n_events"], a["n_backwards"]) == (4, 2)
    assert a["max_backstep_us"] == 5_000_000
    assert a["backwards_rate_e6"] == 2 * 10**6 // 4
    b = got["b"]
    assert (b["n_backwards"], b["max_backstep_us"], b["backwards_rate_e6"]) == (0, 0, 0)
