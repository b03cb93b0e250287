"""Count-min sketch: one-sided error property, exactness at ample width,
and plan shape (cell-bounded aggregate, no cartesian)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_flow_spark.operators.sketches import cms_build, cms_probe, heavy_hitters
from kafka_flow_spark.tables import load
from tests.conftest import SF_SMALL


def test_cms_estimate_never_undercounts(spark):
    o = load(spark, SF_SMALL, "orders")
    sketch = cms_build(o, "o_custkey", depth=4, width=64)  # force collisions
    exact = o.groupBy("o_custkey").agg(F.count("*").alias("exact"))
    est = cms_probe(sketch, exact, "o_custkey", depth=4, width=64)
    joined = exact.join(est, "o_custkey").collect()
    assert len(joined) > 0
    assert all(r["est"] >= r["exact"] for r in joined)
    # width 64 << key cardinality: some key MUST be inflated
    assert any(r["est"] > r["exact"] for r in joined)


def test_cms_exact_at_ample_width(spark):
    df = spark.createDataFrame(
        [(i % 7,) for i in range(700)], "k BIGINT"
    )
    sketch = cms_build(df, "k", depth=4, width=4096)
    est = {r["k"]: r["est"] for r in cms_probe(sketch, df, "k", 4, 4096).collect()}
    assert est == {i: 100 for i in range(7)}


def test_cms_sketch_is_cell_bounded(spark):
    o = load(spark, SF_SMALL, "orders")
    n = cms_build(o, "o_custkey", depth=3, width=32).count()
    assert n <= 3 * 32


def test_heavy_hitters_rank_and_order(spark):
    o = load(spark, SF_SMALL, "orders")
    out = heavy_hitters(o, "o_custkey", k=5).orderBy("rank").collect()
    assert [r["rank"] for r in out] == [1, 2, 3, 4, 5]
    counts = [r["exact_cnt"] for r in out]
    assert counts == sorted(counts, reverse=True)
    assert all(r["cms_est"] >= r["exact_cnt"] for r in out)


def test_heavy_hitters_plan_clean(spark):
    o = load(spark, SF_SMALL, "orders")
    plan = (
        heavy_hitters(o, "o_custkey", k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan


def test_cms_xxhash_mode_same_properties(spark):
    o = load(spark, SF_SMALL, "orders")
    sketch = cms_build(o, "o_custkey", depth=4, width=64, hash_mode="xxhash64")
    exact = o.groupBy("o_custkey").agg(F.count("*").alias("exact"))
    est = cms_probe(sketch, exact, "o_custkey", 4, 64, hash_mode="xxhash64")
    joined = exact.join(est, "o_custkey").collect()
    assert all(r["est"] >= r["exact"] for r in joined)


def test_windowed_cms_stream_matches_batch(spark, tmp_path):
    from datetime import datetime

    from kafka_flow_spark.operators.sketches import windowed_cms

    schema = "ts TIMESTAMP, k BIGINT"
    rows = [
        (datetime(2026, 1, 1, 12, 0, 10), 1),
        (datetime(2026, 1, 1, 12, 0, 20), 1),
        (datetime(2026, 1, 1, 12, 1, 0), 2),
        (datetime(2026, 1, 1, 12, 7, 0), 1),   # second window
        (datetime(2026, 1, 1, 12, 20, 0), 3),  # advances watermark, closes all
    ]
    input_dir, chk = str(tmp_path / "in"), str(tmp_path / "chk")
    out_dir = str(tmp_path / "out")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(input_dir)
    stream = spark.readStream.schema(schema).parquet(input_dir)
    q = (
        windowed_cms(stream, "ts", "k", duration="5 minutes", depth=3, width=32,
                     watermark="1 minute")
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"].minute, r["r"], r["b"]): r["cnt"]
        for r in spark.read.parquet(out_dir).collect()
    }
    # batch reference over the same rows (windows emitted by the stream are
    # the watermark-closed ones; compare those windows cell-by-cell)
    batch = windowed_cms(
        spark.createDataFrame(rows, schema), "ts", "k",
        duration="5 minutes", depth=3, width=32,
    )
    want = {
        (r["window_start"].minute, r["r"], r["b"]): r["cnt"]
        for r in batch.collect()
        if r["window_start"].minute in {m for m, _, _ in got}
    }
    assert got == want and len(got) > 0


def test_windowed_cms_drops_late_data(spark, tmp_path):
    """Watermark contract: a record arriving after its window's watermark has
    passed is dropped from the (already emitted) window's cells."""
    from datetime import datetime

    from kafka_flow_spark.operators.sketches import windowed_cms

    schema = "ts TIMESTAMP, k BIGINT"
    input_dir, chk = str(tmp_path / "in"), str(tmp_path / "chk")
    out_dir = str(tmp_path / "out")

    def run(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(input_dir)
        q = (
            windowed_cms(
                spark.readStream.schema(schema).parquet(input_dir),
                "ts", "k", duration="5 minutes", depth=2, width=16,
                watermark="1 minute",
            )
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            ((r["window_start"].minute), r["r"], r["b"]): r["cnt"]
            for r in spark.read.parquet(out_dir).collect()
        }

    first = run([
        (datetime(2026, 1, 1, 12, 0, 10), 1),
        (datetime(2026, 1, 1, 12, 20, 0), 2),   # watermark -> 12:19, closes [12:00,12:05)
    ])
    assert any(m == 0 for m, _, _ in first)
    # late arrival for the already-closed 12:00 window: must change nothing
    second = run([(datetime(2026, 1, 1, 12, 0, 30), 1)])
    assert {k: v for k, v in second.items() if k[0] == 0} == \
           {k: v for k, v in first.items() if k[0] == 0}


# --- linear counting ----------------------------------------------------------


def test_linear_counting_close_to_exact_and_partition_stable(spark):
    from kafka_flow_spark.operators.sketches import (
        linear_counting_estimate,
        linear_counting_sketch,
    )

    rows = [(f"g{i % 2}", i % 700) for i in range(5000)]
    df = spark.createDataFrame(rows, "g STRING, v INT")
    m = 4096
    out = {
        r["g"]: r
        for r in linear_counting_estimate(
            linear_counting_sketch(df, ["g"], "v", m=m), ["g"], m
        ).collect()
    }
    import math

    for g in ("g0", "g1"):
        exact = len({v for gg, v in rows if gg == g})
        est = out[g]["est_e6"] / 1e6
        assert abs(est - exact) / exact < 0.05  # load factor ~0.09: tight
        assert out[g]["occupied"] <= exact
        # python mirror of the micro-scaled estimate
        want = math.floor(m * math.log(m / (m - out[g]["occupied"])) * 1e6)
        assert out[g]["est_e6"] == want
    a = sorted(map(tuple, linear_counting_sketch(df, ["g"], "v", m=m).collect()))
    b = sorted(
        map(tuple, linear_counting_sketch(df.repartition(7), ["g"], "v", m=m).collect())
    )
    assert a == b


def test_linear_counting_sketch_merge_law(spark):
    """sketch(A ∪ B) == distinct-union(sketch(A), sketch(B)) — the property
    that lets shards sketch independently and merge with one distinct."""
    from kafka_flow_spark.operators.sketches import linear_counting_sketch

    rows = [("g", i * 13 % 997) for i in range(2000)]
    df = spark.createDataFrame(rows, "g STRING, v INT")
    a = df.where("v % 2 = 0")
    b = df.where("v % 2 = 1")
    merged = (
        linear_counting_sketch(a, ["g"], "v", m=512)
        .unionByName(linear_counting_sketch(b, ["g"], "v", m=512))
        .distinct()
    )
    whole = linear_counting_sketch(df, ["g"], "v", m=512)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_linear_counting_saturation_returns_null(spark):
    from kafka_flow_spark.operators.sketches import (
        linear_counting_estimate,
        linear_counting_sketch,
    )

    import pytest as _pytest

    df = spark.createDataFrame([("g", i) for i in range(200)], "g STRING, v INT")
    m = 4  # tiny: all 4 buckets certainly occupied
    [r] = linear_counting_estimate(
        linear_counting_sketch(df, ["g"], "v", m=m), ["g"], m
    ).collect()
    assert r["occupied"] == m and r["est_e6"] is None
    with _pytest.raises(ValueError, match="m must be"):
        linear_counting_sketch(df, ["g"], "v", m=1)


def test_linear_counting_ignores_nulls(spark):
    """NULL is not a value: it must neither occupy a phantom bucket nor
    create a group estimate where no values exist (review r8)."""
    from kafka_flow_spark.operators.sketches import (
        linear_counting_estimate,
        linear_counting_sketch,
    )

    df = spark.createDataFrame(
        [("g", "0"), ("g", "1"), ("g", None), ("h", None)],
        "g STRING, v STRING",
    )
    sk = linear_counting_sketch(df, ["g"], "v", m=4)
    rows = sk.collect()
    assert all(r["bucket"] is not None for r in rows)
    out = {r["g"]: r for r in linear_counting_estimate(sk, ["g"], 4).collect()}
    assert "h" not in out  # all-NULL group: no distribution at all
    assert out["g"]["occupied"] <= 2  # never counts the NULL
