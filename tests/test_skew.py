"""Salted join / two-stage aggregation: equivalence with the unsalted plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_flow_spark.operators import skew


def test_salted_join_matches_plain_join(spark):
    # hot key: 'h' carries most rows
    left = spark.createDataFrame(
        [("h", i) for i in range(500)] + [("c", 1), ("d", 2)], "k STRING, v INT"
    )
    right = spark.createDataFrame([("h", 100), ("c", 200), ("x", 999)], "k STRING, w INT")
    plain = left.join(right, ["k"]).groupBy("k").agg(
        F.count("*").alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
    )
    salted = skew.salted_join(left, right, ["k"], n=8).groupBy("k").agg(
        F.count("*").alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_preserves_unmatched(spark):
    left = spark.createDataFrame([("a", 1), ("b", 2)], "k STRING, v INT")
    right = spark.createDataFrame([("a", 10)], "k STRING, w INT")
    out = {r["k"]: r["w"] for r in skew.salted_join(left, right, ["k"], n=4, how="left").collect()}
    assert out == {"a": 10, "b": None}


def test_two_stage_agg_matches_direct(spark):
    df = spark.createDataFrame(
        [("h", float(i)) for i in range(1000)] + [("c", 5.0)], "k STRING, v DOUBLE"
    )
    direct = df.groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx")
    )
    staged = skew.two_stage_agg(
        df,
        keys=["k"],
        n=16,
        partial=[F.count("*").alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx")],
        final=[F.sum("n").alias("n"), F.sum("s").alias("s"), F.max("mx").alias("mx")],
    )
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, staged.collect()))


def test_salt_determinism(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k STRING, v INT")
    s1 = {(r["k"], r["_salt"]) for r in skew.with_salt(df, 8).collect()}
    s2 = {(r["k"], r["_salt"]) for r in skew.with_salt(df, 8).collect()}
    assert s1 == s2  # replays land in identical buckets
