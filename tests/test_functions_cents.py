"""Pin the fast unscaled-cents path to the exact decimal-cast path.

functions.cents is pure double-ALU round-half-away (no per-row BigDecimal);
functions.cents_exact is the decimal cast.  They agree whenever the input
double was generated as a fixed-point value — the testdata money contract.
This test proves that agreement on every money column of the actual testdata
plus a synthetic grid of fixed-point values, including negatives and edges.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_flow_spark.functions import cents, cents_exact, unscaled
from kafka_flow_spark.tables import load

SF_DIR = "/root/testdata/sf0.001"

MONEY_COLS = [
    ("lineitem", "l_quantity"),
    ("lineitem", "l_extendedprice"),
    ("lineitem", "l_discount"),
    ("lineitem", "l_tax"),
    ("orders", "o_totalprice"),
    ("events", "value"),
]


@pytest.mark.parametrize("table,col", MONEY_COLS)
def test_cents_fast_equals_exact_on_testdata(spark, table, col):
    df = load(spark, SF_DIR, table).select(F.col(col).alias("x"))
    bad = df.filter(cents("x") != cents_exact("x")).count()
    assert bad == 0


def test_cents_fast_equals_exact_on_fixed_point_grid(spark):
    # every 2-dp value in [-1000, 1000], plus large magnitudes; the doubles are
    # the nearest-representable of k/100 — exactly how the testdata generator
    # (and any upstream round(x, 2)) produces them
    vals = [k / 100.0 for k in range(-100_000, 100_001, 7)]
    vals += [1e9 + 0.05, -1e9 - 0.05, 0.0, -0.0, 104999.91, 900.68]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    bad = df.filter(cents("x") != cents_exact("x")).count()
    assert bad == 0


def test_unscaled_roundtrip_exact(spark):
    # sum of cents rescaled through decimal must equal the decimal-sum double
    df = spark.createDataFrame([(k / 100.0,) for k in range(1, 5000)], "x double")
    got = df.agg(unscaled(F.sum(cents("x")), 2).alias("s")).collect()[0]["s"]
    want = df.agg(F.sum(F.col("x").cast("decimal(18,2)")).cast("double").alias("s")).collect()[0][
        "s"
    ]
    assert got == want


def test_cents_null_and_sign(spark):
    df = spark.createDataFrame([(None,), (-2.345,), (2.345,)], "x double")
    rows = {r["x"]: r["c"] for r in df.select("x", cents("x").alias("c")).collect()}
    assert rows[None] is None
    # half-away-from-zero on the *double nearest* -2.345/2.345: the double is
    # 2.34499999... so both round to ±234 — same as CAST(x AS DECIMAL(.,2))
    exact = {r["x"]: r["c"] for r in df.select("x", cents_exact("x").alias("c")).collect()}
    assert rows == exact
