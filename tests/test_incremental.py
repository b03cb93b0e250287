"""Incremental aggregate maintenance: merge-of-states equals full recompute,
in any split and any merge shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_flow_spark.operators.incremental import agg_merge, agg_result, agg_state
from kafka_flow_spark.tables import load
from tests.conftest import SF_SMALL


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_merge_equals_full_recompute_any_split(spark):
    o = load(spark, SF_SMALL, "orders")
    full = agg_result(agg_state(o, ["o_orderpriority"], "o_totalprice"))
    # three-way split on a hash — arbitrary, covers empty-group overlap
    parts = [
        agg_state(
            o.filter(F.pmod(F.xxhash64("o_orderkey"), F.lit(3)) == i),
            ["o_orderpriority"],
            "o_totalprice",
        )
        for i in range(3)
    ]
    merged = agg_result(agg_merge(*parts))
    assert _rows(merged) == _rows(full)


def test_merge_is_associative(spark):
    o = load(spark, SF_SMALL, "orders")
    a, b, c = (
        agg_state(
            o.filter(F.pmod(F.xxhash64("o_orderkey"), F.lit(3)) == i),
            ["o_orderpriority"],
            "o_totalprice",
        )
        for i in range(3)
    )
    left = agg_result(agg_merge(agg_merge(a, b), c))
    right = agg_result(agg_merge(a, agg_merge(b, c)))
    assert _rows(left) == _rows(right)


def test_state_is_group_sized(spark):
    o = load(spark, SF_SMALL, "orders")
    st = agg_state(o, ["o_orderpriority"], "o_totalprice")
    assert st.count() == o.select("o_orderpriority").distinct().count()


def test_underscore_grouping_key_survives(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 3.0)], "_region STRING, amount DOUBLE"
    )
    st = agg_state(df, ["_region"], "amount")
    out = {r["_region"]: r["n_rows"] for r in agg_result(agg_merge(st, st)).collect()}
    assert out == {"a": 4, "b": 2}


# --- table_diff ------------------------------------------------------------


def test_table_diff_classifies_all_cases(spark):
    from pyspark.sql import Row

    from kafka_flow_spark.operators.incremental import table_diff

    old = spark.createDataFrame(
        [
            Row(k=1, a="x", b=1.0),   # unchanged
            Row(k=2, a="x", b=1.0),   # b changes
            Row(k=3, a="x", b=None),  # a AND b change (NULL -> value)
            Row(k=4, a="x", b=1.0),   # deleted
        ],
        "k BIGINT, a STRING, b DOUBLE",
    )
    new = spark.createDataFrame(
        [
            Row(k=1, a="x", b=1.0),
            Row(k=2, a="x", b=2.0),
            Row(k=3, a="y", b=3.0),
            Row(k=5, a="z", b=9.0),   # added
        ],
        "k BIGINT, a STRING, b DOUBLE",
    )
    got = {
        r["k"]: (r["status"], r["changed_cols"])
        for r in table_diff(old, new, ["k"]).collect()
    }
    assert got == {
        1: ("unchanged", []),
        2: ("changed", ["b"]),
        3: ("changed", ["a", "b"]),
        4: ("deleted", []),
        5: ("added", []),
    }


def test_table_diff_rejects_missing_compare_col(spark):
    import pytest as _pytest
    from pyspark.sql import Row

    from kafka_flow_spark.operators.incremental import table_diff

    old = spark.createDataFrame([Row(k=1, a="x")])
    new = spark.createDataFrame([Row(k=1, b="y")])
    with _pytest.raises(ValueError, match="absent"):
        table_diff(old, new, ["k"], ["a", "b"])


# --- changeset / apply_changeset (MERGE round trip) --------------------------


def test_apply_changeset_roundtrip_identity(spark):
    """apply(old, changeset(old, new)) == new, exactly — on snapshots with
    adds, deletes, value changes, NULL transitions both ways, and NULL keys
    absent (keys are non-null by construction)."""
    from kafka_flow_spark.operators.incremental import apply_changeset, changeset

    old = spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", None), (3, "C", 30.0), (4, "D", 40.0)],
        "k INT, s STRING, v DOUBLE",
    )
    new = spark.createDataFrame(
        [(2, "B", 20.0), (3, None, 30.0), (4, "D", 40.0), (5, "E", 50.0)],
        "k INT, s STRING, v DOUBLE",
    )
    ch = changeset(old, new, ["k"], ["s", "v"])
    got = {tuple(r) for r in apply_changeset(old, ch, ["k"]).collect()}
    want = {tuple(r) for r in new.collect()}
    assert got == want
    # the changeset itself: 1 deleted, 2+3 changed, 5 added, 4 absent
    st = {r["k"]: r["status"] for r in ch.collect()}
    assert st == {1: "deleted", 2: "changed", 3: "changed", 5: "added"}


def test_apply_changeset_roundtrip_random(spark):
    """Randomized differential: arbitrary overlapping snapshots round-trip."""
    import random

    from kafka_flow_spark.operators.incremental import apply_changeset, changeset

    rng = random.Random(42)
    for trial in range(3):
        old_rows = [
            (k, rng.choice(["x", "y", None]), rng.choice([1.0, 2.0, None]))
            for k in rng.sample(range(50), 30)
        ]
        new_rows = [
            (k, rng.choice(["x", "y", None]), rng.choice([1.0, 2.0, None]))
            for k in rng.sample(range(50), 30)
        ]
        old = spark.createDataFrame(old_rows, "k INT, s STRING, v DOUBLE")
        new = spark.createDataFrame(new_rows, "k INT, s STRING, v DOUBLE")
        ch = changeset(old, new, ["k"], ["s", "v"])
        got = {tuple(r) for r in apply_changeset(old, ch, ["k"]).collect()}
        assert got == {tuple(r) for r in new.collect()}, f"trial {trial}"


def test_maintain_join_view_equals_recompute_random(spark):
    """Randomized differential: the maintained view equals the full
    recompute A_new ⋈ B_new for arbitrary add/change/delete mixes on both
    sides (including a fact row whose fk MOVES to a different dim key, and
    simultaneous fact+dim changes hitting the same key)."""
    import random

    from kafka_flow_spark.operators.incremental import (
        changeset,
        maintain_join_view,
    )

    rng = random.Random(7)
    for trial in range(3):
        # dim: keys 0..9; fact: pk 0..39 with fk into 0..14 (some dangling)
        def dim_rows():
            return [
                (k, rng.choice([10.0, 20.0, 30.0]))
                for k in rng.sample(range(10), rng.randint(5, 10))
            ]

        def fact_rows():
            return [
                (k, rng.randrange(15), rng.choice([1.0, 2.0, 3.0]))
                for k in rng.sample(range(40), rng.randint(20, 40))
            ]

        a_old = spark.createDataFrame(fact_rows(), "fpk INT, fk INT, fv DOUBLE")
        a_new = spark.createDataFrame(fact_rows(), "fpk INT, fk INT, fv DOUBLE")
        b_old = spark.createDataFrame(dim_rows(), "dpk INT, dv DOUBLE")
        b_new = spark.createDataFrame(dim_rows(), "dpk INT, dv DOUBLE")
        da = changeset(a_old, a_new, ["fpk"])
        db = changeset(b_old, b_new, ["dpk"])
        view_old = a_old.join(b_old, a_old.fk == b_old.dpk).drop("dpk")
        maintained = maintain_join_view(
            view_old, a_old, da, b_old, db, ["fpk"], "fk", "dpk"
        ).select("fpk", "fk", "fv", "dv")
        got = {tuple(r) for r in maintained.collect()}
        expected = {
            tuple(r)
            for r in a_new.join(b_new, a_new.fk == b_new.dpk)
            .select("fpk", "fk", "fv", "dv")
            .collect()
        }
        assert got == expected, f"trial {trial}"


def test_maintain_join_view_noop_deltas_is_identity(spark):
    from kafka_flow_spark.operators.incremental import (
        changeset,
        maintain_join_view,
    )

    a = spark.createDataFrame(
        [(1, 100, 5.0), (2, 100, 6.0), (3, 200, 7.0)], "fpk INT, fk INT, fv DOUBLE"
    )
    b = spark.createDataFrame([(100, 1.5), (200, 2.5)], "dpk INT, dv DOUBLE")
    da = changeset(a, a, ["fpk"])
    db = changeset(b, b, ["dpk"])
    view = a.join(b, a.fk == b.dpk).drop("dpk")
    got = {
        tuple(r)
        for r in maintain_join_view(view, a, da, b, db, ["fpk"], "fk", "dpk")
        .select("fpk", "fk", "fv", "dv")
        .collect()
    }
    assert got == {tuple(r) for r in view.select("fpk", "fk", "fv", "dv").collect()}


def test_agg_maintain_equals_recompute_random(spark):
    """Randomized differential: maintained state == agg_state(new) exactly,
    for arbitrary add/update/delete mixes including rows that MOVE between
    groups and groups that empty out or appear."""
    import random

    from kafka_flow_spark.operators.incremental import (
        agg_maintain,
        changeset,
    )

    rng = random.Random(11)
    for trial in range(3):
        def rows():
            return [
                (k, rng.choice(["g1", "g2", "g3"]), round(rng.uniform(-50, 50), 2))
                for k in rng.sample(range(60), rng.randint(25, 60))
            ]

        old = spark.createDataFrame(rows(), "pk INT, g STRING, v DOUBLE")
        new = spark.createDataFrame(rows(), "pk INT, g STRING, v DOUBLE")
        st = agg_state(old, ["g"], "v")
        ch = changeset(old, new, ["pk"])
        got = {
            r["g"]: (r["_n"], r["_sum_c"], r["_min"], r["_max"])
            for r in agg_maintain(st, old, ch, ["g"], ["pk"], "v").collect()
        }
        exp = {
            r["g"]: (r["_n"], r["_sum_c"], r["_min"], r["_max"])
            for r in agg_state(new, ["g"], "v").collect()
        }
        assert got == exp, f"trial {trial}"


def test_agg_maintain_untouched_groups_keep_minmax_without_rescan(spark):
    from kafka_flow_spark.operators.incremental import agg_maintain, changeset

    old = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 9.0), (3, "b", 1.0)], "pk INT, g STRING, v DOUBLE"
    )
    new = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 9.0), (3, "b", 2.0)], "pk INT, g STRING, v DOUBLE"
    )
    st = agg_state(old, ["g"], "v")
    out = {
        r["g"]: (r["_n"], r["_min"], r["_max"])
        for r in agg_maintain(
            st, old, changeset(old, new, ["pk"]), ["g"], ["pk"], "v"
        ).collect()
    }
    assert out["a"] == (2, 5.0, 9.0)  # untouched, carried from state
    assert out["b"] == (1, 2.0, 2.0)  # touched, recomputed


def test_changeset_empty_when_identical(spark):
    from kafka_flow_spark.operators.incremental import changeset
    from kafka_flow_spark.tables import load
    from tests.conftest import SF_SMALL

    orders = load(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    assert changeset(orders, orders, ["o_orderkey"]).count() == 0


def test_apply_changeset_refuses_partial_changesets(spark):
    import pytest

    from kafka_flow_spark.operators.incremental import apply_changeset, changeset

    old = spark.createDataFrame([(1, "A", 1.0)], "k INT, s STRING, v DOUBLE")
    new = spark.createDataFrame([(1, "B", 1.0)], "k INT, s STRING, v DOUBLE")
    partial = changeset(old, new, ["k"], ["s"])  # v not carried
    with pytest.raises(ValueError, match="does not carry every"):
        apply_changeset(old, partial, ["k"])
    with pytest.raises(ValueError, match="status"):
        apply_changeset(old, new, ["k"])  # not a changeset at all
