"""Deterministic sampling: content-addressed, partition-invariant, and
bit-identical to the DuckDB md5 reproduction."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from kafka_flow_spark.operators.sampling import (
    fraction_threshold,
    hash_sample,
    stratified_sample,
)
from kafka_flow_spark.tables import load
from tests.conftest import SF_SMALL


def _orders(spark):
    return load(spark, SF_SMALL, "orders").withColumn(
        "_key", F.col("o_orderkey").cast("string")
    )


def test_fraction_one_keeps_everything(spark):
    df = _orders(spark)
    # regression: threshold capping used to drop keys in bucket 'ffffff'
    assert hash_sample(df, "_key", 1.0).count() == df.count()


def test_invalid_fractions_raise(spark):
    df = _orders(spark)
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            hash_sample(df, "_key", bad)
    with pytest.raises(ValueError):
        fraction_threshold(0.0)


def test_partition_invariance(spark):
    df = _orders(spark)
    a = {r["o_orderkey"] for r in hash_sample(df, "_key", 0.2).select("o_orderkey").collect()}
    b = {
        r["o_orderkey"]
        for r in hash_sample(df.repartition(7), "_key", 0.2).select("o_orderkey").collect()
    }
    assert a == b and 0 < len(a) < df.count()


def test_matches_duckdb_exactly(spark):
    t = fraction_threshold(0.15)
    got = {
        r["o_orderkey"]
        for r in hash_sample(_orders(spark), "_key", 0.15).select("o_orderkey").collect()
    }
    want = {
        r[0]
        for r in duckdb.sql(
            f"""SELECT o_orderkey FROM '{SF_SMALL}/orders.parquet'
                WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 6) < '{t}'"""
        ).fetchall()
    }
    assert got == want


def test_stratified_exactly_k_and_invariant(spark):
    df = _orders(spark)
    out = stratified_sample(df, ["o_orderpriority"], "_key", k=7)
    counts = {
        r["o_orderpriority"]: r["n"]
        for r in out.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    strata = {r["o_orderpriority"] for r in df.select("o_orderpriority").distinct().collect()}
    assert set(counts) == strata and all(n == 7 for n in counts.values())
    again = stratified_sample(df.repartition(5), ["o_orderpriority"], "_key", k=7)
    assert {tuple(r) for r in out.select("o_orderpriority", "o_orderkey").collect()} == {
        tuple(r) for r in again.select("o_orderpriority", "o_orderkey").collect()
    }


def test_stratified_small_stratum_keeps_all(spark):
    df = _orders(spark)
    total = df.count()
    out = stratified_sample(df, ["o_orderpriority"], "_key", k=10**9)
    assert out.count() == total


def test_sample_nesting(spark):
    """Smaller fractions are strict subsets of larger ones (same key hash) —
    the property that lets a pipeline downsample reproducibly."""
    df = _orders(spark)
    sets = {
        f: {r["o_orderkey"] for r in hash_sample(df, "_key", f).select("o_orderkey").collect()}
        for f in (0.05, 0.2, 0.5)
    }
    assert sets[0.05] <= sets[0.2] <= sets[0.5]
    assert len(sets[0.05]) < len(sets[0.2]) < len(sets[0.5])


def test_fraction_threshold_properties():
    from hypothesis import given, strategies as st

    @given(st.floats(min_value=1e-9, max_value=1.0, allow_nan=False))
    def check(f):
        t = fraction_threshold(f)
        assert len(t) == 6 and t == t.lower()
        assert int(t, 16) <= 16**6 - 1

    @given(
        st.floats(min_value=1e-6, max_value=0.5, allow_nan=False),
        st.floats(min_value=1e-6, max_value=0.49, allow_nan=False),
    )
    def check_monotone(f, delta):
        assert fraction_threshold(f) <= fraction_threshold(min(f + delta, 1.0))

    check()
    check_monotone()


# --- weighted_sample ---


def test_weighted_sample_clamp_semantics(spark):
    from kafka_flow_spark.operators.sampling import weighted_sample

    df = _orders(spark)
    n = df.count()
    assert weighted_sample(df, "_key", F.lit(1.0)).count() == n
    assert weighted_sample(df, "_key", F.lit(2.5)).count() == n
    assert weighted_sample(df, "_key", F.lit(0.0)).count() == 0
    assert weighted_sample(df, "_key", F.lit(-1.0)).count() == 0


def test_weighted_sample_monotone_and_nested(spark):
    # raising the weight only ADDS rows (the kept set is nested), and a
    # constant weight w matches hash_sample(w) up to the conv-vs-string
    # threshold rounding of at most one bucket
    from kafka_flow_spark.operators.sampling import weighted_sample

    df = _orders(spark)
    lo = {r["_key"] for r in weighted_sample(df, "_key", F.lit(0.2)).select("_key").collect()}
    hi = {r["_key"] for r in weighted_sample(df, "_key", F.lit(0.5)).select("_key").collect()}
    assert lo <= hi
    hs = {r["_key"] for r in hash_sample(df, "_key", 0.5).select("_key").collect()}
    assert hi == hs


def test_weighted_sample_partition_invariant(spark):
    from kafka_flow_spark.operators.sampling import weighted_sample

    df = _orders(spark)
    w = F.col("o_totalprice") / F.lit(300000.0)
    a = {r["_key"] for r in weighted_sample(df, "_key", w).select("_key").collect()}
    b = {
        r["_key"]
        for r in weighted_sample(df.repartition(7), "_key", w).select("_key").collect()
    }
    assert a == b and 0 < len(a) < df.count()


# --- shuffle_shard ---


def test_shuffle_shard_total_cover_and_contiguous_ranks(spark):
    from kafka_flow_spark.operators.sampling import shuffle_shard

    df = _orders(spark)
    out = shuffle_shard(df, "_key", n_shards=4)
    assert out.count() == df.count()
    per = {
        r["shard"]: (r["n"], r["mx"])
        for r in out.groupBy("shard")
        .agg(F.count("*").alias("n"), F.max("shard_rank").alias("mx"))
        .collect()
    }
    assert set(per) == {0, 1, 2, 3}
    for n, mx in per.values():
        assert n == mx  # row_number is dense from 1..n per shard
    # balanced within 20% of even
    sizes = [n for n, _ in per.values()]
    assert max(sizes) <= 1.2 * min(sizes)


def test_shuffle_shard_deterministic_under_repartition(spark):
    from kafka_flow_spark.operators.sampling import shuffle_shard

    df = _orders(spark)
    a = {
        (r["_key"], r["shard"], r["shard_rank"])
        for r in shuffle_shard(df, "_key", 4).select("_key", "shard", "shard_rank").collect()
    }
    b = {
        (r["_key"], r["shard"], r["shard_rank"])
        for r in shuffle_shard(df.repartition(13), "_key", 4)
        .select("_key", "shard", "shard_rank")
        .collect()
    }
    assert a == b


def test_shuffle_shard_salt_changes_permutation(spark):
    from kafka_flow_spark.operators.sampling import shuffle_shard

    df = _orders(spark)
    a = {
        (r["_key"], r["shard"], r["shard_rank"])
        for r in shuffle_shard(df, "_key", 4, salt="ep0").collect()
    }
    b = {
        (r["_key"], r["shard"], r["shard_rank"])
        for r in shuffle_shard(df, "_key", 4, salt="ep1").collect()
    }
    assert a != b  # different epoch -> different permutation


def test_rebalance_exact_target_both_regimes(spark):
    from kafka_flow_spark.operators.sampling import rebalance_classes

    # stratum 'big' has 7 rows (> target 5 -> downsample), 'small' has 2
    # (< target -> oversample: each row twice, one hash-ranked row a 3rd time)
    rows = [("big", f"b{i}") for i in range(7)] + [("small", "s0"), ("small", "s1")]
    df = spark.createDataFrame(rows, "grp string, _key string")
    out = rebalance_classes(df, ["grp"], "_key", target_n=5).collect()
    by_grp: dict[str, list] = {}
    for r in out:
        by_grp.setdefault(r.grp, []).append(r)
    assert len(by_grp["big"]) == 5 and len(by_grp["small"]) == 5
    # downsampled stratum: distinct keys, single copy each
    assert all(r.copy_idx == 1 for r in by_grp["big"])
    assert len({r._key for r in by_grp["big"]}) == 5
    # oversampled stratum: both keys present, copies 2 and 3
    copies = sorted(
        len([r for r in by_grp["small"] if r._key == k]) for k in ("s0", "s1")
    )
    assert copies == [2, 3]
    # copy_idx is 1..copies per key
    for k in ("s0", "s1"):
        idx = sorted(r.copy_idx for r in by_grp["small"] if r._key == k)
        assert idx == list(range(1, len(idx) + 1))


def test_rebalance_partition_invariant(spark):
    from kafka_flow_spark.operators.sampling import rebalance_classes

    rows = [(f"g{i % 3}", f"k{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "grp string, _key string")
    a = {(r.grp, r._key, r.copy_idx) for r in rebalance_classes(df, ["grp"], "_key", 9).collect()}
    b = {
        (r.grp, r._key, r.copy_idx)
        for r in rebalance_classes(df.repartition(11), ["grp"], "_key", 9).collect()
    }
    assert a == b
    for g in ("g0", "g1", "g2"):
        assert len([t for t in a if t[0] == g]) == 9


def test_rebalance_rejects_bad_target(spark):
    from kafka_flow_spark.operators.sampling import rebalance_classes

    df = spark.createDataFrame([("a", "k")], "grp string, _key string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        rebalance_classes(df, ["grp"], "_key", target_n=0)


# --- cap_per_group ---

def test_cap_per_group_properties(spark):
    from pyspark.sql import functions as F

    from kafka_flow_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(
        [(str(i), "big" if i < 80 else "small") for i in range(100)],
        "k STRING, g STRING",
    )
    out = cap_per_group(df, "g", "k", n_max=10)
    per = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert per["big"] == 10          # capped
    assert per["small"] == 10        # group of 20 -> capped at 10 too
    small_all = cap_per_group(df.where("g = 'small'"), "g", "k", n_max=50)
    assert small_all.count() == 20   # n_max above group size keeps everything
    # deterministic and partition-invariant: same surviving keys
    a = {r["k"] for r in out.collect()}
    b = {r["k"] for r in cap_per_group(df.repartition(7), "g", "k", n_max=10).collect()}
    assert a == b
    # rank is 1..n_max dense per group
    ranks = sorted(r["cap_rank"] for r in out.where("g = 'big'").collect())
    assert ranks == list(range(1, 11))


def test_cap_per_group_rejects_bad_n(spark):
    import pytest as _pytest

    from kafka_flow_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame([("1", "a")], "k STRING, g STRING")
    with _pytest.raises(ValueError):
        cap_per_group(df, "g", "k", n_max=0)


# --- exactly-k weighted reservoir (Efraimidis–Spirakis) -----------------------


def test_weighted_reservoir_exact_k_and_deterministic(spark):
    from kafka_flow_spark.operators.sampling import weighted_reservoir
    from kafka_flow_spark.tables import load
    from tests.conftest import SF_SMALL

    docs = load(spark, SF_SMALL, "documents").withColumn(
        "_key", F.col("doc_id").cast("string")
    )
    a = weighted_reservoir(docs, "_key", F.col("n_chars"), k=50)
    b = weighted_reservoir(docs, "_key", F.col("n_chars"), k=50)
    ra = [(r["doc_id"], r["sel_rank"]) for r in a.orderBy("sel_rank").collect()]
    rb = [(r["doc_id"], r["sel_rank"]) for r in b.orderBy("sel_rank").collect()]
    assert len(ra) == 50 and ra == rb
    # different salt -> different draw
    c = weighted_reservoir(docs, "_key", F.col("n_chars"), k=50, salt="other")
    rc = {r["doc_id"] for r in c.collect()}
    assert rc != {d for d, _ in ra}


def test_weighted_reservoir_dominant_weight_always_selected(spark):
    from kafka_flow_spark.operators.sampling import weighted_reservoir

    rows = [(str(i), 1) for i in range(200)] + [("heavy", 10**9)]
    df = spark.createDataFrame(rows, "k STRING, w INT")
    # -ln(u)/1e9 is ~always the smallest score: heavy must win rank 1
    out = weighted_reservoir(df, "k", F.col("w"), k=5)
    assert out.orderBy("sel_rank").first()["k"] == "heavy"


def test_weighted_reservoir_nonpositive_weights_never_selected(spark):
    from kafka_flow_spark.operators.sampling import weighted_reservoir

    rows = [("a", 5), ("b", 0), ("c", -3), ("d", None), ("e", 2)]
    df = spark.createDataFrame(rows, "k STRING, w INT")
    got = {r["k"] for r in weighted_reservoir(df, "k", F.col("w"), k=10).collect()}
    assert got == {"a", "e"}


def test_weighted_reservoir_is_proportional_ish(spark):
    """Statistical smoke over 30 salts: an item with 10x the weight of each
    of 100 light items is selected (k=10) far more often than a light one."""
    from kafka_flow_spark.operators.sampling import weighted_reservoir

    rows = [(f"L{i}", 10) for i in range(100)] + [("H", 100)]
    df = spark.createDataFrame(rows, "k STRING, w INT").cache()
    heavy_hits = 0
    for s in range(30):
        sel = {r["k"] for r in weighted_reservoir(df, "k", F.col("w"), 10, salt=f"s{s}").collect()}
        heavy_hits += "H" in sel
    df.unpersist()
    # P[H in top-10] ~ 1 - prod(...) ≈ 0.65; light ~0.09.  30 draws: expect ~20
    assert heavy_hits >= 10


def test_reservoir_per_group_exact_k_each(spark):
    from pyspark.sql import functions as F

    from kafka_flow_spark.operators.sampling import weighted_reservoir_per_group
    from kafka_flow_spark.tables import load
    from tests.conftest import SF_SMALL

    docs = load(spark, SF_SMALL, "documents").withColumn(
        "_key", F.col("doc_id").cast("string")
    )
    out = weighted_reservoir_per_group(docs, ["lang"], "_key", F.col("n_chars"), k=10)
    per = out.groupBy("lang").count().collect()
    sizes = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    for r in per:
        assert r["count"] == min(10, sizes[r["lang"]])


# --- negative sampling --------------------------------------------------------


def test_negative_samples_deterministic_and_excludes_self_and_label(spark):
    from kafka_flow_spark.operators.sampling import negative_samples

    rows = [(i, i % 3) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, label INT")
    a = sorted(
        map(tuple, negative_samples(df, "vec_id", k=3, label_col="label",
                                    n_buckets=4).collect())
    )
    b = sorted(
        map(tuple, negative_samples(df.repartition(7), "vec_id", k=3,
                                    label_col="label", n_buckets=4).collect())
    )
    assert a == b and len(a) > 0  # partitioning-independent
    for anchor_id, j, neg_id, albl, nlbl in a:
        assert neg_id != anchor_id
        assert albl != nlbl
        assert 1 <= j <= 3


def test_negative_samples_new_salt_new_permutation(spark):
    from kafka_flow_spark.operators.sampling import negative_samples

    rows = [(i, 0 if i < 20 else 1) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, label INT")
    a = set(
        (r["anchor_id"], r["j"], r["neg_id"])
        for r in negative_samples(df, "vec_id", k=2, salt="s1").collect()
    )
    b = set(
        (r["anchor_id"], r["j"], r["neg_id"])
        for r in negative_samples(df, "vec_id", k=2, salt="s2").collect()
    )
    assert a != b  # the epoch knob actually re-permutes


def test_negative_samples_tiny_bucket_no_duplicate_pairs(spark):
    """k larger than the bucket population must NOT lap the ring: each
    anchor gets at most n-1 distinct negatives and no (anchor, neg) pair is
    emitted twice under different j (ADVICE r7)."""
    from kafka_flow_spark.operators.sampling import negative_samples

    # n_buckets=1 forces every row into one 3-row bucket; k=10 >> n-1=2
    df = spark.createDataFrame([(1,), (2,), (3,)], "vec_id BIGINT")
    rows = negative_samples(df, "vec_id", k=10, n_buckets=1).collect()
    pairs = [(r["anchor_id"], r["neg_id"]) for r in rows]
    assert len(pairs) == len(set(pairs))  # no duplicate negatives
    per_anchor = {}
    for a, n in pairs:
        assert a != n
        per_anchor.setdefault(a, set()).add(n)
    # every anchor saw exactly the other two rows, once each
    assert all(len(v) == 2 for v in per_anchor.values())
    assert len(rows) == 6
    assert all(1 <= r["j"] <= 2 for r in rows)


def test_negative_samples_k_guard(spark):
    import pytest as _pytest

    from kafka_flow_spark.operators.sampling import negative_samples

    df = spark.createDataFrame([(1, 0)], "vec_id BIGINT, label INT")
    with _pytest.raises(ValueError, match="k must be"):
        negative_samples(df, "vec_id", k=0)


# --- hard negative mining ------------------------------------------------------


def _vec_rows():
    # two tight same-label clusters + one cross-label near neighbor
    return [
        (1, 0, [1.0, 0.0, 0.0, 0.0]),
        (2, 0, [0.9, 0.1, 0.0, 0.0]),
        (3, 1, [0.95, 0.05, 0.0, 0.0]),   # label 1 but VERY close to 1/2
        (4, 1, [0.0, 1.0, 0.0, 0.0]),
        (5, 2, [0.0, 0.0, 1.0, 0.0]),
    ]


def test_hard_negatives_exact_single_bucket_matches_bruteforce(spark):
    """n_planes=0 = one bucket = exact: top-k different-label cosine
    neighbors must equal a python brute force with the same FLOOR-e6 key."""
    import math

    from kafka_flow_spark.operators.sampling import hard_negatives

    rows = _vec_rows()
    df = spark.createDataFrame(rows, "vec_id BIGINT, label INT, embedding ARRAY<DOUBLE>")
    got = {
        (r["anchor_id"], r["rank"]): (r["neg_id"], r["cos_e6"])
        for r in hard_negatives(
            df, "vec_id", "embedding", "label", k=2, dim=4, n_planes=0
        ).collect()
    }

    def cos_e6(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return math.floor(dot / (na * nb) * 1_000_000)

    by_id = {i: (l, v) for i, l, v in rows}
    for i, (lbl, v) in by_id.items():
        cands = sorted(
            (
                (-cos_e6(v, v2), j)
                for j, (l2, v2) in by_id.items()
                if l2 != lbl
            )
        )
        for rank, (negc, j) in enumerate(cands[:2], start=1):
            assert got[(i, rank)] == (j, -negc), (i, rank)
    # the interesting case: anchor 1's hardest negative is 3 (cross-label
    # near neighbor), not some same-label twin
    assert got[(1, 1)][0] == 3


def test_hard_negatives_bucketed_subset_of_exact_and_deterministic(spark):
    """With LSH bucketing on, results are a subset of the exact candidate
    relation (same pairs, same scores) and stable under repartitioning."""
    from kafka_flow_spark.operators.sampling import hard_negatives

    rows = [(i, i % 3, [float((i * 7 + d * 13) % 11 - 5) for d in range(8)])
            for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, label INT, embedding ARRAY<DOUBLE>")
    kw = dict(k=2, dim=8, n_planes=3, seed=7)
    a = sorted(map(tuple, hard_negatives(df, "vec_id", "embedding", "label", **kw).collect()))
    b = sorted(map(tuple, hard_negatives(df.repartition(5), "vec_id", "embedding", "label", **kw).collect()))
    assert a == b and len(a) > 0
    exact_pairs = {
        (r["anchor_id"], r["neg_id"]): r["cos_e6"]
        for r in hard_negatives(
            df, "vec_id", "embedding", "label", k=50, dim=8, n_planes=0
        ).collect()
    }
    for anchor_id, rank, neg_id, cos_e6, albl, nlbl in a:
        assert albl != nlbl and 1 <= rank <= 2
        assert exact_pairs[(anchor_id, neg_id)] == cos_e6  # same score contract


def test_hard_negatives_k_guard(spark):
    import pytest as _pytest

    from kafka_flow_spark.operators.sampling import hard_negatives

    df = spark.createDataFrame([(1, 0, [1.0])], "vec_id BIGINT, label INT, embedding ARRAY<DOUBLE>")
    with _pytest.raises(ValueError, match="k must be"):
        hard_negatives(df, "vec_id", "embedding", "label", k=0)


def test_positive_pairs_same_label_excludes_self(spark):
    """Positive mining: nearest SAME-label bucket-mate, never the anchor
    itself; exact single-bucket run checked against python brute force."""
    import math

    from kafka_flow_spark.operators.sampling import positive_pairs

    rows = _vec_rows()
    df = spark.createDataFrame(rows, "vec_id BIGINT, label INT, embedding ARRAY<DOUBLE>")
    got = {
        r["anchor_id"]: (r["pos_id"], r["cos_e6"])
        for r in positive_pairs(
            df, "vec_id", "embedding", "label", k=1, dim=4, n_planes=0
        ).collect()
    }

    def cos_e6(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return math.floor(dot / (na * nb) * 1_000_000)

    by_id = {i: (l, v) for i, l, v in rows}
    for i, (lbl, v) in by_id.items():
        cands = sorted(
            (-cos_e6(v, v2), j)
            for j, (l2, v2) in by_id.items()
            if l2 == lbl and j != i
        )
        if not cands:
            assert i not in got  # label 2 is a singleton: no positive exists
        else:
            negc, j = cands[0]
            assert got[i] == (j, -negc)
    assert 5 not in got  # the singleton


def test_contrastive_dataset_equals_composed_miners(spark):
    """Differential: the one-scan capstone must equal composing
    positive_pairs + hard_negatives + negative_samples with the same
    geometry, restricted to anchors holding both mined sides — the single
    pair scan changes the cost, not the semantics."""
    from kafka_flow_spark.operators.sampling import (
        contrastive_dataset,
        hard_negatives,
        negative_samples,
        positive_pairs,
    )

    rows = [(i, i % 3, [float((i * 7 + d * 13) % 11 - 5) for d in range(8)])
            for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, label INT, embedding ARRAY<DOUBLE>")
    kw = dict(dim=8, n_planes=3, seed=7)
    got = sorted(
        map(
            tuple,
            contrastive_dataset(
                df, "vec_id", "embedding", "label",
                k_pos=1, k_hard=2, k_ring=2, n_buckets=8, **kw,
            ).collect(),
        )
    )
    pos = {
        (r["anchor_id"], "positive", r["rank"]): (r["pos_id"], r["pos_label"], r["cos_e6"])
        for r in positive_pairs(df, "vec_id", "embedding", "label", k=1, **kw).collect()
    }
    hard = {
        (r["anchor_id"], "hard_negative", r["rank"]): (r["neg_id"], r["neg_label"], r["cos_e6"])
        for r in hard_negatives(df, "vec_id", "embedding", "label", k=2, **kw).collect()
    }
    ring = {
        (r["anchor_id"], "ring_negative", r["j"]): (r["neg_id"], r["neg_label"], None)
        for r in negative_samples(df, "vec_id", k=2, label_col="label", n_buckets=8).collect()
    }
    ok = {a for (a, _, _) in pos} & {a for (a, _, _) in hard}
    lbl = {i: l for i, l, _ in rows}
    want = sorted(
        (a, lbl[a], role, rank, pid, plbl, c)
        for d in (pos, hard, ring)
        for (a, role, rank), (pid, plbl, c) in d.items()
        if a in ok
    )
    assert got == want and len(got) > 0
    # every qualified anchor carries all three roles
    roles_by_anchor = {}
    for a, _, role, *_ in got:
        roles_by_anchor.setdefault(a, set()).add(role)
    assert all(
        {"positive", "hard_negative"} <= s for s in roles_by_anchor.values()
    )


def test_contrastive_dataset_k_guard(spark):
    import pytest as _pytest

    from kafka_flow_spark.operators.sampling import contrastive_dataset

    df = spark.createDataFrame(
        [(1, 0, [1.0])], "vec_id BIGINT, label INT, embedding ARRAY<DOUBLE>"
    )
    with _pytest.raises(ValueError, match="k_ring must be"):
        contrastive_dataset(df, "vec_id", "embedding", "label", k_ring=0)


# --- poisson_bootstrap ---


def test_bootstrap_weights_follow_poisson1(spark):
    # over many (replicate, key) draws the weight histogram approximates
    # Poisson(1): P(0)=P(1)=e^-1~0.368, mean ~1.
    from kafka_flow_spark.operators.sampling import poisson_bootstrap

    df = spark.createDataFrame([(i, 1) for i in range(500)], "id BIGINT, x BIGINT")
    out = poisson_bootstrap(df, "id", "x", replicates=8).collect()
    n_eff = sum(r["n_eff"] for r in out)
    draws = 500 * 8
    assert abs(n_eff / draws - 1.0) < 0.05  # mean weight ~ 1


def test_bootstrap_replicates_differ_but_rerun_identical(spark):
    from kafka_flow_spark.operators.sampling import poisson_bootstrap

    df = spark.createDataFrame([(i, i % 7) for i in range(200)], "id BIGINT, x BIGINT")
    a = {r["replicate"]: (r["n_eff"], r["sum_value"])
         for r in poisson_bootstrap(df, "id", "x", replicates=6).collect()}
    b = {r["replicate"]: (r["n_eff"], r["sum_value"])
         for r in poisson_bootstrap(df, "id", "x", replicates=6).collect()}
    assert a == b                       # content-addressed: rerun identical
    assert len(set(a.values())) > 1     # replicates are distinct draws


def test_bootstrap_mean_is_weighted_truncating_mean(spark):
    from kafka_flow_spark.operators.sampling import poisson_bootstrap

    df = spark.createDataFrame([(1, 10), (2, 20), (3, 31)], "id BIGINT, x BIGINT")
    for r in poisson_bootstrap(df, "id", "x", replicates=4).collect():
        if r["n_eff"] > 0:
            assert r["mean_value"] == r["sum_value"] // r["n_eff"]
        else:
            assert r["mean_value"] is None


def test_bootstrap_spread_brackets_the_point_estimate(spark):
    # the replicate means should scatter AROUND the true mean, not all to
    # one side (a sanity check of the unbiasedness the method promises).
    from kafka_flow_spark.operators.sampling import poisson_bootstrap

    rows = [(i, 100 + (i * 37) % 50) for i in range(400)]
    true_mean = sum(x for _, x in rows) / len(rows)
    df = spark.createDataFrame(rows, "id BIGINT, x BIGINT")
    means = [r["mean_value"] for r in
             poisson_bootstrap(df, "id", "x", replicates=16).collect()]
    assert min(means) <= true_mean <= max(means)


def test_bootstrap_validates_replicates(spark):
    import pytest as _pytest

    from kafka_flow_spark.operators.sampling import poisson_bootstrap

    df = spark.createDataFrame([(1, 1)], "id BIGINT, x BIGINT")
    with _pytest.raises(ValueError, match="replicates"):
        poisson_bootstrap(df, "id", "x", replicates=1)


# --- recency_weighted_sample ---


def test_recency_sample_rates_halve_per_week(spark):
    from pyspark.sql import functions as F

    from kafka_flow_spark.operators.sampling import recency_weighted_sample

    # 4000 rows per age bucket 0..3 (ts stepped back a week per bucket)
    rows = [
        (i, f"2024-01-{28 - 7 * (i % 4):02d} 12:00:00") for i in range(16000)
    ]
    df = spark.createDataFrame(rows, "id BIGINT, t STRING").select(
        "id", F.col("t").cast("timestamp").alias("t")
    )
    out = recency_weighted_sample(df, "id", "t", "2024-01-29 00:00:00")
    got = {
        r["age_weeks"]: (r["n"], r["k"])
        for r in out.groupBy("age_weeks")
        .agg(F.count("*").alias("n"), F.sum(F.col("kept").cast("int")).alias("k"))
        .collect()
    }
    assert set(got) == {0, 1, 2, 3}
    assert got[0][1] == got[0][0]  # age 0: everything kept
    for age in (1, 2, 3):
        n, k = got[age]
        expect = n * 2.0 ** -age
        assert abs(k - expect) < 4 * (expect ** 0.5) + 5, (age, k, expect)


def test_recency_sample_deterministic_and_clamps(spark):
    from pyspark.sql import functions as F

    from kafka_flow_spark.operators.sampling import recency_weighted_sample

    df = spark.createDataFrame(
        [(1, "2024-02-05 00:00:00"), (2, "2020-01-01 00:00:00")],
        "id BIGINT, t STRING",
    ).select("id", F.col("t").cast("timestamp").alias("t"))
    out = {
        r["id"]: (r["age_weeks"], r["kept"])
        for r in recency_weighted_sample(
            df, "id", "t", "2024-01-29 00:00:00", max_age_weeks=5
        ).collect()
    }
    assert out[1][0] == 0 and out[1][1] is True  # future row clamps to age 0
    assert out[2][0] > 5  # raw age reported, gate capped at max_age_weeks
    again = {
        r["id"]: (r["age_weeks"], r["kept"])
        for r in recency_weighted_sample(
            df, "id", "t", "2024-01-29 00:00:00", max_age_weeks=5
        ).collect()
    }
    assert again == out

    import pytest as _pytest

    with _pytest.raises(ValueError, match="half_life"):
        recency_weighted_sample(df, "id", "t", "2024-01-29", half_life_weeks=0)


def test_recency_sample_floor_is_nonzero_beyond_hash_resolution(spark):
    """Review r10: the md5 bucket space is 16^6 = 2^24, so 2^-k floors to a
    '000000' threshold (P = exactly 0) for k >= 25 — with the default
    max_age_weeks=30 every row older than 24 halvings was silently HARD-CUT,
    the exact behavior the docstring promises not to have.  Halvings now
    clamp at _MAX_HALVINGS=24; the effective floor is 2^-24, pinned here with
    a key whose md5 prefix is '000000' (md5('20412333') — kept at ANY age)
    and one at '000001' (md5('78337636') — just above the floor threshold,
    dropped)."""
    from pyspark.sql import functions as F

    from kafka_flow_spark.operators.sampling import (
        _MAX_HALVINGS,
        fraction_threshold,
        recency_weighted_sample,
    )

    assert _MAX_HALVINGS == 24
    assert fraction_threshold(2.0 ** -24) == "000001"  # smallest nonzero gate
    df = spark.createDataFrame(
        [(20412333, "1990-01-01 00:00:00"), (78337636, "1990-01-01 00:00:00")],
        "id BIGINT, t STRING",
    ).select("id", F.col("t").cast("timestamp").alias("t"))
    out = {
        r["id"]: r["kept"]
        for r in recency_weighted_sample(
            df, "id", "t", "2024-01-29 00:00:00", max_age_weeks=30
        ).collect()
    }
    # pre-fix both were False (threshold '000000' is never cleared); the
    # decaying floor keeps the 1-in-2^24 key and drops its neighbor
    assert out[20412333] is True
    assert out[78337636] is False
