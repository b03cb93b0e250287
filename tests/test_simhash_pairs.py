"""simhash_pairs: pigeonhole chunk blocking must equal brute-force XOR
popcount over the same fingerprints (recall 1.0), and refuse degenerate
fingerprint mass (oracle parity at sf0.001/sf0.01 covers corpus-level
equivalence via tests/test_oracle_parity.py)."""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from kafka_flow_spark.operators.dedup import simhash, simhash_pairs
from kafka_flow_spark.tables import load
from tests.conftest import SF_SMALL


def test_simhash_pairs_equals_bruteforce(spark):
    docs = load(spark, SF_SMALL, "documents")
    got = {
        (r["a_id"], r["b_id"]): r["hamming"]
        for r in simhash_pairs(docs, "doc_id", "text", max_hamming=4).collect()
    }
    fps = {
        r["doc_id"]: r["simhash"]
        for r in simhash(docs, "doc_id", "text").collect()
    }
    want = {}
    for (a, fa), (b, fb) in combinations(sorted(fps.items()), 2):
        h = bin((fa ^ fb) & ((1 << 64) - 1)).count("1")
        if h <= 4:
            want[(a, b)] = h
    assert got == want
    assert len(want) > 0  # the corpus has planted near-dups — non-vacuous


def test_simhash_pairs_refuses_degenerate_fingerprints(spark):
    # mass-empty docs all fingerprint to 0 and agree on every chunk
    df = spark.createDataFrame(
        [(i, "") for i in range(200)], "doc_id BIGINT, text STRING"
    )
    with pytest.raises(ValueError, match="candidate"):
        simhash_pairs(df, "doc_id", "text", max_candidate_pairs=1000)


def test_simhash_pairs_validates_max_hamming(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id BIGINT, text STRING")
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_pairs(df, "doc_id", "text", max_hamming=16)


def test_simhash_pairs_plan_has_no_cartesian(spark):
    docs = load(spark, SF_SMALL, "documents")
    plan = simhash_pairs(docs, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan


def test_simhash_pairs_k0_exact_fingerprint_match(spark):
    # k=0 → a single 64-bit chunk; the (1 << 64) - 1 mask would overflow
    # LongType, so the chunk must be the raw fingerprint (exact-match join)
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "zz qq ww ee rr tt")],
        "doc_id BIGINT, text STRING",
    )
    got = {(r["a_id"], r["b_id"], r["hamming"])
           for r in simhash_pairs(df, "doc_id", "text", max_hamming=0).collect()}
    assert got == {(1, 2, 0)}
