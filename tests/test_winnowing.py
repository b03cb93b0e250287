"""Winnowing fingerprints: the substring-sharing guarantee and density bound.

DuckDB cannot mirror xxhash64, so the operator is rows-only in the registry;
these property tests carry its correctness instead.
"""

from __future__ import annotations

from kafka_flow_spark.operators.dedup import shingle_hashes, winnowing_fingerprints

WINDOW = 4
SHINGLE_N = 3


def _fps(spark, docs: dict[int, str]) -> dict[int, set[int]]:
    df = spark.createDataFrame(list(docs.items()), "doc_id BIGINT, text STRING")
    out: dict[int, set[int]] = {i: set() for i in docs}
    for r in winnowing_fingerprints(df, "doc_id", "text", WINDOW, SHINGLE_N).collect():
        out[r["doc_id"]].add(r["fingerprint"])
    return out


def test_shared_run_guarantees_shared_fingerprint(spark):
    # a shared token run of >= window + shingle_n - 1 words must yield at
    # least one common fingerprint (the winnowing guarantee)
    shared = "quick brown foxes jump over seven lazy sleeping dogs tonight"
    fps = _fps(
        spark,
        {
            1: "alpha beta gamma " + shared + " delta epsilon",
            2: "one two three four five " + shared + " six seven",
            3: "completely different words about database engines and query plans here",
        },
    )
    assert fps[1] & fps[2], "docs sharing a long run must share a fingerprint"
    assert not (fps[1] & fps[3]), "unrelated docs should share nothing"


def test_identical_docs_have_identical_fingerprints(spark):
    text = "the winnowing algorithm selects minima of sliding hash windows deterministically"
    fps = _fps(spark, {1: text, 2: text})
    assert fps[1] == fps[2] and fps[1]


def test_short_doc_gets_one_fingerprint(spark):
    # fewer shingles than the window -> exactly the global min is selected
    fps = _fps(spark, {1: "tiny document here now"})  # 4 tokens -> 2 shingles
    assert len(fps[1]) == 1


def test_density_is_a_fraction_of_shingles(spark):
    words = " ".join(f"w{i % 97}x{i % 13}" for i in range(400))
    df = spark.createDataFrame([(1, words)], "doc_id BIGINT, text STRING")
    n_sh = shingle_hashes(df, "doc_id", "text", SHINGLE_N).filter("_h IS NOT NULL").count()
    n_fp = winnowing_fingerprints(df, "doc_id", "text", WINDOW, SHINGLE_N).count()
    # expected density ~2/(window+1); allow generous slack but require real
    # compression over the raw shingle stream
    assert n_fp < n_sh / 2
