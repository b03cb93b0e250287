"""DSIR importance resampling (operators/selection.py).

The oracle gate (tests/test_oracle_parity.py picks up q_dsir_sample
automatically) proves end-to-end equality; the tests here pin the pieces the
oracle can't isolate: the ln-boundary determinism contract on real data, an
independent numpy re-derivation of the weights, and the selection semantics.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_flow_spark.operators.selection import (
    DEFAULT_BUCKETS,
    LOG_SCALE,
    bucket_logratios,
    doc_buckets,
    importance_weights,
    select_topk,
)
from tests.conftest import SF_MED


def _py_bucket(gram: str, n_buckets: int) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:6], 16) % n_buckets


def _py_weights(docs, n_buckets):
    """Independent reference: pure-python DSIR weights for [(id, text, is_t)]."""
    from collections import Counter, defaultdict

    per_doc = {}
    t_cnt, r_cnt = Counter(), Counter()
    for doc_id, text, is_t in docs:
        toks = " ".join(text.lower().split()).split(" ") if text.strip() else []
        buckets = [
            _py_bucket(f"{a} {b}", n_buckets) for a, b in zip(toks, toks[1:])
        ]
        per_doc[doc_id] = (buckets, is_t)
        (t_cnt if is_t else r_cnt).update(buckets)
    t_tot, r_tot = sum(t_cnt.values()), sum(r_cnt.values())
    lr = {}
    for b in set(t_cnt) | set(r_cnt):
        num = (t_cnt[b] + 1) * (r_tot + n_buckets)
        den = (r_cnt[b] + 1) * (t_tot + n_buckets)
        lr[b] = round(math.log(num / den) * LOG_SCALE)
    return {
        doc_id: (len(buckets), sum(lr[b] for b in buckets))
        for doc_id, (buckets, is_t) in per_doc.items()
        if buckets
    }


CORPUS = [
    # target domain: spark-ish jargon
    (0, "spark shuffle partition spark shuffle partition join", True),
    (1, "broadcast join shuffle partition codegen stage", True),
    (2, "spark shuffle partition broadcast join", True),
    # raw: one target-like, one neutral, one anti-target, one tiny
    (10, "spark shuffle partition broadcast join codegen", False),
    (11, "the cat sat on the mat and purred loudly", False),
    (12, "recipe flour sugar butter oven bake cake frosting", False),
    (13, "one", False),  # no bigrams -> absent from weights
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, is_t=b) for i, t, b in CORPUS]
    )


def test_weights_match_python_reference(spark, corpus_df):
    got = {
        r["doc_id"]: (r["n_grams"], r["weight_scaled"])
        for r in importance_weights(
            corpus_df, "text", "doc_id", F.col("is_t"), n_buckets=256
        ).collect()
    }
    assert got == _py_weights(CORPUS, 256)


def test_topk_selects_target_like_raw_docs(spark, corpus_df):
    rows = select_topk(
        corpus_df, "text", "doc_id", F.col("is_t"), k=3, n_buckets=256
    ).collect()
    ids = [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])]
    # only raw docs are candidates; the target-jargon doc must rank first
    # with a positive weight, the two off-domain docs below it with negative
    # weights (weight magnitude scales with doc gram count — faithful DSIR)
    assert set(ids) <= {10, 11, 12}
    assert ids[0] == 10
    by_id = {r["doc_id"]: r["weight_scaled"] for r in rows}
    assert by_id[10] > 0 > by_id[11]
    assert by_id[12] < 0
    # weights ordering is strict and ranks are 1..n
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == list(
        range(1, len(rows) + 1)
    )


def test_no_bigram_docs_absent(spark, corpus_df):
    w = importance_weights(corpus_df, "text", "doc_id", F.col("is_t"), n_buckets=256)
    assert 13 not in {r["doc_id"] for r in w.collect()}


def test_logratio_cross_engine(spark):
    """ln determinism pin: Spark's per-bucket lr_scaled must equal DuckDB's on
    the REAL sf0.01 bucket table — the finite input set the oracle gate will
    exercise.  A failure here means an ln() ulp landed on a round() boundary
    (switch LOG_SCALE or nudge, see ADVICE r5 percentile precedent)."""
    import duckdb

    from kafka_flow_spark.tables import load

    docs = load(spark, SF_MED, "documents")
    b = doc_buckets(docs, "text", "doc_id", F.col("source") == "src0")
    got = {
        r["bucket"]: r["lr_scaled"]
        for r in bucket_logratios(b, DEFAULT_BUCKETS).collect()
    }
    B = DEFAULT_BUCKETS
    want = {
        bucket: lr
        for bucket, lr in duckdb.sql(f"""
        WITH t AS (
          SELECT doc_id, source = 'src0' AS is_t,
            CASE WHEN trim(text) = '' THEN []
                 ELSE string_split_regex(trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')
            END AS toks
          FROM '{SF_MED}/documents.parquet'),
        pr0 AS (SELECT doc_id, is_t, toks, UNNEST(range(len(toks) - 1)) AS i
                FROM t WHERE len(toks) >= 2),
        g AS (SELECT is_t, toks[i + 1] || ' ' || toks[i + 2] AS gram FROM pr0),
        b AS (SELECT is_t,
                list_reduce(list_transform(range(1, 7), d ->
                  CAST(strpos('0123456789abcdef', substr(md5(gram), d, 1)) - 1 AS BIGINT)),
                  (a, b) -> a * 16 + b) % {B} AS bucket
              FROM g),
        c AS (SELECT bucket,
                     SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS t_cnt,
                     SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS r_cnt
              FROM b GROUP BY bucket),
        tot AS (SELECT SUM(t_cnt) AS t_tot, SUM(r_cnt) AS r_tot FROM c)
        SELECT bucket,
               CAST(ROUND(LN(CAST((t_cnt + 1) * (r_tot + {B}) AS DOUBLE)
                             / CAST((r_cnt + 1) * (t_tot + {B}) AS DOUBLE))
                          * 1000000) AS BIGINT)
        FROM c CROSS JOIN tot
        """).fetchall()
    }
    assert got == want


# --- hashed-linear classifier ------------------------------------------------


def _py_weight(tag: str, bucket: int) -> int:
    return int(hashlib.md5(f"{tag}:{bucket}".encode()).hexdigest()[:6], 16) % 2001 - 1000


def test_classifier_matches_python_mirror(spark):
    from kafka_flow_spark.operators.selection import classifier_scores, hash_model

    docs = [
        (1, "The quick brown fox  jumps"),
        (2, "lazy dog"),
        (3, "   "),  # zero tokens -> absent
        (4, "fox fox fox"),  # multiplicity counts
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    model = hash_model(spark, "quality-v1", n_buckets=64)
    got = {
        r["doc_id"]: (r["n_tokens"], r["score_micro"], r["label"])
        for r in classifier_scores(
            df, "text", "doc_id", weights=model, n_buckets=64
        ).collect()
    }
    assert 3 not in got
    for doc_id, text in [(1, docs[0][1]), (2, docs[1][1]), (4, docs[3][1])]:
        toks = " ".join(text.lower().split()).split(" ")
        score = sum(_py_weight("quality-v1", _py_bucket(t, 64)) for t in toks)
        assert got[doc_id] == (len(toks), score, score >= 0)


def test_classifier_threshold_shifts_labels(spark):
    from kafka_flow_spark.operators.selection import classifier_scores, hash_model

    df = spark.createDataFrame([(1, "alpha beta gamma")], ["doc_id", "text"])
    model = hash_model(spark, "quality-v1", n_buckets=64)
    lo = classifier_scores(df, "text", "doc_id", model, 64, threshold_micro=-(10**9))
    hi = classifier_scores(df, "text", "doc_id", model, 64, threshold_micro=10**9)
    assert lo.collect()[0]["label"] is True
    assert hi.collect()[0]["label"] is False


def test_classifier_model_join_is_broadcast(spark):
    from kafka_flow_spark.operators.selection import classifier_scores, hash_model
    from kafka_flow_spark.tables import load
    from tests.conftest import SF_SMALL

    docs = load(spark, SF_SMALL, "documents")
    model = hash_model(spark, "quality-v1")
    plan = classifier_scores(docs, "text", "doc_id", model)._sc_jvm_plan if False else (
        classifier_scores(docs, "text", "doc_id", model)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_classifier_sparse_model_scores_missing_as_zero(spark):
    from kafka_flow_spark.operators.selection import classifier_scores

    df = spark.createDataFrame([(1, "alpha beta"), (2, "zzz")], ["doc_id", "text"])
    # a weight table covering NO buckets: every doc must still appear,
    # n_tokens full, score 0, label by threshold sign
    empty = spark.createDataFrame([], "bucket LONG, w_micro LONG")
    got = {
        r["doc_id"]: (r["n_tokens"], r["score_micro"], r["label"])
        for r in classifier_scores(df, "text", "doc_id", empty, 64).collect()
    }
    assert got == {1: (2, 0, True), 2: (1, 0, True)}


# --- score_bin_report ---


def _report(spark, rows, n_bins=10):
    from kafka_flow_spark.operators.selection import score_bin_report

    df = spark.createDataFrame(rows, "id BIGINT, s BIGINT, y BOOLEAN")
    out = score_bin_report(df, "s", "y", n_bins=n_bins)
    return {r["bin"]: (r["n"], r["mean_score"], r["pos_rate_e6"], r["lift_e6"])
            for r in out.collect()}


def test_report_hand_checked_two_bins(spark):
    # scores 0..9 (bin 0) all negative outcome; 10..19 (bin 1) all positive
    rows = [(i, i, i >= 10) for i in range(20)]
    got = _report(spark, rows, n_bins=2)
    assert got[0] == (10, 4, 0, 0)          # mean 45//10=4, rate 0, lift 0
    assert got[1] == (10, 14, 1_000_000, 2_000_000)  # rate 1.0, lift 2x


def test_report_empty_bins_absent(spark):
    rows = [(1, 0, True), (2, 99, False)]  # middle bins unpopulated
    got = _report(spark, rows, n_bins=10)
    assert set(got) == {0, 9}


def test_report_single_score_value_lands_in_bin_zero(spark):
    got = _report(spark, [(i, 7, i % 2 == 0) for i in range(4)], n_bins=10)
    assert set(got) == {0}
    assert got[0][0] == 4 and got[0][2] == 500_000


def test_report_negative_scores_and_means(spark):
    rows = [(1, -10, False), (2, -7, False), (3, 50, True)]
    got = _report(spark, rows, n_bins=2)
    # (-10-(-10))*2 div 61 = 0; (-7+10)*2 div 61 = 0; (50+10)*2 div 61 = 1
    assert got[0][1] == -8   # trunc toward zero: -17 div 2 -> -8
    assert got[1][2] == 1_000_000


def test_report_large_n_decimal_path(spark):
    # 10M rows previously overflowed int64 in ANSI mode (pos·n_tot·1e6
    # passes 9.2e18 once the corpus exceeds ~3e6 rows with a high positive
    # rate); the DECIMAL(38,0) rationals must stay exact.
    from kafka_flow_spark.cache import release_all
    from kafka_flow_spark.operators.selection import score_bin_report

    n = 10_000_000
    df = spark.range(n).select(
        (F.col("id") % 10).alias("s"),
        (F.col("id") % 10 >= 5).alias("y"),  # 50% positive overall
    )
    try:
        out = {
            r["bin"]: r
            for r in score_bin_report(df, "s", "y", n_bins=2).collect()
        }
    finally:
        release_all()
    # bin 0 = scores 0..4 (all negative), bin 1 = scores 5..9 (all positive)
    half, pos_tot = n // 2, n // 2
    assert out[0]["n"] == half and out[0]["pos_rate_e6"] == 0
    assert out[0]["lift_e6"] == 0
    assert out[1]["pos_rate_e6"] == 1_000_000
    assert out[1]["lift_e6"] == half * n * 10**6 // (half * pos_tot)  # = 2e6


def test_report_validates_bins(spark):
    import pytest as _pytest

    from kafka_flow_spark.operators.selection import score_bin_report

    df = spark.createDataFrame([(1, 1, True)], "id BIGINT, s BIGINT, y BOOLEAN")
    with _pytest.raises(ValueError, match="n_bins"):
        score_bin_report(df, "s", "y", n_bins=1)
