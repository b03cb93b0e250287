"""Unit tests for the full-text search operators (operators/search.py).

The registry queries are oracle-gated (tests/test_oracle_parity.py covers
hash-exactness); these tests pin semantics on crafted corpora where the
expected answer is hand-checkable: postings/tf, document-frequency, BM25
ranking direction, vocab cut determinism, and OOV accounting.
"""

from __future__ import annotations

import pytest

from kafka_flow_spark.operators import search as S


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark spark spark join"),          # tf(spark)=3, dl=4
        (2, "spark join merge"),                # tf(spark)=1, dl=3
        (3, "merge merge sort sort sort sort"),  # no spark, dl=6
        (4, "   "),                             # whitespace-only: excluded
        (5, "Spark  JOIN"),                     # case/whitespace normalize, dl=2
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_postings_tf_and_normalization(corpus):
    post = {(r.term, r.doc_id): r.tf for r in S.postings(corpus).collect()}
    assert post[("spark", 1)] == 3
    assert post[("spark", 2)] == 1
    assert post[("spark", 5)] == 1  # "Spark" lowercased
    assert post[("join", 5)] == 1
    assert ("sort", 3) in post and post[("sort", 3)] == 4
    assert not any(d == 4 for (_, d) in post)  # blank doc indexed nowhere


def test_doc_lengths_skip_blank(corpus):
    dls = {r.doc_id: r.dl for r in S.doc_lengths(corpus).collect()}
    assert dls == {1: 4, 2: 3, 3: 6, 5: 2}


def test_term_stats_df(corpus):
    dfreq = {r.term: r.df for r in S.term_stats(S.postings(corpus)).collect()}
    assert dfreq["spark"] == 3  # docs 1, 2, 5
    assert dfreq["merge"] == 2  # docs 2, 3
    assert dfreq["sort"] == 1


def test_bm25_ranks_higher_tf_first(spark, corpus):
    queries = S.queries_from_terms(spark, {"q": ["spark"]})
    res = S.search_bm25(corpus, queries, k=10).collect()
    ranked = [r.doc_id for r in sorted(res, key=lambda r: r.rank)]
    # doc 1 has tf=3 but dl=4; doc 5 tf=1 dl=2 (short-doc boost); doc 2 tf=1 dl=3.
    # tf dominates here: doc 1 first; doc 5 beats doc 2 on length normalization.
    assert ranked[0] == 1
    assert set(ranked) == {1, 2, 5}
    assert ranked.index(5) < ranked.index(2)
    assert all(r.score_micro > 0 for r in res)


def test_bm25_multi_term_sums_and_k_cut(spark, corpus):
    queries = S.queries_from_terms(spark, {"q": ["spark", "merge"]})
    res = S.search_bm25(corpus, queries, k=2).collect()
    assert len(res) == 2  # k cut applied
    assert [r.rank for r in sorted(res, key=lambda r: r.rank)] == [1, 2]
    # every matched doc scores the sum over its matched terms only
    all_scores = S.bm25_scores(corpus, queries).collect()
    assert {r.doc_id for r in all_scores} == {1, 2, 3, 5}


def test_bm25_batch_queries_are_independent(spark, corpus):
    queries = S.queries_from_terms(spark, {"a": ["spark"], "b": ["sort"]})
    res = S.search_bm25(corpus, queries, k=10).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r.query_id, set()).add(r.doc_id)
    assert by_q == {"a": {1, 2, 5}, "b": {3}}


def test_vocab_top_k_total_order(spark, corpus):
    vocab = S.vocab_top_k(corpus, k=3).collect()
    assert [r.term for r in sorted(vocab, key=lambda r: r.rank)] == [
        "spark",  # 5 occurrences
        "sort",   # 4
        "join",   # 3 — ties with merge (3), lexicographic break
    ]
    top = {r.term: (r.n_occurrences, r.n_docs) for r in vocab}
    assert top["spark"] == (5, 3)
    assert top["sort"] == (4, 1)


def test_vocab_ties_break_on_term(spark):
    df = spark.createDataFrame(
        [(1, "b a"), (2, "a b")], "doc_id int, text string"
    )
    vocab = S.vocab_top_k(df, k=1).collect()
    assert vocab[0].term == "a"  # equal counts -> lexicographic


def test_oov_stats_exact_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "en", "known known new1"),
            (2, "en", "known new2"),
            (3, "fr", "known known"),
        ],
        "doc_id int, lang string, text string",
    )
    vocab = spark.createDataFrame([("known",)], "term string")
    res = {r.lang: r for r in S.oov_stats(df, vocab).collect()}
    assert (res["en"].n_tokens, res["en"].n_oov) == (5, 2)
    assert res["en"].oov_rate == 2 / 5
    assert (res["fr"].n_tokens, res["fr"].n_oov) == (2, 0)
    assert res["fr"].oov_rate == 0.0


def test_search_plan_has_no_python_udf(spark, corpus):
    queries = S.queries_from_terms(spark, {"q": ["spark"]})
    plan = S.search_bm25(corpus, queries, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- rrf_fuse / search_tf --------------------------------------------------


def test_rrf_fuse_hand_worked(spark):
    from kafka_flow_spark.operators.search import rrf_fuse

    # system 1 ranks: d1=1, d2=2 ; system 2 ranks: d2=1, d3=2
    r1 = spark.createDataFrame(
        [("q", "d1", 1), ("q", "d2", 2)], "query_id STRING, doc_id STRING, rank INT"
    )
    r2 = spark.createDataFrame(
        [("q", "d2", 1), ("q", "d3", 2)], "query_id STRING, doc_id STRING, rank INT"
    )
    got = {
        r["doc_id"]: (r["rrf_micro"], r["n_systems"], r["rank"])
        for r in rrf_fuse([r1, r2], k0=60, topk=10).collect()
    }
    # 10^6 // 61 = 16393, 10^6 // 62 = 16129
    assert got == {
        "d2": (16129 + 16393, 2, 1),  # in both systems -> fused top
        "d1": (16393, 1, 2),
        "d3": (16129, 1, 3),
    }


def test_search_tf_counts_occurrences_exactly(spark):
    from kafka_flow_spark.operators.search import search_tf

    docs = spark.createDataFrame(
        [(1, "spark spark shuffle"), (2, "spark join"), (3, "nothing here")],
        "doc_id BIGINT, text STRING",
    )
    queries = spark.createDataFrame(
        [("q1", "spark"), ("q1", "join")], "query_id STRING, term STRING"
    )
    got = {
        r["doc_id"]: (r["tf_total"], r["rank"])
        for r in search_tf(docs, queries, k=10).collect()
    }
    # doc 3 matches no query term -> absent; tie at tf=2 breaks on doc_id
    assert got == {1: (2, 1), 2: (2, 2)}


# --- Dirichlet query likelihood ---


def _ql_py(corpus_rows, query_terms, mu=2000):
    """Pure-python mirror of ql_scores on a tokenized corpus."""
    import math

    docs = {
        i: t.lower().split() for i, t in corpus_rows if t.strip()
    }
    dl = {i: len(ws) for i, ws in docs.items()}
    total = sum(dl.values())
    cf = {
        t: sum(ws.count(t) for ws in docs.values()) for t in set(query_terms)
    }
    out = {}
    for i, ws in docs.items():
        s = 0
        matched = False
        for t in query_terms:
            tf = ws.count(t)
            if tf:
                matched = True
                s += math.floor(
                    math.log((mu * cf[t] + tf * total) / (mu * cf[t])) * 1e6 + 0.5
                )
        if matched:
            s -= len(query_terms) * math.floor(
                math.log((dl[i] + mu) / mu) * 1e6 + 0.5
            )
            out[i] = s
    return out


def test_ql_matches_python_mirror(spark, corpus):
    rows = [(r.doc_id, r.text) for r in corpus.collect()]
    queries = S.queries_from_terms(spark, {"q": ["spark", "merge"]})
    got = {
        r.doc_id: r.score_micro_nats
        for r in S.ql_scores(corpus, queries).collect()
    }
    assert got == _ql_py(rows, ["spark", "merge"])


def test_ql_ranking_prefers_heavier_tf(spark, corpus):
    queries = S.queries_from_terms(spark, {"q": ["spark"]})
    ranked = S.search_ql(corpus, queries, k=10).collect()
    order = [r.doc_id for r in sorted(ranked, key=lambda r: r.rank)]
    # doc 1 (tf 3, dl 4) > doc 5 (tf 1, dl 2) > doc 2 (tf 1, dl 3):
    # higher tf wins; equal tf ranks the SHORTER doc higher (dl norm).
    assert order == [1, 5, 2]
    # doc 3 has no 'spark': never scored
    assert all(r.doc_id != 3 for r in ranked)


def test_ql_rank_equivalent_to_true_log_probability(spark, corpus):
    # the operator drops the query-constant Σ_t ln(µ·p(t|C)) of the full
    # Dirichlet log-probability; ORDERINGS must agree with the real thing.
    import math

    terms = ["spark", "join"]
    queries = S.queries_from_terms(spark, {"q": terms})
    got = sorted(
        ((r.score_micro_nats, -r.doc_id), r.doc_id)
        for r in S.ql_scores(corpus, queries).collect()
    )
    docs = {r.doc_id: r.text.lower().split() for r in corpus.collect() if r.text.strip()}
    total = sum(len(ws) for ws in docs.values())
    cf = {t: sum(ws.count(t) for ws in docs.values()) for t in terms}
    mu = 2000

    def logp(i):
        return sum(
            math.log((docs[i].count(t) + mu * cf[t] / total) / (len(docs[i]) + mu))
            for t in terms
        )

    truth = sorted(((logp(i), -i), i) for _, i in got)
    assert [i for _, i in got] == [i for _, i in truth]


def test_ql_validates_mu(spark, corpus):
    queries = S.queries_from_terms(spark, {"q": ["spark"]})
    with pytest.raises(ValueError, match="mu must be"):
        S.ql_scores(corpus, queries, mu=0)


# --- retrieval_eval ---


def test_relevance_requires_all_terms(spark, corpus):
    queries = S.queries_from_terms(spark, {"q": ["spark", "merge"]})
    rel = {(r.query_id, r.doc_id)
           for r in S.relevance_all_terms(corpus, queries).collect()}
    assert rel == {("q", 2)}  # only doc 2 has BOTH terms


def test_retrieval_eval_hand_checked(spark):
    ranked = spark.createDataFrame(
        [("q", 100, 1), ("q", 200, 2), ("q", 300, 3)],
        "query_id STRING, doc_id BIGINT, rank INT",
    )
    rel = spark.createDataFrame(
        [("q", 200), ("q", 300), ("q", 999)],  # 999 never retrieved
        "query_id STRING, doc_id BIGINT",
    )
    r = S.retrieval_eval(ranked, rel, k=10).collect()[0]
    assert (r.n_rel, r.hits_at_k) == (3, 2)
    assert r.recall_e6 == 666_666          # 2/3 truncated
    assert r.mrr_e6 == 500_000             # first relevant at rank 2


def test_retrieval_eval_zero_hits_and_missing_queries(spark):
    ranked = spark.createDataFrame(
        [("q", 100, 1)], "query_id STRING, doc_id BIGINT, rank INT"
    )
    rel = spark.createDataFrame(
        [("q", 999), ("unjudged_only", 1)],
        "query_id STRING, doc_id BIGINT",
    )
    got = {r.query_id: (r.hits_at_k, r.recall_e6, r.mrr_e6)
           for r in S.retrieval_eval(ranked, rel, k=10).collect()}
    assert got["q"] == (0, 0, 0)
    # a query with judgments but no ranking rows still reports (0 recall)
    assert got["unjudged_only"] == (0, 0, 0)


def test_retrieval_eval_respects_k(spark):
    ranked = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 11)], "query_id STRING, doc_id BIGINT, rank INT"
    )
    rel = spark.createDataFrame([("q", 2)], "query_id STRING, doc_id BIGINT")
    r = S.retrieval_eval(ranked, rel, k=10).collect()[0]
    assert r.hits_at_k == 0  # rank-11 hit is outside the cutoff
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be"):
        S.retrieval_eval(ranked, rel, k=0)
