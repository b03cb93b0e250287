"""duplicate_spans: substring-level dedup (Lee et al. 2021 semantics at
n-gram granularity).  Constructed corpora with known shared runs verify span
boundaries, overlap merging, adjacency, self-repetition scoping, and the
no-duplicates case; oracle parity at sf0.001/sf0.01 carries the corpus-scale
check (tests/test_oracle_parity.py::q_duplicate_spans).
"""

from __future__ import annotations

from kafka_flow_spark.operators.dedup import duplicate_spans

N = 3


def _spans(spark, docs, **kw):
    df = spark.createDataFrame(list(docs.items()), "doc_id BIGINT, text STRING")
    rows = duplicate_spans(df, "doc_id", "text", shingle_n=N, **kw).collect()
    return {
        d: sorted(
            (r["span_start"], r["span_end"]) for r in rows if r["doc_id"] == d
        )
        for d in docs
    }


def test_shared_run_exact_boundaries(spark):
    # docs 1/2 share exactly tokens 'a b c d' -> span [0,3] in doc1, [2,5] in doc2
    out = _spans(
        spark,
        {
            1: "a b c d x1 y1 z1 w1 q1",
            2: "p2 q2 a b c d r2 s2 t2",
            3: "nothing here matches anything else at all today",
        },
    )
    assert out[1] == [(0, 3)]
    assert out[2] == [(2, 5)]
    assert out[3] == []


def test_two_separate_shared_runs_stay_separate(spark):
    # shared runs 'a b c' and 'x y z' separated by >n unique tokens in both
    out = _spans(
        spark,
        {
            1: "a b c u1 u2 u3 u4 u5 x y z",
            2: "a b c v1 v2 v3 v4 v5 x y z",
        },
    )
    assert out[1] == [(0, 2), (8, 10)]
    assert out[2] == [(0, 2), (8, 10)]


def test_overlapping_hits_merge_into_one_span(spark):
    # doc2 contains doc1's whole text -> every 3-gram of doc1 duplicated,
    # hits at consecutive positions merge into ONE maximal span
    out = _spans(
        spark,
        {
            1: "m n o p q r s",
            2: "pre1 pre2 m n o p q r s post1",
        },
    )
    assert out[1] == [(0, 6)]
    assert out[2] == [(2, 8)]


def test_self_repetition_scope(spark):
    docs = {
        1: "rep1 rep2 rep3 mid1 mid2 mid3 rep1 rep2 rep3",
        2: "other words entirely unrelated to the first document",
    }
    # corpus scope: within-doc repeated 3-gram counts as duplicated
    out = _spans(spark, docs)
    assert out[1] == [(0, 2), (6, 8)]
    # cross-doc scope: no other doc shares it -> clean
    out = _spans(spark, docs, cross_doc_only=True)
    assert out[1] == []
    assert out[2] == []


def test_min_occurrences_threshold(spark):
    # 'a b c' occurs 3x corpus-wide, 'x y z' occurs 2x
    docs = {
        1: "a b c s1 s2 s3 x y z",
        2: "a b c t1 t2 t3 x y z",
        3: "a b c u1 u2 u3 w y z",
    }
    out = _spans(spark, docs, min_occurrences=3)
    assert out[1] == [(0, 2)]
    assert out[2] == [(0, 2)]
    assert out[3] == [(0, 2)]


def test_short_docs_no_full_shingle(spark):
    out = _spans(spark, {1: "a b", 2: "a b", 3: ""})
    assert out[1] == [] and out[2] == [] and out[3] == []


# --- remove_duplicate_spans (the cut step) ---


def _clean(spark, docs, **kw):
    from kafka_flow_spark.operators.dedup import remove_duplicate_spans

    df = spark.createDataFrame(list(docs.items()), "doc_id BIGINT, text STRING")
    rows = remove_duplicate_spans(df, "doc_id", "text", shingle_n=N, **kw).collect()
    return {r["doc_id"]: (r["clean_text"], r["n_tokens_removed"]) for r in rows}


def test_cut_keeps_first_occurrence(spark):
    out = _clean(
        spark,
        {
            1: "a b c d x1 y1 z1",
            2: "p2 q2 a b c d r2",
            3: "w3 a b c d v3 u3",
        },
    )
    # doc 1 (lowest doc_id) keeps the shared run; docs 2 and 3 lose it
    assert out[1] == ("a b c d x1 y1 z1", 0)
    assert out[2] == ("p2 q2 r2", 4)
    assert out[3] == ("w3 v3 u3", 4)


def test_cut_none_removes_all_occurrences(spark):
    out = _clean(spark, {1: "a b c d x1", 2: "y2 a b c d"}, keep="none")
    assert out[1] == ("x1", 4)
    assert out[2] == ("y2", 4)


def test_cut_preserves_unaffected_docs_normalized(spark):
    # untouched docs come back as their normalized token stream
    out = _clean(spark, {1: "  Mixed   CASE    doc  ", 2: "another doc entirely here"})
    assert out[1] == ("mixed case doc", 0)
    assert out[2] == ("another doc entirely here", 0)


def test_cut_total_tokens_conserved(spark):
    docs = {
        1: "a b c d e f g h i j",
        2: "z2 a b c d e f g h i j y2",
    }
    out = _clean(spark, docs)
    for d, text in docs.items():
        n_orig = len(text.split())
        clean, removed = out[d]
        n_clean = len(clean.split()) if clean else 0
        assert n_clean + removed == n_orig


# --- randomized differential: operator vs pure-Python brute force ---


def _brute_spans(docs: dict[int, str], n: int) -> dict[int, list[tuple[int, int]]]:
    from collections import Counter

    toks = {d: t.split() for d, t in docs.items()}
    grams: Counter = Counter()
    for ts_ in toks.values():
        for i in range(len(ts_) - n + 1):
            grams[tuple(ts_[i : i + n])] += 1
    out: dict[int, list[tuple[int, int]]] = {}
    for d, ts_ in toks.items():
        hits = [
            i for i in range(len(ts_) - n + 1) if grams[tuple(ts_[i : i + n])] >= 2
        ]
        spans: list[list[int]] = []
        for p in hits:
            if spans and p - (spans[-1][1] - n + 1) <= n:
                spans[-1][1] = p + n - 1
            else:
                spans.append([p, p + n - 1])
        out[d] = [tuple(s) for s in spans]
    return out


def test_random_corpora_match_brute_force(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    token = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
    doc = st.lists(token, min_size=0, max_size=18).map(" ".join)
    corpus = st.lists(doc, min_size=1, max_size=5).map(
        lambda ds: {i + 1: d for i, d in enumerate(ds)}
    )

    @settings(max_examples=10, deadline=None)
    @given(corpus)
    def check(docs):
        assert _spans(spark, docs) == _brute_spans(docs, N)

    check()
