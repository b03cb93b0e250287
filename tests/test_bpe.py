"""BPE tokenizer training/segmentation: hand-worked merge tables, the
losslessness property, guard behavior (iterative training has no SQL
oracle — these differentials are its correctness gate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_flow_spark.operators.bpe import (
    _train_merges,
    _train_merges_ref,
    bpe_segment,
    bpe_train,
)
from kafka_flow_spark.tables import load
from tests.conftest import SF_SMALL


def test_train_merges_hand_worked_classic_example():
    # Sennrich et al.'s canonical corpus: low x5, lower x2, newest x6, widest x3
    hist = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    got = _train_merges(hist, 4)
    # e+s: 6(newest)+3(widest)=9; then es+t: 9; l+o: 5+2=7; lo+w: 7
    assert got == [
        (0, "e", "s", 9),
        (1, "es", "t", 9),
        (2, "l", "o", 7),
        (3, "lo", "w", 7),
    ]


def test_train_merges_tie_breaks_lexicographically():
    # 'ab' and 'cd' both count 1: (a, b) < (c, d)
    assert _train_merges([("ab", 1), ("cd", 1)], 1)[0][:3] == (0, "a", "b")


def test_train_merges_stops_when_no_pairs_left():
    # single-char words have no pairs; 'ab' exhausts after one merge
    assert len(_train_merges([("a", 5), ("ab", 1)], 10)) == 1


def test_train_merges_incremental_matches_reference():
    """The heap/incremental trainer must be bit-identical to the recount
    reference — including tie-breaks, overlapping pairs (aaa), words that
    collapse to one symbol, and repeated pairs within a word (abab)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abc", min_size=1, max_size=8)
    hist_s = st.lists(
        st.tuples(word, st.integers(min_value=1, max_value=9)),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )

    @settings(max_examples=200, deadline=None)
    @given(hist_s, st.integers(min_value=1, max_value=30))
    def check(hist, n_merges):
        assert _train_merges(hist, n_merges) == _train_merges_ref(hist, n_merges)

    check()
    # targeted shapes the random alphabet under-samples
    for hist in (
        [("aaaa", 3)],                     # overlapping pair runs
        [("abab", 2), ("ab", 7)],          # repeated pair inside one word
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)],
    ):
        assert _train_merges(hist, 50) == _train_merges_ref(hist, 50)


def test_bpe_train_guard_and_determinism(spark):
    docs = load(spark, SF_SMALL, "documents")
    with pytest.raises(ValueError):
        bpe_train(docs, "text", n_merges=5, max_word_types=1)
    with pytest.raises(ValueError):
        bpe_train(docs, "text", n_merges=0)
    a = bpe_train(docs, "text", n_merges=10).collect()
    b = bpe_train(docs, "text", n_merges=10).collect()
    assert a == b


def test_bpe_segment_lossless_and_counts(spark):
    docs = load(spark, SF_SMALL, "documents")
    mt = bpe_train(docs, "text", n_merges=20)
    merges = [(r["left"], r["right"]) for r in mt.orderBy("rank").collect()]
    seg = bpe_segment(docs, "doc_id", "text", merges)
    toks = docs.select(
        "doc_id",
        F.split(
            F.trim(F.regexp_replace(F.lower("text"), "\\s+", " ")), " "
        ).alias("_t"),
    )
    joined = seg.join(toks, "doc_id").collect()
    assert joined
    for r in joined:
        # piece stream concatenates back to the exact token stream
        assert "".join(r["pieces"]) == "".join(r["_t"])
        assert r["n_tokens"] == len(r["_t"])
        assert r["n_pieces"] >= r["n_tokens"]


def test_bpe_segment_null_text_propagates(spark):
    d = spark.createDataFrame([(1, "aa bb"), (2, None)], "id long, text string")
    rows = {
        r["id"]: r
        for r in bpe_segment(
            d, "id", "text", [("a", "a"), ("b", "b")]
        ).collect()
    }
    assert rows[1]["pieces"] == ["aa", "bb"]
    assert rows[2]["pieces"] is None and rows[2]["n_tokens"] is None


def test_bpe_fertility_card_differential_vs_proxy_and_monotone(spark):
    """The r10 #6 differential: (a) the trained-BPE card's ws_tokens equals
    the oracle-gated regex-proxy card's EXACTLY (shared tokenization
    contract — ties the rows-only card to a value-exact twin); (b)
    fertility_e6 is monotonically NON-INCREASING as the merge table grows
    (each extra merge can only merge further — the property that makes the
    card worth publishing), strictly dropping somewhere on real text; (c)
    the zero-proxy: an empty merge table degenerates to characters-per-word
    exactly."""
    from kafka_flow_spark.operators.bpe import bpe_fertility_card
    from kafka_flow_spark.plans.registry import all_queries, load_all_plans

    docs = load(spark, SF_SMALL, "documents")
    mt = bpe_train(docs, "text", n_merges=100)
    ranked = [(r["left"], r["right"]) for r in mt.orderBy("rank").collect()]

    def card(merges):
        return {
            r["source"]: r
            for r in bpe_fertility_card(
                docs, "source", "doc_id", "text", merges
            ).collect()
        }

    load_all_plans()
    proxy = {
        r["source"]: r
        for r in all_queries()["q_tokenizer_fertility"](spark, SF_SMALL).collect()
    }
    c0, c10, c100 = card([]), card(ranked[:10]), card(ranked)
    assert set(c100) == set(proxy)
    ferts = []
    for src in c100:
        # (a) same whitespace-token denominator as the value-exact proxy
        assert c100[src]["ws_tokens"] == proxy[src]["ws_tokens"]
        assert c100[src]["n_bytes"] == proxy[src]["n_bytes"]
        # (b) monotone: more merges never raises fertility
        f0, f10, f100 = (
            c["fertility_e6"] for c in (c0[src], c10[src], c100[src])
        )
        assert f0 >= f10 >= f100, (src, f0, f10, f100)
        ferts.append((f0, f100))
        # (c) zero merges == characters per word: pieces are single chars
        chars = (
            docs.where(F.col("source") == src)
            .select(
                F.sum(
                    F.length(
                        F.regexp_replace(
                            F.trim(
                                F.regexp_replace(F.lower("text"), "\\s+", " ")
                            ),
                            " ",
                            "",
                        )
                    )
                ).alias("c")
            )
            .collect()[0]["c"]
        )
        assert c0[src]["bpe_tokens"] == chars
    # strictly dropped overall (real text always has mergeable pairs)
    assert any(f100 < f0 for f0, f100 in ferts)
