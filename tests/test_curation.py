"""Curation operators: split/mix/pack/contamination edge semantics (the
oracle-parity suite covers corpus-level equivalence; these pin the contracts
on handmade data)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_flow_spark.operators.curation import (
    hash_split,
    ngram_contamination,
    pack_sequences,
    split_thresholds,
    weighted_mix,
)
from kafka_flow_spark.tables import load
from tests.conftest import SF_SMALL


def _docs(spark):
    return load(spark, SF_SMALL, "documents").withColumn(
        "_key", F.col("doc_id").cast("string")
    )


def test_split_every_row_assigned_and_stable(spark):
    d = _docs(spark)
    out = hash_split(d, "_key", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = d.count()
    assert sum(counts.values()) == total  # nothing dropped, even bucket ffffff
    assert counts["train"] > counts.get("val", 0) and counts["train"] > counts.get("test", 0)
    again = hash_split(d.repartition(5), "_key", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert {(r["doc_id"], r["split"]) for r in out.select("doc_id", "split").collect()} == {
        (r["doc_id"], r["split"]) for r in again.select("doc_id", "split").collect()
    }


def test_split_validation():
    with pytest.raises(ValueError):
        split_thresholds({"a": 0.9, "b": 0.3})
    with pytest.raises(ValueError):
        split_thresholds({"a": 0.5, "b": -0.1})


def test_weighted_mix_semantics(spark):
    d = _docs(spark)
    langs = {r["lang"] for r in d.select("lang").distinct().collect()}
    assert "en" in langs and "zh" in langs
    out = weighted_mix(d, "lang", "_key", {"en": 1.0, "zh": 0.3})
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    en_total = d.where(F.col("lang") == "en").count()
    zh_total = d.where(F.col("lang") == "zh").count()
    assert got["en"] == en_total  # weight 1.0 keeps everything
    assert 0 < got.get("zh", 0) < zh_total
    assert set(got) == {"en", "zh"}  # unlisted groups dropped
    with pytest.raises(ValueError):
        weighted_mix(d, "lang", "_key", {"en": 1.5})


def test_pack_sequences_offsets_by_hand(spark):
    # one shard (ids all ≡ 0 mod 8), known token counts 3/4/5
    d = spark.createDataFrame(
        [(0, "a b c"), (8, "d e f g"), (16, "h i j k l")], "doc_id: long, text: string"
    )
    out = pack_sequences(d, "doc_id", "text", budget=6, n_shards=8)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert all(r["shard"] == 0 for r in rows.values())
    # order within shard is by md5(doc_id-string): recompute to assert exactly
    import hashlib

    order = sorted([0, 8, 16], key=lambda i: (hashlib.md5(str(i).encode()).hexdigest()[:6], str(i)))
    toks = {0: 3, 8: 4, 16: 5}
    cum = 0
    for i in order:
        assert rows[i]["pack_id"] == cum // 6 and rows[i]["pack_offset"] == cum % 6
        assert rows[i]["n_tokens"] == toks[i]
        cum += toks[i]


def test_pack_sequences_empty_text(spark):
    d = spark.createDataFrame([(1, ""), (2, "   ")], "doc_id: long, text: string")
    out = {r["doc_id"]: r["n_tokens"] for r in pack_sequences(d, "doc_id", "text").collect()}
    assert out == {1: 0, 2: 0}


def test_ngram_contamination_by_hand(spark):
    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9"  # 9 words -> two 8-grams
    train = spark.createDataFrame(
        [(1, base), (2, "x1 x2 x3 x4 x5 x6 x7 x8"), (3, "short text")],
        "doc_id: long, text: string",
    )
    ev = spark.createDataFrame([(100, base)], "doc_id: long, text: string")
    got = {r["doc_id"]: r["n_shared"] for r in ngram_contamination(train, ev, "doc_id", "text").collect()}
    # doc 1 shares both of eval's 8-grams; doc 2 none; doc 3 has no 8-grams
    assert got == {1: 2, 2: 0, 3: 0}


def test_split_thresholds_properties():
    from hypothesis import given, strategies as st

    from kafka_flow_spark.operators.sampling import fraction_threshold

    @given(
        st.lists(
            st.floats(min_value=0.01, max_value=0.5, allow_nan=False),
            min_size=1,
            max_size=4,
        ).filter(lambda fs: sum(fs) <= 1.0)
    )
    def check(fracs):
        splits = {f"s{i}": f for i, f in enumerate(fracs)}
        bounds = split_thresholds(splits)
        # names preserved in order; thresholds non-decreasing and cumulative
        assert [n for n, _ in bounds] == list(splits)
        hexes = [h for _, h in bounds]
        assert hexes == sorted(hexes)
        acc = 0.0
        for (_, h), f in zip(bounds, fracs):
            acc = min(acc + f, 1.0)
            assert h == fraction_threshold(acc)

    check()


# --- bloom-filter decontamination (the broadcast-bitmap scale path) ---


def test_bloom_contamination_no_false_negatives(spark):
    """Every exactly-shared n-gram must be flagged: bloom error is one-sided."""
    from kafka_flow_spark.operators.curation import (
        bloom_contamination,
        ngram_contamination,
    )
    from kafka_flow_spark.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    ev = docs.where("doc_id % 20 = 0")
    tr = docs.where("doc_id % 20 <> 0")
    exact = {r.doc_id: r.n_shared for r in ngram_contamination(tr, ev, "doc_id", "text", n=8).collect()}
    bloom = {r.doc_id: r.n_flagged for r in bloom_contamination(tr, ev, "doc_id", "text", n=8).collect()}
    assert set(exact) == set(bloom)
    for d, n in exact.items():
        assert bloom[d] >= n, f"doc {d}: bloom {bloom[d]} < exact {n}"


def test_bloom_tiny_filter_overflags_but_never_underflags(spark):
    """A deliberately undersized bitmap saturates: false positives explode but
    no shared n-gram is ever missed."""
    from kafka_flow_spark.operators.curation import (
        bloom_contamination,
        ngram_contamination,
    )

    rows = [
        (1, "a b c d e f g h extra tokens here now"),
        (2, "totally different words one two three four five six"),
    ]
    ev_rows = [(100, "a b c d e f g h unrelated suffix text ok")]
    tr = spark.createDataFrame(rows, "doc_id long, text string")
    ev = spark.createDataFrame(ev_rows, "doc_id long, text string")
    exact = {r.doc_id: r.n_shared for r in ngram_contamination(tr, ev, "doc_id", "text", n=8).collect()}
    tiny = {r.doc_id: r.n_flagged for r in bloom_contamination(tr, ev, "doc_id", "text", n=8, m_bits=64, k=2).collect()}
    assert exact[1] >= 1            # docs share the 8-gram "a b c d e f g h"
    assert tiny[1] >= exact[1]
    assert tiny[2] >= exact[2]


def test_bloom_bitmap_shape(spark):
    from kafka_flow_spark.operators.curation import bloom_bitmap

    ev = spark.createDataFrame([(1, "one two three four five six seven eight nine")], "doc_id long, text string")
    bm = bloom_bitmap(ev, "text", n=8, m_bits=1 << 12, k=4).collect()
    assert all(0 <= r.bucket < (1 << 12) // 64 for r in bm)
    # 2 distinct 8-grams * 4 hashes = at most 8 set bits across all buckets
    total_bits = sum(bin(r.bits & ((1 << 64) - 1)).count("1") for r in bm)
    assert 1 <= total_bits <= 8


def test_bloom_deterministic_under_repartition(spark):
    from kafka_flow_spark.operators.curation import bloom_contamination
    from kafka_flow_spark.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    ev = docs.where("doc_id % 20 = 0")
    tr = docs.where("doc_id % 20 <> 0")
    a = sorted((r.doc_id, r.n_flagged) for r in bloom_contamination(tr, ev, "doc_id", "text").collect())
    b = sorted(
        (r.doc_id, r.n_flagged)
        for r in bloom_contamination(tr.repartition(13), ev.repartition(5), "doc_id", "text").collect()
    )
    assert a == b


# --- chunk_tokens -----------------------------------------------------------

def _chunk_df(spark, rows, chunk=4, stride=2):
    from kafka_flow_spark.operators.curation import chunk_tokens

    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    return chunk_tokens(df, "doc_id", "text", chunk=chunk, stride=stride)


def test_chunk_covers_every_token_with_overlap(spark):
    text = " ".join(f"w{i}" for i in range(10))  # 10 tokens, chunk=4 stride=2
    rows = _chunk_df(spark, [(1, text)]).orderBy("chunk_idx").collect()
    assert [r["start"] for r in rows] == [0, 2, 4, 6, 8]
    assert [r["n_chunk_tokens"] for r in rows] == [4, 4, 4, 4, 2]
    assert rows[0]["chunk_text"] == "w0 w1 w2 w3"
    assert rows[-1]["chunk_text"] == "w8 w9"  # short tail kept, not dropped
    covered = set()
    for r in rows:
        covered.update(r["chunk_text"].split(" "))
    assert covered == {f"w{i}" for i in range(10)}


def test_chunk_empty_and_single_token_docs(spark):
    rows = _chunk_df(spark, [(1, "   "), (2, "only")]).collect()
    assert [(r["doc_id"], r["chunk_idx"], r["chunk_text"]) for r in rows] == [
        (2, 0, "only")
    ]


def test_chunk_no_overlap_when_stride_equals_chunk(spark):
    text = " ".join(f"w{i}" for i in range(6))
    rows = _chunk_df(spark, [(1, text)], chunk=3, stride=3).orderBy("chunk_idx").collect()
    texts = [r["chunk_text"] for r in rows]
    assert texts == ["w0 w1 w2", "w3 w4 w5"]


def test_chunk_validation(spark):
    with pytest.raises(ValueError):
        _chunk_df(spark, [(1, "a b")], chunk=0)
    with pytest.raises(ValueError):
        _chunk_df(spark, [(1, "a b")], stride=0)


# --- edit_distance_pairs (record linkage) ---------------------------------

def test_edit_distance_pairs_adjacent_band_and_dedup(spark):
    from kafka_flow_spark.operators.dedup import edit_distance_pairs

    rows = [
        (1, "abcdefgh"),    # len 8 -> band 1 (width 8)
        (2, "abcdefg"),     # len 7 -> band 0; dist(1,2)=1 across bands
        (3, "abcdefgh"),    # dup of 1 -> dist 0, same band
        (4, "zzzzzzzz"),    # far from everything
    ]
    df = spark.createDataFrame(rows, "rid BIGINT, name STRING")
    out = {(r["a_id"], r["b_id"]): r["dist"]
           for r in edit_distance_pairs(df, "rid", "name", max_dist=1).collect()}
    # adjacent-band pair found once, exact dup found once, nothing else
    assert out == {(1, 2): 1, (1, 3): 0, (2, 3): 1}


def test_edit_distance_pairs_validation(spark):
    from kafka_flow_spark.operators.dedup import edit_distance_pairs

    df = spark.createDataFrame([(1, "a")], "rid BIGINT, name STRING")
    with pytest.raises(ValueError):
        edit_distance_pairs(df, "rid", "name", max_dist=8, band_width=8)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_distance_deletion_fallback_matches_bruteforce(spark):
    from itertools import combinations

    from kafka_flow_spark.operators.dedup import edit_distance_pairs

    # all length 8: substitutions, a dup, and unrelated strings
    names = ["abcdefgh", "abcdefgx", "abcdefgh", "zzzzzzzz", "abxdefgh",
             "qrstuvwx", "qrstuvwy"]
    rows = [(i, s) for i, s in enumerate(names)]
    df = spark.createDataFrame(rows, "rid BIGINT, name STRING")
    # max_candidate_pairs=0 forces the band path over the cap -> fallback
    out = {(r["a_id"], r["b_id"]): r["dist"]
           for r in edit_distance_pairs(df, "rid", "name", max_dist=1,
                                        max_candidate_pairs=30).collect()}
    want = {(i, j): _lev(a, b)
            for (i, a), (j, b) in combinations(rows, 2) if _lev(a, b) <= 1}
    assert out == want


def test_edit_distance_deletion_fallback_insertions_k2(spark):
    from itertools import combinations

    from kafka_flow_spark.operators.dedup import edit_distance_pairs

    import hashlib

    names = ["abcdefgh", "abcdefghi", "bcdefgh", "abcdegh", "abcdefghij",
             "xydefgh", "abcdffgh"]
    # pad with pairwise-distant uniform-length filler so the LENGTH-BAND
    # estimate blows past the cap (forcing the fallback) while the deletion
    # blocks stay small (the filler shares no variants)
    names += [hashlib.md5(str(i).encode()).hexdigest()[:8] for i in range(30)]
    rows = [(i, s) for i, s in enumerate(names)]
    df = spark.createDataFrame(rows, "rid BIGINT, name STRING")
    out = {(r["a_id"], r["b_id"]): r["dist"]
           for r in edit_distance_pairs(df, "rid", "name", max_dist=2,
                                        max_candidate_pairs=200).collect()}
    want = {(i, j): _lev(a, b)
            for (i, a), (j, b) in combinations(rows, 2) if _lev(a, b) <= 2}
    assert out == want


def test_edit_distance_pairs_refuses_identical_string_blowup(spark):
    from kafka_flow_spark.operators.dedup import edit_distance_pairs

    # mass-identical strings: length bands AND deletion blocks both degenerate
    df = spark.createDataFrame(
        [(i, "samename") for i in range(100)], "rid BIGINT, name STRING"
    )
    with pytest.raises(ValueError, match="candidate"):
        edit_distance_pairs(df, "rid", "name", max_candidate_pairs=1000)


def test_edit_distance_band_rescue_when_deletion_blocks_degenerate(spark):
    from kafka_flow_spark.operators.dedup import edit_distance_pairs

    # 60 identical length-8 strings: deletion-neighborhood blocks are
    # degenerate (every copy shares every variant key) and blow past the
    # cap, but the length-band estimate (n^2 = 3600) stays under it — the
    # operator must fall back to the band join, not refuse
    rows = [(i, "abcdefgh") for i in range(60)] + [(60, "abcdefgx")]
    df = spark.createDataFrame(rows, "rid BIGINT, name STRING")
    out = edit_distance_pairs(
        df, "rid", "name", max_dist=1, max_candidate_pairs=10_000
    )
    got = {(r["a_id"], r["b_id"]): r["dist"] for r in out.collect()}
    # 60 identical -> C(60,2) dist-0 pairs; each identical vs the
    # substitution variant -> 60 dist-1 pairs
    assert len(got) == 60 * 59 // 2 + 60
    assert got[(0, 1)] == 0 and got[(0, 60)] == 1


# --- jaccard_pairs_prefix (All-Pairs/PPJoin prefix filtering) ---------------

def test_jaccard_prefix_equals_bruteforce(spark):
    from itertools import combinations

    from kafka_flow_spark.operators.dedup import jaccard_pairs_prefix

    docs = [
        "alpha beta gamma delta epsilon zeta",
        "alpha beta gamma delta epsilon eta",    # high overlap with 0
        "alpha beta gamma delta epsilon zeta",   # exact dup of 0
        "one two three four five six seven",
        "one two three four five six eight",     # high overlap with 3
        "totally different words entirely here now",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id BIGINT, text STRING"
    )
    t = 0.6
    got = {(r["a_id"], r["b_id"]): r["jac"]
           for r in jaccard_pairs_prefix(df, "doc_id", "text", threshold=t).collect()}

    def jac(a, b):
        sa, sb = set(a.split()), set(b.split())
        return len(sa & sb) / len(sa | sb)

    want = {(i, j): round(jac(a, b), 4)
            for (i, a), (j, b) in combinations(enumerate(docs), 2)
            if jac(a, b) >= t}
    assert got == want
    assert (0, 2) in got and got[(0, 2)] == 1.0  # exact dup survives


def test_jaccard_prefix_refuses_degenerate_prefixes(spark):
    import pytest

    from kafka_flow_spark.operators.dedup import jaccard_pairs_prefix

    # mass-identical documents: every prefix posting holds every copy
    df = spark.createDataFrame(
        [(i, "same tokens in every single document") for i in range(200)],
        "doc_id BIGINT, text STRING",
    )
    with pytest.raises(ValueError, match="candidate"):
        jaccard_pairs_prefix(df, "doc_id", "text", threshold=0.9,
                             max_candidate_pairs=1000)


def test_jaccard_prefix_plan_clean(spark):
    from kafka_flow_spark.operators.dedup import jaccard_pairs_prefix
    from kafka_flow_spark.tables import load
    from tests.conftest import SF_SMALL

    out = jaccard_pairs_prefix(load(spark, SF_SMALL, "documents"),
                               "doc_id", "text", threshold=0.8, shingle_n=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan


def test_jaccard_prefix_property_random_corpora(spark):
    """Property: prefix filtering is LOSSLESS — for random small corpora the
    operator equals the brute-force all-pairs truth at every threshold."""
    from itertools import combinations

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafka_flow_spark.operators.dedup import jaccard_pairs_prefix

    token = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"])
    doc = st.lists(token, min_size=1, max_size=12).map(" ".join)
    corpus = st.lists(doc, min_size=2, max_size=6)
    thresh = st.sampled_from([0.3, 0.5, 0.8])

    @settings(max_examples=8, deadline=None)
    @given(corpus, thresh)
    def check(docs, t):
        df = spark.createDataFrame(
            [(i, d) for i, d in enumerate(docs)], "doc_id BIGINT, text STRING"
        )
        got = {(r["a_id"], r["b_id"]): r["jac"]
               for r in jaccard_pairs_prefix(df, "doc_id", "text", threshold=t).collect()}

        def jac(a, b):
            sa, sb = set(a.split()), set(b.split())
            return len(sa & sb) / len(sa | sb)

        want = {(i, j): round(jac(a, b), 4)
                for (i, a), (j, b) in combinations(enumerate(docs), 2)
                if jac(a, b) >= t}
        assert got == want

    check()


# --- containment_pairs_prefix (asymmetric prefix filtering) -----------------

def test_containment_prefix_equals_bruteforce(spark):
    from itertools import permutations

    from kafka_flow_spark.operators.dedup import containment_pairs_prefix

    docs = [
        "alpha beta gamma delta",
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",  # contains 0
        "one two three",
        "one two three four five six seven eight",                   # contains 2
        "totally different words entirely",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id BIGINT, text STRING"
    )
    t = 0.75
    got = {(r["a_id"], r["b_id"]): r["containment"]
           for r in containment_pairs_prefix(
               df, "doc_id", "text", threshold=t, shingle_n=1).collect()}

    def cont(a, b):
        sa, sb = set(a.split()), set(b.split())
        return len(sa & sb) / len(sa)

    want = {(i, j): round(cont(a, b), 4)
            for (i, a), (j, b) in permutations(enumerate(docs), 2)
            if cont(a, b) >= t}
    assert got == want
    assert (0, 1) in got and got[(0, 1)] == 1.0   # small inside large
    assert (1, 0) not in got                      # direction matters


def test_containment_prefix_property_random_corpora(spark):
    """Property: the asymmetric prefix filter is LOSSLESS — equals the
    brute-force directed-pairs truth at every threshold."""
    from itertools import permutations

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafka_flow_spark.operators.dedup import containment_pairs_prefix

    token = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"])
    doc = st.lists(token, min_size=1, max_size=12).map(" ".join)
    corpus = st.lists(doc, min_size=2, max_size=6)
    thresh = st.sampled_from([0.5, 0.8, 1.0])

    @settings(max_examples=8, deadline=None)
    @given(corpus, thresh)
    def check(docs, t):
        df = spark.createDataFrame(
            [(i, d) for i, d in enumerate(docs)], "doc_id BIGINT, text STRING"
        )
        got = {(r["a_id"], r["b_id"]): r["containment"]
               for r in containment_pairs_prefix(
                   df, "doc_id", "text", threshold=t, shingle_n=1).collect()}

        def cont(a, b):
            sa, sb = set(a.split()), set(b.split())
            return len(sa & sb) / len(sa)

        want = {(i, j): round(cont(a, b), 4)
                for (i, a), (j, b) in permutations(enumerate(docs), 2)
                if cont(a, b) >= t}
        assert got == want

    check()


def test_containment_prefix_refuses_degenerate(spark):
    import pytest

    from kafka_flow_spark.operators.dedup import containment_pairs_prefix

    df = spark.createDataFrame(
        [(i, "same tokens in every single document") for i in range(200)],
        "doc_id BIGINT, text STRING",
    )
    with pytest.raises(ValueError, match="candidate"):
        containment_pairs_prefix(df, "doc_id", "text", threshold=0.9,
                                 max_candidate_pairs=1000)


# --- minhash_lsh_pairs_incremental ------------------------------------------

def test_incremental_minhash_equals_full_minus_old(spark):
    """pairs(old ∪ new) == pairs(old) ∪ incremental(old, new) — band
    signatures are per-doc, so the incremental run loses nothing."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafka_flow_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_incremental,
    )

    token = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
    doc = st.lists(token, min_size=4, max_size=10).map(" ".join)
    corpus = st.lists(doc, min_size=4, max_size=8)

    @settings(max_examples=5, deadline=None)
    @given(corpus)
    def check(docs):
        df = spark.createDataFrame(
            [(i, d) for i, d in enumerate(docs)], "doc_id BIGINT, text STRING"
        )
        old = df.where("doc_id % 3 != 0")
        new = df.where("doc_id % 3 = 0")
        kw = dict(id_col="doc_id", text_col="text", k=16, bands=8,
                  threshold=0.4, shingle_n=1)
        full = {(r["a_id"], r["b_id"]): r["jac"]
                for r in minhash_lsh_pairs(df, **kw).collect()}
        old_only = {(r["a_id"], r["b_id"]): r["jac"]
                    for r in minhash_lsh_pairs(old, **kw).collect()}
        inc = {tuple(sorted((r["a_id"], r["b_id"]))): r["jac"]
               for r in minhash_lsh_pairs_incremental(old, new, **kw).collect()}
        assert {**old_only, **inc} == full
        # and the two halves are disjoint: inc touches new, old_only doesn't
        assert not (set(old_only) & set(inc))

    check()


def test_incremental_minhash_a_side_is_new(spark):
    from kafka_flow_spark.operators.dedup import minhash_lsh_pairs_incremental

    docs = [(0, "x y z w v"), (1, "x y z w v"), (10, "x y z w u"),
            (11, "p q r s t")]
    df = spark.createDataFrame(docs, "doc_id BIGINT, text STRING")
    old = df.where("doc_id >= 10")
    new = df.where("doc_id < 10")
    rows = minhash_lsh_pairs_incremental(
        old, new, "doc_id", "text", k=16, bands=8, threshold=0.4, shingle_n=1
    ).collect()
    got = {(r["a_id"], r["b_id"]) for r in rows}
    # a_id is always from the new batch; new-new pair ordered a < b
    assert (0, 1) in got           # new-new exact dup
    assert (0, 10) in got and (1, 10) in got   # new-vs-old near dups
    assert all(a in (0, 1) for a, _ in got)


def test_indexed_increment_roundtrip_equals_recompute(spark, tmp_path):
    """A saved LSH index queried back (minhash_lsh_pairs_indexed) yields
    EXACTLY the recompute path's pairs — the stored-index contract, plus
    re-crawl refresh (an id in both index and increment is served from the
    increment) and the params-from-index guarantee."""
    from kafka_flow_spark.operators.dedup import (
        minhash_lsh_pairs_incremental,
        minhash_lsh_pairs_indexed,
        save_minhash_index,
    )

    docs = [(0, "x y z w v"), (1, "x y z w v"), (3, "x y z w u"),
            (4, "p q r s t"), (5, "x y z w v t")]
    df = spark.createDataFrame(docs, "doc_id BIGINT, text STRING")
    old = df.where("doc_id >= 3")
    # increment includes id 3 -> re-crawl refresh: index rows for 3 must be
    # anti-joined away, exactly as the recompute path drops old id 3
    new = spark.createDataFrame(
        [(0, "x y z w v"), (1, "x y z w v"), (3, "x y z w v u")],
        "doc_id BIGINT, text STRING",
    )
    kw = dict(k=16, bands=8, threshold=0.4, shingle_n=1)
    path = str(tmp_path / "idx")
    save_minhash_index(old, "doc_id", "text", path,
                       k=16, bands=8, shingle_n=1)
    want = {(r["a_id"], r["b_id"]): r["jac"]
            for r in minhash_lsh_pairs_incremental(
                old, new, "doc_id", "text", **kw).collect()}
    got = {(r["a_id"], r["b_id"]): r["jac"]
           for r in minhash_lsh_pairs_indexed(
               new, "doc_id", "text", path, threshold=0.4).collect()}
    assert got == want and got  # identical, and non-trivially so


def test_minhash_index_append_rolls_forward(spark, tmp_path):
    """mode='append' adds an increment's rows; a later increment queried
    against the rolled-forward index sees old ∪ first-increment."""
    from kafka_flow_spark.operators.dedup import (
        minhash_lsh_pairs_incremental,
        minhash_lsh_pairs_indexed,
        save_minhash_index,
    )

    base = spark.createDataFrame(
        [(10, "x y z w v"), (11, "p q r s t")], "doc_id BIGINT, text STRING"
    )
    inc1 = spark.createDataFrame(
        [(20, "x y z w u")], "doc_id BIGINT, text STRING"
    )
    inc2 = spark.createDataFrame(
        [(30, "x y z w u v")], "doc_id BIGINT, text STRING"
    )
    path = str(tmp_path / "idx")
    kw = dict(k=16, bands=8, shingle_n=1)
    save_minhash_index(base, "doc_id", "text", path, **kw)
    save_minhash_index(inc1, "doc_id", "text", path, mode="append", **kw)
    want = {(r["a_id"], r["b_id"]): r["jac"]
            for r in minhash_lsh_pairs_incremental(
                base.union(inc1), inc2, "doc_id", "text",
                threshold=0.4, **kw).collect()}
    got = {(r["a_id"], r["b_id"]): r["jac"]
           for r in minhash_lsh_pairs_indexed(
               inc2, "doc_id", "text", path, threshold=0.4).collect()}
    assert got == want and got


def test_ensure_minhash_index_same_id_text_edit_invalidates(spark, tmp_path):
    """The corpus fingerprint hashes (id, text), so an in-place text edit
    under identical ids and count must trigger a rebuild — the r7 blind
    spot.  A byte-identical corpus must NOT rebuild (validated by mtime of
    the stored shingles)."""
    import os

    from kafka_flow_spark.operators.dedup import (
        ensure_minhash_index,
        minhash_lsh_pairs_indexed,
    )

    corpus = spark.createDataFrame(
        [(0, "x y z w v"), (1, "p q r s t")], "doc_id BIGINT, text STRING"
    )
    path = str(tmp_path / "idx")
    kw = dict(k=16, bands=8, shingle_n=1)
    ensure_minhash_index(corpus, "doc_id", "text", path, **kw)

    def _mtime():
        d = f"{path}/shingles"
        return max(os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d))

    t0 = _mtime()
    ensure_minhash_index(corpus, "doc_id", "text", path, **kw)
    assert _mtime() == t0  # unchanged corpus: validated, not rebuilt

    # same ids, same count, ONE text edited in place
    edited = spark.createDataFrame(
        [(0, "x y z w v"), (1, "a b c d e")], "doc_id BIGINT, text STRING"
    )
    ensure_minhash_index(edited, "doc_id", "text", path, **kw)
    assert _mtime() > t0  # rebuilt
    # and the rebuilt index serves the EDITED content: a probe near doc 1's
    # new text matches against it
    probe = spark.createDataFrame([(9, "a b c d e f")], "doc_id BIGINT, text STRING")
    pairs = {(r["a_id"], r["b_id"])
             for r in minhash_lsh_pairs_indexed(
                 probe, "doc_id", "text", path, threshold=0.4).collect()}
    assert (9, 1) in pairs


def test_minhash_index_append_refuses_old_fingerprint_format(spark, tmp_path):
    """Appending onto a pre-r8 index (id-only fingerprint) must refuse with
    migration guidance: xoring an (id, text) signature onto an id-only one
    would match NEITHER convention and every later ensure would silently
    full-rebuild (review r8)."""
    import pytest as _pytest

    from kafka_flow_spark.operators.dedup import save_minhash_index

    corpus = spark.createDataFrame(
        [(0, "x y z w v")], "doc_id BIGINT, text STRING"
    )
    inc = spark.createDataFrame([(1, "p q r s t")], "doc_id BIGINT, text STRING")
    path = str(tmp_path / "idx")
    kw = dict(k=16, bands=8, shingle_n=1)
    save_minhash_index(corpus, "doc_id", "text", path, **kw)
    # simulate the stored r7 format: params without sig_ver
    spark.createDataFrame(
        [(16, 8, 1, 12345, 1)],
        "k int, bands int, shingle_n int, id_sig long, n_docs long",
    ).write.mode("overwrite").parquet(f"{path}/params")
    with _pytest.raises(ValueError, match="rebuild once"):
        save_minhash_index(inc, "doc_id", "text", path, mode="append", **kw)


def test_save_minhash_index_writes_params_last(spark, tmp_path):
    """Commit-last ordering (ADVICE r7): the params fingerprint must become
    visible only after bands/ and shingles/ are fully written, so a torn
    save can never leave a matching fingerprint over missing data."""
    import os

    from kafka_flow_spark.operators.dedup import save_minhash_index

    corpus = spark.createDataFrame(
        [(0, "x y z w v"), (1, "p q r s t")], "doc_id BIGINT, text STRING"
    )
    path = str(tmp_path / "idx")
    save_minhash_index(corpus, "doc_id", "text", path, k=16, bands=8, shingle_n=1)

    def _latest(sub):
        d = f"{path}/{sub}"
        out = 0.0
        for root, _, files in os.walk(d):
            for f in files:
                out = max(out, os.path.getmtime(os.path.join(root, f)))
        return out

    t_params = _latest("params")
    assert t_params >= _latest("bands")
    assert t_params >= _latest("shingles")


# --- line_dedup ---

def _pages(spark):
    return spark.createDataFrame(
        [
            (1, "keep me\nCOOKIE BANNER\n\nunique line"),
            (2, "COOKIE BANNER\nanother doc"),
            (3, "COOKIE BANNER\nCOOKIE BANNER"),
            (4, "totally unique"),
            (5, None),
        ],
        "id long, text string",
    )


def test_line_dedup_removes_corpus_duplicates_preserving_order(spark):
    from kafka_flow_spark.operators.curation import line_dedup

    out = {
        r["id"]: r
        for r in line_dedup(_pages(spark), "id", "text", min_dup_count=3).collect()
    }
    # COOKIE BANNER appears 4x (>= 3): removed everywhere; empty line is
    # exempt (kept); doc 3 empties out but its row survives; NULL text drops.
    assert out[1]["text"] == "keep me\n\nunique line"
    assert (out[1]["n_lines"], out[1]["n_removed"]) == (4, 1)
    assert out[2]["text"] == "another doc"
    assert out[3]["text"] == "" and out[3]["n_removed"] == 2
    assert out[4]["text"] == "totally unique" and out[4]["n_removed"] == 0
    assert 5 not in out


def test_line_dedup_below_bar_lines_kept(spark):
    from kafka_flow_spark.operators.curation import line_dedup

    # multiplicity 2 < min_dup_count=3: nothing removed
    out = line_dedup(_pages(spark).filter("id IN (1, 2)"), "id", "text", 3)
    assert {r["n_removed"] for r in out.collect()} == {0}


def test_line_dedup_literal_delimiter_not_regex(spark):
    from kafka_flow_spark.operators.curation import line_dedup

    # '. ' must split ONLY on the literal dot-space (a regex would split on
    # any-char-plus-space and shred every text)
    d = spark.createDataFrame(
        [(1, "dup sent. unique one"), (2, "dup sent. other"), (3, "dup sent. x")],
        "id long, text string",
    )
    out = {
        r["id"]: r["text"]
        for r in line_dedup(d, "id", "text", 3, delimiter=". ").collect()
    }
    assert out[1] == "unique one" and out[2] == "other" and out[3] == "x"


def test_line_dedup_exemption_and_guards(spark):
    from kafka_flow_spark.operators.curation import line_dedup

    # min_line_chars=0 counts empty lines too: 3 empties cross the bar
    d = spark.createDataFrame(
        [(1, "a\n\nb"), (2, "\nc"), (3, "d\n")], "id long, text string"
    )
    out = {
        r["id"]: r
        for r in line_dedup(d, "id", "text", 3, min_line_chars=0).collect()
    }
    assert out[1]["text"] == "a\nb" and out[1]["n_removed"] == 1
    with pytest.raises(ValueError):
        line_dedup(d, "id", "text", min_dup_count=1)
    with pytest.raises(ValueError):
        line_dedup(d, "id", "text", min_line_chars=-1)


def test_vocab_coverage_ties_and_saturation(spark):
    from kafka_flow_spark.operators.profile import vocab_coverage

    d = spark.createDataFrame([("a a a b b c",), ("a d",)], "text string")
    rows = {
        r["k"]: r
        for r in vocab_coverage(d, "text", ks=(1, 2, 10)).collect()
    }
    assert (rows[1]["n_types"], rows[1]["covered_tokens"]) == (1, 4)
    # b(2) beats c(1)/d(1); ties inside (c, d) break lexicographically
    assert (rows[2]["n_types"], rows[2]["covered_tokens"]) == (2, 6)
    # k beyond vocab saturates at |vocab| and coverage 1.0
    assert (rows[10]["n_types"], rows[10]["covered_tokens"]) == (4, 8)
    assert rows[10]["coverage"] == 1.0
    with pytest.raises(ValueError):
        vocab_coverage(d, "text", ks=())
    with pytest.raises(ValueError):
        vocab_coverage(d, "text", ks=(2_000_000,))


def test_line_dedup_random_corpora_match_reference(spark):
    """Differential: the Spark operator against a transparent pure-Python
    reference on random multi-line corpora (exemption + threshold + order
    semantics all exercised by the generator's tiny line alphabet)."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafka_flow_spark.operators.curation import line_dedup

    line = st.sampled_from(["dup line", "other dup", "unique", "x", "", " "])
    doc = st.lists(line, min_size=1, max_size=6).map("\n".join)
    corpus = st.lists(doc, min_size=1, max_size=6)

    def reference(docs, min_count, min_chars):
        counts = Counter(
            ln
            for d in docs
            for ln in d.split("\n")
            if len(ln.strip(" ")) >= min_chars
        )
        dup = {ln for ln, c in counts.items() if c >= min_count}
        out = {}
        for i, d in enumerate(docs):
            lines = d.split("\n")
            kept = [ln for ln in lines if ln not in dup]
            out[i] = ("\n".join(kept), len(lines), len(lines) - len(kept))
        return out

    @settings(max_examples=8, deadline=None)
    @given(corpus, st.integers(2, 3), st.integers(0, 1))
    def check(docs, min_count, min_chars):
        df = spark.createDataFrame(
            [(i, d) for i, d in enumerate(docs)], "id long, text string"
        )
        got = {
            r["id"]: (r["text"], r["n_lines"], r["n_removed"])
            for r in line_dedup(df, "id", "text", min_count, min_chars).collect()
        }
        assert got == reference(docs, min_count, min_chars)

    check()


def test_source_overlap_matrix_hand_checked(spark):
    from kafka_flow_spark.operators.curation import source_overlap_matrix

    # unigram shingles: A={a,b,c}, B={b,c,d}, C={x}
    d = spark.createDataFrame(
        [("A", "a b c"), ("A", "b"), ("B", "b c d"), ("C", "x")],
        "source string, text string",
    )
    out = {
        (r["group_a"], r["group_b"]): (r["n_shared"], r["n_a"], r["containment"])
        for r in source_overlap_matrix(d, "source", "text", shingle_n=1).collect()
    }
    assert out[("A", "B")] == (2, 3, 2 / 3)
    assert out[("B", "A")] == (2, 3, 2 / 3)
    # C shares nothing: absent from the matrix entirely
    assert all("C" not in k for k in out)
    assert set(out) == {("A", "B"), ("B", "A")}


# --- mixture_divergence ---

def test_mixture_divergence_hand_checked(spark):
    """Identical distributions -> jsd 0; disjoint vocabularies -> jsd 1;
    a hand-worked middle case."""
    import math

    from kafka_flow_spark.operators.curation import mixture_divergence

    df = spark.createDataFrame(
        [
            ("a", "x x y"), ("a", "y"),          # a: x:2 y:2
            ("b", "x y x y"),                     # b: x:2 y:2  (= a)
            ("c", "z z w"),                       # c: disjoint from a and b
            ("d", "x x x y"),                     # d: x:3 y:1
        ],
        "src STRING, text STRING",
    )
    out = {(r["group_a"], r["group_b"]): r for r in
           mixture_divergence(df, "src", "text").collect()}
    assert out[("a", "b")]["jsd"] == 0.0
    # every unordered pair gets a row — INCLUDING fully disjoint ones, which
    # hit the jsd = 1 endpoint with shared_types 0 (r6 review fix: these are
    # the most divergent pairs the diagnostic exists to flag)
    assert len(out) == 6  # C(4,2)
    for pair in [("a", "c"), ("b", "c"), ("c", "d")]:
        assert out[pair]["jsd"] == 1.0
        assert out[pair]["shared_types"] == 0
    # hand-worked a-vs-d: p=(.5,.5), q=(.75,.25)
    px, qx = 0.5, 0.75
    py, qy = 0.5, 0.25
    want = 0.5 * (
        px * math.log2(2 * px / (px + qx)) + qx * math.log2(2 * qx / (px + qx))
        + py * math.log2(2 * py / (py + qy)) + qy * math.log2(2 * qy / (py + qy))
    )
    assert abs(out[("a", "d")]["jsd"] - round(want, 4)) <= 1e-4
    assert out[("a", "d")]["shared_types"] == 2
    assert out[("a", "d")]["n_tokens_a"] == 4 and out[("a", "d")]["n_tokens_b"] == 4


def test_mixture_divergence_symmetric_in_value(spark):
    """JSD is symmetric; the operator emits each unordered pair once with
    group_a < group_b, and swapping the group LABELS leaves jsd unchanged."""
    from kafka_flow_spark.operators.curation import mixture_divergence

    rows = [("a", "p q r p"), ("b", "q r s s s")]
    df1 = spark.createDataFrame(rows, "src STRING, text STRING")
    df2 = spark.createDataFrame(
        [("b" if g == "a" else "a", t) for g, t in rows], "src STRING, text STRING"
    )
    [r1] = mixture_divergence(df1, "src", "text").collect()
    [r2] = mixture_divergence(df2, "src", "text").collect()
    assert r1["jsd"] == r2["jsd"]
    assert (r1["group_a"], r1["group_b"]) == (r2["group_a"], r2["group_b"]) == ("a", "b")


# --- n-gram novelty -----------------------------------------------------------


def test_novelty_complements_contamination(spark):
    """For every doc: n_novel + n_shared_with_ref == n_grams (novelty is the
    exact inverse of the contamination count on the same gram sets)."""
    from pyspark.sql import functions as F

    from kafka_flow_spark.operators.curation import ngram_contamination, ngram_novelty
    from kafka_flow_spark.operators.sampling import hash_sample
    from kafka_flow_spark.tables import load
    from tests.conftest import SF_SMALL

    docs = load(spark, SF_SMALL, "documents").withColumn(
        "_key", F.col("doc_id").cast("string")
    )
    ref = hash_sample(docs, "_key", 0.05)
    corpus = docs.join(ref.select("doc_id"), "doc_id", "left_anti")
    nov = ngram_novelty(corpus, ref, "doc_id", "text", n=8)
    con = ngram_contamination(corpus, ref, "doc_id", "text", n=8)
    j = nov.join(con, "doc_id")
    bad = j.where(F.col("n_novel") + F.col("n_shared") != F.col("n_grams"))
    assert bad.count() == 0


def test_novelty_verbatim_copy_is_zero(spark):
    from kafka_flow_spark.operators.curation import ngram_novelty

    ref = spark.createDataFrame(
        [(100, "a b c d e f g h i j k l")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j k l"),        # verbatim -> novelty 0
            (2, "z y x w v u t s r q p o"),        # disjoint -> novelty 1e6
            (3, "too short"),                      # < 8 tokens -> 0 grams, NULL
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty_ppm"])
        for r in ngram_novelty(corpus, ref, "doc_id", "text", n=8).collect()
    }
    assert got[1] == (5, 0, 0)
    assert got[2] == (5, 5, 1_000_000)
    assert got[3] == (0, 0, None)


# --- token-budget mixing --------------------------------------------------------


def test_token_budget_mix_expected_tokens_near_budget(spark):
    """Over many salts... budgets are content-addressed (no salt param), so
    instead check the ANALYTIC property: kept-token mass is within a
    plausible band of the budget for over-budget groups, and under-budget
    groups keep everything."""
    from pyspark.sql import functions as F

    from kafka_flow_spark.operators.curation import token_budget_mix
    from kafka_flow_spark.tables import load
    from tests.conftest import SF_SMALL

    docs = load(spark, SF_SMALL, "documents").withColumn(
        "_key", F.col("doc_id").cast("string")
    )
    budgets = {f"src{i}": 400 for i in range(20)}
    budgets["src0"] = 10**9  # under budget -> keep all
    out = token_budget_mix(docs, "source", "_key", "text", budgets)
    kept = {
        r["source"]: r["k"]
        for r in out.groupBy("source").agg(F.sum("n_tokens").alias("k")).collect()
    }
    full = {
        r["source"]: r["t"]
        for r in docs.groupBy("source")
        .agg(F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("t"))
        .collect()
    }
    assert kept["src0"] == full["src0"]
    # over-budget groups: kept mass positive and below the full mass
    over = [s for s in kept if s != "src0"]
    assert over and all(0 < kept[s] < full[s] for s in over)


def test_token_budget_mix_unlisted_groups_dropped(spark):
    from kafka_flow_spark.operators.curation import token_budget_mix

    df = spark.createDataFrame(
        [("1", "a", "x y z"), ("2", "b", "p q")], ["id", "g", "text"]
    )
    out = token_budget_mix(df, "g", "id", "text", {"a": 100})
    assert {r["g"] for r in out.collect()} == {"a"}


# --- boilerplate_by_source ---


def _bps(spark, rows, **kw):
    from kafka_flow_spark.operators.curation import boilerplate_by_source

    df = spark.createDataFrame(rows, "id BIGINT, src STRING, text STRING")
    out = boilerplate_by_source(df, "id", "src", "text", **kw)
    return {r["id"]: (r["text"], r["n_lines"], r["n_removed"]) for r in out.collect()}


def test_bps_removes_only_within_the_source(spark):
    # 'banner' is in 2/2 docs of src a (>=30%, >=2 docs) but only 1/2 of b.
    rows = [
        (1, "a", "banner\nalpha"),
        (2, "a", "banner\nbeta"),
        (3, "b", "banner\ngamma"),
        (4, "b", "delta"),
    ]
    got = _bps(spark, rows, min_frac_pct=30, min_doc_count=2)
    assert got[1] == ("alpha", 2, 1)
    assert got[2] == ("beta", 2, 1)
    assert got[3] == ("banner\ngamma", 2, 0)  # same line SURVIVES in src b
    assert got[4] == ("delta", 1, 0)


def test_bps_min_doc_count_saves_single_doc_sources(spark):
    # 1/1 docs = 100% of the source, but the >=2-doc floor keeps the page.
    got = _bps(spark, [(1, "solo", "only\nline")], min_frac_pct=30)
    assert got[1] == ("only\nline", 2, 0)


def test_bps_fraction_bar_is_exact_integers(spark):
    # 3 docs in the source; a line in 1 of 3 = 33.33% -> passes pct=33
    # (1*100 >= 33*3 is 100 >= 99) but fails pct=34 (100 < 102).
    rows = [
        (1, "a", "shared"),
        (2, "a", "x2"),
        (3, "a", "x3"),
    ]
    loose = _bps(spark, rows, min_frac_pct=33, min_doc_count=1)
    tight = _bps(spark, rows, min_frac_pct=34, min_doc_count=1)
    assert loose[1] == ("", 1, 1)
    assert tight[1] == ("shared", 1, 0)


def test_bps_repeats_inside_one_page_count_once(spark):
    # 'dup' twice in doc 1 only: 1 distinct doc of 2 = 50% but
    # min_doc_count=2 refuses; with the floor at 1 BOTH copies go.
    rows = [(1, "a", "dup\ndup\nx"), (2, "a", "y")]
    kept = _bps(spark, rows, min_frac_pct=30, min_doc_count=2)
    assert kept[1] == ("dup\ndup\nx", 3, 0)
    # with the floor at 1, BOTH dup copies go (as does singleton x — every
    # 1-of-2-docs line crosses the 50% >= 30% bar).
    gone = _bps(spark, rows, min_frac_pct=30, min_doc_count=1)
    assert gone[1] == ("", 3, 3)


def test_bps_empty_lines_exempt(spark):
    rows = [(1, "a", "p\n\nq"), (2, "a", "r\n\ns")]
    got = _bps(spark, rows, min_frac_pct=30, min_doc_count=2)
    # the blank line is in 2/2 docs but exempt (min_line_chars=1)
    assert got[1] == ("p\n\nq", 3, 0)


def test_bps_validates_args(spark):
    import pytest as _pytest

    from kafka_flow_spark.operators.curation import boilerplate_by_source

    df = spark.createDataFrame([(1, "a", "x")], "id BIGINT, src STRING, text STRING")
    with _pytest.raises(ValueError, match="min_frac_pct"):
        boilerplate_by_source(df, "id", "src", "text", min_frac_pct=0)
    with _pytest.raises(ValueError, match="min_doc_count"):
        boilerplate_by_source(df, "id", "src", "text", min_doc_count=0)


# --- temporal_split_embargo / temporal_leakage_report ---


def test_temporal_split_boundaries_and_embargo(spark):
    from kafka_flow_spark.operators.curation import temporal_split_embargo

    rows = [
        (1, "2024-01-14 23:59:59"),  # train (strictly before train_end)
        (2, "2024-01-15 00:00:00"),  # embargo (at train_end)
        (3, "2024-01-17 23:59:59"),  # embargo
        (4, "2024-01-18 00:00:00"),  # test (at test_start, inclusive)
    ]
    df = spark.createDataFrame(rows, "id BIGINT, t STRING").select(
        "id", F.col("t").cast("timestamp").alias("t")
    )
    got = {
        r["id"]: r["split"]
        for r in temporal_split_embargo(
            df, "t", "2024-01-15 00:00:00", "2024-01-18 00:00:00"
        ).collect()
    }
    assert got == {1: "train", 2: "embargo", 3: "embargo", 4: "test"}


def test_temporal_split_no_embargo_when_equal_and_validates(spark):
    import pytest as _pytest

    from kafka_flow_spark.operators.curation import temporal_split_embargo

    df = spark.createDataFrame(
        [(1, "2024-01-15 00:00:00")], "id BIGINT, t STRING"
    ).select("id", F.col("t").cast("timestamp").alias("t"))
    got = temporal_split_embargo(
        df, "t", "2024-01-15 00:00:00", "2024-01-15 00:00:00"
    ).collect()[0]
    assert got["split"] == "test"  # plain cut: nothing can be 'embargo'
    with _pytest.raises(ValueError, match="train_end"):
        temporal_split_embargo(df, "t", "2024-02-01", "2024-01-01")


def test_temporal_split_validates_at_timestamp_semantics(spark):
    """Review r10: the bound order used to be checked by Python STRING
    comparison while the row predicates compare casted timestamps — mixed
    literal formats ('2024-1-5' > '2024-01-15' lexicographically, yet
    Jan 5 < Jan 15 as timestamps) falsely rejected a valid split, and the
    inverse shape defined an inverted embargo that validation waved
    through.  Both directions pinned, plus the uncastable-bound refusal
    (pre-fix an uncastable bound silently sent every row to 'embargo')."""
    import pytest as _pytest

    from kafka_flow_spark.operators.curation import temporal_split_embargo

    df = spark.createDataFrame(
        [(1, "2024-01-10 00:00:00")], "id BIGINT, t STRING"
    ).select("id", F.col("t").cast("timestamp").alias("t"))
    # valid at timestamp semantics, inverted lexicographically: must pass
    got = temporal_split_embargo(df, "t", "2024-1-5", "2024-01-15").collect()[0]
    assert got["split"] == "embargo"
    # inverted at timestamp semantics, ordered lexicographically: must refuse
    with _pytest.raises(ValueError, match="timestamp semantics"):
        temporal_split_embargo(df, "t", "2024-01-15", "2024-1-5")
    with _pytest.raises(ValueError, match="cast to timestamp"):
        temporal_split_embargo(df, "t", "not-a-time", "2024-01-15")


def test_temporal_leakage_report_hand_checked(spark):
    from kafka_flow_spark.operators.curation import temporal_leakage_report

    rows = [
        ("u1", "2024-01-10 00:00:00"),  # u1 train
        ("u1", "2024-01-20 00:00:00"),  # u1 test  -> u1 in BOTH
        ("u2", "2024-01-11 00:00:00"),  # u2 train only
        ("u3", "2024-01-21 00:00:00"),  # u3 test only
        ("u3", "2024-01-16 00:00:00"),  # u3 embargo row (not 'both')
    ]
    df = spark.createDataFrame(rows, "u STRING, t STRING").select(
        "u", F.col("t").cast("timestamp").alias("t")
    )
    r = temporal_leakage_report(
        df, "t", "u", "2024-01-15 00:00:00", "2024-01-18 00:00:00"
    ).collect()[0]
    assert (r["n_train"], r["n_embargo"], r["n_test"]) == (2, 1, 2)
    assert (r["entities_train"], r["entities_test"], r["entities_both"]) == (2, 2, 1)


# --- packing_report ---


def test_packing_report_hand_checked(spark):
    from kafka_flow_spark.operators.curation import packing_report

    # one shard, budget 10: docs of 4, 8, 5, 0, 12 tokens at cumulative
    # offsets 0, 4, 12%10=2... build the packed relation directly
    packed = spark.createDataFrame(
        [
            (1, 0, 0, 0, 4),    # [0,4)   in pack 0 — no split
            (2, 0, 0, 4, 8),    # [4,12)  crosses 1 boundary
            (3, 0, 1, 2, 5),    # [12,17) in pack 1 — no split
            (4, 0, 1, 7, 0),    # empty doc: no crossing
            (5, 0, 1, 7, 12),   # [17,29) crosses packs 1→2 (offset7+12-1=18 div 10 = 1)
        ],
        "id BIGINT, shard INT, pack_id BIGINT, pack_offset BIGINT, n_tokens INT",
    )
    r = packing_report(packed, budget=10).collect()[0]
    assert (r["n_docs"], r["n_tokens"]) == (5, 29)
    assert r["n_packs"] == 3 and r["tail_waste_tokens"] == 1
    assert r["n_docs_split"] == 2          # docs 2 and 5
    assert r["n_boundary_crossings"] == 2  # one each
    assert r["split_rate_e6"] == 2 * 10**6 // 5
    assert r["waste_rate_e6"] == 1 * 10**6 // 30


def test_packing_report_validates_budget(spark):
    import pytest as _pytest

    from kafka_flow_spark.operators.curation import packing_report

    df = spark.createDataFrame(
        [(1, 0, 0, 0, 1)],
        "id BIGINT, shard INT, pack_id BIGINT, pack_offset BIGINT, n_tokens INT",
    )
    with _pytest.raises(ValueError, match="budget"):
        packing_report(df, budget=0)
