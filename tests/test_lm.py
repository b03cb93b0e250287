"""bigram_lm_scores (operators/lm.py) — KenLM-style perplexity filter."""

from __future__ import annotations

import math
from collections import Counter

import pyspark.sql.functions as F

from kafka_flow_spark.operators.lm import bigram_lm_scores, bigram_lm_scores_interp
from kafka_flow_spark.tables import load
from tests.conftest import SF_SMALL


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING, grp STRING")


def test_reference_like_text_scores_higher(spark):
    ref = "the cat sat on the mat and the dog sat on the rug"
    rows = [(i, ref, "ref") for i in range(5)] + [
        (100, "the cat sat on the mat", "raw"),  # verbatim reference phrase
        (101, "zq xv qqj kpl zzt wvx", "raw"),  # gibberish, all-unseen
    ]
    out = {
        r["doc_id"]: r
        for r in bigram_lm_scores(
            _mk(spark, rows), "doc_id", "text", F.col("grp") == "ref"
        ).collect()
    }
    assert set(out) == {100, 101}
    assert out[100]["avg_logprob_scaled"] > out[101]["avg_logprob_scaled"]
    # scores are negative log-probs (p < 1 always under add-one smoothing)
    assert out[100]["logprob_scaled"] < 0 and out[101]["logprob_scaled"] < 0


def test_short_docs_absent_and_null_ref_counts_as_raw(spark):
    rows = [
        (1, "a b a b a c", "ref"),
        (2, "single", "raw"),  # 1 token -> no bigram evidence -> absent
        (3, "", "raw"),  # empty -> absent
        (4, "a b c", None),  # NULL predicate -> raw (scored)
    ]
    out = bigram_lm_scores(
        _mk(spark, rows), "doc_id", "text", F.col("grp") == "ref"
    ).collect()
    assert sorted(r["doc_id"] for r in out) == [4]


def test_min_count_prunes_model_bigrams(spark):
    # 'a b' appears twice in ref, 'b c' once; min_count=2 drops 'b c' from
    # the model, so a raw doc of 'b c' must score as unseen (lower than one
    # scoring the retained 'a b')
    rows = [
        (1, "a b a b c", "ref"),
        (10, "a b", "raw"),
        (11, "b c", "raw"),
    ]
    df = _mk(spark, rows)
    pruned = {
        r["doc_id"]: r["avg_logprob_scaled"]
        for r in bigram_lm_scores(
            df, "doc_id", "text", F.col("grp") == "ref", min_count=2
        ).collect()
    }
    unpruned = {
        r["doc_id"]: r["avg_logprob_scaled"]
        for r in bigram_lm_scores(
            df, "doc_id", "text", F.col("grp") == "ref"
        ).collect()
    }
    assert pruned[10] > pruned[11]
    # pruning can only lower a doc's score (a dropped bigram scores unseen)
    assert pruned[11] <= unpruned[11]
    assert pruned[10] == unpruned[10]


def test_interp_strictly_improves_ref_vs_gibberish_separation(spark):
    """The r7-brief differential: on the ref-vs-gibberish fixture the
    interpolated model's score margin between the reference-like doc and the
    gibberish doc must STRICTLY exceed the add-one model's — the reason to
    ship the upgrade at all."""
    from kafka_flow_spark.operators.lm import bigram_lm_scores_interp

    ref = "the cat sat on the mat and the dog sat on the rug"
    rows = [(i, ref, "ref") for i in range(5)] + [
        (100, "the cat sat on the mat", "raw"),
        (101, "zq xv qqj kpl zzt wvx", "raw"),
    ]
    df = _mk(spark, rows)

    def margin(fn, **kw):
        out = {
            r["doc_id"]: r["avg_logprob_scaled"]
            for r in fn(df, "doc_id", "text", F.col("grp") == "ref", **kw).collect()
        }
        assert out[100] > out[101]  # both models must rank correctly
        return out[100] - out[101]

    assert margin(bigram_lm_scores_interp) > margin(bigram_lm_scores)


def test_interp_matches_python_mirror(spark):
    """Exact python mirror of the interpolated arithmetic (same integer
    num/den polynomials, one double division, micro-nat rounding) — pins
    tokenization, all four count relations, both branches of the backoff,
    and the rounding contract."""
    rows = [
        (1, "a b a b c d", "ref"),
        (2, "b c a a b", "ref"),
        (10, "a b c", "raw"),    # seen bigrams
        (11, "a q", "raw"),      # seen w1, unseen w2
        (12, "q z a", "raw"),    # unseen w1 branch (and unseen w2)
        (13, "c d b c", "raw"),  # mix
    ]
    ln_, ld_ = 7, 10
    out = {
        r["doc_id"]: r
        for r in bigram_lm_scores_interp(
            _mk(spark, rows), "doc_id", "text", F.col("grp") == "ref",
            lam_num=ln_, lam_den=ld_,
        ).collect()
    }
    ref_toks = [t.split() for _, t, g in rows if g == "ref"]
    c12: Counter = Counter()
    c2: Counter = Counter()
    for tk in ref_toks:
        c2.update(tk)
        for a, b in zip(tk, tk[1:]):
            c12[(a, b)] += 1
    c1: Counter = Counter()
    for (a, _), c in c12.items():
        c1[a] += c
    V, N = len(c2), sum(c2.values())
    for doc_id, text, grp in rows:
        if grp != "raw":
            continue
        tk = text.split()
        terms = []
        for a, b in zip(tk, tk[1:]):
            if c1[a] > 0:
                num = ln_ * c12[(a, b)] * (N + V) + (ld_ - ln_) * (c2[b] + 1) * c1[a]
                den = ld_ * c1[a] * (N + V)
            else:
                num, den = c2[b] + 1, N + V
            # same rounding idiom as the add-one mirror: exact .5 ties in
            # the 1e6-scaled double do not occur on this fixture
            terms.append(int(round(math.log(num / den) * 1e6)))
        total, n = sum(terms), len(terms)
        q, rem = divmod(total, n)
        trunc = q + (1 if q < 0 and rem else 0)  # toward-zero division
        assert out[doc_id]["n_bigrams"] == n
        assert out[doc_id]["logprob_scaled"] == total
        assert out[doc_id]["avg_logprob_scaled"] == trunc


def test_perplexity_buckets_are_balanced_terciles(spark):
    from kafka_flow_spark.operators.lm import perplexity_buckets

    rows = [(i, "en" if i % 2 else "de", -i * 1000) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, lang STRING, s BIGINT")
    out = perplexity_buckets(df, "lang", "s", "doc_id").collect()
    per = {}
    for r in out:
        per.setdefault((r["lang"], r["bucket"]), []).append(r["s"])
    # 10 docs per lang -> ntile(3) gives 4/3/3 (earlier tiles take remainder)
    for lang in ("en", "de"):
        assert len(per[(lang, "head")]) == 4
        assert len(per[(lang, "middle")]) == 3
        assert len(per[(lang, "tail")]) == 3
        # head holds the HIGHEST scores (desc order)
        assert min(per[(lang, "head")]) > max(per[(lang, "middle")])
        assert min(per[(lang, "middle")]) > max(per[(lang, "tail")])


def test_lm_scores_match_python_mirror_on_real_corpus(spark):
    """Exact python mirror (Counter + math.log, same add-one arithmetic) on
    the sf0.001 documents table — pins the whole chain: tokenization, c12 /
    c1 / V, unseen fallbacks, micro-nat rounding, integer division."""
    docs = load(spark, SF_SMALL, "documents")
    rows = docs.select("doc_id", "text", "source").collect()

    def toks(t):
        return t.strip().lower().split() if t and t.strip() else []

    c12: Counter = Counter()
    vocab = set()
    for r in rows:
        if r["source"] != "src0":
            continue
        tk = toks(r["text"])
        vocab.update(tk)
        for a, b in zip(tk, tk[1:]):
            c12[(a, b)] += 1
    c1: Counter = Counter()
    for (a, _), c in c12.items():
        c1[a] += c
    V = len(vocab)
    expected = {}
    for r in rows:
        if r["source"] == "src0":
            continue
        tk = toks(r["text"])
        if len(tk) < 2:
            continue
        total = n = 0
        for a, b in zip(tk, tk[1:]):
            p = (c12[(a, b)] + 1) / (c1[a] + V)
            total += int(round(math.log(p) * 1e6))
            n += 1
        q, rem = divmod(total, n)
        trunc = q + (1 if q < 0 and rem else 0)  # toward-zero division
        expected[r["doc_id"]] = (n, total, trunc)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["logprob_scaled"], r["avg_logprob_scaled"])
        for r in bigram_lm_scores(
            docs, "doc_id", "text", F.col("source") == "src0"
        ).collect()
    }
    assert got == expected


def test_trigram_interp_matches_python_mirror(spark):
    """Exact mirror of the trigram interpolation's three backoff branches:
    seen context (full ladder), unseen context/seen w2 (renormalized bi+uni),
    unseen w2 (pure unigram)."""
    from kafka_flow_spark.operators.lm import trigram_lm_scores_interp

    rows = [
        (1, "a b c a b c d", "ref"),
        (2, "b c a a b e", "ref"),
        (10, "a b c", "raw"),        # seen trigram
        (11, "a b q", "raw"),        # seen context, unseen w3
        (12, "q z a b", "raw"),      # unseen context branches + seen one
        (13, "q q q", "raw"),        # everything unseen
    ]
    l3, l2, l1 = 5, 3, 2
    out = {
        r["doc_id"]: r
        for r in trigram_lm_scores_interp(
            _mk(spark, rows), "doc_id", "text", F.col("grp") == "ref",
            l3=l3, l2=l2, l1=l1,
        ).collect()
    }
    ref_toks = [t.split() for _, t, g in rows if g == "ref"]
    c123: Counter = Counter()
    c23: Counter = Counter()
    c3: Counter = Counter()
    for tk in ref_toks:
        c3.update(tk)
        for a, b in zip(tk, tk[1:]):
            c23[(a, b)] += 1
        for a, b, c in zip(tk, tk[1:], tk[2:]):
            c123[(a, b, c)] += 1
    c12: Counter = Counter()
    for (a, b, _), n in c123.items():
        c12[(a, b)] += n
    c2: Counter = Counter()
    for (b, _), n in c23.items():
        c2[b] += n
    V, N = len(c3), sum(c3.values())
    NV = N + V
    for doc_id, text, grp in rows:
        if grp != "raw":
            continue
        tk = text.split()
        if len(tk) < 3:
            assert doc_id not in out
            continue
        terms = []
        for a, b, c in zip(tk, tk[1:], tk[2:]):
            if c12[(a, b)] > 0 and c2[b] > 0:
                num = (l3 * c123[(a, b, c)] * c2[b] * NV
                       + l2 * c23[(b, c)] * c12[(a, b)] * NV
                       + l1 * (c3[c] + 1) * c12[(a, b)] * c2[b])
                den = (l3 + l2 + l1) * c12[(a, b)] * c2[b] * NV
            elif c2[b] > 0:
                num = l2 * c23[(b, c)] * NV + l1 * (c3[c] + 1) * c2[b]
                den = (l2 + l1) * c2[b] * NV
            else:
                num, den = c3[c] + 1, NV
            terms.append(int(round(math.log(num / den) * 1e6)))
        total, n = sum(terms), len(terms)
        q, rem = divmod(total, n)
        trunc = q + (1 if q < 0 and rem else 0)
        assert out[doc_id]["n_trigrams"] == n
        assert out[doc_id]["logprob_scaled"] == total
        assert out[doc_id]["avg_logprob_scaled"] == trunc


def test_trigram_conditional_sums_to_one_per_branch():
    """Mass preservation of every backoff branch, checked symbolically on a
    tiny closed vocabulary (pure python — the algebra the operator encodes)."""
    l3, l2, l1 = 5, 3, 2
    vocab = ["a", "b", "c"]
    c123 = {("a", "b", "a"): 2, ("a", "b", "b"): 1}
    c12 = {("a", "b"): 3}
    c23 = {("b", "a"): 2, ("b", "b"): 2, ("c", "a"): 1}
    c2 = {"b": 4, "c": 1}
    c3 = {"a": 3, "b": 3, "c": 1}
    N = sum(c3.values()); V = len(vocab); NV = N + V

    def p(w1, w2, w3):
        if c12.get((w1, w2), 0) > 0 and c2.get(w2, 0) > 0:
            return (l3 * c123.get((w1, w2, w3), 0) / c12[(w1, w2)]
                    + l2 * c23.get((w2, w3), 0) / c2[w2]
                    + l1 * (c3.get(w3, 0) + 1) / NV) / (l3 + l2 + l1)
        if c2.get(w2, 0) > 0:
            return (l2 * c23.get((w2, w3), 0) / c2[w2]
                    + l1 * (c3.get(w3, 0) + 1) / NV) / (l2 + l1)
        return (c3.get(w3, 0) + 1) / NV

    # the vocab is CLOSED (every token of the model appears in it, so
    # Σ_vocab (c3+1) == N+V): each branch's conditional must sum to exactly
    # 1 over it — seen context (full ladder), unseen context (renormalized
    # bi+uni), unseen w2 (pure unigram)
    for ctx in [("a", "b"), ("x", "b"), ("x", "y")]:
        s = sum(p(ctx[0], ctx[1], w) for w in vocab)
        assert abs(s - 1.0) < 1e-12, ctx


def test_trigram_interp_beats_bigram_interp_on_trigram_fixture(spark):
    """On a reference with strong trigram structure, the trigram model's
    ref-vs-gibberish margin must be at least the bigram-interp's — longer
    context can only sharpen this fixture."""
    from kafka_flow_spark.operators.lm import trigram_lm_scores_interp

    ref = "the cat sat on the mat and the dog sat on the rug " * 3
    rows = [(i, ref, "ref") for i in range(3)] + [
        (100, "the cat sat on the mat", "raw"),
        (101, "zq xv qqj kpl zzt wvx", "raw"),
    ]
    df = _mk(spark, rows)

    def margin(fn, **kw):
        out = {
            r["doc_id"]: r["avg_logprob_scaled"]
            for r in fn(df, "doc_id", "text", F.col("grp") == "ref", **kw).collect()
        }
        assert out[100] > out[101]
        return out[100] - out[101]

    assert margin(trigram_lm_scores_interp) >= margin(bigram_lm_scores_interp)


def test_trigram_weights_guard(spark):
    import pytest as _pytest

    from kafka_flow_spark.operators.lm import trigram_lm_scores_interp

    df = _mk(spark, [(1, "a b c", "ref")])
    with _pytest.raises(ValueError, match="weights"):
        trigram_lm_scores_interp(df, "doc_id", "text", F.col("grp") == "ref", l3=0)


def test_flat_broadcast_plan_equals_big_model_fallback(spark):
    """The size-gated flat plan (broadcast models, per-occurrence scoring,
    one exchange) must produce BIT-identical output to the big-model
    fallback (distinct-gram collapse + shuffled joins) — forced via
    model_broadcast_rows=0 — for all three scorers on the real corpus."""
    from kafka_flow_spark.cache import release_all
    from kafka_flow_spark.operators.lm import trigram_lm_scores_interp

    docs = load(spark, SF_SMALL, "documents")
    ref = F.col("source") == "src0"
    for fn in (bigram_lm_scores, bigram_lm_scores_interp, trigram_lm_scores_interp):
        flat = sorted(tuple(r) for r in fn(docs, "doc_id", "text", ref).collect())
        release_all()
        fallback = sorted(
            tuple(r)
            for r in fn(
                docs, "doc_id", "text", ref, model_broadcast_rows=0
            ).collect()
        )
        release_all()
        assert flat == fallback, fn.__name__
