"""Quality-gate, PII-redaction, and int8-quantization operator semantics.

The oracle-parity suite proves engine agreement on the fixture corpus; these
tests pin the *semantics* on crafted rows the fixtures don't contain (real
emails/phones/IPs, rule-boundary documents, negative/zero vectors).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_flow_spark.operators.quality import (
    pii_redact,
    quality_flags,
    top_word_stats,
)
from kafka_flow_spark.operators.similarity import quantize_int8


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_quality_flags_basic_pass(spark):
    text = "the quick brown fox jumps over a lazy dog near the old mill today"
    [r] = quality_flags(_docs(spark, [(1, text)]), "doc_id", "text").collect()
    assert r.n_words == 14
    assert r.n_stopwords >= 2
    assert r.dup_2gram_frac == 0.0
    assert r.symbol_frac == 0.0
    assert r.keep is True


def test_quality_flags_too_short_and_empty(spark):
    out = {
        r.doc_id: r
        for r in quality_flags(
            _docs(spark, [(1, "the cat sat"), (2, "   ")]), "doc_id", "text"
        ).collect()
    }
    assert out[1].keep is False  # < min_words
    assert out[2].n_words == 0 and out[2].mean_word_len == 0.0
    assert out[2].keep is False


def test_quality_flags_repetition_fails(spark):
    # "ab ab ab..." — every bigram identical → dup fraction → 1 - 1/(n-1)
    text = " ".join(["ab"] * 20)
    [r] = quality_flags(_docs(spark, [(1, text)]), "doc_id", "text").collect()
    assert r.dup_2gram_frac == pytest.approx(1 - 1 / 19)
    assert r.keep is False  # > max_dup_2gram_frac (0.9)


def test_quality_flags_custom_rules(spark):
    text = "one two three four five"
    [r] = quality_flags(
        _docs(spark, [(1, text)]), "doc_id", "text", rules={"min_words": 3, "min_stopwords": 0}
    ).collect()
    assert r.keep is True


def test_top_word_stats_tiebreak_and_frac(spark):
    # 'b' and 'a' both appear twice → tie breaks to lexicographically smaller
    [r] = top_word_stats(_docs(spark, [(1, "b a b a c")]), "doc_id", "text").collect()
    assert r.top_word == "a" and r.top_count == 2
    assert r.top_word_frac == pytest.approx(2 / 5)
    # empty doc → absent from output
    assert top_word_stats(_docs(spark, [(1, "  ")]), "doc_id", "text").count() == 0


def test_pii_redact_all_kinds(spark):
    text = "mail bob.smith+x@example.org or call 555-123-4567; host 10.0.0.1 ok"
    [r] = pii_redact(_docs(spark, [(1, text)]), "doc_id", "text").collect()
    assert (r.n_email, r.n_phone, r.n_ipv4) == (1, 1, 1)
    assert r.redacted == "mail [EMAIL] or call [PHONE]; host [IP] ok"


def test_pii_redact_counts_on_original_text(spark):
    # An email whose domain looks like an IP must not ALSO count as an IP hit
    # after redaction reshapes the string; counts are independent per pattern.
    text = "x@1.2.3.4x and 1.2.3.4"
    [r] = pii_redact(_docs(spark, [(1, text)]), "doc_id", "text").collect()
    assert r.n_email == 0  # TLD must be alphabetic
    assert r.n_ipv4 == 1
    assert "[IP]" in r.redacted


def test_pii_redact_clean_text_unchanged(spark):
    [r] = pii_redact(_docs(spark, [(1, "nothing here")]), "doc_id", "text").collect()
    assert (r.n_email, r.n_phone, r.n_ipv4) == (0, 0, 0)
    assert r.redacted == "nothing here"


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_quantize_int8_codes_and_scale(spark):
    [r] = quantize_int8(_vecs(spark, [(1, [1.0, -2.0, 0.5])]), "vec_id", "embedding").collect()
    assert r.scale == pytest.approx(2.0 / 127.0)
    assert r.codes == [64, -127, 32]  # round(v / scale)
    assert max(abs(c) for c in r.codes) <= 127


def test_quantize_int8_zero_vector(spark):
    [r] = quantize_int8(_vecs(spark, [(1, [0.0, 0.0])]), "vec_id", "embedding").collect()
    assert r.scale == 0.0 and r.codes == [0, 0]


def test_quantize_int8_reconstruction_error_bounded(spark):
    import random

    rng = random.Random(7)
    vec = [rng.uniform(-1, 1) for _ in range(64)]
    [r] = quantize_int8(_vecs(spark, [(1, vec)]), "vec_id", "embedding").collect()
    # dequantized error ≤ scale/2 per component (round-to-nearest guarantee)
    for orig, code in zip(vec, r.codes):
        assert abs(orig - code * r.scale) <= r.scale / 2 + 1e-9


def test_unigram_doc_scores_hand_checked(spark):
    from kafka_flow_spark.operators.quality import unigram_doc_scores

    # corpus: 4 tokens total -> p(a)=2/4, p(b)=1/4, p(c)=1/4
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "c"), (3, "  ")], "doc_id int, text string"
    )
    res = {r.doc_id: r for r in unigram_doc_scores(df, "doc_id", "text").collect()}
    assert set(res) == {1, 2}  # blank doc absent
    # doc 1: mean(p) = (0.5 + 0.5 + 0.25)/3 in nano-units
    assert res[1].n_tokens == 3
    assert abs(res[1].mean_p_nano - (500e6 + 500e6 + 250e6) / 3) < 1.0
    # doc 2: single rare token
    assert res[2].n_tokens == 1
    assert abs(res[2].mean_p_nano - 250e6) < 1.0
    # corpus-typical doc outranks the rare-token doc
    assert res[1].mean_p_nano > res[2].mean_p_nano


def test_unigram_scores_case_normalized(spark):
    from kafka_flow_spark.operators.quality import unigram_doc_scores

    df = spark.createDataFrame([(1, "Word word"), (2, "WORD")], "doc_id int, text string")
    res = {r.doc_id: r for r in unigram_doc_scores(df, "doc_id", "text").collect()}
    # all three tokens are the same term after normalization: p = 1.0
    assert abs(res[1].mean_p_nano - 1e9) < 1.0
    assert abs(res[2].mean_p_nano - 1e9) < 1.0


def test_length_histogram_buckets(spark):
    from kafka_flow_spark.operators.quality import length_histogram

    rows = [
        (1, "en", "w " * 5),     # 5 tokens  -> bucket 0 [0,16)
        (2, "en", "w " * 20),    # 20 tokens -> bucket 1 [16,32)
        (3, "en", "w " * 300),   # 300 tokens -> bucket 15 (open-ended)
        (4, "fr", ""),           # 0 tokens  -> bucket 0
    ]
    df = spark.createDataFrame(rows, "doc_id int, lang string, text string")
    res = {(r.lang, r.bucket): r for r in length_histogram(df, "lang", "text").collect()}
    assert res[("en", 0)].n_docs == 1 and res[("en", 0)].lo == 0 and res[("en", 0)].hi == 16
    assert res[("en", 1)].n_docs == 1 and res[("en", 1)].lo == 16
    assert res[("en", 15)].n_docs == 1 and res[("en", 15)].hi is None
    assert res[("fr", 0)].n_docs == 1


def test_length_histogram_rejects_bad_params(spark):
    import pytest as _pytest

    from kafka_flow_spark.operators.quality import length_histogram

    df = spark.createDataFrame([(1, "en", "x")], "doc_id int, lang string, text string")
    with _pytest.raises(ValueError):
        length_histogram(df, "lang", "text", bucket_width=0)
    with _pytest.raises(ValueError):
        length_histogram(df, "lang", "text", n_buckets=1)


def test_profile_columns_exact(spark):
    from kafka_flow_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(1, "a", 10), (2, None, 9), (3, "a", None), (4, "b", 200)],
        "id long, s string, v long",
    )
    prof = {r.column: r for r in profile_columns(df).collect()}
    assert prof["id"].n_rows == 4 and prof["id"].n_nonnull == 4
    assert prof["s"].n_nonnull == 3 and prof["s"].n_distinct == 2
    assert prof["v"].n_nonnull == 3
    # min/max are computed on the NATIVE type (numeric, not lexicographic):
    assert prof["v"].min_value == "9" and prof["v"].max_value == "200"
    assert prof["s"].min_value == "a" and prof["s"].max_value == "b"


def test_profile_scan_prunes_to_one_column(spark):
    from kafka_flow_spark.operators.profile import profile_columns
    from kafka_flow_spark.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    plan = (
        profile_columns(docs, ["lang"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ReadSchema: struct<lang:string>" in plan  # text column never read


def test_profile_empty_cols_raises(spark):
    import pytest as _pytest

    from kafka_flow_spark.operators.profile import profile_columns

    df = spark.createDataFrame([(1,)], "id long")
    with _pytest.raises(ValueError):
        profile_columns(df, [])


# --- bigram_doc_scores ------------------------------------------------------

def test_bigram_scores_hand_checked(spark):
    from kafka_flow_spark.operators.quality import bigram_doc_scores

    # corpus: doc1 "a b a b" -> pairs (a,b)x2, (b,a); doc2 "a b" -> (a,b)
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "solo"), (4, "")],
        "doc_id BIGINT, text STRING",
    )
    out = {r["doc_id"]: r for r in bigram_doc_scores(df, "doc_id", "text").collect()}
    # docs with <2 tokens emit nothing
    assert set(out) == {1, 2}
    assert out[1]["n_bigrams"] == 3 and out[2]["n_bigrams"] == 1
    # corpus pair counts: (a,b)=3, (b,a)=1; ctx a=3, b=1; sec b=3, a=1; tot=4
    p_ab = 0.75 * (3 / 3) + 0.25 * (3 / 4)      # 0.9375
    p_ba = 0.75 * (1 / 1) + 0.25 * (1 / 4)      # 0.8125
    nano = lambda p: float(int(p * 1e9 + 0.5))
    assert out[2]["mean_p_nano"] == nano(p_ab)
    assert out[1]["mean_p_nano"] == (2 * nano(p_ab) + nano(p_ba)) / 3


def test_bigram_scores_rank_fluent_above_shuffled(spark):
    from kafka_flow_spark.operators.quality import bigram_doc_scores

    # many fluent docs share transitions; one scrambled doc uses the same
    # vocabulary but corpus-atypical transitions -> lower bigram score
    fluent = [(i, "the cat sat on the mat") for i in range(10)]
    df = spark.createDataFrame(
        fluent + [(99, "mat the on sat cat the")], "doc_id BIGINT, text STRING"
    )
    out = {r["doc_id"]: r["mean_p_nano"] for r in bigram_doc_scores(df, "doc_id", "text").collect()}
    assert out[99] < out[0]


# --- repetition_stats (Gopher repetition-removal signals) -------------------

def _rep_brute(text, top_ns=(2, 3, 4), dup_ns=(5,)):
    from collections import Counter

    toks = text.strip().split() if text.strip() else []
    tc = sum(len(t) for t in toks)
    out = {}
    for n in top_ns:
        grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        c = Counter(grams)
        if not c or tc == 0:
            out[f"top{n}gram_frac"] = 0.0
            continue
        # max count, ties toward more chars — the documented rule
        best = max(c.items(), key=lambda kv: (kv[1], len(kv[0].replace(" ", ""))))
        out[f"top{n}gram_frac"] = best[1] * len(best[0].replace(" ", "")) / tc
    for n in dup_ns:
        grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        c = Counter(grams)
        tot = sum(cnt * len(g.replace(" ", "")) for g, cnt in c.items())
        dup = sum(cnt * len(g.replace(" ", "")) for g, cnt in c.items() if cnt >= 2)
        out[f"dup{n}gram_frac"] = dup / tot if tot else 0.0
    return out


import pytest as _pytest


@_pytest.mark.parametrize("engine", ["arrow", "expr"])
def test_repetition_stats_matches_bruteforce(spark, engine):
    from kafka_flow_spark.operators.quality import repetition_stats

    docs = [
        "the cat sat on the mat the cat sat again",
        "a b a b a b a b",                # heavy 2-gram repetition
        "xx yy zz",                       # no repeats, shorter than 5-gram
        "one",                            # single token
        "",                               # empty
        "   ",                            # whitespace only
        "tie tie zz zz",                  # count tie: 'tie tie' vs 'zz zz' etc
        "w w w w w w",                    # one token repeated
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id BIGINT, text STRING"
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in repetition_stats(df, "doc_id", "text", engine=engine).collect()
    }
    for i, t in enumerate(docs):
        want = _rep_brute(t)
        for k, v in want.items():
            assert abs(got[i][k] - v) < 1e-12, (i, k, got[i][k], v)


def test_repetition_stats_plan_is_scan_projection(spark):
    from kafka_flow_spark.operators.quality import repetition_stats
    from kafka_flow_spark.tables import load
    from tests.conftest import SF_SMALL

    for engine in ("arrow", "expr"):
        df = repetition_stats(
            load(spark, SF_SMALL, "documents"), "doc_id", "text", engine=engine
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_repetition_stats_engines_agree_on_corpus(spark):
    """The two engines are the same operator: bit-identical output over the
    real corpus (including its planted repetition structure)."""
    from kafka_flow_spark.operators.quality import repetition_stats
    from kafka_flow_spark.tables import load
    from tests.conftest import SF_SMALL

    docs = load(spark, SF_SMALL, "documents")
    a = {r["doc_id"]: tuple(r)[1:] for r in
         repetition_stats(docs, "doc_id", "text", dup_ns=(3,), engine="arrow").collect()}
    e = {r["doc_id"]: tuple(r)[1:] for r in
         repetition_stats(docs, "doc_id", "text", dup_ns=(3,), engine="expr").collect()}
    assert a == e and len(a) > 0


# --- equiwidth_histogram ----------------------------------------------------

def test_equiwidth_histogram_counts_and_edges(spark):
    from kafka_flow_spark.operators.profile import equiwidth_histogram

    df = spark.createDataFrame([(float(i),) for i in range(100)], "v DOUBLE")
    h = {r["bucket"]: r["n"] for r in equiwidth_histogram(df, "v", n_buckets=10).collect()}
    # values 0..99 over [0, 99]: bucket = floor(v*10/99); v=99 folds into 9
    assert sum(h.values()) == 100 and max(h) == 9 and min(h) == 0


def test_equiwidth_histogram_constant_and_empty(spark):
    import pytest

    from kafka_flow_spark.operators.profile import equiwidth_histogram

    const = spark.createDataFrame([(5.0,), (5.0,)], "v DOUBLE")
    rows = equiwidth_histogram(const, "v", n_buckets=4).collect()
    assert len(rows) == 1 and rows[0]["bucket"] == 0 and rows[0]["n"] == 2

    empty = spark.createDataFrame([], "v DOUBLE")
    with pytest.raises(ValueError, match="empty"):
        equiwidth_histogram(empty, "v")


def test_group_reputation_and_filter(spark):
    from kafka_flow_spark.operators.quality import group_reputation, reputation_filter

    df = spark.createDataFrame(
        [("good", 1, True), ("good", 2, True), ("good", 3, False),
         ("bad", 4, False), ("bad", 5, False), ("bad", 6, True)],
        "src STRING, doc_id BIGINT, keep BOOLEAN",
    )
    rep = {r["src"]: (r["n_docs"], r["n_keep"], r["keep_frac"])
           for r in group_reputation(df, "src").collect()}
    assert rep == {"good": (3, 2, 2 / 3), "bad": (3, 1, 1 / 3)}

    kept = reputation_filter(df, "src", min_keep_frac=0.5)
    rows = kept.select("doc_id", "keep_frac").collect()
    assert sorted(r["doc_id"] for r in rows) == [1, 2, 3]   # whole group kept
    assert all(r["keep_frac"] == 2 / 3 for r in rows)


def test_pmi_collocations_hand_corpus(spark):
    from kafka_flow_spark.operators.quality import pmi_collocations

    # "new york" always adjacent; "the dog" and "the cat" dilute "the"
    docs = ["new york new york new york",
            "the dog saw the cat",
            "the dog saw the dog"]
    df = spark.createDataFrame([(t,) for t in docs], "text STRING")
    rows = {(r["w1"], r["w2"]): r for r in
            pmi_collocations(df, "text", min_count=2, k=10).collect()}
    # tokens: 16 total; pairs: 4 + 4 + 4 = 12... compute exact
    # doc1: new york new york new york -> 5 pairs (6 tokens)
    # doc2/3: 4 pairs each  => n2 = 13; n1 = 16
    assert ("new", "york") in rows
    ny = rows[("new", "york")]
    assert ny["n_ab"] == 3
    n1, n2 = 16, 13
    lift = (3 / n2) / ((3 / n1) * (3 / n1))
    assert ny["lift"] == round(lift, 4)
    # (dog, saw) has the numerically identical lift ((2/13)/((3/16)(2/16)))
    # and wins the (w1, w2) tie-break — ranks are deterministic
    assert rows[("dog", "saw")]["rank"] == 1 and ny["rank"] == 2
    assert rows[("dog", "saw")]["lift"] == ny["lift"]
    # every returned pair respects min_count
    assert all(r["n_ab"] >= 2 for r in rows.values())


def test_score_buckets_deterministic_terciles(spark):
    from kafka_flow_spark.operators.quality import score_buckets

    # sample = full population (fraction 1.0): exact terciles, key tie-break
    df = spark.createDataFrame(
        [(str(i), float(s)) for i, s in enumerate([9, 8, 7, 6, 5, 4, 3, 2, 1])],
        "k STRING, score DOUBLE",
    )
    out = {r["k"]: r["bucket"]
           for r in score_buckets(df, "score", "k", sample_fraction=1.0).collect()}
    # order by score desc: 9,8,7 -> head; 6,5,4 -> middle; 3,2,1 -> tail
    assert [out[str(i)] for i in range(9)] == [
        "head", "head", "head", "middle", "middle", "middle", "tail", "tail", "tail"
    ]


def test_score_buckets_tie_break_and_guard(spark):
    import pytest

    from kafka_flow_spark.operators.quality import score_buckets

    # all scores equal: assignment must still be total + deterministic by key
    df = spark.createDataFrame(
        [(f"k{i}", 1.0) for i in range(6)], "k STRING, score DOUBLE"
    )
    out = {r["k"]: r["bucket"]
           for r in score_buckets(df, "score", "k", sample_fraction=1.0).collect()}
    # keys ascending fill head -> tail
    assert [out[f"k{i}"] for i in range(6)] == [
        "head", "head", "middle", "middle", "tail", "tail"
    ]
    with pytest.raises(ValueError, match="sample has"):
        score_buckets(df.limit(1), "score", "k", sample_fraction=1.0)


def test_reputation_filter_relative_bar(spark):
    from kafka_flow_spark.operators.quality import reputation_filter

    # corpus pass rate = 3/6 = 0.5; good (2/3) passes, bad (1/3) doesn't
    df = spark.createDataFrame(
        [("good", 1, True), ("good", 2, True), ("good", 3, False),
         ("bad", 4, False), ("bad", 5, False), ("bad", 6, True)],
        "src STRING, doc_id BIGINT, keep BOOLEAN",
    )
    kept = reputation_filter(df, "src")   # relative (corpus-average) bar
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 2, 3]


def test_exact_percentiles_disc_hand_checked(spark):
    from kafka_flow_spark.operators.profile import exact_percentiles_disc

    rows = [("a", v) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]] + [("b", 7)]
    df = spark.createDataFrame(rows, "g STRING, v INT")
    out = {r["g"]: r for r in
           exact_percentiles_disc(df, "v", ["g"], qs=(0.5, 0.9)).collect()}
    # percentile_disc semantics: smallest v with cume >= q*n
    assert out["a"]["n_rows"] == 10
    assert out["a"]["p_50"] == 5 and out["a"]["p_90"] == 9
    assert out["b"]["p_50"] == 7 and out["b"]["p_90"] == 7
    # duplicates collapse into counts, not rank positions
    dups = spark.createDataFrame([("c", 1)] * 9 + [("c", 100)], "g STRING, v INT")
    [r] = exact_percentiles_disc(dups, "v", ["g"], qs=(0.5, 0.9, 1.0)).collect()
    assert (r["p_50"], r["p_90"], r["p_100"]) == (1, 1, 100)


def test_exact_percentiles_disc_fp_boundary(spark):
    """q*n products whose IEEE double rounds ABOVE the exact integer must
    still select the ceil(q*n)-th order statistic: 0.07*100 =
    7.000000000000001 in doubles — without the 1e-9 threshold nudge the 7th
    value is skipped for the 8th (r6 ADVICE finding)."""
    from kafka_flow_spark.operators.profile import exact_percentiles_disc

    rows = [("a", v) for v in range(1, 101)]   # n=100, value k at rank k
    df = spark.createDataFrame(rows, "g STRING, v INT")
    [r] = exact_percentiles_disc(df, "v", ["g"], qs=(0.07, 0.29, 0.5)).collect()
    # ceil(.07*100)=7, ceil(.29*100)=29 (0.29*100=28.999999999999996 needs
    # the plain >= side to hold too), ceil(.5*100)=50
    assert (r["p_7"], r["p_29"], r["p_50"]) == (7, 29, 50)


# --- token entropy -------------------------------------------------------------


def test_token_entropy_hand_worked_and_mirror(spark):
    import math

    from kafka_flow_spark.operators.quality import token_entropy

    rows = [
        (1, "a a a a"),           # all-same: H = 0
        (2, "a b c d"),           # uniform: H = ln 4
        (3, "a a b"),             # mixed
        (4, ""),                  # no tokens -> absent
        (5, None),                # null -> absent
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = {r["doc_id"]: r for r in token_entropy(df, "doc_id", "text").collect()}
    assert set(out) == {1, 2, 3}

    def ln_e6(x):
        return int(round(math.log(x) * 1e6))

    def mirror(counts):
        n = sum(counts)
        s = sum(c * ln_e6(c) for c in counts)
        q, rem = divmod(s, n)
        trunc = q + (1 if q < 0 and rem else 0)
        return ln_e6(n) - trunc

    assert out[1]["entropy_e6"] == mirror([4]) == 0
    assert out[2]["entropy_e6"] == mirror([1, 1, 1, 1]) == ln_e6(4)
    assert out[3]["entropy_e6"] == mirror([2, 1])
    assert (out[3]["n_tokens"], out[3]["n_types"]) == (3, 2)
    # ordering: uniform > mixed > constant
    assert out[2]["entropy_e6"] > out[3]["entropy_e6"] > out[1]["entropy_e6"]


def test_token_entropy_flags_templated_text(spark):
    from kafka_flow_spark.operators.quality import token_entropy

    rows = [
        (1, "click here " * 50),
        (2, "the quick brown fox jumps over the lazy dog and then naps"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = {r["doc_id"]: r["entropy_e6"] for r in token_entropy(df, "doc_id", "text").collect()}
    assert out[1] < out[2]  # templated page scores below natural prose


# --- HTML extraction -----------------------------------------------------------


def test_html_to_text_hand_worked(spark):
    from kafka_flow_spark.operators.text import html_to_text

    cases = [
        # comments, multi-line script bodies, style, nested attrs, entities
        ("<html><!-- hidden\nnav --><script type='x'>var a=1;\nif(a<2){}</script>"
         "<style>p { margin: 0 }</style><body><h1>Big&nbsp;Title</h1>"
         "<p>Hello &amp; welcome</p><div class='f'>B &lt;3 &quot;q&quot; &#39;s&#39;</div></body>",
         "Big Title Hello & welcome B <3 \"q\" 's'"),
        ("no markup at all", "no markup at all"),
        ("  <p>  spaced   out  </p>  ", "spaced out"),
        ("<SCRIPT>UPPER case blocks</SCRIPT>kept", "kept"),
        ("", ""),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i INT, h STRING"
    )
    got = {r["i"]: r["t"] for r in df.select("i", html_to_text("h").alias("t")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_html_to_text_adjacent_elements_do_not_merge_tokens(spark):
    from kafka_flow_spark.operators.text import html_to_text

    df = spark.createDataFrame([("<td>alpha</td><td>beta</td>",)], "h STRING")
    [r] = df.select(html_to_text("h").alias("t")).collect()
    assert r["t"] == "alpha beta"  # not "alphabeta"


def test_zipf_fit_python_mirror_exact(spark):
    """The fitted slope is pure integer arithmetic over FLOOR-e6 ln
    coordinates — a python mirror must match to the last micro-unit."""
    import math
    from collections import Counter

    from kafka_flow_spark.operators.quality import zipf_fit

    texts = [
        "the the the the quick brown fox fox jumps over over the lazy dog",
        "the quick fox runs and the dog sleeps while the fox waits",
    ]
    df = spark.createDataFrame(
        [(i, t, "s0") for i, t in enumerate(texts)],
        "doc_id BIGINT, text STRING, source STRING",
    )
    got = {r["source"]: (r["n_ranks"], r["slope_e6"])
           for r in zipf_fit(df, "source", "text").collect()}

    counts = Counter(w for t in texts for w in t.lower().split())
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    pts = [
        (math.floor(math.log(r) * 1e6), math.floor(math.log(f) * 1e6))
        for r, (_, f) in enumerate(ranked, start=1)
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts); sxx = sum(x * x for x, _ in pts)
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    q = num * 1_000_000
    want = -((-q) // den) if q < 0 else q // den  # truncate like div
    assert got == {"s0": (n, want)}


def test_zipf_fit_natural_vs_uniform_shapes(spark):
    """A planted 1/r frequency corpus fits near slope −1e6; a flat
    every-word-once corpus fits near 0 — the diagnostic separates them."""
    from kafka_flow_spark.operators.quality import zipf_fit

    zipf_words = []
    for r in range(1, 40):
        zipf_words += [f"w{r:03d}"] * (400 // r)
    flat_words = [f"u{i:03d}" for i in range(200)] * 3
    df = spark.createDataFrame(
        [(0, " ".join(zipf_words), "zipf"), (1, " ".join(flat_words), "flat")],
        "doc_id BIGINT, text STRING, source STRING",
    )
    got = {r["source"]: r["slope_e6"] for r in zipf_fit(df, "source", "text").collect()}
    assert -1_150_000 < got["zipf"] < -850_000
    assert abs(got["flat"]) < 50_000


def test_zipf_fit_guards_and_degenerate_groups(spark):
    import pytest as _pytest

    from kafka_flow_spark.operators.quality import zipf_fit

    df = spark.createDataFrame(
        [(0, "solo", "one_word"), (1, "a b c", "ok")],
        "doc_id BIGINT, text STRING, source STRING",
    )
    with _pytest.raises(ValueError, match="max_rank"):
        zipf_fit(df, "source", "text", max_rank=1)
    got = {r["source"] for r in zipf_fit(df, "source", "text").collect()}
    assert got == {"ok"}  # a single-rank group has no slope: absent


# --- source_quantile_gate ---


def _gate(spark, rows, pct):
    from kafka_flow_spark.operators.quality import source_quantile_gate

    df = spark.createDataFrame(rows, "id BIGINT, src STRING, score BIGINT")
    out = source_quantile_gate(df, "src", "id", "score", keep_frac_pct=pct)
    return {r["id"]: (r["rank_in_source"], r["n_source"], r["keep"])
            for r in out.collect()}


def test_gate_keeps_top_fraction_per_source(spark):
    rows = [
        (1, "a", 100), (2, "a", 90), (3, "a", 80), (4, "a", 70),
        (5, "b", 5), (6, "b", 4),
    ]
    got = _gate(spark, rows, 50)
    # source a keeps exactly ceil(0.5*4)=2; source b keeps ceil(0.5*2)=1 —
    # b's low absolute scores do NOT matter (the whole point).
    assert [got[i][2] for i in (1, 2, 3, 4)] == [True, True, False, False]
    assert got[5][2] is True and got[6][2] is False


def test_gate_kept_count_is_exact_ceil(spark):
    rows = [(i, "a", 100 - i) for i in range(1, 6)]  # n=5
    kept = sum(v[2] for v in _gate(spark, rows, 50).values())
    assert kept == 3  # ceil(0.5 * 5), the integer rule's contract


def test_gate_ties_break_to_smaller_id(spark):
    rows = [(10, "a", 7), (2, "a", 7)]  # equal scores
    got = _gate(spark, rows, 50)
    assert got[2] == (1, 2, True)
    assert got[10] == (2, 2, False)


def test_gate_validates_pct(spark):
    import pytest as _pytest

    from kafka_flow_spark.operators.quality import source_quantile_gate

    df = spark.createDataFrame([(1, "a", 1)], "id BIGINT, src STRING, score BIGINT")
    with _pytest.raises(ValueError, match="keep_frac_pct"):
        source_quantile_gate(df, "src", "id", "score", keep_frac_pct=0)


# --- gate_agreement_kappa ---


def _kappa(spark, pairs):
    from kafka_flow_spark.operators.quality import gate_agreement_kappa

    df = spark.createDataFrame(pairs, "fa BOOLEAN, fb BOOLEAN")
    return gate_agreement_kappa(df, "fa", "fb").collect()[0]


def test_kappa_perfect_agreement_is_one(spark):
    r = _kappa(spark, [(True, True)] * 3 + [(False, False)] * 2)
    assert (r["a"], r["b"], r["c"], r["d"]) == (3, 0, 0, 2)
    assert r["po_e6"] == 1_000_000
    assert r["kappa_e6"] == 1_000_000


def test_kappa_worse_than_chance_is_negative(spark):
    # perfect DISagreement on a balanced table
    r = _kappa(spark, [(True, False)] * 2 + [(False, True)] * 2)
    assert r["kappa_e6"] == -1_000_000


def test_kappa_hand_checked_2x2(spark):
    # a=20 b=5 c=10 d=15, n=50: po=0.7, pe=(25*30+25*20)/2500=0.5,
    # kappa = 0.2/0.5 = 0.4
    pairs = ([(True, True)] * 20 + [(True, False)] * 5
             + [(False, True)] * 10 + [(False, False)] * 15)
    r = _kappa(spark, pairs)
    assert r["po_e6"] == 700_000
    assert r["pe_e6"] == 500_000
    assert r["kappa_e6"] == 400_000


def test_kappa_degenerate_denominator_is_null(spark):
    # all four cells in one row class: pe=1 -> kappa undefined
    r = _kappa(spark, [(True, True)] * 4)
    assert r["kappa_e6"] is None


def test_kappa_large_n_decimal_path(spark):
    # n = 12M rows previously overflowed int64 in ANSI mode (n²·1e6 passes
    # 9.2e18 once n > ~3.0e6); the DECIMAL(38,0) rationals must stay exact
    # — including a NEGATIVE kappa (worse-than-chance table).
    from kafka_flow_spark.operators.quality import gate_agreement_kappa

    df = spark.range(12_000_000).select(
        (F.col("id") % 12 < 7).alias("fa"),
        ((F.col("id") % 12 < 4) | (F.col("id") % 12 >= 9)).alias("fb"),
    )
    r = gate_agreement_kappa(df, "fa", "fb").collect()[0]
    a, b, c, d = 4_000_000, 3_000_000, 3_000_000, 2_000_000
    n = a + b + c + d
    po, pe = n * (a + d), (a + b) * (a + c) + (c + d) * (b + d)
    kn, kd = po - pe, n * n - pe
    expect_kappa = kn * 10**6 // kd if kn >= 0 else -((-kn) * 10**6 // kd)
    assert (r["n"], r["a"], r["b"], r["c"], r["d"]) == (n, a, b, c, d)
    assert r["po_e6"] == po * 10**6 // (n * n)
    assert r["pe_e6"] == pe * 10**6 // (n * n)
    assert r["kappa_e6"] == expect_kappa and expect_kappa < 0


def test_kappa_nulls_excluded(spark):
    from kafka_flow_spark.operators.quality import gate_agreement_kappa

    df = spark.createDataFrame(
        [(True, True), (None, True), (True, None)], "fa BOOLEAN, fb BOOLEAN"
    )
    r = gate_agreement_kappa(df, "fa", "fb").collect()[0]
    assert r["n"] == 1
