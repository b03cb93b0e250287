"""Document-quality filtering and PII scrubbing for training-data curation.

Rule-based quality gates in the style of the published Gopher / C4 cleaning
heuristics (Rae et al. 2021 §A1.1; Raffel et al. 2020 §2.2): word-count
bounds, mean-word-length bounds, stopword presence, symbol density, and
repeated-content fractions.  No counterpart in the reference (SURVEY.md
Phase 4 — corpus curation the streaming engine never needed).

Scale posture: every rule in ``quality_flags`` is a PER-ROW projection over
one staged token array — zero shuffles, stacks with parquet pushdown, and the
whole gate runs map-side at 100 TB.  Only ``top_word_stats`` shuffles (the
per-(doc, word) count is a real aggregation), and it is map-combinable.
PII redaction is sequential JVM ``regexp_replace`` — no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_flow_spark.cache import scoped_persist

from kafka_flow_spark.operators.text import STOPWORDS, ngram_level, normalize_text, tokens

# Conservative defaults tuned for short web-ish documents; callers override.
DEFAULT_RULES = {
    "min_words": 10,
    "max_words": 100_000,
    "min_mean_word_len": 2.0,
    "max_mean_word_len": 12.0,
    "min_stopwords": 1,
    "max_dup_2gram_frac": 0.9,
    "max_symbol_frac": 0.1,
}


def _bigrams(toks: Column) -> Column:
    """Adjacent word pairs as strings; empty array for < 2 tokens."""
    n = F.size(toks)
    pairs = F.transform(
        F.sequence(F.lit(0), n - F.lit(2)),
        lambda i: F.concat_ws(" ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)),
    )
    return F.when(n >= 2, pairs).otherwise(F.array().cast("array<string>"))


STAT_COLS = [
    "n_words",
    "mean_word_len",
    "n_stopwords",
    "dup_2gram_frac",
    "symbol_frac",
    "keep",
]


def with_quality_stats(
    df: DataFrame,
    text_col: str,
    rules: dict | None = None,
    lang: str = "en",
) -> DataFrame:
    """Append the quality statistics + ``keep`` verdict to ``df``, preserving
    every existing column (streaming-safe: stateless projection, no watermark,
    no shuffle).

    Every stat is integer arithmetic with ONE final division (deterministic
    across engines).  The token array and bigram array are staged in their own
    projections so the text is split exactly once per row — Catalyst's
    CollapseProject declines to merge them because that would duplicate the
    non-cheap split/transform expressions.
    """
    r = {**DEFAULT_RULES, **(rules or {})}
    stops = F.array(*[F.lit(s) for s in STOPWORDS[lang]])

    staged = df.select(
        "*",
        F.length(text_col).alias("_nc"),
        (
            F.length(text_col)
            - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
        ).alias("_np"),
        tokens(text_col).alias("_toks"),
    ).select(
        "*",
        F.size("_toks").alias("n_words"),
        F.aggregate(
            F.transform("_toks", F.length), F.lit(0), lambda a, x: a + x
        ).alias("_chars"),
        F.size(F.filter("_toks", lambda t: F.array_contains(stops, F.lower(t)))).alias(
            "n_stopwords"
        ),
        _bigrams(F.col("_toks")).alias("_g2"),
    )

    n = F.col("n_words")
    mean_wl = F.when(n == 0, F.lit(0.0)).otherwise(
        F.col("_chars").cast("double") / n.cast("double")
    )
    n_g2 = F.size("_g2")
    dup_frac = F.when(n_g2 == 0, F.lit(0.0)).otherwise(
        (n_g2 - F.size(F.array_distinct("_g2"))).cast("double") / n_g2.cast("double")
    )
    sym_frac = F.when(F.col("_nc") == 0, F.lit(0.0)).otherwise(
        F.col("_np").cast("double") / F.col("_nc").cast("double")
    )

    out = staged.withColumns(
        {
            "mean_word_len": mean_wl,
            "dup_2gram_frac": dup_frac,
            "symbol_frac": sym_frac,
        }
    ).drop("_nc", "_np", "_toks", "_chars", "_g2")
    keep = (
        (F.col("n_words") >= r["min_words"])
        & (F.col("n_words") <= r["max_words"])
        & (F.col("mean_word_len") >= r["min_mean_word_len"])
        & (F.col("mean_word_len") <= r["max_mean_word_len"])
        & (F.col("n_stopwords") >= r["min_stopwords"])
        & (F.col("dup_2gram_frac") <= r["max_dup_2gram_frac"])
        & (F.col("symbol_frac") <= r["max_symbol_frac"])
    )
    return out.withColumn("keep", keep)


def quality_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
    rules: dict | None = None,
    lang: str = "en",
) -> DataFrame:
    """Per-document quality statistics + a single ``keep`` verdict.

    Output columns: id, n_words, mean_word_len, n_stopwords, dup_2gram_frac,
    symbol_frac, keep (the stats-only view of ``with_quality_stats``)."""
    return with_quality_stats(df, text_col, rules, lang).select(id_col, *STAT_COLS)


def top_word_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Most frequent word per document and its frequency ratio (the Gopher
    "fraction of text in the most common word" repetition signal).

    Shape: explode → map-combinable count per (doc, word) → per-doc max via
    one window (rank-limit pushdown keeps it partial).  Ties break to the
    lexicographically smallest word so the result is deterministic.  Documents
    with zero tokens are absent from the output (nothing to rank).
    """
    from pyspark.sql import Window

    counts = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count("*").alias("word_count"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("word_count"), F.asc("word"))
    totals = Window.partitionBy(id_col)
    return (
        counts.withColumn("_rk", F.row_number().over(w))
        .withColumn("_tot", F.sum("word_count").over(totals))
        .where(F.col("_rk") == 1)
        .select(
            id_col,
            F.col("word").alias("top_word"),
            F.col("word_count").alias("top_count"),
            (F.col("word_count").cast("double") / F.col("_tot").cast("double")).alias(
                "top_word_frac"
            ),
        )
    )


# PII patterns kept to syntax shared by java.util.regex and RE2 (DuckDB), so
# the same literal string drives both engines.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
]


def pii_redact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Count and redact common PII shapes (emails, NANP-style phone numbers,
    IPv4 addresses).  Counts are taken on the ORIGINAL text (each against the
    untouched input, so a phone inside an email can't be double-counted after
    redaction reshapes the string), then replacements apply sequentially.
    Output: id, n_email, n_phone, n_ipv4, redacted.
    """
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    red: Column = F.col(text_col)
    for _, pat, tag in PII_PATTERNS:
        red = F.regexp_replace(red, pat, tag)
    return df.select(F.col(id_col), *counts, red.alias("redacted"))


def unigram_doc_scores(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Corpus-statistics language-model score per document (the CCNet-style
    "LM quality filter" shape, with a scoring function chosen to be exactly
    reproducible across engines).

    Builds the corpus unigram distribution p(w) = count(w)/total, then scores
    each doc by its MEAN token probability — documents made of corpus-typical
    words score high, gibberish/rare-token docs score low.  The arithmetic
    mean replaces the usual perplexity's geometric mean so no transcendental
    enters: per-term probabilities are one IEEE division each, quantized to
    integer nano-units, summed as bigint (order-insensitive), and divided
    once per doc — bit-identical in any engine (same trick as the BM25
    scorer in operators/search.py; ranking direction matches -perplexity for
    the filtering use).

    Output: (id, n_tokens, mean_p_nano) where mean_p_nano is the mean token
    probability in integer nano-units (divide by 1e9 for the float).

    Scale shape: two map-combinable aggregates (term counts, per-doc sums)
    and one term-key shuffle join — no driver state; the corpus-total scalar
    rides a broadcast single-row aggregate.
    """
    from pyspark.sql import Window

    # Branch economy (Spark re-runs the lineage per branch — each branch is
    # a full tokenize scan): ONE pass builds per-(doc, term) occurrence
    # counts and a window over term turns them into corpus term counts in
    # place; only the corpus-total scalar needs a second pass.
    toks = (
        df.filter(F.length(F.trim(text_col)) > 0)
        .select(
            F.col(id_col),
            F.explode(tokens(normalize_text(text_col))).alias("_term"),
        )
        .filter(F.col("_term") != "")
    )
    occ = (
        toks.groupBy(id_col, "_term")
        .agg(F.count("*").alias("_n_occ"))
        .withColumn("_cnt", F.sum("_n_occ").over(Window.partitionBy("_term")))
    )
    total = toks.agg(F.count("*").alias("_total"))
    p_nano = F.floor(
        (F.col("_cnt").cast("double") / F.col("_total").cast("double"))
        * F.lit(1_000_000_000.0)
        + F.lit(0.5)
    ).cast("long")
    return (
        occ.crossJoin(F.broadcast(total))
        .select(F.col(id_col), "_n_occ", p_nano.alias("_p_nano"))
        .groupBy(id_col)
        .agg(
            F.sum("_n_occ").alias("n_tokens"),
            F.sum(F.col("_p_nano") * F.col("_n_occ")).alias("_sum_nano"),
        )
        .select(
            id_col,
            "n_tokens",
            (F.col("_sum_nano").cast("double") / F.col("n_tokens").cast("double"))
            .alias("mean_p_nano"),
        )
    )


def length_histogram(
    df: DataFrame,
    group_col: str,
    text_col: str,
    bucket_width: int = 16,
    n_buckets: int = 16,
) -> DataFrame:
    """Token-length histogram per group — the data-card staple (length
    distribution per language/source).  Bucket = min(n_tokens // width,
    n_buckets-1); pure integer arithmetic, one map-combinable aggregate,
    zero joins.  Output: (group, bucket, lo, hi, n_docs) where [lo, hi) is
    the bucket's token range (hi is NULL for the open-ended last bucket)."""
    if bucket_width < 1 or n_buckets < 2:
        raise ValueError("bucket_width >= 1 and n_buckets >= 2 required")
    n_tok = F.size(tokens(text_col))
    bucket = F.least(
        (n_tok / F.lit(bucket_width)).cast("long"), F.lit(n_buckets - 1)
    ).cast("int")
    out = (
        df.withColumn("_b", bucket)
        .groupBy(F.col(group_col), F.col("_b").alias("bucket"))
        .agg(F.count("*").alias("n_docs"))
    )
    lo = (F.col("bucket") * bucket_width).cast("int")
    hi = F.when(
        F.col("bucket") < n_buckets - 1, (F.col("bucket") + 1) * bucket_width
    ).cast("int")
    return out.select(group_col, "bucket", lo.alias("lo"), hi.alias("hi"), "n_docs")


def bigram_doc_scores(
    df: DataFrame, id_col: str, text_col: str, lam: float = 0.75
) -> DataFrame:
    """Interpolated-bigram LM score per document — the next rung above
    ``unigram_doc_scores`` on the CCNet-style quality ladder: a doc scores
    high when its word TRANSITIONS are corpus-typical, which separates
    shuffled-word salad from fluent text that a unigram model cannot.

    Per adjacent token pair (w1, w2) the interpolated probability is
    p = lam * p(w2 | w1) + (1 - lam) * p(w2), with p(w2|w1) =
    count(w1 w2)/count(w1 .) and p(w2) over second-position occurrences.
    As in the unigram scorer the mean replaces the geometric mean so no
    transcendental enters: each p is a handful of IEEE multiplies/divides,
    quantized to integer nano-units, summed as bigint (order-insensitive),
    divided once per doc — bit-identical in any engine.

    Output: (id, n_bigrams, mean_p_nano); docs with < 2 tokens emit nothing.

    Scale shape: pairs are built NARROWLY (an in-row transform over the token
    array — no per-doc window shuffle), then one map-combinable groupBy on
    (doc, w1, w2) and three window passes keyed on small term keys turn group
    counts into bigram/context/second-position corpus counts in place; the
    corpus total rides a broadcast single-row aggregate.  Everything shuffles
    on term keys whose cardinality grows sublinearly with corpus size — the
    right 100 TB shape for corpus-statistics scoring.
    """
    from pyspark.sql import Window

    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    toks = tokens(normalize_text(text_col))
    pairs = (
        df.filter(F.length(F.trim(text_col)) > 0)
        .select(F.col(id_col), toks.alias("_t"))
        .filter(F.size("_t") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_t") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("_t"), i).alias("_w1"),
                        F.element_at(F.col("_t"), i + 1).alias("_w2"),
                    ),
                )
            ).alias("_p"),
        )
        .select(F.col(id_col), F.col("_p._w1").alias("_w1"), F.col("_p._w2").alias("_w2"))
    )
    # Hash partitioning on a single term key SATISFIES the (_w1, _w2) window's
    # clustering requirement (subset rule), and Catalyst transposes windows to
    # exploit it: the physical plan runs the _big window on the _w2 exchange
    # with only a local re-sort — three stats cost two term-key exchanges.
    occ = (
        pairs.groupBy(id_col, "_w1", "_w2")
        .agg(F.count("*").alias("_n_occ"))
        .withColumn("_ctx", F.sum("_n_occ").over(Window.partitionBy("_w1")))
        .withColumn("_big", F.sum("_n_occ").over(Window.partitionBy("_w1", "_w2")))
        .withColumn("_sec", F.sum("_n_occ").over(Window.partitionBy("_w2")))
    )
    total = pairs.agg(F.count("*").alias("_total"))
    p_cond = F.col("_big").cast("double") / F.col("_ctx").cast("double")
    p_uni = F.col("_sec").cast("double") / F.col("_total").cast("double")
    p_nano = F.floor(
        (F.lit(float(lam)) * p_cond + F.lit(float(1.0 - lam)) * p_uni)
        * F.lit(1_000_000_000.0)
        + F.lit(0.5)
    ).cast("long")
    return (
        occ.crossJoin(F.broadcast(total))
        .select(F.col(id_col), "_n_occ", p_nano.alias("_p_nano"))
        .groupBy(id_col)
        .agg(
            F.sum("_n_occ").alias("n_bigrams"),
            F.sum(F.col("_p_nano") * F.col("_n_occ")).alias("_sum_nano"),
        )
        .select(
            id_col,
            "n_bigrams",
            (F.col("_sum_nano").cast("double") / F.col("n_bigrams").cast("double"))
            .alias("mean_p_nano"),
        )
    )


def repetition_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_ns: tuple = (2, 3, 4),
    dup_ns: tuple = (5,),
    engine: str = "arrow",
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1, the "repetition
    removal" family): per document, the fraction of (non-space) characters
    covered by the most frequent word n-gram for each n in ``top_ns``, and
    the fraction of n-gram character mass lying in duplicated n-grams for
    each n in ``dup_ns``.

    Output: id, top{n}gram_frac per top n, dup{n}gram_frac per dup n — every
    value an exact integer ratio evaluated with one final double division,
    so the DuckDB oracle reproduces it bit-identically.  Both engines are
    zero-shuffle scan projections — the same 100 TB posture as the other
    quality gates: stats travel WITH the row, no aggregation barrier before
    the filter downstream.

    ``engine="arrow"`` (default): Arrow-batched ``mapInPandas`` — per-doc
    ``Counter`` over grams in CPython.  This is the knn_bruteforce_arrow
    precedent in reverse: Catalyst higher-order functions evaluate
    interpreted per element, and for string-multiset counting CPython's hash
    machinery beats them ~3× end-to-end (measured sf10: 2.5 s vs 8.0 s;
    sf0.1 single-row-group: 0.6 s vs 1.6 s).

    ``engine="expr"``: pure-JVM column expressions, kept as the no-Python
    fallback and differential baseline.  Its shape carries three measured
    lessons (sf10, 500k docs): (1) gram arrays must build INCREMENTALLY via
    ``text.ngram_level`` (per-position ``array_join(slice(...))`` measured
    61 s vs 3.1 s); (2) a struct-accumulator fold is interpreter-bound
    (63 s); (3) Catalyst does NOT CSE across higher-order-function trees, so
    every multiply-referenced intermediate is STAGED as a real column (an
    un-staged draft re-evaluated the sort per element and never finished).
    Equal grams are adjacent after ``array_sort``; run boundaries are the
    ``G[i] != G[i-1]`` positions, run lengths are boundary-index deltas,
    chars(gram) is ``length(gram) - (n-1)``, and the (cnt, chars) tie rule
    packs into one int64 ``cnt<<32 | chars`` max.
    """
    all_ns = sorted({*top_ns, *dup_ns})
    if min(all_ns) < 2:
        raise ValueError(f"n-gram orders must be >= 2, got {all_ns}")
    if engine not in ("arrow", "expr"):
        raise ValueError(f"engine must be 'arrow' or 'expr', got {engine!r}")
    if engine == "arrow":
        return _repetition_stats_arrow(df, id_col, text_col, top_ns, dup_ns)
    zero = F.lit(0).cast("long")
    toks = tokens(text_col)
    tok_chars = F.aggregate(
        F.transform(toks, F.length), zero, lambda a, x: a + x
    )

    # stage 0→1: incremental gram build (constraint 1; shared construction
    # text.ngram_level), then one sort per n
    s0 = df.select(F.col(id_col), tok_chars.alias("_tc"), toks.alias("_u1"))
    for n in range(2, max(all_ns) + 1):
        g = ngram_level(F.col(f"_u{n - 1}"), F.col("_u1"), n)
        s0 = s0.select("*", g.alias(f"_u{n}"))
    s1 = s0.select(
        id_col,
        "_tc",
        *[F.array_sort(F.col(f"_u{n}")).alias(f"_g{n}") for n in all_ns],
    )

    # stage 2: boundary indices of equal-gram runs (G referenced per element
    # — MUST be an attribute here, see docstring)
    def bnd_col(n):
        G = F.col(f"_g{n}")
        return F.when(F.size(G) == 0, F.array().cast("array<int>")).otherwise(
            F.filter(
                F.sequence(F.lit(1), F.size(G)),
                lambda i: (i == 1)
                | (F.element_at(G, i) != F.element_at(G, i - 1)),
            )
        )

    s2 = s1.select("*", *[bnd_col(n).alias(f"_b{n}") for n in all_ns])

    # stage 3: run lengths + per-run gram chars from the staged boundaries
    def run_cols(n):
        G, B = F.col(f"_g{n}"), F.col(f"_b{n}")
        ends = F.concat(
            F.slice(B, 2, F.greatest(F.size(B) - 1, F.lit(0))),
            F.array((F.size(G) + 1).cast("int")),
        )
        runs = F.when(F.size(B) == 0, F.array().cast("array<long>")).otherwise(
            F.zip_with(B, ends, lambda s, e: (e - s).cast("long"))
        )
        chars = F.transform(
            B, lambda s: (F.length(F.element_at(G, s)) - F.lit(n - 1)).cast("long")
        )
        return runs.alias(f"_r{n}"), chars.alias(f"_c{n}")

    s3 = s2.select(
        id_col, "_tc", *[c for n in all_ns for c in run_cols(n)],
        *[F.col(f"_g{n}") for n in sorted(set(dup_ns))],
    )

    # stage 4: scalars — best (cnt, chars) key, duplicated mass, total mass
    cols = [F.col(id_col)]
    for n in top_ns:
        R, C = F.col(f"_r{n}"), F.col(f"_c{n}")
        key = F.array_max(
            F.zip_with(R, C, lambda r, c: r * F.lit(1 << 32).cast("long") + c)
        )
        best_w = F.coalesce(
            F.shiftright(key, 32)
            * key.bitwiseAND(F.lit((1 << 32) - 1).cast("long")),
            zero,
        )
        cols.append(
            F.when(F.col("_tc") == 0, F.lit(0.0))
            .otherwise(best_w.cast("double") / F.col("_tc").cast("double"))
            .alias(f"top{n}gram_frac")
        )
    for n in dup_ns:
        R, C, G = F.col(f"_r{n}"), F.col(f"_c{n}"), F.col(f"_g{n}")
        dup = F.aggregate(
            F.zip_with(R, C, lambda r, c: F.when(r >= 2, r * c).otherwise(zero)),
            zero,
            lambda a, x: a + x,
        )
        tot = F.aggregate(
            F.transform(G, lambda g: (F.length(g) - F.lit(n - 1)).cast("long")),
            zero,
            lambda a, x: a + x,
        )
        cols.append(
            F.when(tot == 0, F.lit(0.0))
            .otherwise(dup.cast("double") / tot.cast("double"))
            .alias(f"dup{n}gram_frac")
        )
    return s3.select(*cols)


def _repetition_stats_arrow(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_ns: tuple,
    dup_ns: tuple,
) -> DataFrame:
    """Arrow-batched engine for ``repetition_stats`` — identical semantics to
    the expression engine (pinned by a differential test): whitespace tokens
    of trimmed text, chars(gram) = non-space chars, (cnt, chars) tie rule,
    exact int ratios with one final IEEE double division."""
    import pandas as pd

    top_ns, dup_ns = tuple(top_ns), tuple(dup_ns)
    cols = (
        [id_col]
        + [f"top{n}gram_frac" for n in top_ns]
        + [f"dup{n}gram_frac" for n in dup_ns]
    )

    def gen(batches):
        import re
        from collections import Counter

        # exact mirror of operators.text.tokens: F.trim strips ASCII spaces
        # only, and Java's \s is the ASCII class (Python's str \s is
        # unicode-aware, re.split keeps leading/trailing empties like
        # Spark's limit=-1 split)
        ws = re.compile("[ \\t\\n\\x0b\\f\\r]+")

        for pdf in batches:
            out = {c: [] for c in cols}
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if not isinstance(text, str):
                    # NULL text: the expression engine's tokens(NULL) is a
                    # null array, so every frac propagates NULL (the
                    # F.when(_tc == 0, ...) guard never fires on null _tc);
                    # None -> NaN -> SQL NULL through the Arrow batch.
                    out[id_col].append(did)
                    for c in cols:
                        if c != id_col:
                            out[c].append(None)
                    continue
                t = text.strip(" ")
                toks = ws.split(t) if t else []
                tc = sum(len(t) for t in toks)
                counters = {}
                for n in {*top_ns, *dup_ns}:
                    counters[n] = Counter(
                        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
                    )
                out[id_col].append(did)
                for n in top_ns:
                    c = counters[n]
                    if not c or tc == 0:
                        out[f"top{n}gram_frac"].append(0.0)
                        continue
                    cnt, ch = max((v, len(g) - (n - 1)) for g, v in c.items())
                    out[f"top{n}gram_frac"].append(cnt * ch / tc)
                for n in dup_ns:
                    c = counters[n]
                    tot = sum(v * (len(g) - (n - 1)) for g, v in c.items())
                    dup = sum(
                        v * (len(g) - (n - 1)) for g, v in c.items() if v >= 2
                    )
                    out[f"dup{n}gram_frac"].append(dup / tot if tot else 0.0)
            yield pd.DataFrame(out)

    id_t = df.schema[id_col].dataType.simpleString()
    schema = ", ".join(
        [f"{id_col} {id_t}"] + [f"{c} DOUBLE" for c in cols if c != id_col]
    )
    return df.select(id_col, text_col).mapInPandas(gen, schema=schema)


def group_reputation(
    df: DataFrame, group_col: str, signal_col: str = "keep"
) -> DataFrame:
    """Per-group document-quality reputation: how many docs the group has and
    what fraction pass the boolean ``signal_col`` gate.  One map-combinable
    aggregate over the group key — the RefinedWeb/C4 'domain-level decision
    from document-level signals' shape.  keep_frac is one exact int/int IEEE
    division (engine-reproducible)."""
    return (
        df.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(signal_col).cast("long")).alias("n_keep"),
        )
        .withColumn(
            "keep_frac",
            F.col("n_keep").cast("double") / F.col("n_docs").cast("double"),
        )
    )


def reputation_filter(
    df: DataFrame,
    group_col: str,
    signal_col: str = "keep",
    min_keep_frac: float | None = None,
) -> DataFrame:
    """Keep only rows whose GROUP passes the reputation bar — a low-quality
    source poisons all its documents (spam domains, machine-translated
    mirrors), which per-document rules can't see.  Appends ``keep_frac``.

    ``min_keep_frac=None`` (default) sets the bar at the CORPUS-WIDE pass
    rate — a scale-free relative bar: an absolute constant tuned on one
    corpus snapshot silently keeps everything (or nothing) when the rule
    gate's base rate shifts, which it does across corpus versions.  Both
    sides of the relative comparison are single exact-integer IEEE
    divisions (never a float mean of per-group fractions, whose summation
    order is engine-dependent), so the decision is bit-reproducible.

    Scale shape: the reputation table is one row per group (domains — orders
    of magnitude smaller than documents); the join back is left to AQE,
    whose runtime stats broadcast it when it fits and shuffle-hash it
    otherwise — no hint needed because the reduced side is always the
    aggregate.  The corpus total rides a broadcast single-row aggregate."""
    # persisted: the input lineage otherwise runs three times (reputation
    # aggregate, corpus-total aggregate, final join probe) — and the typical
    # input is with_quality_stats(documents), the full tokenize/bigram gate
    # (same measured discipline as score_buckets: 17 s -> 7 s at sf10).
    # The persist targets an internally-owned identity projection, tracked
    # by cache.scoped_persist (released at the harness's next release_all)
    # — never the caller's own handle (r6 ADVICE finding).
    df = df.select("*").transform(scoped_persist)
    rep = group_reputation(df, group_col, signal_col)
    if min_keep_frac is None:
        tot = df.agg(
            F.count(F.lit(1)).alias("_td"),
            F.sum(F.col(signal_col).cast("long")).alias("_tk"),
        )
        rep = rep.crossJoin(F.broadcast(tot)).where(
            F.col("keep_frac")
            >= F.col("_tk").cast("double") / F.col("_td").cast("double")
        )
    else:
        rep = rep.where(F.col("keep_frac") >= F.lit(min_keep_frac))
    return df.join(rep.select(group_col, "keep_frac"), group_col)


def pmi_collocations(
    df: DataFrame,
    text_col: str,
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-k collocations (adjacent word pairs) by pointwise mutual
    information over the corpus — the phrase-mining / tokenizer-merge-rule
    primitive.  PMI = log lift with lift = p(w1 w2) / (p(w1)·p(w2)); log is
    monotone, so ranking by LIFT ranks by PMI while keeping every number a
    plain IEEE divide of exact integer counts — bit-identical across engines
    (house rule: no transcendental in oracle-gated arithmetic).

    Output: (w1, w2, n_ab, lift, rank), rank 1..k by (lift DESC, w1, w2),
    ``lift`` rounded to 4 (ordering on the raw value).

    Scale shape: pairs are built narrowly in-row (no window), then two
    map-combinable aggregates (bigram counts, unigram counts) and two joins
    of the bigram relation onto the vocab-bounded unigram counts — build
    side pinned to the vocab side (post-shuffle stats pick the occurrence
    side otherwise; same measured trap as jaccard_pairs_prefix).  The final
    top-k is TakeOrdered (no global sort)."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    toks = tokens(normalize_text(text_col))
    # persisted: base feeds the word explode (-> uni, n1) AND the pair
    # build (-> big, n2) — un-persisted, the tokenize/normalize scan runs
    # four times; uni is additionally probed by BOTH join legs (w1, w2).
    base = (
        df.filter(F.length(F.trim(text_col)) > 0)
        .select(toks.alias("_t"))
        .filter(F.size("_t") >= 1)
        .transform(scoped_persist)
    )
    words = base.select(F.explode("_t").alias("_w")).filter(F.col("_w") != "")
    uni = words.groupBy("_w").agg(F.count("*").alias("_cw")).transform(scoped_persist)
    n1 = words.agg(F.count("*").alias("_n1"))
    pairs = (
        base.filter(F.size("_t") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_t") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("_t"), i).alias("w1"),
                        F.element_at(F.col("_t"), i + 1).alias("w2"),
                    ),
                )
            ).alias("_p")
        )
        .select(F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    )
    big = pairs.groupBy("w1", "w2").agg(F.count("*").alias("n_ab"))
    n2 = pairs.agg(F.count("*").alias("_n2"))
    scored = (
        big.filter(F.col("n_ab") >= F.lit(min_count))
        .join(
            uni.hint("shuffle_hash").select(
                F.col("_w").alias("w1"), F.col("_cw").alias("_ca")
            ),
            "w1",
        )
        .join(
            uni.hint("shuffle_hash").select(
                F.col("_w").alias("w2"), F.col("_cw").alias("_cb")
            ),
            "w2",
        )
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .withColumn(
            "_lift",
            (F.col("n_ab").cast("double") / F.col("_n2").cast("double"))
            / (
                (F.col("_ca").cast("double") / F.col("_n1").cast("double"))
                * (F.col("_cb").cast("double") / F.col("_n1").cast("double"))
            ),
        )
    )
    from pyspark.sql import Window

    topk = scored.orderBy(
        F.desc("_lift"), F.asc("w1"), F.asc("w2")
    ).limit(k)
    w = Window.orderBy(F.desc("_lift"), F.asc("w1"), F.asc("w2"))
    return topk.select(
        "w1",
        "w2",
        "n_ab",
        F.round("_lift", 4).alias("lift"),
        F.row_number().over(w).cast("int").alias("rank"),
    )


def score_buckets(
    df: DataFrame,
    score_col: str,
    key_col: str,
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    sample_fraction: float = 0.2,
) -> DataFrame:
    """Quantile bucketing of a score column the way CCNet buckets documents
    by LM perplexity into head/middle/tail: equal-count thresholds are
    computed from a CONTENT-ADDRESSED bernoulli sample, then every row is
    assigned by comparison against the broadcast thresholds.

    Why a sample, not a global ntile: an exact global ntile needs a total
    order over the corpus (a rank window with no partition key — one task
    sorts everything, the classic scale-killer); CCNet itself fits its
    percentile cutoffs on a fraction of the data.  The sample is md5
    content-addressed (``sampling.hash_bucket``), so thresholds — and hence
    every bucket decision — are bit-reproducible across runs, engines, and
    partitionings, unlike a random sample.  Pick ``sample_fraction`` so the
    sample fits one task's sort at your scale (1e-3 at 100 TB).

    Tie handling is total: rows are ordered by (score DESC, key ASC), and a
    row sorts "after" a threshold via tuple comparison, so boundary ties
    break deterministically by key.

    Output: ``df`` + ``bucket`` (labels[0] = highest scores).
    """
    from pyspark.sql import Window

    from kafka_flow_spark.operators.sampling import hash_sample

    b = len(labels)
    if b < 2:
        raise ValueError("need at least 2 labels")
    # persisted: df is consumed by the sample count, the threshold window,
    # and the final assignment — un-persisted, an expensive upstream (e.g.
    # the corpus LM scorer) re-runs three times (measured 17 s -> 7 s at
    # sf10 for q_perplexity_buckets).  Internally-owned projection + tracked
    # handle, not the caller's object (r6 ADVICE finding).
    df = df.select("*").transform(scoped_persist)
    sample = hash_sample(df, key_col, sample_fraction).select(score_col, key_col)
    n = sample.count()
    if n < b:
        raise ValueError(
            f"score_buckets: sample has {n} rows < {b} buckets — raise "
            f"sample_fraction (got {sample_fraction})"
        )
    # exact integer ceil(n*i/b) boundary ranks — mirrored by the SQL oracles
    ranks = [(n * i + b - 1) // b for i in range(1, b)]
    w = Window.orderBy(F.desc(score_col), F.asc(key_col))
    thr = (
        sample.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn").isin(ranks))
        .select(score_col, key_col)
        .collect()
    )
    idx: Column = F.lit(0)
    for r in thr:  # b-1 rows — bounded collect
        after = (F.col(score_col) < F.lit(r[score_col])) | (
            (F.col(score_col) == F.lit(r[score_col]))
            & (F.col(key_col) > F.lit(r[key_col]))
        )
        idx = idx + after.cast("int")
    mapping = F.array(*[F.lit(lb) for lb in labels])
    return df.withColumn("bucket", F.element_at(mapping, idx + F.lit(1)))


def zipf_fit(
    df: DataFrame,
    group_col: str,
    text_col: str,
    max_rank: int = 10_000,
) -> DataFrame:
    """Per-group Zipf exponent: the least-squares slope of the log-log
    rank/frequency curve over the top ``max_rank`` word frequencies — the
    corpus-naturalness diagnostic (natural language sits near slope ≈ −1;
    templated/boilerplate-heavy or synthetic corpora bend measurably away),
    fitted per source so one bad feed stands out in a profile sweep.

    Exactness (the token_entropy/lm.py discipline, extended to a
    REGRESSION): x = FLOOR(ln(rank)·1e6), y = FLOOR(ln(freq)·1e6) are
    engine-identical bigints (FLOOR of a shared binary double), and the
    closed-form slope

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

    is evaluated as DECIMAL(38,0) integer polynomials with ONE truncating
    division at the end (slope_e6 = num·1e6 div den — Spark ``div`` ==
    DuckDB ``//``, truncation-identical on both signs), so the fitted
    exponent hash-matches the oracle.  Magnitudes: x,y ≤ ~3.3e7 micro-nats,
    Σ over ≤ max_rank terms keeps num·1e6 ≤ ~1e29 — inside DECIMAL(38,0)
    and HUGEINT at any corpus size.

    Rank is deterministic: frequency DESC, word ASC tie-break; ``max_rank``
    caps the fit to the distribution head (where Zipf behavior lives — the
    long unit-frequency tail flattens any fit) and bounds the regression
    input per group regardless of vocabulary size.

    Scale shape: tokenize-and-explode once, ONE map-combinable
    (group, word) count, one per-group rank window over ≤ |vocab| rows
    (max_rank keeps what follows tiny), one group aggregate.  Groups with
    < 2 ranked points are absent (a one-point fit has no slope).

    Output: (group, n_ranks, slope_e6) — slope_e6 ≈ −1e6 for natural text.
    """
    if max_rank < 2:
        raise ValueError(f"max_rank must be >= 2, got {max_rank}")
    from pyspark.sql.window import Window

    words = df.select(
        F.col(group_col).alias("_g"),
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("_w"),
    )
    freqs = words.groupBy("_g", "_w").agg(F.count(F.lit(1)).alias("_f"))
    w = Window.partitionBy("_g").orderBy(F.desc("_f"), F.asc("_w"))
    ranked = (
        freqs.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= max_rank)
    )
    ln_e6 = lambda c: F.floor(  # noqa: E731
        F.log(c.cast("double")) * F.lit(1_000_000.0)
    ).cast("long")
    xy = ranked.select(
        "_g", ln_e6(F.col("_r")).alias("_x"), ln_e6(F.col("_f")).alias("_y")
    )
    s = xy.groupBy("_g").agg(
        F.count(F.lit(1)).cast("decimal(10,0)").alias("_n"),
        F.sum("_x").cast("decimal(15,0)").alias("_sx"),
        F.sum("_y").cast("decimal(15,0)").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).cast("decimal(28,0)").alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).cast("decimal(28,0)").alias("_sxx"),
    )
    return (
        s.where(F.col("_n") >= 2)
        .select(
            F.col("_g").alias(group_col),
            F.col("_n").cast("long").alias("n_ranks"),
            F.expr(
                "cast(((_n * _sxy - _sx * _sy) * 1000000)"
                " div (_n * _sxx - _sx * _sx) as bigint)"
            ).alias("slope_e6"),
        )
    )


def token_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document Shannon entropy of the token distribution — the
    templated/repetitive-text signal the ratio heuristics miss (a page of
    "click here click here …" has healthy length and punctuation but near-
    zero entropy; Gopher-class pipelines threshold on it next to the
    repetition ratios in operators/text.py).

    Exact micro-nat contract (the lm.py discipline): with per-token counts
    c_t and n = Σ c_t,

        entropy_e6 = ln_e6(n) − (Σ_t c_t · ln_e6(c_t)) div n

    where ln_e6(x) = ROUND(ln(x)·1e6) of a BIGINT count — one ln per
    distinct (doc, token), bigint sums, truncating division: engine-
    identical, value-exact against the SQL mirror.  entropy_e6/1e6 ≈ H in
    nats; uniform tokens give ln(n_types), all-same-token gives 0.  Docs
    with no tokens are absent (no distribution to measure — the DSIR
    absence convention).

    Scale shape: tokenize once, one explode, ONE map-combinable
    groupBy(doc, token) count, one groupBy(doc) fold — same gram-explode
    class as q_text_stats; nothing wider than a token crosses an exchange.

    Output: (id, n_tokens, n_types, entropy_e6).
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("_tok"),
    )
    ln_e6 = lambda c: F.round(F.log(c.cast("double")) * 1_000_000).cast("long")  # noqa: E731
    per = toks.groupBy("_id", "_tok").agg(F.count(F.lit(1)).alias("_c"))
    return (
        per.groupBy(F.col("_id").alias(id_col))
        .agg(
            F.sum("_c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum(F.col("_c") * ln_e6(F.col("_c"))).alias("_sum_cln"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_types",
            (
                ln_e6(F.col("n_tokens"))
                - F.expr("_sum_cln div n_tokens")
            ).cast("long").alias("entropy_e6"),
        )
    )


def source_quantile_gate(
    scored: DataFrame,
    source_col: str,
    id_col: str,
    score_col: str,
    keep_frac_pct: int = 50,
) -> DataFrame:
    """PER-SOURCE quantile gating: keep each source's top ``keep_frac_pct``
    percent by score (FineWeb-style per-domain thresholds — a single global
    cut lets one verbose domain swamp the budget and silently deletes whole
    domains whose scores run low; ranking WITHIN the source keeps every
    domain represented at the same selectivity).

    Fully integer: a row is kept iff ``(rank − 1) · 100 < pct · n_source``
    (strict rank, best score first, ties broken to the smaller id), so the
    kept count per source is exactly ``ceil(pct·n/100)`` and the decision is
    engine-identical — no percentile interpolation, no doubles.

    Scale shape: ONE window exchange on the source (rank + per-source count
    in the same window pass) — the same shuffle any per-source report pays.
    Output: (id, source, score, rank_in_source, n_source, keep).
    """
    from pyspark.sql.window import Window

    if not 1 <= keep_frac_pct <= 100:
        raise ValueError(f"keep_frac_pct must be in [1, 100], got {keep_frac_pct}")
    w = Window.partitionBy(source_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    wall = Window.partitionBy(source_col)
    return scored.select(
        F.col(id_col),
        F.col(source_col),
        F.col(score_col),
        F.row_number().over(w).alias("rank_in_source"),
        F.count(F.lit(1)).over(wall).alias("n_source"),
    ).withColumn(
        "keep",
        (F.col("rank_in_source") - 1) * 100 < F.lit(keep_frac_pct) * F.col("n_source"),
    )


def gate_agreement_kappa(
    flags: DataFrame,
    flag_a_col: str,
    flag_b_col: str,
) -> DataFrame:
    """Cohen's kappa between two boolean quality gates — "do my rule gate
    and my model gate agree beyond chance?"  (Cohen 1960; the eval-tooling
    number a curation pipeline reports before swapping one gate for the
    other.)

    Exact integer form: with confusion counts a(TT) b(TF) c(FT) d(FF) and
    n = a+b+c+d,

        kappa = (n·(a+d) − [(a+b)(a+c) + (c+d)(b+d)])
                / (n² − [(a+b)(a+c) + (c+d)(b+d)])

    — numerator/denominator are exact DECIMAL(38,0) rationals (n² and the
    chance products overflow BIGINT once n passes ~3.0e6 with the ×1e6
    quantization folded in, and ANSI mode turns that into a hard error at
    exactly the corpus sizes this gate targets); the e6 quantizations are
    single truncating divisions with explicit negative-numerator handling
    (kappa can be negative: worse-than-chance agreement).  Exact bound:
    DECIMAL(38,0) holds n²·1e6 up to n ≈ 3.1e15 rows — beyond any corpus
    (pinned by test_gate_agreement_large_n).  Output is ONE row:
    (n, a, b, c, d, po_e6, pe_e6, kappa_e6), all BIGINT.

    Scale shape: one map-combinable global aggregate over the flag pairs —
    nothing else.  NULL flags are excluded (both gates must have voted).
    """
    both = flags.where(
        F.col(flag_a_col).isNotNull() & F.col(flag_b_col).isNotNull()
    )
    agg = both.agg(
        F.sum(F.when(F.col(flag_a_col) & F.col(flag_b_col), 1).otherwise(0))
        .cast("long").alias("a"),
        F.sum(F.when(F.col(flag_a_col) & ~F.col(flag_b_col), 1).otherwise(0))
        .cast("long").alias("b"),
        F.sum(F.when(~F.col(flag_a_col) & F.col(flag_b_col), 1).otherwise(0))
        .cast("long").alias("c"),
        F.sum(F.when(~F.col(flag_a_col) & ~F.col(flag_b_col), 1).otherwise(0))
        .cast("long").alias("d"),
    )
    # DECIMAL(38,0) arithmetic for every product: n·(a+d), the chance
    # products, and the ×1e6 quantization all exceed int64 once n passes
    # ~3e6, and ANSI mode (Spark 4 default) makes that a hard
    # ARITHMETIC_OVERFLOW.  Decimal(38,0) keeps the rationals exact to
    # n ≈ 3.1e15; `x div y` on decimals is still the truncating integral
    # divide returning BIGINT on both engines (oracle mirrors with
    # HUGEINT casts).
    dec = "decimal(38,0)"
    a, b, c, d = (F.col(x).cast(dec) for x in ("a", "b", "c", "d"))
    n = a + b + c + d
    chance = (a + b) * (a + c) + (c + d) * (b + d)
    staged = agg.select(
        "a", "b", "c", "d",
        n.cast("long").alias("n"),
        n.cast(dec).alias("_n_dec"),
        (n * (a + d)).cast(dec).alias("_po_num"),
        chance.cast(dec).alias("_pe_num"),
    )
    # truncating e6 divisions; po/pe are non-negative, kappa may be negative
    # (div truncates toward zero on BOTH engines only for non-negative
    # operands — negate explicitly, the group_trend pattern).
    kappa_num = F.col("_po_num") - F.col("_pe_num")
    kappa_den = F.col("_n_dec") * F.col("_n_dec") - F.col("_pe_num")
    kappa = F.when(kappa_den == F.lit(0).cast(dec), F.lit(None).cast("long")).otherwise(
        F.when(
            kappa_num >= F.lit(0).cast(dec),
            F.expr(
                "CAST((_po_num - _pe_num) * CAST(1000000 AS decimal(38,0)) AS decimal(38,0))"
                " div CAST(_n_dec * _n_dec - _pe_num AS decimal(38,0))"
            ),
        ).otherwise(
            -F.expr(
                "CAST((_pe_num - _po_num) * CAST(1000000 AS decimal(38,0)) AS decimal(38,0))"
                " div CAST(_n_dec * _n_dec - _pe_num AS decimal(38,0))"
            )
        )
    )
    return staged.select(
        "n", "a", "b", "c", "d",
        F.expr(
            "CAST(_po_num * CAST(1000000 AS decimal(38,0)) AS decimal(38,0))"
            " div CAST(_n_dec * _n_dec AS decimal(38,0))"
        ).alias("po_e6"),
        F.expr(
            "CAST(_pe_num * CAST(1000000 AS decimal(38,0)) AS decimal(38,0))"
            " div CAST(_n_dec * _n_dec AS decimal(38,0))"
        ).alias("pe_e6"),
        kappa.alias("kappa_e6"),
    )
