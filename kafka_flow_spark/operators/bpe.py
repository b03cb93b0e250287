"""Byte-pair-encoding tokenizer training and segmentation.

The missing third of the tokenizer-prep story (``pmi_collocations`` mines
merge-rule CANDIDATES, ``vocab_coverage`` sizes the vocabulary; this trains
the actual merge table and applies it).  No counterpart in the reference
(SURVEY.md Phase 4 — corpus → training-run prep).

Scale shape — the shape production BPE trainers use: the corpus is touched
EXACTLY ONCE to build the word histogram (map-combinable aggregate, output
bounded by word-type cardinality, not token volume); merge training then
iterates on the histogram, which is guarded to a driver-safe cardinality
(same bounded-collect discipline as the IVF k-means codebook in
operators/similarity.py).  Pair statistics over a weighted word histogram
are EXACTLY the corpus pair statistics, so nothing is approximated by
training off the histogram.  Segmentation broadcasts the (small) merge
table and streams Arrow batches (mapInPandas) — per-word merge loops are
CPython-over-Counter territory, the measured fast path for string-multiset
work (see repetition_stats: 3x over interpreted Catalyst HOFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_flow_spark.operators.text import normalize_text, tokens


def _word_histogram(df: DataFrame, text_col: str) -> DataFrame:
    return (
        df.filter(F.length(F.trim(text_col)) > 0)
        .select(F.explode(tokens(normalize_text(text_col))).alias("_w"))
        .filter(F.col("_w") != "")
        .groupBy("_w")
        .agg(F.count("*").alias("_n"))
    )


def _train_merges_ref(
    hist: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Reference trainer: recount EVERY pair over the whole histogram each
    round — O(n_merges × total symbols), obviously correct, kept as the
    differential oracle for ``_train_merges`` (and fine for the ≤100-merge
    toy vocabularies the unit tests use).  Semantics: each round merges the
    pair with the highest corpus-weighted adjacent-position count, ties
    broken on (left, right) lexicographically; within a word, merge
    applications scan left-to-right non-overlapping."""
    words = [(tuple(w), n) for w, n in hist]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, n in words:
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, cnt))
        merged = left + right
        out = []
        for sym, n in words:
            s, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                    s.append(merged)
                    i += 2
                else:
                    s.append(sym[i])
                    i += 1
            out.append((tuple(s), n))
        words = out
    return merges


def _train_merges(
    hist: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Deterministic BPE merge training with INCREMENTAL pair-count
    maintenance — the standard production-trainer shape (Sennrich et al.'s
    subword-nmt learn_bpe keeps the same pair→words index): after a merge,
    only the words actually CONTAINING the merged pair are re-counted, and
    the best pair comes from a lazy-deletion max-heap instead of a full
    scan.  Work per merge is O(symbols in touched words + heap churn), not
    O(total symbols) — at a 190k-type Zipf histogram this trains 30,000
    merges in 42 s where the recount reference needs 64 s for its FIRST
    100 (~450× at a real tokenizer's merge count; measured, PERF.md r6).

    Bit-identical to ``_train_merges_ref`` (hypothesis differential in
    tests/test_bpe.py): the heap orders by (-count, left, right), exactly
    the reference's tie-break; stale entries are skipped by comparing the
    popped count against the live count."""
    import heapq

    words: list[list] = [[list(w), n] for w, n in hist]
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, (sym, n) in enumerate(words):
        for i in range(len(sym) - 1):
            p = (sym[i], sym[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + n
            pair_words.setdefault(p, set()).add(wi)
    heap = [(-c, p[0], p[1]) for p, c in pair_counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        cnt = 0
        while heap:
            negc, left, right = heapq.heappop(heap)
            if pair_counts.get((left, right), 0) == -negc:
                cnt = -negc
                break
        if cnt <= 0:
            break
        merges.append((rank, left, right, cnt))
        merged = left + right
        touched: set[tuple[str, str]] = set()
        for wi in list(pair_words.get((left, right), ())):
            sym, n = words[wi]
            # retract this word's adjacent-pair contributions entirely…
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pair_counts[p] -= n
                pair_words[p].discard(wi)
                touched.add(p)
            # …apply the merge left-to-right non-overlapping…
            s, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                    s.append(merged)
                    i += 2
                else:
                    s.append(sym[i])
                    i += 1
            words[wi][0] = s
            # …and re-add the rewritten word's pairs.
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + n
                pair_words.setdefault(p, set()).add(wi)
                touched.add(p)
        for p in touched:
            c = pair_counts.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, p[0], p[1]))
            else:
                pair_counts.pop(p, None)
                pair_words.pop(p, None)
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 100,
    max_word_types: int = 1_000_000,
) -> DataFrame:
    """Train a BPE merge table on the corpus.  Output: (rank, left, right,
    pair_count) — rank 0 is the first (most frequent) merge; applying the
    merges in rank order to any word re-tokenizes it exactly as training
    did.  Symbols start as single characters (no end-of-word marker —
    words are the atomic units here, matching ``tokens``' whitespace
    contract; a marker variant is a trivial histogram preprocessing).

    The corpus pass is the word histogram only; training iterates on the
    histogram driver-side, refusing loudly past ``max_word_types`` (an
    unbounded natural-text vocabulary wants the histogram truncated by
    count first — pass a pre-filtered df, the standard trainer move).
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    # one corpus pass: limit(max+1) bounds the collect AND detects
    # overflow without a separate count job (the histogram aggregate runs
    # fully either way; a count-then-collect would scan the corpus twice)
    rows = _word_histogram(df, text_col).limit(max_word_types + 1).collect()
    if len(rows) > max_word_types:
        raise ValueError(
            f"bpe_train: > {max_word_types} word types (max_word_types) "
            "— truncate the histogram (frequency floor) before training"
        )
    hist = [(r["_w"], r["_n"]) for r in rows]
    merges = _train_merges(hist, n_merges)
    schema = "rank int, left string, right string, pair_count long"
    return df.sparkSession.createDataFrame(merges, schema)


def bpe_segment(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Segment every document with a trained merge list (rank order):
    output (id, n_tokens, n_pieces, pieces) where ``pieces`` are the BPE
    units of all words in document order — lossless (concatenating a
    word's pieces reproduces the word, pinned by a property test).

    The merge table broadcasts inside the Arrow closure (it is a few
    thousand rows); each batch applies the standard lowest-rank-first
    merge loop per word, memoized per distinct word within the batch —
    CPython dict work, the measured fast lane for this shape.
    """
    rank_of = {pair: i for i, pair in enumerate(merges)}
    import pandas as pd  # noqa: F401  (driver-side presence check)

    def gen(batches):
        import re

        import pandas as pd

        ws = re.compile("[ \\t\\n\\x0b\\f\\r]+")
        memo: dict[str, list[str]] = {}

        def seg(word: str) -> list[str]:
            got = memo.get(word)
            if got is not None:
                return got
            sym = list(word)
            while len(sym) > 1:
                best, bi = None, -1
                for i in range(len(sym) - 1):
                    r = rank_of.get((sym[i], sym[i + 1]))
                    if r is not None and (best is None or r < best):
                        best, bi = r, i
                if best is None:
                    break
                sym[bi : bi + 2] = [sym[bi] + sym[bi + 1]]
            memo[word] = sym
            return sym

        for pdf in batches:
            out = {c: [] for c in (id_col, "n_tokens", "n_pieces", "pieces")}
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if not isinstance(text, str):
                    out[id_col].append(did)
                    out["n_tokens"].append(None)
                    out["n_pieces"].append(None)
                    out["pieces"].append(None)
                    continue
                # exact mirror of tokens(normalize_text(text)): lower,
                # collapse ASCII whitespace runs to one space, trim spaces,
                # split — Java's \s is the ASCII class, hence the explicit
                # ws pattern (Python's \s is unicode-aware)
                t = ws.sub(" ", text.lower()).strip(" ")
                toks = [w for w in (t.split(" ") if t else []) if w]
                pieces: list[str] = []
                for w in toks:
                    pieces.extend(seg(w))
                out[id_col].append(did)
                out["n_tokens"].append(len(toks))
                out["n_pieces"].append(len(pieces))
                out["pieces"].append(pieces)
            yield pd.DataFrame(out)

    id_t = df.schema[id_col].dataType.simpleString()
    schema = (
        f"{id_col} {id_t}, n_tokens long, n_pieces long, pieces array<string>"
    )
    return df.select(id_col, text_col).mapInPandas(gen, schema=schema)


def bpe_fertility_card(
    df: DataFrame,
    source_col: str,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Tokenizer-fertility data card per source under a TRAINED merge table
    — the real-tokenizer sibling of the regex-proxy card (plans/llm.py
    q_tokenizer_fertility): sub-word pieces per whitespace word and bytes
    per piece, computed from ``bpe_segment``'s actual segmentation instead
    of the pre-tokenizer regex.  Same output columns and the same
    DECIMAL(38,0) e6 rationals, so the two cards are directly comparable —
    and the differential that makes the card worth publishing holds by BPE
    construction: a longer merge-table PREFIX can only merge further, so
    ``fertility_e6`` is monotonically non-increasing in n_merges (pinned in
    tests/test_bpe.py), with the zero-merge card degenerating to
    characters-per-word.

    Scale shape: ONE Arrow-batched segmentation pass (per-word memoized
    merge loop — the bpe_segment plan) into one map-combinable (source)
    aggregate; the merge table broadcasts inside the closure.  Output:
    (source, n_docs, ws_tokens, bpe_tokens, n_bytes, fertility_e6,
    bytes_per_token_e6).
    """
    from pyspark.sql import functions as F

    seg = bpe_segment(df, id_col, text_col, merges)
    base = df.select(
        F.col(id_col),
        F.col(source_col).alias("source"),
        F.octet_length(text_col).cast("long").alias("_nb"),
    )
    agg = (
        base.join(seg.select(id_col, "n_tokens", "n_pieces"), id_col)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("ws_tokens"),
            F.sum("n_pieces").cast("long").alias("bpe_tokens"),
            F.sum("_nb").cast("long").alias("n_bytes"),
        )
    )
    # the kappa-class guard: corpus-scale sums × 1e6 overflow int64 past
    # ~9e12, so the rationals ride DECIMAL(38,0) and return to bigint
    return agg.select(
        "source", "n_docs", "ws_tokens", "bpe_tokens", "n_bytes",
        F.when(
            F.col("ws_tokens") > 0,
            F.expr(
                "CAST(bpe_tokens AS decimal(38,0)) * 1000000"
                " div CAST(ws_tokens AS decimal(38,0))"
            ),
        ).otherwise(F.lit(0).cast("long")).alias("fertility_e6"),
        F.when(
            F.col("bpe_tokens") > 0,
            F.expr(
                "CAST(n_bytes AS decimal(38,0)) * 1000000"
                " div CAST(bpe_tokens AS decimal(38,0))"
            ),
        ).otherwise(F.lit(0).cast("long")).alias("bytes_per_token_e6"),
    )
