"""Deduplication operators: exact, word-set Jaccard, MinHash+LSH, SimHash.

Designed for the 100 TB case:
- exact dedup is a single hash-aggregate on a fingerprint (map-side combinable);
- pairwise Jaccard is always *blocked* (same-language + length band) so the
  candidate space is bounded per block, never a global cross join;
- MinHash signatures are computed entirely JVM-side (xxhash64 + higher-order
  array functions — no Python), LSH banding turns near-dup search into an
  equi-join on (band_id, band_hash): shuffle-partitionable, no pair explosion
  outside buckets;
- SimHash is likewise all JVM built-ins: md5-derived token bits + 64
  conditional-sum bit votes in a single hash aggregate (md5 rather than
  xxhash64 so the DuckDB oracle shares the hash bit-for-bit).

No counterpart in the reference (SURVEY.md §7 Phase 4).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_flow_spark.cache import (
    materialized,
    scoped_persist,
    scoped_persist_corpus,
)

from kafka_flow_spark.operators.text import (
    fingerprint,
    ngram_level,
    normalize_text,
    tokens,
)

# MinHash parameters: k independent permutations h_i(x) = (a_i*x + b_i) mod P
# over base hashes folded into [0, P).  P = 2^31-1 (Mersenne prime) keeps
# a_i*h + b_i < 2^62, inside int64 under ANSI arithmetic (no overflow).
_P = (1 << 31) - 1
_K_DEFAULT = 64


def _jac_sets(a: F.Column | str, b: F.Column | str) -> F.Column:
    """Exact Jaccard of two DISTINCT-element array columns via
    inclusion–exclusion: |A∪B| = |A|+|B|−|A∩B|, so one ``array_intersect``
    replaces intersect+union — half the per-candidate array hashing in every
    verify join (r13; the union materialized a merged array per pair only to
    take its size).  Identical value to the size(intersect)/size(union)
    form: inputs are sets by construction (collect_set / array_distinct), so
    the identity is exact and the double division sees the same integers.
    """
    inter = F.size(F.array_intersect(a, b))
    return inter.cast("double") / (
        (F.size(a) + F.size(b) - inter).cast("double")
    )


def _iceil(expr: F.Column) -> F.Column:
    """Integer ceil of threshold·size products, guarded against IEEE
    representation error: the double product 0.07*100 is 7.000000000000001
    (likewise 0.07*300 = 21.000000000000004), which a bare ``F.ceil`` rounds
    up one too far — shrinking prefix lengths and over-tightening size
    bounds, silently dropping exact-boundary pairs from 'recall 1.0' joins.
    The 1e-9 nudge is safe while genuinely non-integer products sit >=
    ~1e-4 from an integer (thresholds are short decimals, set sizes
    bounded far below 2^40)."""
    return F.ceil(expr - F.lit(1e-9))


def _ifloor(expr: F.Column) -> F.Column:
    """Integer floor with the symmetric guard (7/0.7 = 9.999999999999998
    would floor to 9 where the exact bound is 10)."""
    return F.floor(expr + F.lit(1e-9))


def _minhash_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = np.random.RandomState(seed)
    return [
        (int(rng.randint(1, _P - 1, dtype=np.int64)), int(rng.randint(0, _P - 1, dtype=np.int64)))
        for _ in range(k)
    ]


def exact_duplicates(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group identical documents by content fingerprint.

    One hash-aggregate; partial aggregation makes this a single shuffle of
    (fingerprint → count, min_id) pairs regardless of document size.
    """
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("canonical_id"), F.count("*").alias("n_dups"))
    )


def word_shingles(text_col: str, n: int = 1) -> F.Column:
    """Distinct word n-gram shingle set of the normalized text (JVM-side),
    built level-by-level with the shared incremental construction
    (``text.ngram_level`` — see its docstring for the measured rationale)."""
    toks = tokens(normalize_text(text_col))
    if n == 1:
        return F.array_distinct(toks)
    grams = toks
    for k in range(2, n + 1):
        grams = ngram_level(grams, toks, k)
    return F.array_distinct(grams)


def jaccard_pairs_blocked(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    length_col: str | None = None,
    length_band: int = 30,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word-set Jaccard over *blocked* candidate pairs.

    Blocking (equi-join on block_cols + a length band) bounds the pair space;
    the join is an ordinary shuffle equi-join, so it scales horizontally.
    Output: (a_id, b_id, jac) for pairs with similarity >= threshold.
    """
    base = df.select(
        F.col(id_col).alias("_id"),
        *[F.col(c) for c in block_cols],
        *( [F.col(length_col).alias("_len")] if length_col else [] ),
        word_shingles(text_col).alias("_sh"),
    )
    a = base.select(
        F.col("_id").alias("a_id"),
        *[F.col(c).alias(f"_ba_{c}") for c in block_cols],
        *( [F.col("_len").alias("_len_a")] if length_col else [] ),
        F.col("_sh").alias("_sh_a"),
    )
    b = base.select(
        F.col("_id").alias("b_id"),
        *[F.col(c).alias(f"_bb_{c}") for c in block_cols],
        *( [F.col("_len").alias("_len_b")] if length_col else [] ),
        F.col("_sh").alias("_sh_b"),
    )
    cond = F.col("a_id") < F.col("b_id")
    for c in block_cols:
        cond = cond & (F.col(f"_ba_{c}") == F.col(f"_bb_{c}"))
    if length_col:
        cond = cond & (F.abs(F.col("_len_a") - F.col("_len_b")) <= length_band)
    jac = _jac_sets("_sh_a", "_sh_b")
    return (
        a.join(b, cond)
        .select("a_id", "b_id", F.round(jac, 4).alias("jac"))
        .filter(F.col("jac") >= threshold)
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = _K_DEFAULT, shingle_n: int = 3
) -> DataFrame:
    """k-permutation MinHash signature per document, fully JVM-side.

    Shape matters, twice over:
    - computing the signature as k ``array_min(transform(...))`` expressions
      re-evaluates the shingle pipeline k times per row (higher-order lambdas
      defeat Catalyst subexpression elimination — measured 64× slower);
    - even one pass of string n-gram construction (slice + concat_ws +
      array_distinct per index) runs interpreted and dominated the remainder.
    So: posexplode tokens, hash each token once (xxhash64, codegen), form the
    n-gram shingle hash from ``lead()`` token hashes over a (doc_id, pos)
    window, then one hash-aggregate with k ``min(pmod(a*h+b, P))`` buffers.
    The whole pipeline is whole-stage-codegen and shuffles once: the groupBy
    reuses the window's doc_id distribution, and partial aggregation collapses
    each doc to a single k-slot row map-side — one shuffled row per document
    regardless of document length, the 100 TB-safe shape.

    Shingle identity is the hash-of-token-hashes (not the joined string) —
    equivalent for MinHash purposes; duplicates need no dedup since min() is
    multiset-invariant.  Documents with fewer than ``shingle_n`` tokens
    produce an all-null signature (min over no rows).
    """
    mins = _minhash_mins(df, id_col, text_col, k, shingle_n)
    return mins.select("doc_id", F.array(*[f"_m{i}" for i in range(k)]).alias("minhash"))


def shingle_hashes(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    with_pos: bool = False,
    hash_fn: str = "xxhash64",
    passthrough: list[str] | None = None,
) -> DataFrame:
    """(doc_id, _h) rows: one hash in [0, P) per word n-gram occurrence.

    Fully codegen either way: posexplode tokens over a (doc_id, pos) window.
    ``hash_fn`` picks the hash family:

    - ``"xxhash64"`` (default, fastest): xxhash64 each token once, combine n
      consecutive *token hashes* via ``lead()`` — the MinHash pipeline, where
      only hash distribution matters (verified downstream via exact Jaccard).
    - ``"md5"``: lead the token *strings*, hash the joined n-gram with
      md5 and fold its first 15 hex digits to a 60-bit int (still JVM
      codegen, ~md5-speed).  md5 is the one 64-bit-capable hash DuckDB
      shares, so fingerprint *values* are oracle-reproducible bit-exactly —
      used by winnowing, whose output IS the hash values.

    Rows without a full n-gram (short docs; and for ``shingle_n == 1`` the
    per-token tail semantics below) carry null ``_h``.  ``with_pos=True``
    keeps the n-gram start position (for winnowing/spans).

    Plan shape (r13): ZERO shuffles and zero windows — the n-gram at
    position i is assembled by zipping ``shingle_n`` shifted slices of the
    token array (``slice``/``arrays_zip`` are native expressions), exploding,
    and hashing per ROW in whole-stage codegen.  This replaces the previous
    repartition(id)-then-lead-window shape, which shuffled the full corpus
    TEXT once and paid a per-document sort before any hash was computed —
    at 100 TB that was a corpus-sized text exchange for what is a purely
    row-local computation.  Scan parallelism comes from split sizing
    (maxPartitionBytes / openCostInBytes), not from a shuffle.  Hash VALUES
    are unchanged: the same token/gram hash expressions over the same
    (token, +1, +2, …) windows, so signatures, band hashes, fingerprints
    and every stored index stay bit-identical.
    """
    if not 1 <= shingle_n <= 64:
        raise ValueError("shingle_n must be in [1, 64]")
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError("hash_fn must be 'xxhash64' or 'md5'")
    extra = list(passthrough or [])
    toks = tokens(normalize_text(text_col))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in extra],
        toks.alias("_tk"),
    )
    cols = ["doc_id", *extra] + (["_pos"] if with_pos else [])
    if shingle_n == 1:
        rows = base.select(
            "doc_id", *extra, F.posexplode_outer("_tk").alias("_pos", "_tok")
        )
        if hash_fn == "md5":
            shingle_hash = F.pmod(
                F.conv(F.substring(F.md5(F.col("_tok")), 1, 15), 16, 10).cast(
                    "long"
                ),
                F.lit(_P),
            )
            # md5(NULL) is NULL so null-token rows stay null; but conv("")→0
            # must not:
            shingle_hash = F.when(F.col("_tok").isNotNull(), shingle_hash)
        else:
            # NB: xxhash64(NULL) is the seed hash, not NULL — empty docs keep
            # their historical non-null unigram value
            shingle_hash = F.pmod(F.xxhash64("_tok"), F.lit(_P))
        return rows.select(*cols, shingle_hash.alias("_h"))
    # number of full n-grams; a doc with fewer than shingle_n tokens (or a
    # null token array) zips to NULL, which posexplode_outer keeps as one
    # null-_h row — the all-null-signature contract for short docs
    m = F.size("_tk") - F.lit(shingle_n - 1)
    parts = [
        F.slice("_tk", i + 1, m).alias(f"_w{i}") for i in range(shingle_n)
    ]
    sh = F.when(F.size("_tk") >= shingle_n, F.arrays_zip(*parts))
    rows = base.select(
        "doc_id", *extra, F.posexplode_outer(sh).alias("_pos", "_g")
    )
    g = F.col("_g")
    fields = [g[f"_w{i}"] for i in range(shingle_n)]
    if hash_fn == "md5":
        gram = F.concat_ws(" ", *fields)
        shingle_hash = F.when(
            g.isNotNull(),
            F.pmod(
                F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long"),
                F.lit(_P),
            ),
        )
    else:
        # token hashes combined exactly as before: inner xxhash64 per token
        # string, outer xxhash64 over the shingle_n longs
        shingle_hash = F.when(
            g.isNotNull(),
            F.pmod(F.xxhash64(*[F.xxhash64(f) for f in fields]), F.lit(_P)),
        )
    return rows.select(*cols, shingle_hash.alias("_h"))


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 4,
    shingle_n: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, MOSS):
    the distinct minima of a sliding window over the rolling n-gram hashes.

    Guarantee: two documents sharing a token run of ≥ window+shingle_n-1
    words share at least one fingerprint — so fingerprint-set overlap is a
    substring-aware near-dup signal, unlike whole-document hashes.  Density
    is ~2/(window+1) of the shingle count, so the fingerprint table is a
    small fraction of the corpus.

    All JVM-side: the shingle pipeline is the shared codegen path (a lead
    window over token order), the sliding min is one more frame over the
    SAME (doc_id, pos) sort — Catalyst evaluates both windows in a single
    sort pass, and the final distinct aggregates on (doc_id, fingerprint).
    ``hash_fn`` defaults to "md5" because winnowing's *output is the hash
    values themselves*, and md5 is DuckDB-shared so the oracle reproduces
    them bit-exactly; pass "xxhash64" for maximum throughput when oracle
    parity is not needed.
    Output: (doc_id, fingerprint) rows, one per selected hash.
    """
    from pyspark.sql.window import Window

    h = shingle_hashes(
        df, id_col, text_col, shingle_n, with_pos=True, hash_fn=hash_fn
    ).filter(F.col("_h").isNotNull())
    w = Window.partitionBy("doc_id").orderBy("_pos").rowsBetween(0, window - 1)
    # only full windows select a fingerprint (standard winnowing); docs with
    # fewer than `window` shingles contribute their global min so no document
    # has an empty fingerprint set
    sel = h.select(
        "doc_id",
        "_pos",
        F.min("_h").over(w).alias("fingerprint"),
        (F.count("_h").over(w) == window).alias("_full"),
    ).filter(F.col("_full") | (F.col("_pos") == 0))
    return sel.select("doc_id", "fingerprint").distinct()


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 8,
    min_occurrences: int = 2,
    cross_doc_only: bool = False,
    hash_fn: str = "md5",
) -> DataFrame:
    """Exact duplicated token *spans*: maximal runs of tokens whose every
    n-gram occurs at least ``min_occurrences`` times corpus-wide (the
    substring-level dedup of Lee et al. 2021, "Deduplicating Training Data
    Makes Language Models Better" — suffix-array semantics at n-gram
    granularity: a repeated substring of length >= shingle_n is flagged,
    boundaries resolved to +/- shingle_n-1 tokens).

    Shape for 100 TB: three shuffles, all equi-partitioned and skew-free —
    (1) count n-gram hash occurrences (map-combinable aggregate on _h);
    (2) semi-join positions against the duplicated-hash set (equi-join on
    _h, reuses the aggregate's partitioning); (3) per-doc gaps-and-islands
    window merging overlapping hits into maximal spans.  No pair explosion:
    work is linear in token count + duplicated-hit count.

    ``cross_doc_only=True`` restricts to n-grams seen in >= 2 distinct
    documents (self-repetition within one doc is then not a duplicate).
    Output: (doc_id, span_start, span_end, span_tokens) with token-index
    bounds, one row per maximal duplicated span.
    """
    from pyspark.sql.window import Window

    h = shingle_hashes(
        df, id_col, text_col, shingle_n, with_pos=True, hash_fn=hash_fn
    ).filter(F.col("_h").isNotNull())
    counts = h.groupBy("_h").agg(
        F.count("*").alias("_c"), F.count_distinct("doc_id").alias("_d")
    )
    cond = (
        F.col("_d") >= 2 if cross_doc_only else F.col("_c") >= min_occurrences
    )
    hits = h.join(counts.filter(cond).select("_h"), "_h").select("doc_id", "_pos")
    w = Window.partitionBy("doc_id").orderBy("_pos")
    # hits at positions p, q (p < q) cover token intervals [p, p+n) and
    # [q, q+n): one contiguous duplicated region iff q - p <= n
    new_span = (
        F.lag("_pos").over(w).isNull()
        | (F.col("_pos") - F.lag("_pos").over(w) > shingle_n)
    ).cast("int")
    return (
        hits.select("doc_id", "_pos", new_span.alias("_new"))
        .select("doc_id", "_pos", F.sum("_new").over(w).alias("_isl"))
        .groupBy("doc_id", "_isl")
        .agg(
            F.min("_pos").alias("span_start"),
            (F.max("_pos") + F.lit(shingle_n - 1)).alias("span_end"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 8,
    keep: str = "first",
    hash_fn: str = "md5",
) -> DataFrame:
    """The *cut* step of substring-level dedup (Lee et al. 2021): rewrite each
    document with its duplicated spans removed, keeping one canonical
    occurrence of each repeated passage.

    Span occurrences are grouped by a content fingerprint (md5 of the covered
    token slice); within a group the lexicographically-first occurrence by
    (doc_id, span_start) survives (``keep="first"``) — a deterministic,
    engine-independent choice — or every occurrence is cut (``keep="none"``,
    the aggressive mode for boilerplate).  The rewrite operates on the
    NORMALIZED token stream (lowercased, whitespace-collapsed — the same
    stream the spans were detected on), so offsets always line up.

    Scale shape: spans per doc are few and disjoint (maximal islands), so the
    per-doc cut list is a bounded collect_list; the token rewrite is one
    higher-order array filter per row (JVM codegen, no explode of the corpus).
    Output: (doc_id, clean_text, n_tokens_removed).
    """
    from pyspark.sql.window import Window

    if keep not in ("first", "none"):
        raise ValueError("keep must be 'first' or 'none'")
    spans = duplicate_spans(df, id_col, text_col, shingle_n, hash_fn=hash_fn)
    toks_df = df.select(
        F.col(id_col).alias("doc_id"), tokens(normalize_text(text_col)).alias("_toks")
    )
    spans = spans.join(toks_df, "doc_id")
    if keep == "first":
        fp = F.md5(
            F.concat_ws(
                " ",
                F.slice(
                    "_toks",
                    F.col("span_start") + 1,
                    F.col("span_end") - F.col("span_start") + 1,
                ),
            )
        )
        w = Window.partitionBy("_fp").orderBy("doc_id", "span_start")
        spans = (
            spans.withColumn("_fp", fp)
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") > 1)
        )
    cuts = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_cuts")
    )
    out = toks_df.join(cuts, "doc_id", "left")
    covered = lambda s: F.exists(  # noqa: E731
        F.col("_cuts"),
        lambda c: (s["i"] >= c["span_start"]) & (s["i"] <= c["span_end"]),
    )
    kept = F.when(F.col("_cuts").isNull(), F.col("_toks")).otherwise(
        F.transform(
            F.filter(
                F.transform("_toks", lambda x, i: F.struct(x.alias("t"), i.alias("i"))),
                lambda s: ~covered(s),
            ),
            lambda s: s["t"],
        )
    )
    return out.select(
        "doc_id",
        F.concat_ws(" ", kept).alias("clean_text"),
        (F.size("_toks") - F.size(kept)).cast("int").alias("n_tokens_removed"),
    )


def _make_sig_partial_fn(
    params: list[tuple[int, int]], want_set: bool, n_extra: int
):
    """Build the ``mapInArrow`` partial-signature function: per PARTITION, a
    streaming group-by over the contiguous per-doc shingle runs, computing
    all k multiply-mod-min lanes vectorized in int64 numpy (and optionally
    the per-doc distinct shingle set via ``np.unique``).

    Contiguity holds by construction — every shingle row of a doc comes from
    exploding ONE input row, so a doc's rows are consecutive within one scan
    partition; runs spanning Arrow batch boundaries are merged by carrying
    the last open group across batches.  Duplicate doc ids (or ids split by
    upstream unions) are still merged EXACTLY by the JVM combine aggregate
    in ``_minhash_mins`` — this function only has to emit *partials*.

    Arithmetic is bit-identical to the former JVM lanes: a·h+b < 2^62 for
    h ∈ [0, P) (no int64 overflow), and numpy ``%`` on non-negative int64
    equals ``pmod``.  All-null runs (short docs) emit null lanes and an
    empty set, matching ``F.min``/``collect_list`` null semantics.
    """
    a_list = [a for a, _ in params]
    b_list = [b for _, b in params]

    def fn(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        a = np.array(a_list, dtype=np.int64).reshape(-1, 1)
        b = np.array(b_list, dtype=np.int64).reshape(-1, 1)
        k = len(a_list)
        big = np.int64((1 << 63) - 1)  # sentinel > any valid lane value
        p = np.int64(_P)
        out_schema = None
        pend = None  # open group carried across batches: (doc, extras, mins, sh)

        def one_row_batch(row):
            doc_v, extras_v, mins_v, sh_v = row
            arrs = [pa.array([doc_v], type=out_schema.field(0).type)]
            for j in range(n_extra):
                arrs.append(
                    pa.array([extras_v[j]], type=out_schema.field(1 + j).type)
                )
            for i in range(k):
                v = int(mins_v[i])
                arrs.append(pa.array([None if v == big else v], type=pa.int64()))
            if want_set:
                arrs.append(pa.array([sh_v], type=pa.list_(pa.int64())))
            return pa.RecordBatch.from_arrays(arrs, schema=out_schema)

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            if out_schema is None:
                fields = [batch.schema.field(0)]
                fields += [batch.schema.field(1 + j) for j in range(n_extra)]
                fields += [pa.field(f"_m{i}", pa.int64()) for i in range(k)]
                if want_set:
                    fields.append(pa.field("_shl", pa.list_(pa.int64())))
                out_schema = pa.schema(fields)
            doc = batch.column(0)
            extras = [batch.column(1 + j) for j in range(n_extra)]
            h = batch.column(1 + n_extra)
            null_mask = pc.is_null(h).to_numpy(zero_copy_only=False)
            any_null = bool(null_mask.any())
            hv = h.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            if n > 1:
                neq = pc.not_equal(doc.slice(1), doc.slice(0, n - 1))
                changes = np.flatnonzero(
                    neq.fill_null(True).to_numpy(zero_copy_only=False)
                )
                starts = np.concatenate(([0], changes + 1))
            else:
                starts = np.array([0])
            nseg = len(starts)
            lanes = (hv * a + b) % p  # (k, n)
            if any_null:
                lanes[:, null_mask] = big
            mins = np.minimum.reduceat(lanes, starts, axis=1)  # (k, nseg)
            # distinct shingle hashes per run, one vectorized pass: sort the
            # valid (run, hash) pairs, drop adjacent duplicates, and read the
            # per-run slices back through cumulative counts — sorted-distinct
            # per run with no per-doc python work
            h_k = offs = None
            if want_set:
                seg_ids = np.repeat(np.arange(nseg), np.diff(np.append(starts, n)))
                if any_null:
                    valid = ~null_mask
                    sid, hval = seg_ids[valid], hv[valid]
                else:
                    sid, hval = seg_ids, hv
                order = np.lexsort((hval, sid))
                sid_s, h_s = sid[order], hval[order]
                if len(sid_s):
                    keep = np.ones(len(sid_s), dtype=bool)
                    keep[1:] = (sid_s[1:] != sid_s[:-1]) | (h_s[1:] != h_s[:-1])
                    sid_k, h_k = sid_s[keep], h_s[keep]
                else:
                    sid_k, h_k = sid_s, h_s
                offs = np.concatenate(
                    ([0], np.cumsum(np.bincount(sid_k, minlength=nseg)))
                )
            first_doc = doc[0].as_py()
            lo = 0  # first segment index of the vectorized emission block
            if pend is not None:
                if first_doc == pend[0]:
                    merged = (
                        pend[0],
                        pend[1],
                        np.minimum(mins[:, 0], pend[2]),
                        np.union1d(h_k[offs[0] : offs[1]], pend[3])
                        if want_set
                        else None,
                    )
                    if nseg == 1:
                        pend = merged
                        continue
                    yield one_row_batch(merged)
                    lo = 1
                else:
                    yield one_row_batch(pend)
            pend = (
                doc[int(starts[-1])].as_py(),
                [ex[int(starts[-1])].as_py() for ex in extras],
                mins[:, -1].copy(),
                h_k[offs[nseg - 1] : offs[nseg]].copy() if want_set else None,
            )
            if lo >= nseg - 1:
                continue  # nothing left beyond the pend (and merged head)
            idx = pa.array(starts[lo : nseg - 1])
            arrs = [doc.take(idx)]
            for ex in extras:
                arrs.append(ex.take(idx))
            for i in range(k):
                col = mins[i, lo : nseg - 1]
                arrs.append(pa.array(col, mask=col == big))
            if want_set:
                base = offs[lo]
                arrs.append(
                    pa.ListArray.from_arrays(
                        np.asarray(offs[lo : nseg] - base, dtype=np.int32),
                        pa.array(h_k[base : offs[nseg - 1]], type=pa.int64()),
                    )
                )
            yield pa.RecordBatch.from_arrays(arrs, schema=out_schema)
        if pend is not None:
            yield one_row_batch(pend)

    return fn


def _minhash_mins(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    shingle_n: int,
    with_shingle_set: bool = False,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Per-doc k permutation minima (columns _m0.._m{k-1}) and optionally the
    distinct shingle-hash set (column _sh).

    Shape (r14): the k multiply-mod-min lanes run VECTORIZED in int64 numpy
    inside a ``mapInArrow`` partial over the contiguous per-doc shingle runs
    (guide §4.2 — the 64 per-row aggregate-expression updates were the
    measured floor of every minhash query: 64 codegen update calls per
    shingle row vs k fused numpy passes per batch).  Only (doc_id, _h) —
    16 bytes/row — cross the Python boundary, and the partial collapses each
    doc to ONE row before the exchange, so the shuffle volume is unchanged
    from the previous all-JVM partial aggregate.  A JVM combine aggregate
    (min per lane, set-union) then merges partials, which keeps groupBy
    semantics exact for duplicate ids and null runs.  Lane values are
    bit-identical (int64 arithmetic, no overflow: a·h+b < 2^62; numpy ``%``
    == pmod on non-negative operands); the only representational change is
    ``_sh``'s in-array ORDER (np.unique sorts ascending where collect_list
    kept first-occurrence order) — every consumer is order-insensitive
    (sizes, array_intersect), so query values are unchanged.

    ``passthrough``: per-document constant columns (e.g. a batch tag) carried
    through the shingle explode and into the group key — lets callers run ONE
    pipeline over a union of batches instead of one scan+aggregate per batch
    (the incremental-dedup merge, r13).
    """
    params = _minhash_params(k)
    extra = list(passthrough or [])
    hashed = shingle_hashes(df, id_col, text_col, shingle_n, passthrough=extra)
    from pyspark.sql import types as T

    fields = [hashed.schema["doc_id"]]
    fields += [hashed.schema[c] for c in extra]
    fields += [T.StructField(f"_m{i}", T.LongType()) for i in range(k)]
    if with_shingle_set:
        fields.append(T.StructField("_shl", T.ArrayType(T.LongType())))
    partial = hashed.mapInArrow(
        _make_sig_partial_fn(params, with_shingle_set, len(extra)),
        T.StructType(fields),
    )
    aggs = [F.min(f"_m{i}").alias(f"_m{i}") for i in range(k)]
    if with_shingle_set:
        # combine of per-partition partial sets; one partial per doc in the
        # common (unique-id) case, so flatten+distinct touches tiny input
        aggs.append(
            F.array_distinct(F.flatten(F.collect_list("_shl"))).alias("_sh")
        )
    return partial.groupBy("doc_id", *extra).agg(*aggs)


def _banded(per_doc: DataFrame, bands: int, r: int) -> DataFrame:
    """Explode k minima columns into the LSH banding table
    (doc_id, band_id, band_hash) — r minima hashed per band."""
    return per_doc.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band_id"),
                        F.hash(*[F.col(f"_m{bi * r + j}") for j in range(r)]).alias("band_hash"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_hash")


def band_hashes(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = _K_DEFAULT,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document LSH band hashes (doc_id, band_id, band_hash): two docs are
    near-dup CANDIDATES iff they share any (band_id, band_hash) row.  The unit
    of the banding equi-join in ``minhash_lsh_pairs``, exposed for incremental
    use — a persisted band-hash table IS the streaming dedup index."""
    assert k % bands == 0
    return _banded(_minhash_mins(df, id_col, text_col, k, shingle_n), bands, k // bands)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = _K_DEFAULT,
    bands: int = 16,
    threshold: float = 0.5,
    verify: bool = True,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH banding, optionally verified exactly.

    rows-per-band r = k/bands; candidate pairs share at least one band hash.
    The banding is an equi-join on (band_id, band_hash) — pure shuffle join,
    no global cross product.  With verify=True candidates are re-checked with
    the exact Jaccard over the distinct shingle-hash sets (set-identical to
    string shingles modulo 64-bit hash collisions).

    Plan shape: ONE aggregate computes both the k permutation minima and the
    shingle set per doc; that per-doc table (~1 KB/doc) is persisted and
    reused by the banding explode and both sides of the verify join — the
    expensive token pipeline runs exactly once over the corpus.
    """
    assert k % bands == 0
    r = k // bands
    per_doc = _minhash_mins(
        df, id_col, text_col, k, shingle_n, with_shingle_set=verify
    )
    if verify:
        # materialized: the persisted per-doc relation feeds the banding
        # self-join AND both verify joins — forcing it now makes the join
        # strategies stats-driven (see cache.materialized; at sf100 the
        # width-scaled estimate broadcast a multi-GB build side)
        per_doc = materialized(per_doc.transform(scoped_persist_corpus))
    banded = _banded(per_doc, bands, r)
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    if not verify:
        return cand
    sets = per_doc.select("doc_id", "_sh")
    jac = _jac_sets("_sh_a", "_sh_b")
    return (
        cand.join(sets.select(F.col("doc_id").alias("a_id"), F.col("_sh").alias("_sh_a")), "a_id")
        .join(sets.select(F.col("doc_id").alias("b_id"), F.col("_sh").alias("_sh_b")), "b_id")
        .filter(jac >= F.lit(threshold))
        .select("a_id", "b_id", F.round(jac, 4).alias("jac"))
    )


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash fingerprint per document — entirely JVM-side.

    Pipeline: distinct whitespace tokens of the normalized text are exploded
    (``explode_outer`` keeps empty docs, which fingerprint to 0), each token is
    hashed to 64 bits via the first 16 hex digits of its md5 (md5 — unlike
    xxhash64 — is a hash DuckDB shares, so the oracle recomputes fingerprints
    bit-exactly), and the classic ±1 votes per bit position are 64 conditional
    SUM aggregates over the token rows.  Everything is whole-stage codegen:
    one map-side-combinable shuffle, one 64-slot row per document out of the
    map side regardless of document length — the same 100 TB-safe shape as the
    MinHash pipeline.  Bit 63 re-enters the int64 as the sign bit.
    """
    toks = F.array_distinct(
        F.filter(tokens(normalize_text(text_col)), lambda t: t != F.lit(""))
    )
    rows = df.select(F.col(id_col).alias("doc_id"), F.explode_outer(toks).alias("_tok"))
    h = F.md5("_tok")
    # hex digit values of the first 16 md5 nibbles = 64 deterministic bits
    digits = [F.conv(F.substring(h, i + 1, 1), 16, 10).cast("int") for i in range(16)]
    votes = []
    for b in range(64):
        d, j = digits[b // 4], 3 - (b % 4)  # MSB-first within each nibble
        bit = F.shiftright(d, j).bitwiseAND(F.lit(1))
        # null token (empty doc) → null bit → otherwise(-1): votes all -1 → 0
        votes.append(F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"_v{b}"))
    agg = rows.groupBy("doc_id").agg(*votes)
    val = F.lit(0).cast("long")
    for b in range(63):
        val = val + F.when(F.col(f"_v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    val = val + F.when(
        F.col("_v63") > 0, F.lit(-(1 << 63)).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    return agg.select("doc_id", val.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    max_candidate_pairs: int = 250_000_000,
) -> DataFrame:
    """Near-duplicate pairs at Hamming distance ≤ ``max_hamming`` over the
    64-bit SimHash fingerprints — EXACT w.r.t. the fingerprints (recall 1.0)
    via pigeonhole chunk blocking (Manku, Jain & Sarma, WWW'07): split the
    64 bits into ``max_hamming + 1`` chunks; a pair within Hamming k must
    agree EXACTLY on at least one chunk, so an equi-join on
    (chunk_index, chunk_value) finds every qualifying pair, verified by
    ``bit_count(a XOR b) <= k``.

    Scale shape: one fingerprint aggregate (the ``simhash`` operator's
    map-combinable shuffle), then a (k+1)-way fan-out to narrow
    (int, int64) keys — for random-ish fingerprints a 16-bit chunk block
    holds ~n/65536 docs, so candidates stay near-linear.  Degenerate
    fingerprint mass (e.g. many empty docs → simhash 0 agreeing on every
    chunk) is caught by the same up-front candidate estimate the other
    blocking operators use, refusing past ``max_candidate_pairs``.

    Output: (a_id, b_id, hamming) with a_id < b_id.
    """
    k = max_hamming
    if not 0 <= k <= 15:
        raise ValueError(f"max_hamming must be in [0, 15], got {k}")
    n_chunks = k + 1
    width = 64 // n_chunks
    sh = simhash(df, id_col, text_col)
    chunks = []
    for i in range(n_chunks):
        lo = i * width
        w = 64 - lo if i == n_chunks - 1 else width
        if w == 64:
            # k=0: the single chunk is the whole fingerprint — (1 << 64) - 1
            # overflows LongType, and no shift/mask is needed anyway
            v = F.col("simhash")
        else:
            v = F.shiftrightunsigned("simhash", lo).bitwiseAND(F.lit((1 << w) - 1))
        chunks.append(F.struct(F.lit(i).alias("i"), v.alias("v")))
    # persist: the 64-vote fingerprint aggregate feeds the estimate collect
    # AND both sides of the self-join — without this it is computed 3×
    keys = sh.select(
        "doc_id", "simhash", F.explode(F.array(*chunks)).alias("_c")
    ).transform(scoped_persist_corpus)
    est = (
        keys.groupBy("_c")
        .agg(F.count("*").alias("n"))
        .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("c"))
        .collect()[0]["c"]
    )
    if est is not None and est > max_candidate_pairs:
        raise ValueError(
            f"simhash_pairs: chunk blocking leaves ~{est:.2e} candidate pairs "
            f"(> {max_candidate_pairs:.0e}) — the fingerprint distribution is "
            "degenerate (mass-identical fingerprints, e.g. empty or boilerplate "
            "docs). Exact-dedup identical fingerprints first."
        )
    left = keys.select(
        F.col("doc_id").alias("a_id"), F.col("simhash").alias("_a"), "_c"
    )
    right = keys.select(
        F.col("doc_id").alias("b_id"), F.col("simhash").alias("_b"), "_c"
    )
    ham = F.bit_count(F.col("_a").bitwiseXOR(F.col("_b"))).cast("int")
    return (
        left.join(right, "_c")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(ham <= F.lit(k))
        .select("a_id", "b_id", ham.alias("hamming"))
        .dropDuplicates(["a_id", "b_id"])
    )


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 1,
    band_width: int = 8,
    max_candidate_pairs: int = 250_000_000,
) -> DataFrame:
    """Exact edit-distance self-join — the record-linkage primitive: every
    pair with ``levenshtein(a, b) <= max_dist``, recall 1.0.

    Blocking is the LOSSLESS length band: qualifying pairs differ in length
    by at most ``max_dist``, so with ``band_width > max_dist`` they lie in
    the same or adjacent ``len // band_width`` band — the left side probes
    {b-1, b, b+1} and the right keeps its own band, so each qualifying pair
    survives in exactly one probe cell (the roles-swapped duplicate dies on
    the ``a_id < b_id`` filter).  Output: (a_id, b_id, dist).

    Scale posture — two lossless blocking strategies, chosen from the data:

    1. LENGTH BANDS (cheap, wins when lengths vary): qualifying pairs lie in
       the same or adjacent ``len // band_width`` band, so the left side
       probes {b-1, b, b+1}.  Candidate volume is O(n²/bands); the operator
       counts rows per band up front (one tiny aggregate) and switches
       strategy past ``max_candidate_pairs``.
    2. DELETION NEIGHBORHOOD (uniform-length fallback, ``max_dist <= 2``):
       if ``ed(a, b) <= k`` then ``a`` and ``b`` share a variant obtained by
       deleting at most ``k`` characters from each (Mor & Fraenkel's
       deletion-only dictionary, the SymSpell scheme) — so an equi-join on
       the ``xxhash64`` of deletion-variant keys has recall 1.0 regardless
       of the length distribution.  For ``max_dist=1`` the keys are
       POSITION-TAGGED: an ed-1 substitution pair shares the key
       ``(i, del_i)`` for exactly the substituted position, and an indel
       pair matches the shorter string's identity against one deletion of
       the longer (an asymmetric leg), so blocks stay tight even on dense
       sequential keys (zero-padded IDs), where the unconstrained
       ``Del1 × Del1`` join admits every shift-by-one pair (measured at
       sf10: ~1.1e10 candidates unconstrained vs ~6e7 — essentially the
       true pair count — positional).  Each row fans out to O(len) narrow
       int64 keys; hash collisions only add candidates, which the exact
       ``levenshtein`` verification removes.  ``max_dist=2`` uses the
       unconstrained ≤2-deletion neighborhood (correct, looser blocks).

    If the deletion blocks are THEMSELVES degenerate (mass-identical
    strings — every copy shares every variant) the operator still REFUSES
    loudly past ``max_candidate_pairs`` instead of scheduling an unbounded
    quadratic join — same posture as the block-matmul guard in
    ``operators/similarity.py``.  Exact-dedup identical strings first
    (``exact_dedup``), or generate candidates with ``minhash_lsh_pairs``
    over character shingles and verify with ``F.levenshtein``.
    """
    if band_width <= max_dist:
        raise ValueError(f"band_width must exceed max_dist, got {band_width} <= {max_dist}")
    base = df.select(
        F.col(id_col),
        F.col(text_col).alias("_s"),
        F.floor(F.length(text_col) / F.lit(band_width)).cast("int").alias("_band"),
    )
    hist = {
        r["_band"]: r["n"]
        for r in base.groupBy("_band").agg(F.count("*").alias("n")).collect()
    }
    est = sum(
        n * (n + hist.get(b + 1, 0) + hist.get(b - 1, 0)) for b, n in hist.items()
    )
    n_rows = sum(hist.values())
    # strategy switch: the band join verifies `est` pairs with no fan-out;
    # the deletion join fans each row out to ~2*len keys but its blocks are
    # near-duplicate-tight.  Past ~50 verified pairs per input row the
    # fan-out is the cheaper trade (and past max_candidate_pairs the band
    # join is refused outright).
    band_feasible = est <= max_candidate_pairs
    band_ok = band_feasible and (est <= 50 * n_rows or max_dist > 2)

    def _band_join() -> DataFrame:
        left = base.select(
            F.col(id_col).alias("a_id"),
            F.col("_s").alias("_a"),
            F.explode(
                F.array(*[(F.col("_band") + F.lit(d)).alias("_band") for d in (-1, 0, 1)])
            ).alias("_band"),
        )
        right = base.select(F.col(id_col).alias("b_id"), F.col("_s").alias("_b"), "_band")
        return (
            left.join(right, "_band")
            .filter(F.col("a_id") < F.col("b_id"))
            .filter(F.abs(F.length("_a") - F.length("_b")) <= F.lit(max_dist))
            .filter(F.levenshtein("_a", "_b") <= F.lit(max_dist))
            .select("a_id", "b_id", F.levenshtein("_a", "_b").alias("dist"))
        )

    if band_ok:
        return _band_join()
    if max_dist > 2:
        # est > max_candidate_pairs here (band_ok covers the small-est case)
        raise ValueError(
            f"edit_distance_pairs: length-band blocking leaves ~{est:.2e} candidate "
            f"pairs (> {max_candidate_pairs:.0e}) and the deletion-neighborhood "
            f"fallback only supports max_dist <= 2 (got {max_dist}). Generate "
            "candidates with minhash_lsh_pairs over character shingles and verify "
            "those with F.levenshtein instead."
        )
    if max_dist == 1:
        lkeys, rkeys = _positional_del1_keys("_s")
    else:
        lkeys = rkeys = _deletion_variants("_s", max_dist)
    left = base.select(
        F.col(id_col).alias("_x_id"),
        F.col("_s").alias("_x"),
        F.explode(lkeys).alias("_k"),
    ).withColumn("_k", F.xxhash64("_k"))
    right = base.select(
        F.col(id_col).alias("_y_id"),
        F.col("_s").alias("_y"),
        F.explode(rkeys).alias("_k"),
    ).withColumn("_k", F.xxhash64("_k"))
    nl = left.groupBy("_k").agg(F.count("*").alias("nl"))
    nr = right.groupBy("_k").agg(F.count("*").alias("nr"))
    # sum(nl*nr) counts each left key row matching its own right-side twin
    # (rkeys is a superset of lkeys); subtract sum(nl) to estimate only
    # cross-row candidates
    cand = (
        nl.join(nr, "_k")
        .agg((F.sum(F.col("nl") * F.col("nr")) - F.sum("nl")).alias("c"))
        .collect()[0]["c"]
    )
    if cand is not None and cand > max_candidate_pairs:
        # the deletion neighborhood can be the worse trade (mass-identical
        # strings share EVERY variant key) — if the band join stayed under
        # the cap, take it rather than refuse an input it handles
        if band_feasible:
            return _band_join()
        raise ValueError(
            f"edit_distance_pairs: deletion-neighborhood blocking still leaves "
            f"~{cand:.2e} candidate pairs (> {max_candidate_pairs:.0e}) — the input "
            "is dominated by identical or deletion-adjacent strings. Run exact_dedup "
            "first, or generate candidates with minhash_lsh_pairs over character "
            "shingles and verify those with F.levenshtein instead."
        )
    return (
        left.join(right, "_k")
        .filter(F.col("_x_id") != F.col("_y_id"))
        .filter(F.abs(F.length("_x") - F.length("_y")) <= F.lit(max_dist))
        .filter(F.levenshtein("_x", "_y") <= F.lit(max_dist))
        .select(
            F.least("_x_id", "_y_id").alias("a_id"),
            F.greatest("_x_id", "_y_id").alias("b_id"),
            F.levenshtein("_x", "_y").alias("dist"),
        )
        .dropDuplicates(["a_id", "b_id"])
    )


def _positional_del1_keys(col: str):
    """(left, right) blocking-key arrays for the ed<=1 join.

    S-family (both sides): ``S:<i>:<del_i(s)>`` — equal-length pairs with a
    single substitution at position i share exactly that key.  I-family:
    identity ``I:<s>`` on BOTH sides, single deletions ``I:<del_i(s)>`` on
    the RIGHT side only — an indel pair matches the shorter string's
    identity (left) against the longer string's deletion (right), and exact
    duplicates match identity-identity; keeping deletions off the left side
    is what blocks the delete-different-position (ed=2) pair explosion."""
    c = F.col(col)
    sub_keys = F.when(
        F.length(c) > 0,
        F.transform(
            F.sequence(F.lit(1), F.length(c)),
            lambda i: F.concat_ws(
                ":",
                F.lit("S"),
                i.cast("string"),
                F.concat(F.substr(c, F.lit(1), i - F.lit(1)), F.substr(c, i + F.lit(1))),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ident = F.array(F.concat(F.lit("I:"), c))
    del_keys = F.when(
        F.length(c) > 0,
        F.transform(
            F.sequence(F.lit(1), F.length(c)),
            lambda i: F.concat(
                F.lit("I:"),
                F.substr(c, F.lit(1), i - F.lit(1)),
                F.substr(c, i + F.lit(1)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    lkeys = F.array_union(ident, sub_keys)
    rkeys = F.array_union(lkeys, del_keys)
    return lkeys, rkeys


def _deletion_variants(col: str, k: int):
    """Array of all strings reachable from ``col`` by deleting at most ``k``
    characters (including the string itself), as a JVM-side expression —
    the blocking keys of the deletion-neighborhood strategy."""

    def del1(c):
        return F.when(
            F.length(c) > 0,
            F.transform(
                F.sequence(F.lit(1), F.length(c)),
                lambda i: F.concat(
                    F.substr(c, F.lit(1), i - F.lit(1)), F.substr(c, i + F.lit(1))
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    out = F.array(F.col(col))
    frontier = del1(F.col(col))
    for _ in range(k):
        out = F.array_union(out, frontier)
        frontier = F.array_distinct(F.flatten(F.transform(frontier, del1)))
    return F.array_distinct(out)


def jaccard_pairs_prefix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.9,
    shingle_n: int = 1,
    max_candidate_pairs: int = 250_000_000,
) -> DataFrame:
    """EXACT all-pairs word-set Jaccard ≥ ``threshold`` via prefix filtering
    (the All-Pairs/PPJoin candidate rule, Bayardo et al. WWW'07 / Xiao et
    al. WWW'08) — recall 1.0 with NO blocking assumptions, the lossless
    big-corpus alternative to ``jaccard_pairs_blocked``'s semantic blocks.

    Principle: order every document's token set by ascending global
    frequency (rarest first, ties on the token string); if
    jaccard(a, b) ≥ t, the two sets must overlap within their PREFIXES of
    length ``|d| - ceil(t·|d|) + 1`` — so an equi-join on prefix tokens
    finds every qualifying pair.  Prefixes are short (|d|·(1−t) + 1 ≈ 10%
    of tokens at t=0.9) and made of the RAREST tokens, so candidate lists
    per join key are tiny by construction — the frequent-token hot keys
    that blow up a naive token inverted-list join never enter the index.

    ``shingle_n`` picks the set elements (word n-grams): prefix filtering
    needs element frequencies with a long rare tail — on a tiny closed
    vocabulary (this corpus: 31 distinct WORDS) every "rare" word is still
    frequent and word-level prefixes prune nothing, while the 3-gram
    shingle space (16k+ distinct) restores the rare-first prefix property.
    Pick the shingle order so the element space outnumbers the corpus.

    Plan shape: one vocabulary aggregate (map-combinable, vocab-bounded),
    one shuffle join token→frequency, one per-doc rank window, a prefix
    equi-join on (token) and an exact verify on the full sets.  Everything
    shuffles on narrow keys; the same up-front candidate estimate the other
    blocking operators use refuses degenerate corpora loudly.

    Output: (a_id, b_id, jac) with a_id < b_id, jac rounded to 4 — same
    contract as ``jaccard_pairs_blocked``.
    """
    from pyspark.sql.window import Window

    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    # persisted: the shingle relation feeds the token explode AND both verify
    # sides (3 evaluations un-persisted — measured 77 s vs 30 s at sf10);
    # same discipline as the MinHash per-doc shingle table
    sets = df.select(
        F.col(id_col).alias("_id"), word_shingles(text_col, shingle_n).alias("_sh")
    ).filter(F.size("_sh") > 0).transform(scoped_persist_corpus)
    tok = sets.select(
        "_id", F.size("_sh").alias("_sz"), F.explode("_sh").alias("_tok")
    )
    freq = tok.groupBy("_tok").agg(F.count("*").alias("_df"))
    # build-side pin: freq is vocab-bounded (distinct elements), tok is
    # occurrence-volume — un-hinted, post-shuffle stats have picked the 5e7-row
    # occurrence side as the hash build and died on memory at sf10
    ranked = tok.join(freq.hint("shuffle_hash"), "_tok").withColumn(
        "_pos",
        F.row_number().over(
            Window.partitionBy("_id").orderBy(F.asc("_df"), F.asc("_tok"))
        ),
    )
    # prefix length: |d| - ceil(t*|d|) + 1  (FP-guarded ceil: see _iceil)
    pref_len = F.col("_sz") - _iceil(F.lit(threshold) * F.col("_sz")).cast(
        "int"
    ) + F.lit(1)
    # persisted: the estimate collect below materializes the prefix index,
    # and the candidate self-join then reads it twice from cache instead of
    # re-running the explode+join+rank chain per side
    prefix = (
        ranked.filter(F.col("_pos") <= pref_len).select("_id", "_tok", "_sz").transform(scoped_persist_corpus)
    )
    est = (
        prefix.groupBy("_tok")
        .agg(F.count("*").alias("n"))
        .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("c"))
        .collect()[0]["c"]
    )
    if est is not None and est > max_candidate_pairs:
        raise ValueError(
            f"jaccard_pairs_prefix: prefix join leaves ~{est:.2e} candidate pairs "
            f"(> {max_candidate_pairs:.0e}) — rare-token prefixes are degenerate "
            "(mass-duplicate documents). Run exact_dedup first."
        )
    # size filter folded into the candidate join: jaccard >= t requires
    # t*|a| <= |b| <= |a|/t
    cand = (
        prefix.select(F.col("_id").alias("a_id"), "_tok", F.col("_sz").alias("_sza"))
        .join(
            prefix.select(
                F.col("_id").alias("b_id"), "_tok", F.col("_sz").alias("_szb")
            ),
            "_tok",
        )
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(
            (F.col("_szb") >= _iceil(F.lit(threshold) * F.col("_sza")))
            & (F.col("_szb") <= _ifloor(F.col("_sza") / F.lit(threshold)))
        )
        .select("a_id", "b_id")
        .distinct()
    )
    jac = _jac_sets("_sh_a", "_sh_b")
    # the verify filter is on the RAW jaccard (rounding only the output):
    # candidate generation guarantees recall for true jac >= t, so a filter
    # on round(jac, 4) would admit pairs in [t - 5e-5, t) only when they
    # happen to share a prefix token — a nondeterministic contract
    return (
        cand.join(
            sets.select(F.col("_id").alias("a_id"), F.col("_sh").alias("_sh_a")),
            "a_id",
        )
        .join(
            sets.select(F.col("_id").alias("b_id"), F.col("_sh").alias("_sh_b")),
            "b_id",
        )
        .filter(jac >= F.lit(threshold))
        .select("a_id", "b_id", F.round(jac, 4).alias("jac"))
    )


def containment_pairs_prefix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.9,
    shingle_n: int = 3,
    max_candidate_pairs: int = 250_000_000,
) -> DataFrame:
    """EXACT directional containment join: all pairs (a, b), a != b, with
    ``|sh(a) ∩ sh(b)| / |sh(a)| >= threshold`` — "document a is (mostly)
    contained in document b".  The asymmetric cousin of
    ``jaccard_pairs_prefix`` for the quote/excerpt/boilerplate-inclusion
    dedup case Jaccard misses: a short doc pasted inside a much longer one
    has low Jaccard (the union is large) but containment ≈ 1.

    Candidate rule (the asymmetric variant of the All-Pairs prefix filter):
    order every set rarest-token-first by global frequency; containment ≥ t
    forces an overlap of ``ceil(t·|a|)`` elements, so a's PREFIX of length
    ``|a| - ceil(t·|a|) + 1`` must intersect sh(b).  Because only the
    probe side (a) knows |a|, the index side (b) cannot be prefix-pruned —
    the b side indexes its FULL shingle set.  That stays bounded anyway:
    candidate volume per token is n_prefix(token) · n_full(token), and
    frequent tokens almost never appear in rare-first prefixes, so the hot
    keys of a naive inverted-list join contribute ≈ 0 candidates.  The same
    up-front estimate as the Jaccard variant refuses degenerate corpora
    loudly (run ``exact_duplicates`` first — identical texts trivially
    contain each other and multiply every posting).

    Size filter folded into the candidate join: |b| ≥ ceil(t·|a|) (the
    intersection can be no larger than |b|); containment has NO upper size
    bound, unlike Jaccard.

    Output: (a_id, b_id, containment) with a_id != b_id — directional, so a
    mutual near-dup appears in both directions.  Filter is on the raw
    value, output rounded to 4 (house contract).
    """
    from pyspark.sql.window import Window

    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    sets = df.select(
        F.col(id_col).alias("_id"), word_shingles(text_col, shingle_n).alias("_sh")
    ).filter(F.size("_sh") > 0).transform(scoped_persist_corpus)
    tok = sets.select(
        "_id", F.size("_sh").alias("_sz"), F.explode("_sh").alias("_tok")
    )
    freq = tok.groupBy("_tok").agg(F.count("*").alias("_df"))
    # build-side pin: freq is vocab-bounded, tok is occurrence-volume (same
    # measured trap as jaccard_pairs_prefix — see its comment).
    # ``ranked`` is persisted, not just the prefix slice: unlike the Jaccard
    # variant the INDEX side here needs positions too (for the positional
    # filter below), and un-persisted the 26M-row rank window re-ran for the
    # candidate join's b side — measured 88 s vs 59 s at sf10.
    ranked = (
        tok.join(freq.hint("shuffle_hash"), "_tok")
        .withColumn(
            "_pos",
            F.row_number().over(
                Window.partitionBy("_id").orderBy(F.asc("_df"), F.asc("_tok"))
            ),
        )
        .select("_id", "_tok", "_sz", "_pos")
        .transform(scoped_persist_corpus)
    )
    pref_len = F.col("_sz") - _iceil(F.lit(threshold) * F.col("_sz")).cast(
        "int"
    ) + F.lit(1)
    # probe side: prefix postings only.  The index side's per-token posting
    # count is exactly ``freq`` (shingle sets are distinct), so the refusal
    # estimate costs one tiny vocab join.
    prefix = ranked.filter(F.col("_pos") <= pref_len)
    est = (
        prefix.groupBy("_tok")
        .agg(F.count("*").alias("na"))
        .join(freq, "_tok")
        .agg(F.sum(F.col("na") * F.col("_df")).alias("c"))
        .collect()[0]["c"]
    )
    if est is not None and est > max_candidate_pairs:
        raise ValueError(
            f"containment_pairs_prefix: prefix-vs-full join leaves ~{est:.2e} "
            f"candidate pairs (> {max_candidate_pairs:.0e}) — rare-token prefixes "
            "are degenerate (mass-duplicate documents). Run exact_dedup first."
        )
    # positional filter (the PPJoin tightening, lossless by the first-shared-
    # token argument: for the earliest shared token in the global rare-first
    # order, every other shared token sits after it in BOTH orderings, so
    # overlap <= 1 + min(|a|-pa, |b|-pb) — a qualifying pair always survives
    # on that row, and distinct() keeps the pair if any row passes).
    # At sf10 the un-filtered prefix-vs-full join left 8.1M candidates whose
    # verify cost 31 s; with this filter + the ranked persist the whole
    # query is 59 s vs 66 s (setup dominates: the shingle explode + rank
    # window over 26M postings is the floor both variants share).
    req = _iceil(F.lit(threshold) * F.col("_sza"))
    cand = (
        prefix.select(
            F.col("_id").alias("a_id"),
            "_tok",
            F.col("_sz").alias("_sza"),
            F.col("_pos").alias("_pa"),
        )
        .join(
            ranked.select(
                F.col("_id").alias("b_id"),
                "_tok",
                F.col("_sz").alias("_szb"),
                F.col("_pos").alias("_pb"),
            ),
            "_tok",
        )
        .filter(F.col("a_id") != F.col("b_id"))
        .filter(F.col("_szb") >= req)
        .filter(
            F.lit(1)
            + F.least(
                F.col("_sza") - F.col("_pa"), F.col("_szb") - F.col("_pb")
            )
            >= req
        )
        .select("a_id", "b_id")
        .distinct()
    )
    cont = (
        F.size(F.array_intersect("_sh_a", "_sh_b")).cast("double")
        / F.size("_sh_a").cast("double")
    )
    return (
        cand.join(
            sets.select(F.col("_id").alias("a_id"), F.col("_sh").alias("_sh_a")),
            "a_id",
        )
        .join(
            sets.select(F.col("_id").alias("b_id"), F.col("_sh").alias("_sh_b")),
            "b_id",
        )
        .filter(cont >= F.lit(threshold))
        .select("a_id", "b_id", F.round(cont, 4).alias("containment"))
    )


def minhash_lsh_pairs_incremental(
    old_df: DataFrame,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = _K_DEFAULT,
    bands: int = 16,
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-dup pairs TOUCHING THE NEW BATCH ONLY — the incremental form of
    ``minhash_lsh_pairs`` for the daily-increment pipeline: when a crawl
    increment lands, only new-vs-corpus and new-vs-new pairs need discovery;
    re-banding the 100 TB corpus against itself every day is the O(N) work
    the incremental contract exists to avoid.

    A doc's band signature depends only on its own text, so incremental and
    full-corpus runs agree exactly: ``pairs(old ∪ new) = pairs(old) ∪
    incremental(old, new)`` (differential-tested on random corpora).  In
    production ``old_df``'s banding table IS the stored index (the batch
    mirror of ``streaming.dedup.make_near_dedup_batch_fn``'s parquet band
    index); here it is recomputed from the old corpus, which keeps the
    operator a pure function of its inputs.

    Output: (a_id, b_id, jac) with ``a_id`` ALWAYS a new-batch doc; ``b_id``
    is an old doc, or a new doc with a_id < b_id.  Exact-verify is always on
    (the candidate rule is probabilistic; the emitted contract is not).
    Filter is on the RAW jaccard, output rounded to 4 (house contract —
    see jaccard_pairs_prefix's verify comment).

    A doc_id present in BOTH batches is taken from ``new_df`` (re-crawl
    refresh semantics): the old copy is anti-joined away up front —
    otherwise its band hashes collide with its own new row (self-pairs) and
    every real pair verifies against two shingle rows (duplicate outputs).
    """
    assert k % bands == 0
    r = k // bands
    old_only = old_df.join(
        new_df.select(F.col(id_col)).distinct(), id_col, "left_anti"
    )
    # ONE scan + ONE shingle pipeline + ONE aggregate over the tagged union
    # of both batches (r13) — the previous shape ran the full signature
    # pipeline twice (old side, new side), scanning the same storage twice
    # and paying the k-min aggregate's fixed costs twice.  The batch tag
    # rides the shingle explode as a per-doc constant (ids are disjoint
    # after the anti-join, so grouping on (doc_id, tag) == doc_id).
    tagged = old_only.select(
        F.col(id_col), F.col(text_col), F.lit(False).alias("_is_new")
    ).unionByName(
        new_df.select(F.col(id_col), F.col(text_col), F.lit(True).alias("_is_new"))
    )
    per_all = _minhash_mins(
        tagged,
        id_col,
        text_col,
        k,
        shingle_n,
        with_shingle_set=True,
        passthrough=["_is_new"],
    ).transform(scoped_persist_corpus)
    per_all = materialized(per_all)
    per_old = per_all.where(~F.col("_is_new")).drop("_is_new")
    per_new = per_all.where(F.col("_is_new")).drop("_is_new")
    banded_old = _banded(per_old, bands, r)
    banded_new = _banded(per_new, bands, r)
    return _new_touching_pairs(
        banded_new,
        banded_old,
        per_new.select("doc_id", "_sh"),
        per_old.select("doc_id", "_sh"),
        threshold,
    )


def _new_touching_pairs(
    banded_new: DataFrame,
    banded_old: DataFrame,
    new_sets: DataFrame,
    old_sets: DataFrame,
    threshold: float,
) -> DataFrame:
    """Candidate generation + exact verify for the incremental contract:
    new-vs-old (banding equi-join against the old table) plus new-vs-new
    (a_id < b_id), NEVER old-vs-old.  Shared by the recompute path
    (``minhash_lsh_pairs_incremental``) and the stored-index path
    (``minhash_lsh_pairs_indexed``) so the two are the same plan modulo
    where the old side's rows come from."""
    n = banded_new.alias("n")
    o = banded_old.alias("o")
    m = banded_new.alias("m")
    cand_no = (
        n.join(
            o,
            (F.col("n.band_id") == F.col("o.band_id"))
            & (F.col("n.band_hash") == F.col("o.band_hash")),
        )
        .select(F.col("n.doc_id").alias("a_id"), F.col("o.doc_id").alias("b_id"))
    )
    cand_nn = (
        n.join(
            m,
            (F.col("n.band_id") == F.col("m.band_id"))
            & (F.col("n.band_hash") == F.col("m.band_hash"))
            & (F.col("n.doc_id") < F.col("m.doc_id")),
        )
        .select(F.col("n.doc_id").alias("a_id"), F.col("m.doc_id").alias("b_id"))
    )
    cand = cand_no.union(cand_nn).distinct()
    sets = new_sets.union(old_sets)
    jac = _jac_sets("_sh_a", "_sh_b")
    return (
        cand.join(
            new_sets.select(F.col("doc_id").alias("a_id"), F.col("_sh").alias("_sh_a")),
            "a_id",
        )
        .join(sets.select(F.col("doc_id").alias("b_id"), F.col("_sh").alias("_sh_b")), "b_id")
        .filter(jac >= F.lit(threshold))
        .select("a_id", "b_id", F.round(jac, 4).alias("jac"))
    )


def save_minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    k: int = _K_DEFAULT,
    bands: int = 16,
    shingle_n: int = 3,
    mode: str = "overwrite",
) -> None:
    """Materialize the corpus's LSH index as parquet — the STORED form of
    the daily-increment pipeline's old side, so each increment run reads
    the index instead of re-computing 100 TB of signatures (the docstring
    contract ``minhash_lsh_pairs_incremental`` previously only gestured at;
    measured same-window at sf10: recompute 25.4 s → indexed 8.1 s, build
    22.2 s one-time — the old-side shingle explode + window + k-min
    aggregate over 450k docs disappears from every future increment;
    PERF.md r6).

    Layout under ``path``:
    - ``bands/``    (doc_id, band_hash) hive-partitioned by band_id — the
      equi-join side; partition pruning applies if a reader restricts bands.
    - ``shingles/`` (doc_id, _sh array<long>) — the exact-verify side.
    - ``params/``   one row (k, bands, shingle_n) — the signature contract;
      readers refuse on mismatch rather than silently joining
      incompatible hashes.

    Write ordering is COMMIT-LAST: bands and shingles land first, the
    params row (whose fingerprint is what ``ensure_minhash_index`` trusts)
    is written only after both data writes return.  A crash mid-save
    therefore leaves either the OLD params (overwrite: next ensure
    fingerprint-mismatches and rebuilds) or a params/data contract where
    the fingerprint cannot match the corpus — never a matching fingerprint
    over torn data (ADVICE r7).

    ``mode="append"`` adds an increment's rows (call with the NEW batch
    after pair discovery to roll the index forward); ids must be disjoint
    from what's stored — re-crawled ids should be compacted out separately
    (LWW by crawl date), the same discipline as snapshot compaction in
    persistence/snapshots.py.
    """
    assert k % bands == 0
    spark = df.sparkSession
    sig, n_docs = _corpus_signature(df, id_col, text_col)
    if mode == "append":
        # rolling the index forward must keep ONE params row — validate the
        # increment against the stored contract instead of appending a
        # second (possibly different) one.  The content signature is xor-
        # composable and increment ids are disjoint by contract, so the
        # stored fingerprint rolls forward with the data.
        [p] = spark.read.parquet(f"{path}/params").collect()
        stored = (p["k"], p["bands"], p["shingle_n"])
        if stored != (k, bands, shingle_n):
            raise ValueError(
                f"save_minhash_index append: params {(k, bands, shingle_n)} "
                f"!= stored index contract {stored}"
            )
        if p.asDict().get("sig_ver") != _SIG_VER:
            # xoring a (id, text) content signature onto an id-only (or
            # unknown) fingerprint would produce a value matching NEITHER
            # convention — every later ensure would silently full-rebuild,
            # defeating the append path entirely (review r8).  One explicit
            # overwrite migrates the format.
            raise ValueError(
                "save_minhash_index append: stored index predates the "
                f"(id, text) fingerprint format (sig_ver != {_SIG_VER}) — "
                "rebuild once with mode='overwrite' before appending"
            )
        prev_sig = int(p["id_sig"]) if "id_sig" in p.asDict() else 0
        prev_n = int(p["n_docs"]) if "n_docs" in p.asDict() else 0
        params_row = (k, bands, shingle_n, prev_sig ^ sig, prev_n + n_docs, _SIG_VER)
    else:
        params_row = (k, bands, shingle_n, sig, n_docs, _SIG_VER)
    per = _minhash_mins(
        df, id_col, text_col, k, shingle_n, with_shingle_set=True
    ).transform(scoped_persist_corpus)
    banded = _banded(per, bands, k // bands)
    banded.write.mode(mode).partitionBy("band_id").parquet(f"{path}/bands")
    per.select("doc_id", "_sh").write.mode(mode).parquet(f"{path}/shingles")
    # commit point: the fingerprint becomes visible only after the data it
    # vouches for is fully written (params overwrite is a one-row job)
    spark.createDataFrame(
        [params_row],
        "k int, bands int, shingle_n int, id_sig long, n_docs long, sig_ver int",
    ).write.mode("overwrite").parquet(f"{path}/params")


_SIG_VER = 2  # 1 = xor(xxhash64(id)) [r6-r7]; 2 = xor(xxhash64(id, text)) [r8]


def _corpus_signature(df: DataFrame, id_col: str, text_col: str) -> tuple[int, int]:
    """(xor-of-xxhash64(id, text), count) — the stored index's corpus
    fingerprint.  One (id, text)-column aggregate: hashing the CONTENT too
    means an in-place edit under a stable id invalidates the index (the r7
    blind spot) — it reads the text column once but computes no shingles /
    signatures, still ~k·|text| cheaper than rebuilding.  xxhash64's
    multi-arg form hashes (id, text) structurally, so no separator-
    injection ambiguity; xor composes under disjoint appends, so
    roll-forward updates it without re-reading the stored corpus."""
    row = df.agg(
        F.coalesce(
            F.expr(f"bit_xor(xxhash64({id_col}, {text_col}))"), F.lit(0)
        ).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return int(row["s"]), int(row["n"])


def ensure_minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    k: int = _K_DEFAULT,
    bands: int = 16,
    shingle_n: int = 3,
) -> None:
    """Build the stored LSH index iff it is absent or does not match the
    corpus — the idempotent entry point a daily increment job calls before
    querying.  "Matches" = the params contract (k, bands, shingle_n) AND the
    stored content fingerprint (xor of xxhash64(id, text) + count, written
    by ``save_minhash_index``) equal the corpus's — one (id, text)
    aggregate, no shingle/signature compute, cheap relative to rebuilding
    100 TB of signatures.  The fingerprint catches regenerated/relocated
    corpora AND in-place text edits under stable ids (the r7 blind spot —
    hashing content costs one text-column scan, which the validation pays;
    what the index avoids is the k-hash shingle pipeline, not the scan).
    Only a missing index (AnalysisException) routes to a silent build; real
    IO errors propagate (review r7 — the old bare except turned them into
    silent rebuilds inside timed regions).
    """
    from pyspark.errors import AnalysisException

    spark = df.sparkSession
    try:
        [p] = spark.read.parquet(f"{path}/params").collect()
    except AnalysisException:
        save_minhash_index(
            df, id_col, text_col, path, k=k, bands=bands, shingle_n=shingle_n
        )
        return
    if (p["k"], p["bands"], p["shingle_n"]) == (k, bands, shingle_n) and (
        p.asDict().get("sig_ver") == _SIG_VER
    ):
        sig, n = _corpus_signature(df, id_col, text_col)
        if (int(p["id_sig"]), int(p["n_docs"])) == (sig, n):
            return
    save_minhash_index(
        df, id_col, text_col, path, k=k, bands=bands, shingle_n=shingle_n
    )


def minhash_lsh_pairs_indexed(
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs of an increment against a STORED index
    (``save_minhash_index``) — identical output to
    ``minhash_lsh_pairs_incremental(old, new, ...)`` (roundtrip
    differential in tests/test_curation.py) with the old side's signature
    computation replaced by two parquet scans.  Signature params (k, bands,
    shingle_n) come from the index's params table — the caller cannot
    accidentally band the increment with a different contract.

    Re-crawl refresh semantics match the recompute path: an id present in
    BOTH the index and the increment is served from the increment (the
    stored rows are anti-joined away for discovery; compact them out of
    the index separately when rolling it forward)."""
    spark = new_df.sparkSession
    [p] = spark.read.parquet(f"{index_path}/params").collect()
    k, bands, shingle_n = p["k"], p["bands"], p["shingle_n"]
    r = k // bands
    new_ids = new_df.select(F.col(id_col).alias("doc_id")).distinct()
    old_bands = spark.read.parquet(f"{index_path}/bands").join(
        new_ids, "doc_id", "left_anti"
    )
    old_sets = spark.read.parquet(f"{index_path}/shingles").join(
        new_ids, "doc_id", "left_anti"
    )
    per_new = materialized(
        _minhash_mins(
            new_df, id_col, text_col, k, shingle_n, with_shingle_set=True
        ).transform(scoped_persist_corpus)
    )
    banded_new = _banded(per_new, bands, r)
    return _new_touching_pairs(
        banded_new, old_bands, per_new.select("doc_id", "_sh"), old_sets, threshold
    )
