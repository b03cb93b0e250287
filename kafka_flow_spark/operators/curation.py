"""Corpus-curation operators for training-data pipelines: split, mix, pack,
decontaminate.

All four are content-addressed via the same md5 bucketing as
``operators.sampling`` (reproducible across runs, engines, partitionings —
and bit-shared with the DuckDB oracles), and all stay JVM-side: the split/mix
are scan predicates (zero shuffle, stack with parquet pushdown), packing is
one window shuffle on the shard key, contamination is one equi-join on the
n-gram key.  No counterpart in the reference (SURVEY.md Phase 4 — the steps
between a deduped corpus and a training run).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_flow_spark.cache import scoped_persist

from kafka_flow_spark.operators.dedup import word_shingles
from kafka_flow_spark.operators.sampling import _HEX_DIGITS, fraction_threshold, hash_bucket
from kafka_flow_spark.operators.text import normalize_text, token_count, tokens


def split_thresholds(splits: dict[str, float]) -> list[tuple[str, str]]:
    """(name, upper-bound-hex) per split, cumulative in dict order; the last
    split absorbs the remainder (so fractions may sum to < 1 only if a
    catch-all last split is acceptable; they must not exceed 1)."""
    total = sum(splits.values())
    if not 0.0 < total <= 1.0 + 1e-9:
        raise ValueError(f"split fractions must sum to (0, 1], got {total}")
    out, acc = [], 0.0
    for name, frac in splits.items():
        if frac <= 0:
            raise ValueError(f"split {name!r} has non-positive fraction {frac}")
        acc = min(acc + frac, 1.0)
        out.append((name, fraction_threshold(acc)))
    return out


def hash_split(df: DataFrame, key_col: str, splits: dict[str, float]) -> DataFrame:
    """Deterministic train/val/test split: adds a ``split`` column assigned by
    content hash of ``key_col``.  A document's split NEVER changes when the
    corpus grows or repartitions — the property that keeps eval sets stable
    across dataset versions.  The last split absorbs the top bucket edge, so
    every row is assigned."""
    bounds = split_thresholds(splits)
    b = hash_bucket(key_col)
    expr: Column = F.lit(bounds[-1][0])  # catch-all: last split
    for name, hi in reversed(bounds[:-1]):
        expr = F.when(b < F.lit(hi), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def weighted_mix(
    df: DataFrame, group_col: str, key_col: str, weights: dict[str, float]
) -> DataFrame:
    """Per-group bernoulli mixing: keep a ``weights[group]`` fraction of each
    group (language/source/domain re-balancing).  Groups absent from
    ``weights`` are DROPPED (explicit allowlist — the curation posture).
    Weight 1.0 keeps the whole group (no hash-edge loss); weights are
    content-addressed so the mix is reproducible and auditable.  Pure scan
    predicate: no shuffle, pushes down alongside other filters."""
    for g, w in weights.items():
        if not 0.0 < w <= 1.0:
            raise ValueError(f"weight for {g!r} must be in (0, 1], got {w}")
    b = hash_bucket(key_col)
    keep: Column = F.lit(False)
    for g, w in weights.items():
        cond = F.lit(True) if w >= 1.0 else b < F.lit(fraction_threshold(w))
        keep = F.when(F.col(group_col) == F.lit(g), cond).otherwise(keep)
    return df.where(keep)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int = 512,
    n_shards: int = 8,
) -> DataFrame:
    """Assign documents to fixed-token-budget packs (sequence packing for
    training): shard by id (uniform), order within each shard by content hash
    (a deterministic shuffle), then cut the running token stream every
    ``budget`` tokens.  Output: (id, shard, pack_id, pack_offset, n_tokens);
    a document starting at ``pack_offset`` spans packs if it crosses the
    budget boundary — the concat-then-chunk contract training loaders use.

    One window shuffle on the shard key; shards are independent, so
    parallelism = ``n_shards`` × whatever the window needs — there is NO
    global ordering (a global window would serialize the corpus; per-shard
    windows are the 100 TB shape, matching how loaders shard anyway)."""
    from pyspark.sql import Window

    key = F.col(id_col).cast("string")
    w = (
        Window.partitionBy("shard")
        .orderBy(hash_bucket(key), key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.select(
            F.col(id_col),
            F.pmod(F.col(id_col), F.lit(n_shards)).alias("shard"),
            token_count(F.col(text_col)).alias("n_tokens"),
        )
        .withColumn("_cum", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .select(
            id_col,
            "shard",
            F.floor(F.col("_cum") / F.lit(budget)).alias("pack_id"),
            (F.col("_cum") % F.lit(budget)).alias("pack_offset"),
            "n_tokens",
        )
    )


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
) -> DataFrame:
    """Benchmark-decontamination check: for every train document, the number
    of distinct word ``n``-grams it shares with the eval corpus.  Standard
    n=8..13 washout test for eval leakage into training data.

    Shape: explode distinct n-grams on both sides, equi-join on a 64-bit
    n-gram hash (compact shuffle key; the string never shuffles), count
    distinct per train doc.  Both sides partition by the hash, so skew is
    bounded by n-gram popularity — stopword-only 8-grams are rare enough
    that no salting is needed at this n."""
    def grams(d: DataFrame) -> DataFrame:
        return d.select(
            F.col(id_col),
            F.explode(word_shingles(text_col, n=n)).alias("_ng"),
        ).select(id_col, F.xxhash64("_ng").alias("_ngh"))

    hits = (
        grams(train)
        .join(grams(eval_df).select("_ngh").distinct(), "_ngh")
        .groupBy(id_col)
        .agg(F.count_distinct("_ngh").alias("n_shared"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(id_col, F.coalesce("n_shared", F.lit(0)).alias("n_shared"))
    )


def _bloom_positions(gram: Column, m_bits: int, k: int) -> Column:
    """Array of k bloom bit positions for one n-gram: seeded md5 re-hashes,
    first 15 hex digits (60 bits) folded to a long, mod m.  md5 so the whole
    filter — including its false positives — is bit-reproducible in any
    engine (same idiom as the winnowing/span oracles)."""
    return F.array(
        *[
            F.pmod(
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"{i}:"), gram)), 1, 15), 16, 10
                ).cast("long"),
                F.lit(m_bits),
            )
            for i in range(k)
        ]
    )


def bloom_bitmap(
    eval_df: DataFrame, text_col: str, n: int = 8, m_bits: int = 1 << 20, k: int = 4
) -> DataFrame:
    """Bloom filter of the eval corpus's distinct word n-grams, as a bitmap
    DataFrame ``(bucket BIGINT, bits BIGINT)`` — bucket = position DIV 64.

    This is the DECONTAMINATION-AT-SCALE structure: the exact n-gram
    semi-join (`ngram_contamination`) shuffles every train n-gram against the
    reference set, which is right when the reference is a small benchmark
    suite but not when it is itself a corpus.  The bloom compresses ANY
    reference cardinality into m bits (128 KiB at the default 2^20) that
    broadcast to every executor; membership error is one-sided (no false
    negatives — contamination is never missed; false positives over-flag at
    ~(1-e^{-kn/m})^k).  Built with one explode + one map-combinable bit_or
    aggregate."""
    grams = eval_df.select(
        F.explode(word_shingles(text_col, n=n)).alias("_ng")
    ).distinct()
    pos = grams.select(
        F.explode(_bloom_positions(F.col("_ng"), m_bits, k)).alias("_pos")
    )
    return (
        pos.select(
            (F.col("_pos") / F.lit(64)).cast("long").alias("bucket"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))").alias("_b"),
        )
        .groupBy("bucket")
        .agg(F.bit_or("_b").alias("bits"))
    )


def bloom_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    m_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """`ngram_contamination` through a bloom filter: per train doc, how many
    of its distinct n-grams the eval bloom flags.  Upper-bounds the exact
    count (one-sided error); the probe is a BROADCAST join against the
    bitmap, so the train side never shuffles by n-gram — the 100 TB-corpus
    decontamination path.

    Output: (id, n_flagged).  Deterministic including false positives (md5
    positions), so the whole operator is oracle-checkable."""
    bitmap = bloom_bitmap(eval_df, text_col, n=n, m_bits=m_bits, k=k)
    tg = train.select(
        F.col(id_col), F.explode(word_shingles(text_col, n=n)).alias("_ng")
    )
    probes = tg.select(
        id_col,
        "_ng",
        F.explode(_bloom_positions(F.col("_ng"), m_bits, k)).alias("_pos"),
    ).select(
        id_col,
        "_ng",
        (F.col("_pos") / F.lit(64)).cast("long").alias("bucket"),
        F.expr("CAST(_pos % 64 AS INT)").alias("_i"),
    )
    hit = F.col("bits").isNotNull() & F.expr(
        "(bits & shiftleft(CAST(1 AS BIGINT), _i)) != 0"
    )
    flagged = (
        probes.join(F.broadcast(bitmap), "bucket", "left")
        .groupBy(id_col, "_ng")
        .agg(F.min(hit.cast("int")).alias("_all_hit"))
        .groupBy(id_col)
        .agg(F.sum("_all_hit").alias("n_flagged"))
    )
    return (
        train.select(id_col)
        .join(flagged, id_col, "left")
        .select(id_col, F.coalesce("n_flagged", F.lit(0)).alias("n_flagged"))
    )


def chunk_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk: int = 128,
    stride: int = 64,
) -> DataFrame:
    """Sliding-window token chunks — the context-window prep step between a
    curated corpus and a training run (RAG indexing / fixed-context packing
    both start here).  A chunk starts every ``stride`` tokens and spans up to
    ``chunk`` tokens; the final windows are short rather than dropped, so
    every token appears in at least one chunk (``stride < chunk`` gives
    overlap for boundary-context preservation).

    Output: (id, chunk_idx, start, n_chunk_tokens, chunk_text); empty docs
    emit nothing.

    Scale shape: entirely narrow — tokenize, ``sequence`` of starts,
    ``posexplode``, ``slice``; zero shuffles, whole-stage codegen end to end,
    and output rows stay co-partitioned with their input file splits (a
    chunker that shuffles the corpus would be the bottleneck of the whole
    pipeline at 100 TB).  No counterpart in the reference (SURVEY.md Phase 4).
    """
    if chunk < 1 or stride < 1:
        raise ValueError("chunk >= 1 and stride >= 1 required")
    toks = tokens(text_col)
    return (
        df.select(F.col(id_col), toks.alias("_t"))
        .filter(F.size("_t") > 0)
        .select(
            F.col(id_col),
            F.col("_t"),
            F.posexplode(
                F.sequence(F.lit(0), F.size("_t") - 1, F.lit(stride))
            ).alias("chunk_idx", "start"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.col("start").cast("int").alias("start"),
            F.size(F.slice(F.col("_t"), F.col("start") + 1, F.lit(chunk)))
            .alias("n_chunk_tokens"),
            F.array_join(
                F.slice(F.col("_t"), F.col("start") + 1, F.lit(chunk)), " "
            ).alias("chunk_text"),
        )
    )


def line_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_dup_count: int = 3,
    min_line_chars: int = 1,
    delimiter: str = "\n",
) -> DataFrame:
    """Corpus-level LINE deduplication (the RefinedWeb/MassiveText
    'line-wise correction' pass): a line whose exact text occurs at least
    ``min_dup_count`` times across the WHOLE corpus is boilerplate
    (navigation bars, cookie banners, repeated headers/footers) and is
    removed from every document; each document is reassembled from its
    surviving lines in original order.  This is the dedup granularity
    between exact whole-document dedup and ``duplicate_spans``' n-gram
    spans — per-document rules cannot see it at all (each line looks fine
    in isolation; only the corpus-wide count exposes it).

    Lines with fewer than ``min_line_chars`` characters after trimming are
    EXEMPT — kept verbatim and never counted: empty/whitespace lines encode
    paragraph structure and would otherwise always cross any corpus-wide
    bar, collapsing documents.

    Output: (id, text, n_lines, n_removed); ``text`` may be '' when every
    line was boilerplate (dropping empties is the caller's call — a quality
    gate usually follows).  Rows with NULL ``text_col`` are dropped.

    Scale shape: one ``posexplode``, one map-combinable line-frequency
    aggregate, one equi-join of the line relation onto the (distinct,
    above-bar) duplicate-line set, one per-document reassembly aggregate.
    The join's hot probe keys are exactly the boilerplate lines being
    removed — AQE's skew-join splits those reduce partitions — and the
    build side is the duplicate-line vocabulary (corpus-sublinear), pinned
    via shuffle_hash so post-shuffle stats can't pick the occurrence side
    (same measured trap as jaccard_pairs_prefix).  No windows, no driver
    collects, no global sort.
    """
    if min_dup_count < 2:
        raise ValueError(f"min_dup_count must be >= 2, got {min_dup_count}")
    if min_line_chars < 0:
        raise ValueError(f"min_line_chars must be >= 0, got {min_line_chars}")
    # \Q..\E: split() takes a Java regex but reassembly below uses the
    # LITERAL delimiter — quote it so the two always agree (a '. ' sentence
    # delimiter would otherwise split on any-char-plus-space).
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.split(F.col(text_col), "\\Q" + delimiter + "\\E", -1)
        ).alias("_pos", "_ln"),
    )
    dup = (
        lines.filter(F.length(F.trim("_ln")) >= min_line_chars)
        .groupBy("_ln")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= min_dup_count)
        .select("_ln", F.lit(True).alias("_dup"))
    )
    # left join + per-doc aggregate (not left_anti): the reassembly needs
    # the ORIGINAL per-doc line count and the removed count, and
    # collect_list drops the NULL the un-matched F.when leaves for
    # duplicate lines — one aggregate produces kept text and both counts.
    flagged = lines.join(dup.hint("shuffle_hash"), "_ln", "left")
    return (
        flagged.groupBy("_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.when(F.col("_dup"), 1).otherwise(0))
            .cast("long")
            .alias("n_removed"),
            F.array_sort(
                F.collect_list(
                    F.when(F.col("_dup").isNull(), F.struct("_pos", "_ln"))
                )
            ).alias("_a"),
        )
        .select(
            F.col("_id").alias(id_col),
            F.array_join(
                F.transform("_a", lambda s: s["_ln"]), delimiter
            ).alias(text_col),
            "n_lines",
            "n_removed",
        )
    )


def source_overlap_matrix(
    df: DataFrame,
    group_col: str,
    text_col: str,
    shingle_n: int = 8,
) -> DataFrame:
    """Pairwise content-overlap matrix between corpus groups (sources,
    dumps, snapshots): for every ordered pair (a, b) of distinct groups,
    how many of a's distinct word ``shingle_n``-grams also occur in b, and
    what fraction of a's gram vocabulary that is.  The corpus-diagnostics
    sibling of ``ngram_contamination``: where that scores train DOCUMENTS
    against one eval set, this maps leakage/mirroring between every pair of
    sources at once (mirror sites, re-crawled dumps, cross-source syndicated
    boilerplate) — the matrix a data card ships and a mixing plan reads
    before weighting sources.

    Output: (group_a, group_b, n_shared, n_a, containment) for ordered
    pairs with n_shared >= 1; ``containment`` = n_shared / n_a, one exact
    int/int IEEE division.  Directional on purpose — a small source quoted
    wholesale by a big one shows containment ≈ 1 in one direction only.

    Scale shape: the CORPUS is touched exactly once — explode to (group,
    64-bit gram hash; the gram string never shuffles, same trick as
    ngram_contamination) and aggregate each gram's source SET in one
    map-combinable ``collect_set`` pass (the set is bounded by the number
    of GROUPS — a small dimension, dozens, not documents).  Pairs are then
    expanded IN-ROW from the per-gram set (≤ |groups|² per gram, no
    self-join, no second shuffle of the gram relation) and pair counts /
    per-group vocabulary sizes both aggregate the tiny vocab-bounded
    relation.  A distinct-then-self-join formulation shuffled the exploded
    relation twice and measured 34 s (42.5 un-persisted) vs 23.7 s for this
    shape at sf10 — the remainder is the single explode+aggregate pass.
    """
    # persisted: the vocab-bounded per-gram relation feeds the pair
    # expansion AND the size aggregate; un-persisted, the corpus-wide
    # explode lineage re-runs per consumer (the pmi_collocations rule).
    gram_sources = (
        df.select(
            F.col(group_col).alias("_g"),
            F.explode(word_shingles(text_col, n=shingle_n)).alias("_ng"),
        )
        .select("_g", F.xxhash64("_ng").alias("_h"))
        .groupBy("_h")
        .agg(F.collect_set("_g").alias("_gs"))
        .transform(scoped_persist)
    )
    sizes = (
        gram_sources.select(F.explode("_gs").alias("group_a"))
        .groupBy("group_a")
        .agg(F.count("*").alias("n_a"))
    )
    pairs = (
        gram_sources.select(F.explode("_gs").alias("group_a"), "_gs")
        .select("group_a", F.explode("_gs").alias("group_b"))
        .filter(F.col("group_a") != F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count("*").alias("n_shared"))
    )
    return pairs.join(F.broadcast(sizes), "group_a").select(
        "group_a",
        "group_b",
        "n_shared",
        "n_a",
        (F.col("n_shared").cast("double") / F.col("n_a").cast("double")).alias(
            "containment"
        ),
    )


def mixture_divergence(
    df: DataFrame,
    group_col: str,
    text_col: str,
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence (bits) between the unigram token
    distributions of corpus groups — the data-mixture diagnostic that says
    how far two sources' language actually is apart before a mixing plan
    weights them (0 = identical distributions, 1 = disjoint vocabularies).
    The distributional sibling of ``source_overlap_matrix``: that measures
    shared long-n-gram CONTENT (mirroring/leakage), this measures
    statistical STYLE over single tokens, which catches "same topic,
    different register" drift that containment misses.

    Output: one row per unordered pair (group_a < group_b):
    (group_a, group_b, shared_types, n_tokens_a, n_tokens_b, jsd), jsd
    rounded to 4 (log2 is transcendental — cross-engine agreement is at
    the 4-decimal contract like the cosine queries, not bit-exact).

    JSD(P,Q) = ½·KL(P‖M) + ½·KL(Q‖M), M = ½(P+Q).  Words present in only
    one group contribute exactly half their probability mass (the
    p·log2(2p/p) = p limit), so the sum decomposes into a SHARED-WORD term
    plus (1 − shared mass) per side — no outer join against the union
    vocabulary needed.

    Scale shape: the corpus is touched ONCE — explode to (group, word),
    one map-combinable count.  The per-word group expansion and the final
    pair aggregate run over the vocab-bounded count relation (|vocab| ×
    |groups| rows, millions not billions at 100 TB), and group totals ride
    a broadcast.  Same single-pass discipline as source_overlap_matrix.
    """
    words = df.select(
        F.col(group_col).alias("_g"),
        F.explode(tokens(normalize_text(text_col))).alias("_w"),
    ).filter(F.col("_w") != "")
    # persisted: consumed by the pair expansion AND the totals aggregate
    cnt = (
        words.groupBy("_g", "_w")
        .agg(F.count(F.lit(1)).alias("_c"))
        .transform(scoped_persist)
    )
    totals = cnt.groupBy("_g").agg(F.sum("_c").alias("_n"))
    per_word = cnt.groupBy("_w").agg(
        F.collect_list(F.struct("_g", "_c")).alias("_gs")
    )
    pairs = (
        per_word.select(F.explode("_gs").alias("_a"), "_gs")
        .select("_a", F.explode("_gs").alias("_b"))
        .filter(F.col("_a._g") < F.col("_b._g"))
        .select(
            F.col("_a._g").alias("group_a"),
            F.col("_a._c").alias("_ca"),
            F.col("_b._g").alias("group_b"),
            F.col("_b._c").alias("_cb"),
        )
    )
    ta = F.broadcast(totals.select(F.col("_g").alias("group_a"), F.col("_n").alias("_na")))
    tb = F.broadcast(totals.select(F.col("_g").alias("group_b"), F.col("_n").alias("_nb")))
    pa = F.col("_ca").cast("double") / F.col("_na").cast("double")
    pb = F.col("_cb").cast("double") / F.col("_nb").cast("double")
    term = pa * F.log2(F.lit(2.0) * pa / (pa + pb)) + pb * F.log2(
        F.lit(2.0) * pb / (pa + pb)
    )
    agg = (
        pairs.join(ta, "group_a")
        .join(tb, "group_b")
        .groupBy("group_a", "group_b")
        .agg(
            F.sum(term).alias("_t"),
            F.sum("_ca").alias("_sca"),
            F.sum("_cb").alias("_scb"),
            F.count(F.lit(1)).alias("shared_types"),
            F.max("_na").alias("n_tokens_a"),
            F.max("_nb").alias("n_tokens_b"),
        )
    )
    # Pair UNIVERSE from the group totals (|groups|² — broadcast material):
    # pairs with zero shared words never appear in the per-word expansion,
    # yet they are the most divergent pairs the diagnostic exists to flag
    # (review r6) — left-join the shared-word aggregate onto the universe
    # and let the zero fills produce the exact jsd = 1 endpoint.
    ga = totals.select(F.col("_g").alias("group_a"), F.col("_n").alias("_una"))
    gb = totals.select(F.col("_g").alias("group_b"), F.col("_n").alias("_unb"))
    universe = ga.crossJoin(F.broadcast(gb)).filter(
        F.col("group_a") < F.col("group_b")
    )
    full = (
        universe.join(agg, ["group_a", "group_b"], "left")
        .withColumn("_t", F.coalesce(F.col("_t"), F.lit(0.0)))
        .withColumn("_sca", F.coalesce(F.col("_sca"), F.lit(0)))
        .withColumn("_scb", F.coalesce(F.col("_scb"), F.lit(0)))
        .withColumn(
            "shared_types", F.coalesce(F.col("shared_types"), F.lit(0))
        )
        .withColumn("n_tokens_a", F.col("_una"))
        .withColumn("n_tokens_b", F.col("_unb"))
    )
    jsd = F.lit(0.5) * (
        F.col("_t")
        + (F.lit(1.0) - F.col("_sca").cast("double") / F.col("n_tokens_a").cast("double"))
        + (F.lit(1.0) - F.col("_scb").cast("double") / F.col("n_tokens_b").cast("double"))
    )
    return full.select(
        "group_a",
        "group_b",
        "shared_types",
        "n_tokens_a",
        "n_tokens_b",
        F.round(jsd, 4).alias("jsd"),
    )


def ngram_novelty(
    corpus: DataFrame,
    reference: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
) -> DataFrame:
    """Per-document novelty against a reference corpus: of a document's
    distinct word ``n``-grams, how many appear NOWHERE in the reference —
    the inverse of ``ngram_contamination`` (leakage counts shared grams;
    novelty counts unshared).  The memorization/redundancy signal of data-
    curation recipes: low novelty = the document re-states reference
    content; pair with a floor to drop near-verbatim rehashes, or sort by
    novelty for curriculum ordering.

    Shape: same as contamination — distinct grams both sides, LEFT join on
    the 64-bit gram hash against the reference's distinct gram set (the
    string never shuffles), count misses per doc.  Zero-gram documents
    (fewer than n tokens) surface n_grams = 0 with novelty NULL.

    Output: (id_col, n_grams, n_novel, novelty_ppm) — parts-per-million as
    exact bigint (n_novel·1e6 div n_grams), engine-exact.
    """
    def grams(d: DataFrame) -> DataFrame:
        return d.select(
            F.col(id_col),
            F.explode(word_shingles(text_col, n=n)).alias("_ng"),
        ).select(id_col, F.xxhash64("_ng").alias("_ngh"))

    ref = reference.select(
        F.explode(word_shingles(text_col, n=n)).alias("_ng")
    ).select(F.xxhash64("_ng").alias("_ngh")).distinct()
    per_doc = (
        grams(corpus)
        .distinct()
        .join(ref.withColumn("_hit", F.lit(1)), "_ngh", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0)).alias("n_novel"),
        )
    )
    return (
        corpus.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                F.expr("(n_novel * 1000000) div n_grams"),
            ).alias("novelty_ppm"),
        )
    )


def token_budget_mix(
    df: DataFrame,
    group_col: str,
    key_col: str,
    text_col: str,
    budgets: dict[str, int],
) -> DataFrame:
    """Budget-targeted mixing: sample each group down to ~``budgets[group]``
    TOKENS (not rows) — the epochs-per-source recipe stated as an absolute
    token budget.  P[keep] = min(1, budget / group_token_total), decided
    content-addressedly per document, so E[kept tokens] = budget for
    over-budget groups and the whole group survives under-budget ones.
    Groups absent from ``budgets`` are DROPPED (allowlist — the
    ``weighted_mix`` posture).

    Determinism: keep iff u(key) · group_total < budget — u is the exact
    md5-fold uniform, the product is one IEEE double multiply of
    engine-identical factors, no division anywhere.

    Scale shape: one map-combinable token-count aggregate per group
    (|groups| rows, AQE-sized join back — broadcast when small), then a
    scan-side keep predicate.  The corpus is read twice (count pass +
    filter pass) unless the caller persists it.

    Output: the df rows that survive, plus n_tokens and group_tokens.
    """
    from kafka_flow_spark.operators.text import token_count

    for g, b in budgets.items():
        if b <= 0:
            raise ValueError(f"budget for {g!r} must be positive, got {b}")
    tok = df.withColumn("n_tokens", token_count(text_col).cast("long"))
    totals = tok.groupBy(group_col).agg(F.sum("n_tokens").alias("group_tokens"))
    budget: Column = F.lit(None).cast("long")
    for g, b in budgets.items():
        budget = F.when(F.col(group_col) == F.lit(g), F.lit(int(b))).otherwise(budget)
    u = F.conv(hash_bucket(key_col), 16, 10).cast("long") / F.lit(
        float(16**_HEX_DIGITS)
    )
    return (
        tok.join(totals, group_col)
        .withColumn("_budget", budget)
        .where(
            F.col("_budget").isNotNull()
            & (u * F.col("group_tokens").cast("double") < F.col("_budget").cast("double"))
        )
        .drop("_budget")
    )


def boilerplate_by_source(
    df: DataFrame,
    id_col: str,
    source_col: str,
    text_col: str,
    min_frac_pct: int = 30,
    min_doc_count: int = 2,
    min_line_chars: int = 1,
    delimiter: str = "\n",
) -> DataFrame:
    """PER-SOURCE boilerplate-line removal — the RefinedWeb refinement of
    ``line_dedup``'s corpus-wide rule: a line is boilerplate for a source
    when it appears in at least ``min_frac_pct`` percent of THAT SOURCE's
    documents (and in >= ``min_doc_count`` of them), and is removed only
    from that source's documents.

    Why per-source: corpus-wide counting misses domain-local boilerplate (a
    small site's cookie banner never crosses a global absolute bar) and
    over-fires on legitimately common short lines shared across domains.
    The fraction is compared in exact integer arithmetic
    (``docs_with_line * 100 >= pct * docs_in_source``); the
    ``min_doc_count`` floor keeps one-document sources from deleting
    themselves (1/1 = 100% of the source).

    Counting is per DISTINCT document (a line repeated inside one page
    counts once), which is what "appears in x% of documents" means; the
    same line duplicated WITHIN a page is ``duplicate_spans``' job.

    Scale shape: one ``posexplode``; the distinct-doc line frequency is a
    two-level aggregate ((source, line, id) distinct -> (source, line)
    count) — both map-combinable after one exchange on (source, line);
    per-source doc totals are a tiny broadcast relation; the boilerplate
    set joins back on (source, line) with the same shuffle_hash pinning as
    ``line_dedup`` (build side = the per-source boilerplate vocabulary,
    corpus-sublinear).  Empty/short lines are exempt exactly as in
    ``line_dedup``.  Output: (id, source, text, n_lines, n_removed).
    """
    if not 1 <= min_frac_pct <= 100:
        raise ValueError(f"min_frac_pct must be in [1, 100], got {min_frac_pct}")
    if min_doc_count < 1:
        raise ValueError(f"min_doc_count must be >= 1, got {min_doc_count}")
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.col(source_col).alias("_src"),
        F.posexplode(
            F.split(F.col(text_col), "\\Q" + delimiter + "\\E", -1)
        ).alias("_pos", "_ln"),
    )
    src_totals = df.groupBy(F.col(source_col).alias("_src")).agg(
        F.countDistinct(id_col).alias("_nsrc")
    )
    doc_lines = (
        lines.filter(F.length(F.trim("_ln")) >= min_line_chars)
        .select("_src", "_ln", "_id")
        .distinct()
    )
    dup = (
        doc_lines.groupBy("_src", "_ln")
        .agg(F.count(F.lit(1)).alias("_dc"))
        .join(F.broadcast(src_totals), "_src")
        .filter(
            (F.col("_dc") >= min_doc_count)
            & (F.col("_dc") * 100 >= min_frac_pct * F.col("_nsrc"))
        )
        .select("_src", "_ln", F.lit(True).alias("_dup"))
    )
    flagged = lines.join(dup.hint("shuffle_hash"), ["_src", "_ln"], "left")
    return (
        flagged.groupBy("_id", "_src")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.when(F.col("_dup"), 1).otherwise(0))
            .cast("long")
            .alias("n_removed"),
            F.array_sort(
                F.collect_list(
                    F.when(F.col("_dup").isNull(), F.struct("_pos", "_ln"))
                )
            ).alias("_a"),
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("_src").alias(source_col),
            F.array_join(
                F.transform("_a", lambda s: s["_ln"]), delimiter
            ).alias(text_col),
            "n_lines",
            "n_removed",
        )
    )


# --- temporal split with embargo (purged time-based eval split) --------------


def temporal_split_embargo(
    df: DataFrame,
    ts_col: str,
    train_end: str,
    test_start: str,
) -> DataFrame:
    """Time-ordered train/test split with an EMBARGO gap — the leakage-safe
    eval split for temporal data (the "purged" split of López de Prado's
    backtesting chapter, and the standard freshness-eval cut for a training
    corpus with timestamps): ``train`` is strictly before ``train_end``,
    ``test`` is at/after ``test_start``, and rows in between are
    ``embargo`` — excluded from both so near-boundary correlation (a
    session straddling the cut, a document revised hours later) can't leak
    supervised signal across it.

    Pure scan predicate (one codegen CASE — zero shuffle, stacks with
    parquet pushdown exactly like hash_split).  ``train_end <= test_start``
    required; equality means no embargo (a plain temporal cut).  Output:
    input columns + ``split``.

    The bound order is validated at TIMESTAMP semantics — the same cast the
    row predicates use — not by Python string comparison: mixed literal
    formats ('2024-1-5' vs '2024-01-15') can pass lexicographically yet
    define an inverted or empty embargo once cast (review r10).  Bounds
    that do not cast to a timestamp are refused too (the row predicates
    would otherwise silently send every row to 'embargo').
    """
    spark = df.sparkSession
    chk = spark.range(1).select(
        # try_cast, not cast: ANSI mode makes a failed cast THROW with a
        # generic engine error; the refusal below names the bad bound
        F.lit(train_end).try_cast("timestamp").alias("_a"),
        F.lit(test_start).try_cast("timestamp").alias("_b"),
    ).first()
    if chk["_a"] is None or chk["_b"] is None:
        bad = [
            repr(s)
            for s, v in ((train_end, chk["_a"]), (test_start, chk["_b"]))
            if v is None
        ]
        raise ValueError(
            f"temporal_split_embargo bounds must cast to timestamp, got "
            f"{', '.join(bad)} — an uncastable bound would silently mark "
            "every row 'embargo'"
        )
    if chk["_a"] > chk["_b"]:
        raise ValueError(
            f"train_end must be <= test_start at timestamp semantics, got "
            f"{train_end!r} ({chk['_a']}) > {test_start!r} ({chk['_b']})"
        )
    ts = F.col(ts_col)
    return df.withColumn(
        "split",
        F.when(ts < F.lit(train_end).cast("timestamp"), F.lit("train"))
        .when(ts >= F.lit(test_start).cast("timestamp"), F.lit("test"))
        .otherwise(F.lit("embargo")),
    )


def temporal_leakage_report(
    df: DataFrame,
    ts_col: str,
    entity_col: str,
    train_end: str,
    test_start: str,
) -> DataFrame:
    """ONE-row audit of a temporal split: row counts per side plus the
    ENTITY overlap — how many entities (users, domains, documents) appear
    on both sides of the cut.  A time split never isolates entities (that
    is what hash_split by entity does); this report quantifies the overlap
    so the pipeline can alert when entity-level leakage matters for the
    task at hand.

    Scale shape: one map-combinable (entity) aggregate collapsing each
    entity to two booleans, then one global aggregate — the same two-pass
    class as gate_agreement_kappa.  Output: (n_train, n_embargo, n_test,
    entities_train, entities_test, entities_both).
    """
    split = temporal_split_embargo(df, ts_col, train_end, test_start)
    per_entity = split.groupBy(F.col(entity_col).alias("_e")).agg(
        F.max(F.when(F.col("split") == "train", 1).otherwise(0)).alias("_tr"),
        F.max(F.when(F.col("split") == "test", 1).otherwise(0)).alias("_te"),
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("_ntr"),
        F.sum(F.when(F.col("split") == "embargo", 1).otherwise(0)).alias("_nem"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0)).alias("_nte"),
    )
    return per_entity.agg(
        F.sum("_ntr").cast("long").alias("n_train"),
        F.sum("_nem").cast("long").alias("n_embargo"),
        F.sum("_nte").cast("long").alias("n_test"),
        F.sum("_tr").cast("long").alias("entities_train"),
        F.sum("_te").cast("long").alias("entities_test"),
        F.sum(F.col("_tr") * F.col("_te")).cast("long").alias("entities_both"),
    )


def packing_report(
    packed: DataFrame,
    budget: int,
) -> DataFrame:
    """Per-shard packing-efficiency report over ``pack_sequences`` output —
    the table that sizes the context budget: a small ``budget`` splits many
    documents across pack boundaries (attention sees truncated context), a
    large one leaves the shard's TAIL pack underfilled (padded compute).

    Exact integers per shard: ``n_docs``, ``n_tokens``, ``n_packs``
    (= ceil(shard tokens / budget)), ``n_docs_split`` (documents crossing
    ≥1 pack boundary: ``pack_offset + n_tokens > budget``),
    ``n_boundary_crossings`` (a doc longer than several budgets crosses
    several times: ``(pack_offset + n_tokens - 1) div budget``, 0-token
    docs cross none), ``tail_waste_tokens`` (the final pack's padding:
    ``(-shard_tokens) mod budget``), plus truncating e6 rates
    (``split_rate_e6`` of docs, ``waste_rate_e6`` of the padded token
    grid ``n_packs·budget``).

    Scale shape: ONE map-combinable (shard) aggregate over the packed
    relation — output cardinality is the shard count.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    end = F.col("pack_offset") + F.col("n_tokens")
    crossings = F.when(
        F.col("n_tokens") > 0,
        F.expr(f"(pack_offset + n_tokens - 1) div {budget}"),
    ).otherwise(F.lit(0))
    per_shard = packed.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum(F.when(end > budget, 1).otherwise(0)).cast("long").alias("n_docs_split"),
        F.sum(crossings).cast("long").alias("n_boundary_crossings"),
    )
    n_packs = F.expr(f"(n_tokens + {budget} - 1) div {budget}")
    return per_shard.select(
        "shard",
        "n_docs",
        "n_tokens",
        n_packs.alias("n_packs"),
        "n_docs_split",
        "n_boundary_crossings",
        (n_packs * budget - F.col("n_tokens")).alias("tail_waste_tokens"),
        F.expr(
            "CAST(n_docs_split AS decimal(38,0)) * 1000000"
            " div CAST(n_docs AS decimal(38,0))"
        ).alias("split_rate_e6"),
    ).withColumn(
        "waste_rate_e6",
        F.when(
            F.col("n_packs") > 0,
            F.expr(
                f"CAST(tail_waste_tokens AS decimal(38,0)) * 1000000"
                f" div CAST(n_packs * {budget} AS decimal(38,0))"
            ),
        ).otherwise(F.lit(0).cast("long")),
    )
