"""Quality-gate / PII / quantization queries for the curation pipeline.

These extend the Phase-4 chain (SURVEY.md — dedup→cluster→sample→curate) with
the cleaning steps a pretraining corpus pass runs BEFORE dedup: rule-based
quality filtering (Gopher/C4-style heuristics), repetition signals, PII
redaction, and int8 embedding compression for the ANN index.

Oracle strategy: every stat is integer arithmetic with one final division and
both engines stage the identical whitespace token array, so doubles are
bit-identical; PII regexes are restricted to syntax java.util.regex and RE2
interpret the same way (the literal pattern string is shared — see
``operators.quality.PII_PATTERNS``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flow_spark.operators.quality import (
    PII_PATTERNS,
    pii_redact,
    quality_flags,
    top_word_stats,
)
from kafka_flow_spark.operators.similarity import quantize_int8
from kafka_flow_spark.plans.registry import register
from kafka_flow_spark.tables import load

_TOKS = """
    CASE WHEN trim(text) = '' THEN []
         ELSE string_split_regex(trim(text), '\\s+') END
"""


@register(
    "q_quality_rules",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, length(text) AS nc,
             length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS np,
             {_TOKS} AS toks
      FROM documents),
    s AS (
      SELECT doc_id, nc, np,
             CAST(len(toks) AS INT) AS n_words,
             COALESCE(list_sum(list_transform(toks, x -> length(x))), 0) AS chars,
             CAST(len(list_filter(toks, x -> list_contains(
                  ['the','a','and','of','to','is'], lower(x)))) AS INT) AS n_stopwords,
             CASE WHEN len(toks) >= 2
                  THEN list_transform(range(len(toks)-1), i -> toks[i+1] || ' ' || toks[i+2])
                  ELSE [] END AS g2
      FROM t),
    u AS (
      SELECT doc_id, n_words, n_stopwords,
             CASE WHEN n_words = 0 THEN 0.0
                  ELSE chars * 1.0 / n_words END AS mean_word_len,
             CASE WHEN len(g2) = 0 THEN 0.0
                  ELSE (len(g2) - len(list_distinct(g2))) * 1.0 / len(g2)
                  END AS dup_2gram_frac,
             CASE WHEN nc = 0 THEN 0.0 ELSE np * 1.0 / nc END AS symbol_frac
      FROM s)
    SELECT doc_id, n_words, mean_word_len, n_stopwords, dup_2gram_frac, symbol_frac,
           (n_words >= 10 AND n_words <= 100000
            AND mean_word_len >= 2.0 AND mean_word_len <= 12.0
            AND n_stopwords >= 1
            AND dup_2gram_frac <= 0.9
            AND symbol_frac <= 0.1) AS keep
    FROM u
    """,
    bench=True,
)
def q_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style rule gate over documents — zero-shuffle scan projection."""
    return quality_flags(load(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "q_top_word_frac",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    w AS (SELECT doc_id, unnest(toks) AS word FROM t),
    c AS (SELECT doc_id, word, COUNT(*) AS word_count FROM w GROUP BY doc_id, word),
    r AS (SELECT doc_id, word, word_count,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY word_count DESC, word ASC) AS rk,
                 CAST(SUM(word_count) OVER (PARTITION BY doc_id) AS DOUBLE) AS tot
          FROM c)
    SELECT doc_id, word AS top_word, word_count AS top_count,
           word_count * 1.0 / tot AS top_word_frac
    FROM r WHERE rk = 1
    """,
)
def q_top_word_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-common-word repetition signal (explode → map-combinable count)."""
    return top_word_stats(load(spark, sf_dir, "documents"), "doc_id", "text")


def _pii_oracle() -> str:
    (_, em, _), (_, ph, _), (_, ip, _) = PII_PATTERNS
    red = "text"
    for _, pat, tag in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{tag}', 'g')"
    return f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{em}')) AS INT) AS n_email,
           CAST(len(regexp_extract_all(text, '{ph}')) AS INT) AS n_phone,
           CAST(len(regexp_extract_all(text, '{ip}')) AS INT) AS n_ipv4,
           md5({red}) AS redacted_fp
    FROM documents
    """


@register("q_pii_redaction", oracle=_pii_oracle())
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII counts + fingerprint of the redacted text (counts on the original
    text; fingerprint proves the sequential JVM regex rewrite matches RE2)."""
    out = pii_redact(load(spark, sf_dir, "documents"), "doc_id", "text")
    return out.select(
        "doc_id",
        F.col("n_email").cast("int").alias("n_email"),
        F.col("n_phone").cast("int").alias("n_phone"),
        F.col("n_ipv4").cast("int").alias("n_ipv4"),
        F.md5(F.col("redacted").cast("binary")).alias("redacted_fp"),
    )


@register(
    "q_embedding_quantization",
    oracle="""
    WITH s AS (
      SELECT vec_id,
             CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) / 127.0
               AS scale,
             embedding
      FROM embeddings)
    SELECT vec_id, scale,
           array_to_string(
             CASE WHEN scale = 0 THEN list_transform(embedding, x -> 0)
                  ELSE list_transform(embedding,
                                      x -> CAST(round(CAST(x AS DOUBLE) / scale) AS INT))
             END, '-') AS codes
    FROM s
    """,
)
def q_embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 codes per embedding — the persisted form of a 100 TB ANN
    index (4× smaller scans; exact codes are engine-independent by design).
    Codes flattened to a '-'-joined string: oracle-gated outputs must be
    scalar (driver canonicalizer contract, test_plan_audit.py)."""
    out = quantize_int8(load(spark, sf_dir, "embeddings"), "vec_id", "embedding")
    return out.select(
        "vec_id",
        "scale",
        F.array_join(F.col("codes").cast("array<string>"), "-").alias("codes"),
    )


@register(
    "q_knn_quantized",
    oracle="""
    WITH s AS (
      SELECT vec_id,
             CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) / 127.0
               AS scale,
             embedding
      FROM embeddings),
    v AS (
      SELECT vec_id,
             CASE WHEN scale = 0 THEN list_transform(embedding, x -> 0.0)
                  ELSE list_transform(embedding,
                         x -> CAST(round(CAST(x AS DOUBLE) / scale) AS INT) * scale)
             END AS e
      FROM s),
    q AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          FROM embeddings WHERE vec_id < 10),
    sims AS (
      SELECT q.vec_id AS q_id, v.vec_id AS neighbor_id,
             list_sum(list_transform(list_zip(q.e, v.e), p -> p[1] * p[2]))
             / (sqrt(list_sum(list_transform(q.e, x -> x * x)))
                * sqrt(list_sum(list_transform(v.e, x -> x * x)))) AS sim
      FROM q JOIN v ON v.vec_id != q.vec_id)
    SELECT q_id, neighbor_id, ROUND(sim, 4) AS sim, rank FROM (
      SELECT q_id, neighbor_id, sim,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY sim DESC, neighbor_id) AS rank
      FROM sims)
    WHERE rank <= 5
    """,
)
def q_knn_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance kNN against the int8-quantized corpus — search as
    it runs against the persisted index form.  The oracle quantizes and
    dequantizes inline with the identical round-to-nearest arithmetic, so the
    exact ranking over reconstructed codes is engine-independent."""
    from kafka_flow_spark.operators.similarity import knn_quantized

    e = load(spark, sf_dir, "embeddings")
    out = knn_quantized(e, e.filter(F.col("vec_id") < 10), k=5)
    return out.select("q_id", "neighbor_id", F.round("sim", 4).alias("sim"), "rank")


_NTOKS = """
    CASE WHEN trim(text) = '' THEN []
         ELSE string_split_regex(trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') END
"""


@register(
    "q_unigram_doc_score",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, UNNEST({_NTOKS}) AS term
      FROM documents WHERE length(trim(text)) > 0),
    t2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
    counts AS (SELECT term, COUNT(*) AS cnt FROM t2 GROUP BY term),
    total AS (SELECT SUM(cnt) AS tot FROM counts),
    tp AS (SELECT term,
                  CAST(floor((CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE))
                             * 1000000000.0 + 0.5) AS BIGINT) AS p
           FROM counts CROSS JOIN total)
    SELECT doc_id, COUNT(*) AS n_tokens,
           CAST(SUM(p) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_p_nano
    FROM t2 JOIN tp USING (term)
    GROUP BY doc_id
    """,
)
def q_unigram_doc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram LM score per doc (CCNet-flavored quality filter with
    engine-exact rational arithmetic — see operators/quality.py)."""
    from kafka_flow_spark.operators.quality import unigram_doc_scores

    return unigram_doc_scores(load(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "q_length_histogram",
    oracle=f"""
    WITH t AS (SELECT lang, {_TOKS} AS toks FROM documents),
    b AS (SELECT lang, CAST(LEAST(len(toks) // 16, 15) AS INT) AS bucket FROM t)
    SELECT lang, bucket, CAST(bucket * 16 AS INT) AS lo,
           CASE WHEN bucket < 15 THEN CAST((bucket + 1) * 16 AS INT) END AS hi,
           COUNT(*) AS n_docs
    FROM b GROUP BY lang, bucket
    """,
)
def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram per language — the corpus data-card staple.
    Pure integer bucketing, one map-combinable aggregate."""
    from kafka_flow_spark.operators.quality import length_histogram

    return length_histogram(load(spark, sf_dir, "documents"), "lang", "text")


_PROFILE_LEG = """
    SELECT '{c}' AS "column", COUNT(*) AS n_rows, COUNT({c}) AS n_nonnull,
           COUNT(DISTINCT {c}) AS n_distinct,
           CAST(MIN({c}) AS VARCHAR) AS min_value,
           CAST(MAX({c}) AS VARCHAR) AS max_value
    FROM documents"""


@register(
    "q_profile_documents",
    oracle=" UNION ALL ".join(
        _PROFILE_LEG.format(c=c) for c in ["doc_id", "lang", "source", "n_chars"]
    ),
)
def q_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data card of the documents table (exact cardinalities;
    min/max on native types).  One column-pruned aggregate leg per column."""
    from kafka_flow_spark.operators.profile import profile_columns

    return profile_columns(
        load(spark, sf_dir, "documents"), ["doc_id", "lang", "source", "n_chars"]
    )


@register(
    "q_bigram_doc_score",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_NTOKS} AS t
      FROM documents WHERE length(trim(text)) > 0),
    pr0 AS (SELECT doc_id, t, UNNEST(range(len(t) - 1)) AS i
            FROM toks WHERE len(t) >= 2),
    pr AS (SELECT doc_id, t[i + 1] AS w1, t[i + 2] AS w2 FROM pr0),
    occ AS (SELECT doc_id, w1, w2, COUNT(*) AS n_occ
            FROM pr GROUP BY doc_id, w1, w2),
    wins AS (SELECT doc_id, n_occ,
                    SUM(n_occ) OVER (PARTITION BY w1, w2) AS big,
                    SUM(n_occ) OVER (PARTITION BY w1) AS ctx,
                    SUM(n_occ) OVER (PARTITION BY w2) AS sec
             FROM occ),
    total AS (SELECT COUNT(*) AS tot FROM pr),
    p AS (SELECT doc_id, n_occ,
                 CAST(floor((0.75 * (CAST(big AS DOUBLE) / CAST(ctx AS DOUBLE))
                             + 0.25 * (CAST(sec AS DOUBLE) / CAST(tot AS DOUBLE)))
                            * 1000000000.0 + 0.5) AS BIGINT) AS p_nano
          FROM wins CROSS JOIN total)
    SELECT doc_id, CAST(SUM(n_occ) AS BIGINT) AS n_bigrams,
           CAST(SUM(p_nano * n_occ) AS DOUBLE) / CAST(SUM(n_occ) AS DOUBLE)
             AS mean_p_nano
    FROM p GROUP BY doc_id
    """,
)
def q_bigram_doc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated-bigram LM score per doc (lam=0.75) — transition-level
    quality signal above the unigram filter; engine-exact nano-unit
    arithmetic (see operators/quality.py bigram_doc_scores)."""
    from kafka_flow_spark.operators.quality import bigram_doc_scores

    return bigram_doc_scores(load(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "q_chunk_documents",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    nz AS (SELECT doc_id, toks FROM t WHERE len(toks) > 0),
    s AS (SELECT doc_id, toks, UNNEST(range(0, len(toks), 16)) AS start
          FROM nz)
    SELECT doc_id,
           CAST(start // 16 AS INT) AS chunk_idx,
           CAST(start AS INT) AS start,
           CAST(len(list_slice(toks, start + 1, start + 32)) AS INT)
             AS n_chunk_tokens,
           array_to_string(list_slice(toks, start + 1, start + 32), ' ')
             AS chunk_text
    FROM s
    """,
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window token chunks (chunk=32, stride=16) over documents —
    the context-window prep step; fully narrow plan, zero shuffles."""
    from kafka_flow_spark.operators.curation import chunk_tokens

    return chunk_tokens(load(spark, sf_dir, "documents"), "doc_id", "text", 32, 16)


def _repetition_oracle() -> str:
    """Mirror of ``repetition_stats``: per-gram GROUP BY counts stand in for
    the engine's sorted-run-length pass (same multiset, same (cnt, chars)
    tie rule, same final int-ratio division)."""
    parts = [
        f"""
    g{n} AS (
      SELECT b.doc_id, array_to_string(b.toks[u.i:u.i+{n - 1}], ' ') AS gram
      FROM b, unnest(range(1, greatest(len(b.toks)-{n - 1}, 0)+1)) AS u(i)),
    c{n} AS (
      SELECT doc_id, gram, count(*) AS cnt,
             length(replace(gram, ' ', '')) AS ch
      FROM g{n} GROUP BY doc_id, gram)"""
        for n in (2, 3, 4)
    ]
    tops = [
        f"""
    t{n} AS (
      SELECT doc_id, cnt * ch AS w FROM c{n}
      QUALIFY row_number() OVER (
        PARTITION BY doc_id ORDER BY cnt DESC, ch DESC, gram) = 1)"""
        for n in (2, 3, 4)
    ]
    frac_cols = ",\n           ".join(
        f"CASE WHEN b.tc = 0 OR t{n}.w IS NULL THEN 0.0"
        f" ELSE t{n}.w * 1.0 / b.tc END AS top{n}gram_frac"
        for n in (2, 3, 4)
    )
    return f"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents),
    b AS (
      SELECT doc_id, toks,
             COALESCE(list_sum(list_transform(toks, x -> length(x))), 0) AS tc
      FROM t),{",".join(parts)},{",".join(tops)},
    d3 AS (
      SELECT doc_id,
             SUM(CASE WHEN cnt >= 2 THEN cnt * ch ELSE 0 END) AS dup,
             SUM(cnt * ch) AS tot
      FROM c3 GROUP BY doc_id)
    SELECT b.doc_id,
           {frac_cols},
           CASE WHEN d3.tot IS NULL OR d3.tot = 0 THEN 0.0
                ELSE d3.dup * 1.0 / d3.tot END AS dup3gram_frac
    FROM b
    LEFT JOIN t2 USING (doc_id)
    LEFT JOIN t3 USING (doc_id)
    LEFT JOIN t4 USING (doc_id)
    LEFT JOIN d3 USING (doc_id)
    """


@register("q_repetition_stats", oracle=_repetition_oracle(), bench=True)
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition-removal signals: top-{2,3,4}-gram char fraction and
    duplicate-3-gram char fraction per document — zero-shuffle scan
    projection (sorted-run-length aggregate, no per-gram explode/groupBy).
    dup n=3 rather than Gopher's 5-10: the synthetic corpus has no repeated
    5-gram anywhere (measured), so the 5-gram signal would be vacuously 0;
    the operator default keeps Gopher's n=5."""
    from kafka_flow_spark.operators.quality import repetition_stats

    return repetition_stats(
        load(spark, sf_dir, "documents"), "doc_id", "text", dup_ns=(3,)
    )


# --- equi-width value histogram (data-card profiling).  Bucket assignment is
# exact arithmetic both engines share; equi-depth (quantile) boundaries are
# NOT used because interpolation is engine-specific ---
@register(
    "q_value_histogram",
    oracle="""
    WITH b AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events),
    h AS (
      SELECT event_type,
             LEAST(CAST(FLOOR((value - b.lo) * 20.0 / (b.hi - b.lo)) AS INT), 19)
               AS bucket,
             b.lo AS glo, (b.hi - b.lo) / 20 AS width
      FROM events, b)
    SELECT event_type, bucket,
           glo + bucket * width AS lo,
           glo + (bucket + 1) * width AS hi,
           COUNT(*) AS n
    FROM h GROUP BY event_type, bucket, glo, width
    """,
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-bucket equi-width histogram of event values per event type
    (operators/profile.py equiwidth_histogram)."""
    from kafka_flow_spark.operators.profile import equiwidth_histogram

    return equiwidth_histogram(
        load(spark, sf_dir, "events"), "value", ["event_type"], n_buckets=20
    )


@register(
    "q_source_reputation",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, length(text) AS nc,
             length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS np,
             {_TOKS} AS toks
      FROM documents),
    s AS (
      SELECT doc_id, source, nc, np,
             CAST(len(toks) AS INT) AS n_words,
             COALESCE(list_sum(list_transform(toks, x -> length(x))), 0) AS chars,
             CAST(len(list_filter(toks, x -> list_contains(
                  ['the','a','and','of','to','is'], lower(x)))) AS INT) AS n_stopwords,
             CASE WHEN len(toks) >= 2
                  THEN list_transform(range(len(toks)-1), i -> toks[i+1] || ' ' || toks[i+2])
                  ELSE [] END AS g2
      FROM t),
    u AS (
      SELECT doc_id, source, n_words, n_stopwords,
             CASE WHEN n_words = 0 THEN 0.0
                  ELSE chars * 1.0 / n_words END AS mean_word_len,
             CASE WHEN len(g2) = 0 THEN 0.0
                  ELSE (len(g2) - len(list_distinct(g2))) * 1.0 / len(g2)
                  END AS dup_2gram_frac,
             CASE WHEN nc = 0 THEN 0.0 ELSE np * 1.0 / nc END AS symbol_frac
      FROM s),
    q AS (
      SELECT doc_id, source,
             (n_words >= 10 AND n_words <= 100000
              AND mean_word_len >= 2.0 AND mean_word_len <= 12.0
              AND n_stopwords >= 1
              AND dup_2gram_frac <= 0.9
              AND symbol_frac <= 0.1) AS keep
      FROM u),
    rep AS (
      SELECT source, COUNT(*) AS n_docs,
             SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS n_keep
      FROM q GROUP BY source),
    tot AS (
      SELECT COUNT(*) AS td, SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS tk
      FROM q)
    SELECT q.doc_id, q.source,
           CAST(rep.n_keep AS DOUBLE) / CAST(rep.n_docs AS DOUBLE) AS keep_frac
    FROM q JOIN rep USING (source) CROSS JOIN tot
    WHERE CAST(rep.n_keep AS DOUBLE) / CAST(rep.n_docs AS DOUBLE)
          >= CAST(tot.tk AS DOUBLE) / CAST(tot.td AS DOUBLE)
    """,
)
def q_source_reputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level curation: per-source keep fraction under the Gopher/C4
    rule gate, keeping every document of sources at or above the
    CORPUS-WIDE pass rate (a scale-free bar — an absolute constant keeps
    everything or nothing when the gate's base rate shifts between corpus
    versions; it does, 0.9 vs 0.009 between this repo's sf0.01 and sf10
    snapshots).  Document→domain signal aggregation
    (operators/quality.py reputation_filter): one map-combinable aggregate
    + one AQE-sized join back; no per-doc shuffle."""
    from kafka_flow_spark.operators.quality import reputation_filter, with_quality_stats

    docs = with_quality_stats(load(spark, sf_dir, "documents"), "text")
    return reputation_filter(docs, "source", "keep").select(
        "doc_id", "source", "keep_frac"
    )


@register(
    "q_pmi_collocations",
    oracle=f"""
    WITH t AS (
      SELECT {_NTOKS} AS toks FROM documents WHERE length(trim(text)) > 0),
    w AS (SELECT unnest(toks) AS word FROM t),
    w2 AS (SELECT word FROM w WHERE word <> ''),
    uni AS (SELECT word, COUNT(*) AS cw FROM w2 GROUP BY word),
    n1 AS (SELECT COUNT(*) AS n FROM w2),
    pr0 AS (SELECT toks, UNNEST(range(len(toks) - 1)) AS i
            FROM t WHERE len(toks) >= 2),
    pr AS (SELECT toks[i + 1] AS w1, toks[i + 2] AS w2 FROM pr0),
    big AS (SELECT w1, w2, COUNT(*) AS n_ab FROM pr GROUP BY w1, w2),
    n2 AS (SELECT COUNT(*) AS n FROM pr),
    scored AS (
      SELECT big.w1, big.w2, big.n_ab,
             (CAST(big.n_ab AS DOUBLE) / CAST(n2.n AS DOUBLE))
             / ((CAST(a.cw AS DOUBLE) / CAST(n1.n AS DOUBLE))
                * (CAST(b.cw AS DOUBLE) / CAST(n1.n AS DOUBLE))) AS lift
      FROM big
      JOIN uni a ON big.w1 = a.word
      JOIN uni b ON big.w2 = b.word
      CROSS JOIN n1 CROSS JOIN n2
      WHERE big.n_ab >= 5)
    SELECT w1, w2, n_ab, ROUND(lift, 4) AS lift,
           CAST(ROW_NUMBER() OVER (ORDER BY lift DESC, w1, w2) AS INT) AS rank
    FROM scored
    QUALIFY rank <= 50
    """,
)
def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 adjacent-word collocations by PMI (ranked via the
    log-monotone integer-count lift — operators/quality.py
    pmi_collocations); min pair count 5."""
    from kafka_flow_spark.operators.quality import pmi_collocations

    return pmi_collocations(load(spark, sf_dir, "documents"), "text", min_count=5, k=50)


from kafka_flow_spark.operators.sampling import fraction_threshold

_T_PPL_SAMPLE = fraction_threshold(0.2)  # md5-hex bound of the 20% sample

_UNIGRAM_SCORE_CTES = f"""
    toks AS (
      SELECT doc_id, UNNEST({_NTOKS}) AS term
      FROM documents WHERE length(trim(text)) > 0),
    t2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
    counts AS (SELECT term, COUNT(*) AS cnt FROM t2 GROUP BY term),
    total AS (SELECT SUM(cnt) AS tot FROM counts),
    tp AS (SELECT term,
                  CAST(floor((CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE))
                             * 1000000000.0 + 0.5) AS BIGINT) AS p
           FROM counts CROSS JOIN total),
    s AS (
      SELECT doc_id, COUNT(*) AS n_tokens,
             CAST(SUM(p) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_p_nano
      FROM t2 JOIN tp USING (term)
      GROUP BY doc_id)
"""


@register(
    "q_perplexity_buckets",
    oracle=f"""
    WITH {_UNIGRAM_SCORE_CTES},
    samp AS (SELECT doc_id, mean_p_nano FROM s
             WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 6) < '{_T_PPL_SAMPLE}'),
    r AS (SELECT mean_p_nano AS ts, CAST(doc_id AS VARCHAR) AS tk,
                 ROW_NUMBER() OVER (ORDER BY mean_p_nano DESC,
                                    CAST(doc_id AS VARCHAR)) AS rn,
                 COUNT(*) OVER () AS n
          FROM samp),
    thr AS (SELECT ts, tk FROM r
            WHERE rn = (n * 1 + 2) // 3 OR rn = (n * 2 + 2) // 3),
    idx AS (SELECT s.doc_id, s.n_tokens, s.mean_p_nano,
                   SUM(CASE WHEN s.mean_p_nano < t.ts
                             OR (s.mean_p_nano = t.ts
                                 AND CAST(s.doc_id AS VARCHAR) > t.tk)
                            THEN 1 ELSE 0 END) AS i
            FROM s CROSS JOIN thr t
            GROUP BY s.doc_id, s.n_tokens, s.mean_p_nano)
    SELECT doc_id, n_tokens, mean_p_nano,
           CASE i WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail' END
             AS bucket
    FROM idx
    """,
)
def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail terciles over the unigram LM doc score:
    cutoffs fitted on a 20% content-addressed sample, assignment by broadcast
    tuple-comparison (operators/quality.py score_buckets) — no global sort."""
    from kafka_flow_spark.operators.quality import score_buckets, unigram_doc_scores

    scores = unigram_doc_scores(
        load(spark, sf_dir, "documents"), "doc_id", "text"
    ).withColumn("_key", F.col("doc_id").cast("string"))
    out = score_buckets(scores, "mean_p_nano", "_key", sample_fraction=0.2)
    return out.select("doc_id", "n_tokens", "mean_p_nano", "bucket")


@register(
    "q_exact_percentiles",
    oracle="""
    WITH c AS (
      SELECT lang, n_chars, COUNT(*) AS cnt
      FROM documents GROUP BY lang, n_chars),
    w AS (
      SELECT lang, n_chars, cnt,
             SUM(cnt) OVER (PARTITION BY lang ORDER BY n_chars
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             SUM(cnt) OVER (PARTITION BY lang) AS n
      FROM c)
    SELECT lang, CAST(MAX(n) AS BIGINT) AS n_rows,
           MIN(CASE WHEN cum * 2 >= n
                    THEN n_chars END) AS p_50,
           MIN(CASE WHEN cum * 10 >= 9 * n
                    THEN n_chars END) AS p_90
    FROM w GROUP BY lang
    """,
)
def q_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language median and p90 of document length — counting-sort
    order statistics (operators/profile.py exact_percentiles_disc): the
    window runs over distinct lengths, never row volume, and discrete
    semantics make the result engine-exact (approx_percentile is not)."""
    from kafka_flow_spark.operators.profile import exact_percentiles_disc

    return exact_percentiles_disc(
        load(spark, sf_dir, "documents"), "n_chars", ["lang"], qs=(0.5, 0.9)
    )


@register(
    "q_vocab_coverage",
    oracle=f"""
    WITH t AS (SELECT {_NTOKS} AS toks FROM documents WHERE length(trim(text)) > 0),
    w AS (SELECT unnest(toks) AS word FROM t),
    w2 AS (SELECT word FROM w WHERE word <> ''),
    uni AS (SELECT word, COUNT(*) AS cw FROM w2 GROUP BY word),
    tot AS (SELECT COUNT(*) AS n FROM w2),
    r AS (SELECT word, cw, ROW_NUMBER() OVER (ORDER BY cw DESC, word) AS rk
          FROM uni QUALIFY rk <= 25),
    c AS (SELECT rk, SUM(cw) OVER (ORDER BY rk) AS cum FROM r),
    ks AS (SELECT unnest([5, 10, 25]) AS k)
    SELECT CAST(ks.k AS INT) AS k,
           COUNT(*) AS n_types,
           CAST(MAX(c.cum) AS BIGINT) AS covered_tokens,
           CAST(ANY_VALUE(tot.n) AS BIGINT) AS total_tokens,
           CAST(MAX(c.cum) AS DOUBLE) / CAST(ANY_VALUE(tot.n) AS DOUBLE)
             AS coverage
    FROM ks JOIN c ON c.rk <= ks.k CROSS JOIN tot
    GROUP BY ks.k
    """,
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-sizing curve (operators/profile.py vocab_coverage): token
    mass covered by the top-{{5,10,25}} frequency vocabulary, tie-broken
    (count DESC, word ASC).  The testdata's closed ~31-word vocabulary makes
    the small ks the informative ones; at corpus scale the same operator
    runs ks up to the guarded 1M bound."""
    from kafka_flow_spark.operators.profile import vocab_coverage

    return vocab_coverage(load(spark, sf_dir, "documents"), "text", ks=(5, 10, 25))


# --- BPE tokenizer training + segmentation (iterative merge training is the
# canonical non-SQL-expressible op — rows-only, differential-tested against
# hand-worked merge tables and a losslessness property in tests/test_bpe.py) ---
@register("q_bpe_merges")
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a 50-rule BPE merge table on the corpus (operators/bpe.py):
    one corpus pass for the word histogram, merge training on the
    vocab-bounded histogram — corpus pair statistics exactly, the shape
    production tokenizer trainers use."""
    from kafka_flow_spark.operators.bpe import bpe_train

    return bpe_train(load(spark, sf_dir, "documents"), "text", n_merges=50)


@register("q_bpe_segment")
def q_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment every document with the corpus-trained merge table:
    broadcast merge ranks + Arrow-batched per-word merge loop (memoized per
    distinct word per batch).  Losslessness (pieces concat == word) is a
    pytest property; compression ratio n_pieces/n_tokens is the tokenizer
    quality signal."""
    from kafka_flow_spark.operators.bpe import bpe_segment, bpe_train

    docs = load(spark, sf_dir, "documents")
    mt = bpe_train(docs, "text", n_merges=50)
    merges = [(r["left"], r["right"]) for r in mt.orderBy("rank").collect()]
    return bpe_segment(docs, "doc_id", "text", merges).select(
        "doc_id", "n_tokens", "n_pieces"
    )


@register("q_bpe_fertility")
def q_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fertility data card per source under the corpus-TRAINED 50-rule BPE
    (operators/bpe.bpe_fertility_card) — the real-tokenizer sibling of the
    regex-proxy q_tokenizer_fertility (review r10 #6): same columns, same
    e6 rationals, but bpe_tokens counts the trained segmentation's pieces.
    Rows-only like the other trained-BPE queries (the merge loop is not
    SQL-expressible); differential-tied to the proxy card in
    tests/test_bpe.py — ws_tokens matches the oracle-gated proxy card
    EXACTLY (shared tokenization contract) and fertility_e6 is
    monotonically non-increasing in n_merges."""
    from kafka_flow_spark.operators.bpe import bpe_fertility_card, bpe_train

    docs = load(spark, sf_dir, "documents")
    mt = bpe_train(docs, "text", n_merges=50)
    merges = [(r["left"], r["right"]) for r in mt.orderBy("rank").collect()]
    return bpe_fertility_card(docs, "source", "doc_id", "text", merges)


@register(
    "q_zipf_alpha",
    oracle=f"""
    WITH t AS (SELECT source, {_NTOKS} AS toks FROM documents),
    e AS (SELECT source, UNNEST(toks) AS w FROM t WHERE len(toks) > 0),
    f AS (SELECT source, w, COUNT(*) AS freq FROM e GROUP BY source, w),
    r AS (SELECT source, freq,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY freq DESC, w) AS rnk
          FROM f),
    xy AS (SELECT source,
                  CAST(FLOOR(LN(CAST(rnk AS DOUBLE)) * 1000000.0) AS BIGINT) AS x,
                  CAST(FLOOR(LN(CAST(freq AS DOUBLE)) * 1000000.0) AS BIGINT) AS y
           FROM r WHERE rnk <= 10000),
    s AS (SELECT source, CAST(COUNT(*) AS HUGEINT) AS n,
                 CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
                 CAST(SUM(x * y) AS HUGEINT) AS sxy,
                 CAST(SUM(x * x) AS HUGEINT) AS sxx
          FROM xy GROUP BY source HAVING COUNT(*) >= 2)
    SELECT source, CAST(n AS BIGINT) AS n_ranks,
           CAST(((n * sxy - sx * sy) * 1000000) // (n * sxx - sx * sx)
                AS BIGINT) AS slope_e6
    FROM s
    """,
)
def q_zipf_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Zipf exponent (operators/quality.zipf_fit): least-squares
    slope of the log-log rank/frequency head (top 10k ranks, deterministic
    freq-DESC/word-ASC ranking) — the corpus-naturalness diagnostic
    (natural text ≈ −1e6 micro-slope; templated feeds bend away).  FLOOR-e6
    ln coordinates + DECIMAL(38,0) closed-form slope with ONE truncating
    division: the fitted exponent itself hash-matches DuckDB."""
    from kafka_flow_spark.operators.quality import zipf_fit

    return zipf_fit(load(spark, sf_dir, "documents"), "source", "text")


@register(
    "q_token_entropy",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_NTOKS} AS toks FROM documents),
    e AS (SELECT doc_id, UNNEST(toks) AS tok FROM t WHERE len(toks) > 0),
    c AS (SELECT doc_id, tok, COUNT(*) AS c FROM e GROUP BY doc_id, tok),
    a AS (SELECT doc_id,
                 CAST(SUM(c) AS BIGINT) AS n_tokens,
                 CAST(COUNT(*) AS BIGINT) AS n_types,
                 SUM(c * CAST(ROUND(LN(c) * 1000000) AS BIGINT)) AS sum_cln
          FROM c GROUP BY doc_id)
    SELECT doc_id, n_tokens, n_types,
           CAST(CAST(ROUND(LN(n_tokens) * 1000000) AS BIGINT)
                - sum_cln // n_tokens AS BIGINT) AS entropy_e6
    FROM a
    """,
)
def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token-distribution Shannon entropy
    (operators/quality.token_entropy): the templated-text signal ratio
    heuristics miss — exact micro-nat bigints (one ROUND-e6 ln per distinct
    count, truncating division), so thresholds are engine-identical.
    Gram-explode class; nothing wider than a token shuffles."""
    from kafka_flow_spark.operators.quality import token_entropy

    return token_entropy(load(spark, sf_dir, "documents"), "doc_id", "text")


_HTML_WRAP_SQL = (
    "'<html><!-- nav --><script>var x=1;</script>"
    "<style>p{margin:0}</style><body><h1>Title</h1><p>' || text || "
    "'</p><div>footer &amp; links</div></body></html>'"
)


@register(
    "q_html_extract",
    oracle=f"""
    WITH h AS (SELECT doc_id, {_HTML_WRAP_SQL} AS html
               FROM documents WHERE text IS NOT NULL),
    e AS (SELECT doc_id,
      trim(regexp_replace(
        replace(replace(replace(replace(replace(replace(
          regexp_replace(
          regexp_replace(
          regexp_replace(
          regexp_replace(html, '(?s)<!--.*?-->', ' ', 'g'),
            '(?is)<script\\b[^>]*>.*?</script>', ' ', 'g'),
            '(?is)<style\\b[^>]*>.*?</style>', ' ', 'g'),
            '<[^>]+>', ' ', 'g'),
          '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
          '&#39;', ''''), '&amp;', '&'),
        '\\s+', ' ', 'g')) AS extracted
      FROM h)
    SELECT doc_id, extracted, CAST(length(extracted) AS BIGINT) AS n_chars
    FROM e
    """,
)
def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl→text extraction (operators/text.html_to_text): every document
    wrapped in a deterministic HTML shell (comments, script/style blocks,
    block tags, entities) and stripped back to text — the whole
    comment/script/tag/entity/whitespace chain is pure codegen
    regexp_replace, value-exact against the mirrored DuckDB chain.  The
    shell is the fixture; the CONTRACT under test is the extraction chain a
    raw-crawl pipeline runs at scan speed before any other operator here."""
    from kafka_flow_spark.operators.text import html_to_text

    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    html = F.concat(
        F.lit(
            "<html><!-- nav --><script>var x=1;</script>"
            "<style>p{margin:0}</style><body><h1>Title</h1><p>"
        ),
        F.col("text"),
        F.lit("</p><div>footer &amp; links</div></body></html>"),
    )
    extracted = html_to_text(html)
    return docs.select(
        "doc_id",
        extracted.alias("extracted"),
        F.length(extracted).cast("long").alias("n_chars"),
    )


# --- URL canonicalization (crawl-curation primitives) -----------------------
#
# The corpus ships without a url column, so (as with q_html_extract's HTML
# shell) the messy url is a DETERMINISTIC fixture built from doc_id + source
# with one shared SQL expression evaluated by BOTH engines: scheme/host case
# noise, www. prefixes, default and explicit ports, trailing slashes, utm_*
# tracking params in lead/mid/tail positions, and fragments.  The CONTRACT
# under test is the canonicalization chain (operators/text.canonicalize_url).

_URL_FIXTURE = (
    "(CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END) || '://' || "
    "(CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) || source || "
    "(CASE WHEN doc_id % 4 = 0 THEN '.Example.COM' ELSE '.example.org' END) || "
    "(CASE WHEN doc_id % 5 = 0 THEN "
    "   (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END) "
    " WHEN doc_id % 7 = 0 THEN ':8080' ELSE '' END) || "
    "'/docs/d' || (doc_id % 11) || "
    "(CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END) || "
    "(CASE WHEN doc_id % 3 = 0 THEN '?id=' || (doc_id % 13) "
    "        || '&utm_source=feed&utm_campaign=x' "
    " WHEN doc_id % 3 = 1 THEN '?utm_medium=cpc&id=' || (doc_id % 13) "
    " ELSE '?id=' || (doc_id % 13) END) || "
    "(CASE WHEN doc_id % 6 = 0 THEN '#section-2' ELSE '' END)"
)

# The oracle mirror of the whole chain, shared by both url queries.
_URL_CANON_CTES = f"""
    u AS (SELECT doc_id, {_URL_FIXTURE} AS url FROM documents),
    pr AS (SELECT doc_id, url,
             lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
               AS scheme,
             regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
           FROM u),
    hp AS (SELECT *, lower(regexp_extract(rest, '^([^/?#]*)', 1)) AS hostport,
             regexp_replace(rest, '^[^/?#]*', '') AS pathq
           FROM pr),
    hb AS (SELECT *, regexp_replace(hostport, '^www\\.', '') AS bare FROM hp),
    hh AS (SELECT *,
             CASE WHEN scheme = 'http' THEN regexp_replace(bare, ':80$', '')
                  WHEN scheme = 'https' THEN regexp_replace(bare, ':443$', '')
                  ELSE bare END AS host
           FROM hb),
    cc AS (SELECT doc_id, url, scheme, host,
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             regexp_replace(regexp_replace(regexp_replace(pathq,
               '(?s)#.*', ''),
               '&utm_[^&#]*', '', 'g'),
               '\\?utm_[^&#]*&', '?'),
               '\\?utm_[^&#]*$', ''),
               '/+\\?', '?'),
               '/+$', ''),
               '\\?$', '') AS p
           FROM hh),
    canon AS (SELECT doc_id, url,
                CASE WHEN scheme = '' THEN host || p
                     ELSE scheme || '://' || host || p END AS canonical,
                CASE WHEN regexp_matches(regexp_replace(host, ':[0-9]+$', ''),
                                         '[^.]+\\.[^.]+$')
                     THEN regexp_extract(regexp_replace(host, ':[0-9]+$', ''),
                                         '([^.]+\\.[^.]+)$', 1)
                     ELSE regexp_replace(host, ':[0-9]+$', '') END AS domain
              FROM cc)
"""

# One entry that OCCURS (the fixture's registrable domains are exactly
# example.com / example.org — the anti-join demonstrably removes ~half the
# corpus, so a join-key bug fails the parity test) and one that doesn't
# (pinning that non-matching entries remove nothing).
_DOMAIN_BLOCKLIST = ["example.org", "spam.example.net"]


@register(
    "q_url_canonicalize",
    bench=True,
    oracle=f"""
    WITH {_URL_CANON_CTES}
    SELECT doc_id, url, canonical, domain FROM canon
    """,
)
def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-url + registrable-domain extraction (operators/text.
    canonicalize_url / url_domain): the first dedup key of every crawl
    pipeline.  Scheme/host lower-casing, www./default-port stripping,
    utm_* param removal in all three positions, fragment and
    trailing-slash cleanup — a pure codegen regexp chain at scan speed,
    value-exact against the literal same patterns in DuckDB."""
    from kafka_flow_spark.operators.text import canonicalize_url, url_domain

    docs = load(spark, sf_dir, "documents")
    url = F.expr(_URL_FIXTURE)
    return docs.select(
        "doc_id",
        url.alias("url"),
        canonicalize_url(url).alias("canonical"),
        url_domain(url).alias("domain"),
    )


@register(
    "q_domain_stats",
    oracle=f"""
    WITH {_URL_CANON_CTES}
    SELECT domain,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT canonical) AS n_urls
    FROM canon
    WHERE domain NOT IN ({", ".join(f"'{d}'" for d in _DOMAIN_BLOCKLIST)})
    GROUP BY domain
    """,
)
def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain crawl stats behind a blocklist gate: canonical urls from
    q_url_canonicalize aggregated per registrable domain, with blocklisted
    domains removed by a BROADCAST anti-join (a real blocklist is millions
    of rows — an IN-list does not survive; the anti-join plan does)."""
    canon = q_url_canonicalize(spark, sf_dir)
    block = spark.createDataFrame(
        [(d,) for d in _DOMAIN_BLOCKLIST], "domain string"
    )
    return (
        canon.join(F.broadcast(block), "domain", "left_anti")
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("canonical").alias("n_urls"),
        )
    )


@register(
    "q_url_dedup_pages",
    oracle=f"""
    WITH {_URL_CANON_CTES}
    SELECT regexp_replace(canonical, '\\?.*$', '') AS page_url,
           MAX(domain) AS domain,
           COUNT(*) AS n_crawls,
           MAX(doc_id) AS kept_doc
    FROM canon
    GROUP BY page_url
    """,
)
def q_url_dedup_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl re-visit dedup: canonical urls further collapsed to the PAGE
    level (query string stripped — parameter variants of a static page are
    the same content) and deduplicated keep-latest (max doc_id = newest
    crawl wins, the LWW rule every snapshot table here uses).  The
    composition a crawl ingest runs between url canonicalization and text
    dedup; one map-combinable aggregate on the page key."""
    canon = q_url_canonicalize(spark, sf_dir)
    page = F.regexp_replace(F.col("canonical"), r"\?.*$", "")
    return (
        canon.select("doc_id", "domain", page.alias("page_url"))
        .groupBy("page_url")
        .agg(
            F.max("domain").alias("domain"),
            F.count(F.lit(1)).alias("n_crawls"),
            F.max("doc_id").alias("kept_doc"),
        )
    )


# --- per-source quantile gating + gate agreement -----------------------------

_ENTROPY_GATE_CTES = f"""
    t AS (SELECT doc_id, source, {_NTOKS} AS toks FROM documents),
    e AS (SELECT doc_id, source, UNNEST(toks) AS tok FROM t WHERE len(toks) > 0),
    c AS (SELECT doc_id, source, tok, COUNT(*) AS c
          FROM e GROUP BY doc_id, source, tok),
    a AS (SELECT doc_id, source,
                 CAST(SUM(c) AS BIGINT) AS n_tokens,
                 SUM(c * CAST(ROUND(LN(c) * 1000000) AS BIGINT)) AS sum_cln
          FROM c GROUP BY doc_id, source),
    sc AS (SELECT doc_id, source,
                  CAST(CAST(ROUND(LN(n_tokens) * 1000000) AS BIGINT)
                       - sum_cln // n_tokens AS BIGINT) AS entropy_e6
           FROM a),
    rk AS (SELECT doc_id, source, entropy_e6,
                  ROW_NUMBER() OVER (PARTITION BY source
                                     ORDER BY entropy_e6 DESC, doc_id)
                    AS rank_in_source,
                  COUNT(*) OVER (PARTITION BY source) AS n_source
           FROM sc)
"""


@register(
    "q_source_entropy_gate",
    oracle=f"""
    WITH {_ENTROPY_GATE_CTES}
    SELECT doc_id, source, entropy_e6,
           CAST(rank_in_source AS BIGINT) AS rank_in_source,
           CAST(n_source AS BIGINT) AS n_source,
           (rank_in_source - 1) * 100 < 50 * n_source AS keep
    FROM rk
    """,
)
def q_source_entropy_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE quantile gating on token entropy (operators/quality.
    source_quantile_gate): each source keeps its most token-diverse half —
    FineWeb-style per-domain thresholds; a single global entropy cut lets
    one verbose domain swamp the budget.  Fully integer keep rule
    ((rank-1)*100 < pct*n), ONE window exchange on source on top of the
    oracle-proven entropy aggregate."""
    from kafka_flow_spark.operators.quality import (
        source_quantile_gate,
        token_entropy,
    )

    docs = load(spark, sf_dir, "documents")
    ent = token_entropy(docs, "doc_id", "text").select("doc_id", "entropy_e6")
    scored = ent.join(docs.select("doc_id", "source"), "doc_id")
    return source_quantile_gate(
        scored, "source", "doc_id", "entropy_e6", keep_frac_pct=50
    ).select(
        "doc_id", "source", "entropy_e6", "rank_in_source", "n_source", "keep"
    )


@register(
    "q_gate_agreement",
    oracle=f"""
    WITH {_ENTROPY_GATE_CTES},
    gate_b AS (SELECT doc_id,
                      (rank_in_source - 1) * 100 < 50 * n_source AS keep_b
               FROM rk),
    qt AS (SELECT doc_id, {_TOKS} AS toks,
                  length(text) AS nc,
                  length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
                    AS np
           FROM documents),
    qs AS (SELECT doc_id, nc, np,
                  CAST(len(toks) AS INT) AS n_words,
                  COALESCE(list_sum(list_transform(toks, x -> length(x))), 0)
                    AS chars,
                  CAST(len(list_filter(toks, x -> list_contains(
                       ['the','a','and','of','to','is'], lower(x)))) AS INT)
                    AS n_stopwords,
                  CASE WHEN len(toks) >= 2
                       THEN list_transform(range(len(toks)-1),
                                           i -> toks[i+1] || ' ' || toks[i+2])
                       ELSE [] END AS g2
           FROM qt),
    gate_a AS (SELECT doc_id,
                      (n_words >= 10 AND n_words <= 100000
                       AND (CASE WHEN n_words = 0 THEN 0.0
                                 ELSE chars * 1.0 / n_words END) >= 2.0
                       AND (CASE WHEN n_words = 0 THEN 0.0
                                 ELSE chars * 1.0 / n_words END) <= 12.0
                       AND n_stopwords >= 1
                       AND (CASE WHEN len(g2) = 0 THEN 0.0
                                 ELSE (len(g2) - len(list_distinct(g2))) * 1.0
                                      / len(g2) END) <= 0.9
                       AND (CASE WHEN nc = 0 THEN 0.0
                                 ELSE np * 1.0 / nc END) <= 0.1) AS keep_a
               FROM qs),
    j AS (SELECT keep_a, keep_b FROM gate_a JOIN gate_b USING (doc_id)),
    m AS (SELECT
            CAST(SUM(CASE WHEN keep_a AND keep_b THEN 1 ELSE 0 END) AS BIGINT) AS a,
            CAST(SUM(CASE WHEN keep_a AND NOT keep_b THEN 1 ELSE 0 END) AS BIGINT) AS b,
            CAST(SUM(CASE WHEN NOT keep_a AND keep_b THEN 1 ELSE 0 END) AS BIGINT) AS c,
            CAST(SUM(CASE WHEN NOT keep_a AND NOT keep_b THEN 1 ELSE 0 END) AS BIGINT) AS d
          FROM j),
    k AS (SELECT a, b, c, d, a + b + c + d AS n,
                 CAST(a + b + c + d AS HUGEINT) * (a + d) AS po_num,
                 CAST(a + b AS HUGEINT) * (a + c)
                   + CAST(c + d AS HUGEINT) * (b + d) AS pe_num,
                 CAST(a + b + c + d AS HUGEINT)
                   * (a + b + c + d) AS n_sq
          FROM m)
    SELECT n, a, b, c, d,
           CAST(po_num * 1000000 // n_sq AS BIGINT) AS po_e6,
           CAST(pe_num * 1000000 // n_sq AS BIGINT) AS pe_e6,
           CASE WHEN n_sq - pe_num = 0 THEN NULL
                WHEN po_num >= pe_num
                THEN CAST((po_num - pe_num) * 1000000 // (n_sq - pe_num) AS BIGINT)
                ELSE CAST(-((pe_num - po_num) * 1000000 // (n_sq - pe_num)) AS BIGINT)
           END AS kappa_e6
    FROM k
    """,
)
def q_gate_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the Gopher/C4 rule gate and the per-source
    entropy-quantile gate (operators/quality.gate_agreement_kappa): the
    beyond-chance agreement number a pipeline reports before swapping one
    gate for the other.  Exact bigint confusion counts, e6 truncating
    divisions with explicit negative handling; ONE global aggregate."""
    from kafka_flow_spark.operators.quality import (
        gate_agreement_kappa,
        quality_flags,
    )

    docs = load(spark, sf_dir, "documents")
    gate_a = quality_flags(docs, "doc_id", "text").select(
        "doc_id", F.col("keep").alias("keep_a")
    )
    gate_b = q_source_entropy_gate(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("keep_b")
    )
    return gate_agreement_kappa(gate_a.join(gate_b, "doc_id"), "keep_a", "keep_b")


# --- referential-integrity + event-order audits -------------------------------


@register(
    "q_fk_integrity_audit",
    oracle="""
    WITH dimf AS (SELECT p_partkey FROM part WHERE p_partkey % 7 != 0),
    fs AS (SELECT COUNT(*) AS n_fact,
                  CAST(SUM(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_null_fk
           FROM lineitem),
    orph AS (SELECT COUNT(*) AS n_orphans
             FROM lineitem l LEFT JOIN dimf p ON l.l_partkey = p.p_partkey
             WHERE l.l_partkey IS NOT NULL AND p.p_partkey IS NULL),
    ds AS (SELECT COUNT(*) AS n_dim,
                  CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_dup_pk_values,
                  CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
                    AS n_dup_pk_rows
           FROM (SELECT p_partkey, COUNT(*) AS c FROM dimf GROUP BY 1))
    SELECT n_fact, n_null_fk, n_orphans,
           CAST(CAST(n_orphans AS HUGEINT) * 1000000 // n_fact AS BIGINT)
             AS orphan_rate_e6,
           n_dim, n_dup_pk_values, n_dup_pk_rows
    FROM fs CROSS JOIN orph CROSS JOIN ds
    """,
)
def q_fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit of lineitem→part against a DAMAGED dim
    (every 7th part dropped — the fixture that makes the orphan path carry
    real rows; operators/profile.fk_integrity_report): orphan counts and
    rate, null fks, duplicated-pk join-multiplication counts — the ONE-row
    report a pipeline checks before an inner join silently drops or
    multiplies fact rows.  One anti-join + bounded aggregates."""
    from kafka_flow_spark.operators.profile import fk_integrity_report

    fact = load(spark, sf_dir, "lineitem")
    dim = load(spark, sf_dir, "part").where(F.col("p_partkey") % 7 != 0)
    return fk_integrity_report(fact, dim, "l_partkey", "p_partkey")


@register(
    "q_event_order_audit",
    oracle="""
    WITH d AS (SELECT user_id,
                      epoch_us(ts) - LAG(epoch_us(ts)) OVER
                        (PARTITION BY user_id ORDER BY event_id) AS step
               FROM events)
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN step < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_backwards,
           CAST(MAX(CASE WHEN step < 0 THEN -step ELSE 0 END) AS BIGINT)
             AS max_backstep_us,
           CAST(CAST(SUM(CASE WHEN step < 0 THEN 1 ELSE 0 END) AS HUGEINT)
                * 1000000 // COUNT(*) AS BIGINT) AS backwards_rate_e6
    FROM d GROUP BY user_id
    """,
)
def q_event_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-time ordering audit over the event stream (operators/
    profile.event_order_audit): within each user, ordered by event_id (the
    transport order), how often does the embedded timestamp step backwards
    and by at most how much — max_backstep_us IS the minimum safe watermark
    delay, backwards_rate_e6 the damage of choosing less.  ONE window
    exchange + one map-combinable aggregate, exact epoch-microsecond
    integers."""
    from kafka_flow_spark.operators.profile import event_order_audit

    return event_order_audit(
        load(spark, sf_dir, "events"), "user_id", "event_id", "ts"
    )
