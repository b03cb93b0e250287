"""Oracle-gated queries for the full-text search operators (operators/search.py).

The reference never inspects payload text (kafka-flow folds opaque bytes —
`core/.../Fold.scala:14`); keyword retrieval over the corpus is Phase-4
surface (SURVEY.md §7): eval-curation "grep", contamination triage, topic
mining.  Scoring is rational-idf BM25 quantized to integer micro-units so the
cross-term sum is order-insensitive and bit-identical across engines (see the
operator module docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flow_spark.operators import search as S
from kafka_flow_spark.plans.registry import register
from kafka_flow_spark.tables import load

# The fixed query set for the registry proof (two multi-term queries over the
# synthetic corpus vocabulary).
QUERY_TERMS = {
    "q_engine": ["spark", "vector", "merge"],
    "q_retail": ["customer", "join"],
}

_QUERY_VALUES = ", ".join(
    f"('{qid}', '{t}')" for qid, terms in sorted(QUERY_TERMS.items()) for t in terms
)

# Tokenization shared with q_explode_word_counts' oracle: normalize (collapse
# whitespace, lower, trim) then split on single spaces.
_TOKS = (
    "string_split_regex(trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')"
)

_BM25_ORACLE = f"""
WITH queries(query_id, term) AS (VALUES {_QUERY_VALUES}),
toks AS (
  SELECT doc_id, UNNEST({_TOKS}) AS term
  FROM documents WHERE length(trim(text)) > 0),
toks2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
post AS (SELECT term, doc_id, COUNT(*) AS tf FROM toks2 GROUP BY term, doc_id),
dls AS (SELECT doc_id, COUNT(*) AS dl FROM toks2 GROUP BY doc_id),
corpus AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl FROM dls),
qpost AS (SELECT p.* FROM post p JOIN (SELECT DISTINCT term FROM queries) USING (term)),
dfreq AS (SELECT term, COUNT(*) AS df FROM qpost GROUP BY term),
scored AS (
  SELECT q.query_id, p.doc_id,
         CAST(floor(
           (((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
            * ((CAST(tf AS DOUBLE) * 2.2)
               / (CAST(tf AS DOUBLE)
                  + (0.3 + (0.9 * CAST(dl AS DOUBLE))
                           / (CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
           * 1000000.0 + 0.5) AS BIGINT) AS s
  FROM qpost p
  JOIN queries q USING (term)
  JOIN dfreq USING (term)
  JOIN dls USING (doc_id)
  CROSS JOIN corpus),
agg AS (SELECT query_id, doc_id, CAST(SUM(s) AS BIGINT) AS score_micro
        FROM scored GROUP BY query_id, doc_id)
SELECT query_id, doc_id, rank, score_micro FROM (
  SELECT query_id, doc_id, score_micro,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score_micro DESC, doc_id) AS rank
  FROM agg)
WHERE rank <= 10
"""


@register("q_search_bm25", oracle=_BM25_ORACLE)
def q_search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 docs for each of two fixed multi-term queries, rational-idf BM25.

    Plan: postings restricted to the query vocabulary via a broadcast join,
    per-term quantized scores summed in one (query_id, doc_id) aggregate, then
    a per-query top-k window — the matched-postings shuffle is the only one
    whose width scales with the corpus."""
    docs = load(spark, sf_dir, "documents")
    queries = S.queries_from_terms(spark, QUERY_TERMS)
    return S.search_bm25(docs, queries, k=10)


_QL_ORACLE = f"""
WITH queries(query_id, term) AS (VALUES {_QUERY_VALUES}),
toks AS (
  SELECT doc_id, UNNEST({_TOKS}) AS term
  FROM documents WHERE length(trim(text)) > 0),
toks2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
dls AS (SELECT doc_id, COUNT(*) AS dl FROM toks2 GROUP BY doc_id),
corpus AS (SELECT SUM(dl) AS total_dl FROM dls),
qpost AS (SELECT term, doc_id, COUNT(*) AS tf FROM toks2
          JOIN (SELECT DISTINCT term FROM queries) USING (term)
          GROUP BY term, doc_id),
cfreq AS (SELECT term, SUM(tf) AS cf FROM qpost GROUP BY term),
scored AS (
  SELECT q.query_id, p.doc_id, dls.dl,
         CAST(floor(ln(CAST(2000 * cf + tf * total_dl AS DOUBLE)
                       / CAST(2000 * cf AS DOUBLE)) * 1000000.0 + 0.5)
              AS BIGINT) AS t
  FROM qpost p
  JOIN queries q USING (term)
  JOIN cfreq USING (term)
  JOIN dls USING (doc_id)
  CROSS JOIN corpus),
qsz AS (SELECT query_id, COUNT(*) AS qn FROM queries GROUP BY query_id),
agg AS (
  SELECT query_id, doc_id,
         SUM(t) - MAX(qn) * CAST(floor(ln(CAST(MAX(dl) + 2000 AS DOUBLE)
                                          / 2000.0) * 1000000.0 + 0.5)
                                 AS BIGINT) AS score_micro_nats
  FROM scored JOIN qsz USING (query_id)
  GROUP BY query_id, doc_id)
SELECT query_id, doc_id, rank, CAST(score_micro_nats AS BIGINT) AS score_micro_nats
FROM (
  SELECT query_id, doc_id, score_micro_nats,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score_micro_nats DESC, doc_id) AS rank
  FROM agg)
WHERE rank <= 10
"""


@register("q_search_ql", oracle=_QL_ORACLE)
def q_search_ql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 docs per fixed query under Dirichlet-smoothed query likelihood
    (operators/search.search_ql, mu=2000): the language-modeling ranking
    beside q_search_bm25's tf-idf one — same three corpus passes, same
    broadcast query relation, per-term micro-nat lns summed as bigints."""
    docs = load(spark, sf_dir, "documents")
    queries = S.queries_from_terms(spark, QUERY_TERMS)
    return S.search_ql(docs, queries, k=10)


_VOCAB_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, UNNEST({_TOKS}) AS term
  FROM documents WHERE length(trim(text)) > 0),
toks2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
counts AS (
  SELECT term, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
  FROM toks2 GROUP BY term)
SELECT term, n_occurrences, n_docs,
       ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, term) AS rank
FROM counts
ORDER BY n_occurrences DESC, term
LIMIT 20
"""


@register("q_vocab_top_terms", oracle=_VOCAB_ORACLE)
def q_vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 vocabulary by occurrences (tokenizer-training primitive).
    Distributed top-k (per-partition heaps) before the k-row rank window."""
    docs = load(spark, sf_dir, "documents")
    return S.vocab_top_k(docs, k=20)


_OOV_ORACLE = f"""
WITH toks AS (
  SELECT lang, UNNEST({_TOKS}) AS term
  FROM documents WHERE length(trim(text)) > 0),
toks2 AS (SELECT lang, term FROM toks WHERE term <> ''),
counts AS (SELECT term, COUNT(*) AS n FROM toks2 GROUP BY term),
vocab AS (SELECT term FROM counts ORDER BY n DESC, term LIMIT 10),
marked AS (
  SELECT t.lang, CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS oov
  FROM toks2 t LEFT JOIN vocab v ON t.term = v.term)
SELECT lang, COUNT(*) AS n_tokens, CAST(SUM(oov) AS BIGINT) AS n_oov,
       CAST(SUM(oov) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS oov_rate
FROM marked GROUP BY lang
"""


@register("q_vocab_oov_rate", oracle=_OOV_ORACLE)
def q_vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language OOV rate against the corpus top-10 vocab: the coverage
    report deciding whether a tokenizer vocabulary fits a corpus slice.
    Bigint counts aggregate first; one double division per output group."""
    docs = load(spark, sf_dir, "documents")
    vocab = S.vocab_top_k(docs, k=10)
    return S.oov_stats(docs, vocab, group_col="lang")


# --- hybrid retrieval: reciprocal rank fusion ------------------------------

_RRF_ORACLE = f"""
WITH queries(query_id, term) AS (VALUES {_QUERY_VALUES}),
toks AS (
  SELECT doc_id, UNNEST({_TOKS}) AS term
  FROM documents WHERE length(trim(text)) > 0),
toks2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
post AS (SELECT term, doc_id, COUNT(*) AS tf FROM toks2 GROUP BY term, doc_id),
dls AS (SELECT doc_id, COUNT(*) AS dl FROM toks2 GROUP BY doc_id),
corpus AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl FROM dls),
qpost AS (SELECT p.* FROM post p JOIN (SELECT DISTINCT term FROM queries) USING (term)),
dfreq AS (SELECT term, COUNT(*) AS df FROM qpost GROUP BY term),
scored AS (
  SELECT q.query_id, p.doc_id,
         CAST(floor(
           (((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
            * ((CAST(tf AS DOUBLE) * 2.2)
               / (CAST(tf AS DOUBLE)
                  + (0.3 + (0.9 * CAST(dl AS DOUBLE))
                           / (CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
           * 1000000.0 + 0.5) AS BIGINT) AS s
  FROM qpost p
  JOIN queries q USING (term)
  JOIN dfreq USING (term)
  JOIN dls USING (doc_id)
  CROSS JOIN corpus),
bm_agg AS (SELECT query_id, doc_id, SUM(s) AS score_micro
           FROM scored GROUP BY query_id, doc_id),
bm AS (SELECT query_id, doc_id,
              ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score_micro DESC, doc_id) AS rank
       FROM bm_agg QUALIFY rank <= 10),
tf_agg AS (SELECT q.query_id, p.doc_id, SUM(p.tf) AS tf_total
           FROM qpost p JOIN queries q USING (term)
           GROUP BY q.query_id, p.doc_id),
tfr AS (SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY tf_total DESC, doc_id) AS rank
        FROM tf_agg QUALIFY rank <= 10),
u AS (SELECT query_id, doc_id, 1000000 // (60 + rank) AS c FROM bm
      UNION ALL
      SELECT query_id, doc_id, 1000000 // (60 + rank) AS c FROM tfr),
fused AS (SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS rrf_micro,
                 CAST(COUNT(*) AS BIGINT) AS n_systems
          FROM u GROUP BY query_id, doc_id)
SELECT query_id, doc_id, rrf_micro, n_systems,
       ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY rrf_micro DESC, doc_id) AS rank
FROM fused QUALIFY rank <= 10
"""


@register("q_search_rrf", oracle=_RRF_ORACLE)
def q_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-10 and raw-TF top-10 fused with reciprocal
    rank fusion in exact 1e-6 units (operators/search.rrf_fuse) — the
    calibration-free way to combine heterogeneous rankers."""
    docs = load(spark, sf_dir, "documents")
    queries = S.queries_from_terms(spark, QUERY_TERMS)
    bm = S.search_bm25(docs, queries, k=10)
    tf = S.search_tf(docs, queries, k=10)
    return S.rrf_fuse([bm, tf], k0=60, topk=10)


# --- sparse TF-IDF cosine kNN (bag-of-words sibling of the dense ANN family) -

_TFIDF_ORACLE = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents
           WHERE length(trim(text)) > 0),
tok AS (SELECT doc_id, UNNEST(toks) AS term FROM t),
post AS (SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY term, doc_id),
stats AS (SELECT term, COUNT(*) AS df FROM post GROUP BY term),
nd AS (SELECT COUNT(*) AS n FROM t),
w AS (SELECT post.term, post.doc_id,
             post.tf * (CAST(ROUND(LN(CAST(nd.n + 1 AS DOUBLE)
                                      / CAST(stats.df + 1 AS DOUBLE)) * 1000)
                             AS BIGINT) + 1000) AS w
      FROM post JOIN stats USING (term) CROSS JOIN nd),
norms AS (SELECT doc_id, SUM(w * w) AS n2 FROM w GROUP BY doc_id),
qw AS (SELECT doc_id AS q_id, term, w AS wq FROM w WHERE doc_id < 10),
dots AS (SELECT qw.q_id, w.doc_id AS neighbor_id, SUM(qw.wq * w.w) AS dot
         FROM qw JOIN w ON qw.term = w.term AND w.doc_id != qw.q_id
         GROUP BY qw.q_id, w.doc_id),
cos AS (SELECT d.q_id, d.neighbor_id,
               CAST(d.dot AS DOUBLE)
               / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS c
        FROM dots d JOIN norms a ON a.doc_id = d.q_id
                    JOIN norms b ON b.doc_id = d.neighbor_id)
SELECT q_id, neighbor_id, ROUND(c, 4) AS cos_sim, rank FROM (
  SELECT q_id, neighbor_id, c,
         CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                                 ORDER BY c DESC, neighbor_id) AS INT) AS rank
  FROM cos)
WHERE rank <= 5
"""


@register("q_tfidf_knn", oracle=_TFIDF_ORACLE)
def q_tfidf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 TF-IDF cosine neighbors of the first 10 documents over
    the documents corpus (operators/search.tfidf_knn) — sparse vector-space
    retrieval on the inverted index, exact integer milli-nat weights, so
    the cosine values AND the ranking hash-match DuckDB."""
    from kafka_flow_spark.operators.search import tfidf_knn

    docs = load(spark, sf_dir, "documents")
    qids = docs.where(F.col("doc_id") < 10).select("doc_id")
    return tfidf_knn(docs, qids, k=5)


def _retrieval_eval_oracle() -> str:
    """Both rankers' full oracles nested as CTE bodies (DuckDB allows WITH
    inside a CTE), one shared boolean-AND relevance set, rank metrics in
    exact integers."""
    return f"""
WITH queries(query_id, term) AS (VALUES {_QUERY_VALUES}),
bm AS ({_BM25_ORACLE}),
ql AS ({_QL_ORACLE}),
toks AS (
  SELECT doc_id, UNNEST({_TOKS}) AS term
  FROM documents WHERE length(trim(text)) > 0),
dterm AS (SELECT DISTINCT term, doc_id FROM toks WHERE term <> ''),
qsz AS (SELECT query_id, COUNT(DISTINCT term) AS qn FROM queries GROUP BY query_id),
rel AS (
  SELECT q.query_id, d.doc_id
  FROM dterm d JOIN queries q USING (term)
  GROUP BY q.query_id, d.doc_id
  HAVING COUNT(DISTINCT d.term) = (SELECT qn FROM qsz WHERE qsz.query_id = q.query_id)),
nrel AS (SELECT query_id, COUNT(*) AS n_rel FROM rel GROUP BY query_id),
ranked AS (
  SELECT 'bm25' AS ranker, query_id, doc_id, rank FROM bm
  UNION ALL SELECT 'ql' AS ranker, query_id, doc_id, rank FROM ql),
h AS (
  SELECT r.ranker, r.query_id,
         COUNT(*) AS hits_at_k, MIN(r.rank) AS first_rank
  FROM ranked r JOIN rel USING (query_id, doc_id)
  WHERE r.rank <= 10
  GROUP BY r.ranker, r.query_id),
rk AS (SELECT ranker FROM (VALUES ('bm25'), ('ql')) AS t(ranker))
SELECT rk.ranker, nrel.query_id, CAST(nrel.n_rel AS BIGINT) AS n_rel,
       CAST(COALESCE(h.hits_at_k, 0) AS BIGINT) AS hits_at_k,
       CAST(COALESCE(h.hits_at_k, 0) * 1000000 // nrel.n_rel AS BIGINT) AS recall_e6,
       CAST(COALESCE(1000000 // h.first_rank, 0) AS BIGINT) AS mrr_e6
FROM nrel CROSS JOIN rk
LEFT JOIN h ON h.query_id = nrel.query_id AND h.ranker = rk.ranker
"""


@register("q_retrieval_eval", oracle=_retrieval_eval_oracle())
def q_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 and MRR@10 of BOTH rankers (BM25 and Dirichlet QL) against
    boolean-AND pseudo-relevance (operators/search.relevance_all_terms +
    retrieval_eval): the side-by-side eval a team runs before picking a
    ranking function — rankers without metrics are vibes.  Exact integer
    rank metrics, judgments shared by both arms."""
    docs = load(spark, sf_dir, "documents")
    queries = S.queries_from_terms(spark, QUERY_TERMS)
    rel = S.relevance_all_terms(docs, queries)
    out = []
    for ranker, ranked in (
        ("bm25", S.search_bm25(docs, queries, k=10)),
        ("ql", S.search_ql(docs, queries, k=10)),
    ):
        out.append(
            S.retrieval_eval(ranked, rel, k=10).select(
                F.lit(ranker).alias("ranker"), "*"
            )
        )
    return out[0].unionByName(out[1])
