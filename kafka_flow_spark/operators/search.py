"""Full-text keyword search over a document corpus: inverted index + BM25.

The training-data counterpart of "grep the corpus": targeted retrieval for
eval-set curation, contamination triage, and topic mining over a 100 TB text
table.  No counterpart in the reference (kafka-flow never inspects payloads);
this is Phase-4 surface (SURVEY.md §7).

Scale design
------------
- The inverted index is ONE explode + ONE map-side-combinable groupBy per doc
  batch: ``(term, doc_id, tf)`` postings plus per-doc lengths.  At 100 TB the
  postings table is written bucketed by term (layout.py) so query-time lookups
  are partition-pruned scans, exchange-free.
- Query sets are small by nature → broadcast equi-join against postings; the
  per-(query, doc) score aggregation groups on (query_id, doc_id) — one
  shuffle whose reduce-side cardinality is bounded by matched postings, not
  the corpus.
- Scoring avoids transcendentals so results are bit-reproducible across
  engines: the classic BM25 idf ``ln((N-df+0.5)/(df+0.5)+1)`` is replaced by
  its argument (a rational function — ``ln`` is monotone, so PER-TERM
  rankings are unchanged and single-term queries rank identically to
  classic BM25; multi-term orderings can differ, because a sum of per-term
  scores is not invariant under a per-term monotone transform — documented
  as ``rational-idf BM25``, a variant with its own well-defined contract).
  Per-term scores then quantize to integer micro-units so the
  cross-term SUM is order-insensitive (bigint), making distributed
  aggregation exact — same trick as functions.cents for money.
- Everything is JVM built-ins in whole-stage codegen; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_flow_spark.cache import scoped_persist
from kafka_flow_spark.operators import text as T

# BM25 shape parameters, pre-folded so both engines evaluate the identical
# IEEE expression tree: k1=1.2, b=0.75 → k1+1=2.2, k1*(1-b)=0.3, k1*b=0.9.
K1_PLUS_1 = 2.2
K1_ONE_MINUS_B = 0.3
K1_B = 0.9
SCORE_SCALE = 1_000_000  # micro-units: quantized per-term score granularity


def doc_tokens(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, term) pairs: normalized (lowercase, whitespace-collapsed)
    tokens exploded — the single scan every index structure derives from."""
    return (
        docs.filter(F.length(F.trim(text_col)) > 0)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(T.tokens(T.normalize_text(text_col))).alias("term"),
        )
        .filter(F.col("term") != "")
    )


def postings(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Inverted-index postings ``(term, doc_id, tf)``.

    One explode + one groupBy: partial aggregation collapses each doc's
    repeated terms map-side, so the shuffle carries at most |vocab| rows per
    doc, not |tokens|."""
    return (
        doc_tokens(docs, text_col, id_col)
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )


def doc_lengths(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, dl): token count per doc — BM25's length normalizer.  Computed
    from the token array size directly (no explode, no shuffle)."""
    return docs.filter(F.length(F.trim(text_col)) > 0).select(
        F.col(id_col).alias("doc_id"),
        F.size(T.tokens(T.normalize_text(text_col))).alias("dl"),
    )


def term_stats(post: DataFrame) -> DataFrame:
    """(term, df): document frequency per term, from postings."""
    return post.groupBy("term").agg(F.count("*").alias("df"))


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Batch multi-query BM25: score every (query_id, doc) pair that shares at
    least one term.

    ``queries`` is ``(query_id, term)`` — one row per query term.  Returns
    ``(query_id, doc_id, score_micro)`` where ``score_micro`` is the summed
    per-term rational-idf BM25 score in integer micro-units (bigint — exact,
    order-insensitive; divide by 1e6 for the float score).

    Plan shape: postings ⋈ broadcast(queries) (query term sets are small) →
    join doc lengths → per-term quantized score → groupBy (query_id, doc_id)
    sum.  corpus-size scalars (N, avgdl) ride along via a broadcast single-row
    aggregate, not a driver collect.
    """
    from pyspark.sql import Window

    # Branch economy: Spark re-executes the whole lineage per DataFrame
    # branch (no CTE materialization like DuckDB), and each branch here pays
    # a full tokenize scan.  The plan keeps exactly THREE such passes —
    # query-term postings, doc lengths, corpus scalars — by (a) filtering
    # the exploded tokens to the query vocabulary BEFORE any aggregation and
    # (b) deriving document frequency from the filtered postings with a
    # window count instead of a separate aggregate+join branch.  At real
    # scale the index is persisted once (`postings`/`doc_lengths` written
    # bucketed by layout.py) and query time touches none of these scans.
    dls = doc_lengths(docs, text_col, id_col)
    # One tiny aggregate row: corpus doc count + total token count.  Broadcast
    # cross-join (1 row) keeps the plan fully distributed.
    corpus = dls.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("total_dl"),
    )
    qterms = queries.select("term").distinct()
    qpost = (
        doc_tokens(docs, text_col, id_col)
        .join(F.broadcast(qterms), "term")
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
        .withColumn("df", F.count("*").over(Window.partitionBy("term")))
    )

    matched = (
        qpost.join(F.broadcast(queries), "term")
        .join(dls, "doc_id")
        .crossJoin(F.broadcast(corpus))
    )
    # avgdl = total_dl / n_docs: one exact bigint-to-double division; all
    # following arithmetic is IEEE +,-,*,/ in a fixed tree → bit-identical
    # across engines evaluating the same shape.
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs").cast("double")
    idf = (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5)) / (
        F.col("df").cast("double") + F.lit(0.5)
    )
    tf_d = F.col("tf").cast("double")
    tf_part = (tf_d * F.lit(K1_PLUS_1)) / (
        tf_d
        + (F.lit(K1_ONE_MINUS_B) + (F.lit(K1_B) * F.col("dl").cast("double")) / avgdl)
    )
    score_micro = F.floor(idf * tf_part * F.lit(float(SCORE_SCALE)) + F.lit(0.5)).cast(
        "long"
    )
    return (
        matched.select("query_id", "doc_id", score_micro.alias("_s"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("_s").alias("score_micro"))
    )


def search_bm25(
    docs: DataFrame,
    queries: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k docs per query by BM25: ``(query_id, doc_id, rank, score_micro)``.

    One window shuffle on query_id (tiny cardinality: ranking runs as a
    per-query top-k with rank-limit pushdown).  Ties break on doc_id so the
    result is a total order — reproducible across engines and partitionings.
    """
    from pyspark.sql import Window

    scored = bm25_scores(docs, queries, text_col, id_col)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_micro"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank", "score_micro")
    )


def vocab_top_k(
    docs: DataFrame, k: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus vocabulary: top-k terms by total occurrences.

    ``(term, n_occurrences, n_docs, rank)`` — ties break on the term string so
    the cut is a total order.  One explode + one map-combinable groupBy + one
    single-partition top-k window (k is small; the heavy lifting is the
    partial aggregation map-side).  This is the tokenizer-training /
    vocab-coverage primitive of a corpus pipeline."""
    from pyspark.sql import Window

    counts = (
        doc_tokens(docs, text_col, id_col)
        .groupBy("term")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
    )
    # Distributed top-k FIRST (TakeOrderedAndProject — per-partition heaps,
    # no global sort), then rank the k survivors with a window that only ever
    # sees k rows.  A bare row_number window here would funnel the whole
    # vocabulary (billions of terms at 100 TB) through one partition.
    top = counts.orderBy(F.desc("n_occurrences"), F.asc("term")).limit(k)
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("term"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "term", "n_occurrences", "n_docs", "rank"
    )


def oov_stats(
    docs: DataFrame,
    vocab: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Out-of-vocabulary rate per group against a vocab DataFrame (``term``).

    ``(group, n_tokens, n_oov, oov_rate)`` — the coverage report that decides
    whether a tokenizer vocab is big enough for a corpus slice.  Exact-rational
    output: bigint token counts aggregated first, ONE double division per
    output group (order-insensitive, engine-exact).  Plan: explode → broadcast
    left-semi-style vocab probe (vocab is small by construction) → one
    groupBy."""
    toks = docs.filter(F.length(F.trim(text_col)) > 0).select(
        F.col(group_col).alias("grp"),
        F.explode(T.tokens(T.normalize_text(text_col))).alias("term"),
    ).filter(F.col("term") != "")
    marked = toks.join(
        F.broadcast(vocab.select("term").distinct().withColumn("_iv", F.lit(1))),
        "term",
        "left",
    )
    return (
        marked.groupBy("grp")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("_iv").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_tokens",
            "n_oov",
            (F.col("n_oov").cast("double") / F.col("n_tokens").cast("double")).alias(
                "oov_rate"
            ),
        )
    )


def queries_from_terms(spark, query_terms: dict[str, list[str]]) -> DataFrame:
    """Build the ``(query_id, term)`` DataFrame from a {query_id: [terms]}
    dict (terms are normalized the same way doc text is)."""
    rows = [
        (qid, t.strip().lower())
        for qid, terms in sorted(query_terms.items())
        for t in terms
    ]
    return spark.createDataFrame(rows, "query_id string, term string").distinct()


def search_tf(
    docs: DataFrame,
    queries: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k docs per query by PLAIN term-frequency (sum of query-term
    occurrences) — the naive lexical baseline BM25 corrects: no idf, no
    length normalization.  Useful on its own for phrase-stuffing diagnostics
    and as a second system for rank fusion (``rrf_fuse``).

    ``(query_id, doc_id, rank, tf_total)``; exact integer scores, ties on
    doc_id.  Plan: ONE tokenize pass — postings filtered to the broadcast
    query vocabulary before aggregation, then a per-query top-k window.
    """
    from pyspark.sql import Window

    post = postings(docs, text_col, id_col)
    matched = post.join(F.broadcast(queries), "term")
    scored = matched.groupBy("query_id", id_col).agg(
        F.sum("tf").alias("tf_total")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("tf_total"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "rank", "tf_total")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k0: int = 60,
    topk: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR'09):

        rrf(d) = Σ_systems 1 / (k0 + rank_s(d))

    over each system's ``(query_id, doc_id, rank)`` top-k table, in EXACT
    1e-6 units via integer division (10^6 // (k0 + rank) — bit-reproducible
    on any engine; the float form differs in summation order).  RRF is the
    standard way to combine lexical + dense retrieval without score
    calibration, since it only consumes ranks.

    Output: (query_id, doc_id, rrf_micro, n_systems, rank) — top-k fused per
    query, ties on doc_id.  Scale shape: a union of already-top-k tables
    (|queries| × k × systems rows), one map-combinable sum, one per-query
    window over ≤ systems·k candidates.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    from pyspark.sql import Window

    contribs = [
        r.select(
            "query_id",
            id_col,
            F.expr(f"1000000 div ({k0} + rank)").cast("long").alias("_c"),
        )
        for r in rankings
    ]
    u = contribs[0]
    for c in contribs[1:]:
        u = u.union(c)
    fused = u.groupBy("query_id", id_col).agg(
        F.sum("_c").alias("rrf_micro"), F.count(F.lit(1)).alias("n_systems")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_micro"), F.asc(id_col))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select("query_id", id_col, "rrf_micro", "n_systems", "rank")
    )


IDF_SCALE = 1_000  # milli-nats: idf_scaled = round(ln((1+N)/(1+df))*1e3) + 1e3


def tfidf_weights(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Sparse TF-IDF document vectors as an inverted index:
    ``(term, doc_id, w)`` with EXACT integer weights

        w = tf · idf_scaled,   idf_scaled = round(ln((1+N)/(1+df)) · 1e3) + 1e3

    (the scikit-learn smooth-idf ``ln((1+N)/(1+df)) + 1``, quantized to
    milli-nats so every downstream dot product and norm is a bigint sum —
    order-insensitive, hash-identical across engines; the quantization IS
    the contract, same posture as search.py's rational-idf BM25).  ``ln``
    runs once per TERM on an integer ratio (the safe transcendental class).

    Overflow posture (ANSI: loud throw, never silent wrap): per-doc norm
    sums Σ (tf·idf)² stay inside int64 for docs up to ~500k tokens at this
    scale — beyond that, chunk the doc upstream.
    """
    post = postings(docs, text_col, id_col)
    stats = term_stats(post)
    n_docs = doc_lengths(docs, text_col, id_col).agg(
        F.count(F.lit(1)).alias("_nd")
    )
    idf = (
        F.round(
            F.log(
                (F.col("_nd") + 1).cast("double") / (F.col("df") + 1).cast("double")
            )
            * IDF_SCALE
        ).cast("long")
        + IDF_SCALE
    )
    return (
        post.join(stats, "term")
        .crossJoin(F.broadcast(n_docs))
        .select("term", "doc_id", (F.col("tf") * idf).alias("w"))
    )


def tfidf_knn(
    docs: DataFrame,
    query_ids: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Exact top-k TF-IDF cosine neighbors of each query document — SPARSE
    vector search via the inverted index, the bag-of-words sibling of the
    dense-embedding kNN family (brute-force/int8/IVF/LSH/PQ all rank dense
    ``array<float>``; this ranks the corpus's own term space).

    Scale shape: the dot product is an equi-join ON TERM between the query
    side's postings (|queries|·terms — broadcast material) and the corpus
    postings, then ONE map-combinable groupBy(q, d) bigint sum — only
    co-occurring terms ever join, which is the whole point of an inverted
    index; no dense dim-length work anywhere.  Norms are one map-combinable
    aggregate; the final cosine divides two exact bigints under mirrored
    double sqrt, so ROUND(cos, 4) and the (cos DESC, id) ranking are
    engine-exact.

    ``query_ids``: one column of document ids (must exist in ``docs``).
    Output: (q_id, neighbor_id, cos_sim, rank), self excluded.
    """
    from pyspark.sql.window import Window

    w = scoped_persist(tfidf_weights(docs, text_col, id_col))
    norms = w.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    qids = query_ids.select(F.col(query_ids.columns[0]).alias("q_id"))
    qw = w.join(F.broadcast(qids), w.doc_id == qids.q_id).select(
        "q_id", F.col("term").alias("_t"), F.col("w").alias("_wq")
    )
    dots = (
        w.join(F.broadcast(qw), (F.col("term") == F.col("_t")) & (F.col("doc_id") != F.col("q_id")))
        .groupBy("q_id", F.col("doc_id").alias("neighbor_id"))
        .agg(F.sum(F.col("_wq") * F.col("w")).alias("_dot"))
    )
    qn = norms.select(F.col("doc_id").alias("q_id"), F.col("n2").alias("_qn"))
    nn = norms.select(F.col("doc_id").alias("neighbor_id"), F.col("n2").alias("_nn"))
    cos = (
        dots.join(F.broadcast(qn), "q_id")
        .join(nn, "neighbor_id")
        .select(
            "q_id",
            "neighbor_id",
            (
                F.col("_dot").cast("double")
                / (F.sqrt(F.col("_qn").cast("double")) * F.sqrt(F.col("_nn").cast("double")))
            ).alias("_cos"),
        )
    )
    rank_w = Window.partitionBy("q_id").orderBy(F.desc("_cos"), F.asc("neighbor_id"))
    return (
        cos.withColumn("rank", F.row_number().over(rank_w))
        .where(F.col("rank") <= k)
        .select("q_id", "neighbor_id", F.round("_cos", 4).alias("cos_sim"), "rank")
    )


# Dirichlet-prior query-likelihood smoothing mass (Zhai & Lafferty, "A Study
# of Smoothing Methods for Language Models Applied to Ad Hoc Information
# Retrieval", SIGIR'01 — µ=2000 is the paper's recommended default region).
QL_MU = 2000


def ql_scores(
    docs: DataFrame,
    queries: DataFrame,
    mu: int = QL_MU,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dirichlet-smoothed query-likelihood scores — the language-modeling
    ranking next to ``bm25_scores``' tf-idf one (same index, same plan
    shape, a different probability story):

        score(q, d) = Σ_{t∈q} ln(1 + tf(t,d)·|C| / (µ·cf(t)))
                      − |q| · ln((dl(d) + µ) / µ)

    (the standard rank-equivalent decomposition of Σ ln P(t|d): only
    MATCHED terms enter the sum; the document-length norm carries the
    smoothing mass of everything else.)  Each ln's argument is a ratio of
    exact bigints — ``(µ·cf + tf·|C|) / (µ·cf)`` and ``(dl+µ)/µ`` — so the
    fp work per term is ONE double division + ONE ln, quantized to
    micro-nats with the same floor(x·1e6+0.5) as BM25, then summed as
    bigints: order-insensitive, engine-identical (the LM family's
    established ln-e6 contract).  Bigint-exactness bound: µ·cf and tf·|C|
    must stay under 2^53 for the double casts to be exact — at 1e12-token
    corpora with µ=2000 that bounds cf < 4e9 per query term; beyond it,
    pre-divide cf and |C| by a shared power of two (documented, not hit at
    any tested scale).

    Returns ``(query_id, doc_id, score_micro_nats)`` for every (query, doc)
    pair sharing at least one term (bigint; negative — log-probabilities).
    Plan: the same THREE corpus passes as BM25 (query-vocabulary postings,
    doc lengths, one corpus-scalar row), broadcast query relation, one
    (query_id, doc_id) reduce.  cf(t) rides the postings via a window over
    the tiny query vocabulary, exactly as df does for BM25.
    """
    from pyspark.sql import Window

    if mu < 1:
        raise ValueError(f"mu must be >= 1, got {mu}")
    dls = doc_lengths(docs, text_col, id_col)
    corpus = dls.agg(F.sum("dl").alias("total_dl"))
    qterms = queries.select("term").distinct()
    qpost = (
        doc_tokens(docs, text_col, id_col)
        .join(F.broadcast(qterms), "term")
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
        .withColumn("cf", F.sum("tf").over(Window.partitionBy("term")))
    )
    matched = (
        qpost.join(F.broadcast(queries), "term")
        .join(dls, "doc_id")
        .crossJoin(F.broadcast(corpus))
    )
    num = (F.lit(mu) * F.col("cf") + F.col("tf") * F.col("total_dl")).cast("long")
    den = (F.lit(mu) * F.col("cf")).cast("long")
    term_micro = F.floor(
        F.log(num.cast("double") / den.cast("double")) * F.lit(1_000_000.0)
        + F.lit(0.5)
    ).cast("long")
    per_qd = (
        matched.select("query_id", "doc_id", "dl", term_micro.alias("_t"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("_t").alias("_sum"), F.max("dl").alias("dl"))
    )
    qsizes = queries.groupBy("query_id").agg(F.count("*").alias("qn"))
    norm_micro = F.floor(
        F.log((F.col("dl") + F.lit(mu)).cast("double") / F.lit(float(mu)))
        * F.lit(1_000_000.0)
        + F.lit(0.5)
    ).cast("long")
    return (
        per_qd.join(F.broadcast(qsizes), "query_id")
        .select(
            "query_id",
            "doc_id",
            (F.col("_sum") - F.col("qn") * norm_micro).alias("score_micro_nats"),
        )
    )


def search_ql(
    docs: DataFrame,
    queries: DataFrame,
    k: int,
    mu: int = QL_MU,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k docs per query by Dirichlet query likelihood:
    ``(query_id, doc_id, rank, score_micro_nats)`` — the same total-order
    contract as ``search_bm25`` (ties break on doc_id)."""
    from pyspark.sql import Window

    scored = ql_scores(docs, queries, mu, text_col, id_col)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_micro_nats"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank", "score_micro_nats")
    )


def relevance_all_terms(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic relevance judgments: a document is relevant to a query
    iff it contains EVERY query term (boolean-AND containment — the
    strictest judgment derivable from text alone, and the standard
    pseudo-qrel when no human labels exist).  Output: (query_id, doc_id),
    one row per relevant pair.

    Scale shape: distinct (term, doc) pairs restricted to the query
    vocabulary via broadcast, then one (query_id, doc_id) aggregate whose
    matched-distinct-term count must equal the query's term count."""
    qterms = queries.select("term").distinct()
    qsizes = queries.groupBy("query_id").agg(F.countDistinct("term").alias("_qn"))
    pairs = (
        doc_tokens(docs, text_col, id_col)
        .join(F.broadcast(qterms), "term")
        .select("term", "doc_id")
        .distinct()
        .join(F.broadcast(queries), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.countDistinct("term").alias("_matched"))
        .join(F.broadcast(qsizes), "query_id")
        .where(F.col("_matched") == F.col("_qn"))
    )
    return pairs.select("query_id", "doc_id")


def retrieval_eval(
    ranked: DataFrame,
    relevant: DataFrame,
    k: int,
) -> DataFrame:
    """Recall@k and MRR@k of a ranking against relevance judgments — the
    eval the search family was missing (rankers without metrics are vibes).

    ``ranked`` is (query_id, doc_id, rank) with rank 1-based and <= k
    (the contract of ``search_bm25``/``search_ql``); ``relevant`` is
    (query_id, doc_id).  Exact rationals quantized e6:
    ``recall = hits·1e6 div n_rel``, ``mrr = 1e6 div first_relevant_rank``
    (0 when nothing relevant is retrieved).  Queries with NO relevant
    documents are dropped (recall undefined), matching trec_eval.

    Scale shape: one equi-join of the k·|queries|-row ranking onto the
    judgments + two tiny aggregates — judgment cardinality dominates and
    both sides hash on (query_id, doc_id).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    n_rel = relevant.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_rel"))
    hits = (
        ranked.where(F.col("rank") <= k)
        .join(relevant, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("hits_at_k"),
            F.min("rank").alias("_first"),
        )
    )
    return (
        n_rel.join(hits, "query_id", "left")
        .select(
            "query_id",
            "n_rel",
            F.coalesce(F.col("hits_at_k"), F.lit(0)).cast("long").alias("hits_at_k"),
            F.expr("coalesce(hits_at_k, 0L) * 1000000 div n_rel").alias("recall_e6"),
            F.coalesce(F.expr("1000000 div _first"), F.lit(0))
            .cast("long")
            .alias("mrr_e6"),
        )
    )
