"""Count-based n-gram language-model scoring — KenLM-style perplexity
filtering (CCNet, Wenzek et al. 2020: keep/bucket documents by their
perplexity under an LM trained on a trusted reference corpus).

A full KenLM (modified Kneser–Ney, backoff) is a C++ artifact; what the
100 TB pipeline needs from Spark is the distributed half: fit count
relations over a reference slice in one pass, score every candidate
document with exact, engine-independent arithmetic.  This module implements
the add-one-smoothed bigram model — the same family, with every decision
value-provable against DuckDB:

    P(w2 | w1) = (c(w1,w2) + 1) / (c(w1) + V)

with c(w1) the count of w1 as a bigram LEFT (so the smoothed conditional
sums to 1 over the vocabulary) and V the reference vocabulary size.
Unseen bigrams — including unseen w1 — degrade smoothly to 1 / (c(w1)+V).

Determinism contract (the DSIR pattern, operators/selection.py): every
count is an integer; each distinct scored bigram contributes ONE double
division of two bigints followed by ONE ln, rounded to scaled BIGINT
micro-nats; per-document log-probabilities are exact bigint sums of those
integers — order-independent, hash-identical across engines.  The per-doc
average uses integer division (both engines truncate toward zero).

Scale shape (100 TB read):
- model fit: bigram explode over the REFERENCE slice only → ONE map-side-
  combinable groupBy(w1, w2) count; c(w1) derives from c12 by a second
  (tiny) aggregate; V is one distinct-count scalar relation (broadcast).
- scoring, model-fits path (the common case — see MODEL_BROADCAST_ROWS):
  every model relation broadcasts, each gram occurrence scores map-side in
  codegen, and the ONLY exchange is the final map-combinable groupBy(doc).
- scoring, big-model fallback: candidate bigrams collapse to DISTINCT
  (doc, w1, w2, n) before the shuffled hash joins (repetitive text joins
  once per distinct gram), then the final groupBy(doc) — no text wider
  than two words in any exchange.
- The count relations are corpus-vocabulary-sized, not corpus-sized; for
  web-scale references prune with ``min_count`` (standard KenLM practice)
  to bound the model relation (and re-enter the broadcast gate).

Reference parity: the reference engine has no LM surface; this belongs to
the training-data-pipeline family (SURVEY.md §2 LLM block).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_flow_spark.operators.selection import LOG_SCALE
from kafka_flow_spark.operators.text import normalize_text, tokens

# Broadcast the fitted count relations when the (pruned) bigram model is
# below this many rows (~30 B/row → ≲128 MB serialized, the _bc gate's
# class).  A broadcastable model unlocks the FLAT scoring plan: every model
# join goes map-side and the per-(doc, gram) pre-aggregation exchange is
# dropped — each gram occurrence scores in codegen and the ONLY shuffle
# left is the final map-combinable groupBy(doc) (measured at sf10:
# 11.5 → 8.2 s on the interp bench row).  Above the gate the original
# shape survives unchanged: distinct-gram collapse, then shuffled hash
# joins against the vocabulary-sized model — the 100 TB web-reference path
# (prune with min_count per KenLM practice to re-enter the gate).
MODEL_BROADCAST_ROWS = 4_000_000


def _model_fits(c12_persisted: DataFrame, gate_rows: int) -> bool:
    """ONE bounded scalar gate on the persisted model's row count — the
    touched_buckets pattern: a driver-side scalar that sizes the plan, not
    a data materialization."""
    return c12_persisted.count() <= gate_rows


def _norm_tokens(text: Column) -> Column:
    """The ONE shared cross-engine tokenizer (operators/text.py) — mirrors
    the oracle's string_split_regex(trim(lower(regexp_replace(., '\\s+', ' '))))."""
    return tokens(normalize_text(text))


def _bigram_rows(base: DataFrame) -> DataFrame:
    """Explode staged token arrays to (…, w1, w2) bigram occurrence rows.

    Built by zipping two shifted SLICES of the token array (native
    expressions, whole-stage codegen) instead of a per-position transform
    lambda — interpreted lambda evaluation was the dominant cost of the
    candidate-side explode (r13, the shingle_hashes lesson).  Same rows.
    """
    n = F.size(F.col("_toks"))
    pairs = F.arrays_zip(
        F.slice(F.col("_toks"), 1, n - 1).alias("w1"),
        F.slice(F.col("_toks"), 2, n - 1).alias("w2"),
    )
    return (
        base.where(n >= 2)
        .select("_id", "_ref", F.explode(pairs).alias("_g"))
        .select("_id", "_ref", F.col("_g.w1").alias("w1"), F.col("_g.w2").alias("w2"))
    )


def bigram_lm_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    is_ref: Column,
    min_count: int = 1,
    model_broadcast_rows: int = MODEL_BROADCAST_ROWS,
) -> DataFrame:
    """Score every NON-reference document under the add-one bigram LM fit on
    the reference slice.

    Output (one row per non-ref doc with >= 2 tokens; shorter docs carry no
    bigram evidence, the DSIR absence contract):
    - ``n_bigrams``     bigram occurrences scored
    - ``logprob_scaled``  exact bigint sum of per-occurrence micro-nat
      log-probabilities (more negative = less reference-like)
    - ``avg_logprob_scaled``  logprob_scaled div n_bigrams (truncating
      integer division, both engines identical) — the length-normalized
      filter signal (micro-nats/bigram ≈ -ln(perplexity) scaled)

    ``min_count > 1`` prunes model bigrams with c12 < min_count (they score
    as unseen) — bounds the model relation on web-scale references.
    """
    from kafka_flow_spark.cache import scoped_persist, scoped_persist_corpus

    base = df.select(
        F.col(id_col).alias("_id"),
        F.coalesce(is_ref.cast("boolean"), F.lit(False)).alias("_ref"),
        _norm_tokens(F.col(text_col)).alias("_toks"),
    )
    # Persist ONLY the reference-side tokens (reused by the bigram-count and
    # vocab explodes; in the CCNet shape the reference is a bounded curated
    # corpus).  The candidate side is tokenized exactly once, so the former
    # FULL-corpus persist bought it nothing and cost data-scale memory —
    # the 5M-doc sf100 probe OOM'd an 8 GB local heap unrolling that cache
    # under 32 concurrent tokenize tasks (r12).
    ref_toks = scoped_persist_corpus(base.where(F.col("_ref")))
    c12 = (
        _bigram_rows(ref_toks)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("_c12"))
    )
    if min_count > 1:
        c12 = c12.where(F.col("_c12") >= min_count)
    c12 = scoped_persist(c12)
    c1 = c12.groupBy("w1").agg(F.sum("_c12").alias("_c1"))
    vocab = (
        ref_toks.select(F.explode(F.col("_toks")).alias("_tok"))
        .agg(F.count_distinct(F.col("_tok")).alias("_v"))
    )
    grams = _bigram_rows(base.where(~F.col("_ref")))
    term = (
        F.round(
            F.log(
                (F.coalesce(F.col("_c12"), F.lit(0)) + 1).cast("double")
                / (F.coalesce(F.col("_c1"), F.lit(0)) + F.col("_v")).cast("double")
            )
            * LOG_SCALE
        )
        .cast("long")
        .alias("_term")
    )
    if _model_fits(c12, model_broadcast_rows):
        # flat plan: map-side model joins, per-occurrence codegen scoring,
        # one exchange total (see MODEL_BROADCAST_ROWS)
        scored = (
            grams
            .select("_id", "w1", "w2")
            .join(F.broadcast(c12), ["w1", "w2"], "left")
            .join(F.broadcast(c1), ["w1"], "left")
            .crossJoin(F.broadcast(vocab))
            .select("_id", term)
        )
        return scored.groupBy(F.col("_id").alias(id_col)).agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(F.col("_term")).cast("long").alias("logprob_scaled"),
            F.expr("CAST(sum(_term) div count(1) AS BIGINT)").alias(
                "avg_logprob_scaled"
            ),
        )
    dg = (
        grams
        .groupBy("_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    scored = (
        dg.join(c12, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select("_id", "_n", term)
    )
    return scored.groupBy(F.col("_id").alias(id_col)).agg(
        F.sum("_n").cast("long").alias("n_bigrams"),
        F.sum(F.col("_n") * F.col("_term")).cast("long").alias("logprob_scaled"),
        F.expr("CAST(sum(_n * _term) div sum(_n) AS BIGINT)").alias(
            "avg_logprob_scaled"
        ),
    )


def bigram_lm_scores_interp(
    df: DataFrame,
    id_col: str,
    text_col: str,
    is_ref: Column,
    lam_num: int = 7,
    lam_den: int = 10,
    min_count: int = 1,
    model_broadcast_rows: int = MODEL_BROADCAST_ROWS,
) -> DataFrame:
    """Jelinek–Mercer / Stolcke-interpolated bigram LM scoring — the
    materially better CCNet filter signal with the SAME integer-provable
    determinism contract as ``bigram_lm_scores`` (KenLM proper is modified
    Kneser–Ney; fixed-weight interpolation with an add-one unigram is the
    closest member of that family whose every decision is exactly
    SQL-mirrorable):

        P(w2 | w1) = λ·c(w1,w2)/c(w1) + (1−λ)·(c(w2)+1)/(N+V)   if c(w1) > 0
                   = (c(w2)+1)/(N+V)                              otherwise

    with λ = lam_num/lam_den, N = total reference tokens, V = vocabulary
    size.  Each conditional sums to exactly 1 over the vocabulary (λ·1 +
    (1−λ)·1), and the w1-unseen branch backs off to the FULL unigram (not
    (1−λ)·unigram, which would leak mass).  Why it separates better than
    add-one: a frequent reference bigram keeps ~λ·ML-probability instead of
    being crushed toward 1/V by the +V denominator, while an all-unseen
    gibberish bigram falls to ~1/(N+V) « 1/V — both tails move apart
    (strict-separation differential in tests/test_lm.py).

    Determinism: both the numerator and denominator of P are EXACT integer
    polynomials in (c12, c1, c2, N, V, λ) — carried in DECIMAL(38,0), since
    λn·c12·(N+V) overflows int64 at web-scale reference counts (the
    key-skew lesson) — then ONE double division + ONE ln, rounded to
    micro-nat BIGINT: the same single-division contract as the add-one
    model, hash-identical across engines.

    Scale shape: identical to ``bigram_lm_scores`` (distinct-gram collapse
    before joins, vocab-sized model relations, one broadcast scalar row)
    plus ONE more vocab-sized join on w2 for the unigram counts.
    ``min_count`` prunes c12 exactly as in the add-one model (c1 derives
    from the pruned table, keeping the conditional normalized over the
    pruned model).
    """
    if not (0 < lam_num < lam_den):
        raise ValueError(f"need 0 < lam_num < lam_den, got {lam_num}/{lam_den}")
    from kafka_flow_spark.cache import scoped_persist, scoped_persist_corpus

    base = df.select(
        F.col(id_col).alias("_id"),
        F.coalesce(is_ref.cast("boolean"), F.lit(False)).alias("_ref"),
        _norm_tokens(F.col(text_col)).alias("_toks"),
    )
    # Persist ONLY the reference-side tokens: the model relations reuse them
    # (bigram + unigram explodes), and in the CCNet shape the reference is a
    # bounded curated corpus — never the 100 TB candidate side.  The
    # candidate side is tokenized exactly ONCE (the single scoring pass), so
    # the former full-corpus persist bought it nothing and cost data-scale
    # memory: the 5M-doc sf100 probe OOM'd an 8 GB local heap unrolling that
    # cache under 32 concurrent tokenize tasks (r12).  Corpus-sized
    # relations must never be persisted.
    ref_toks = scoped_persist_corpus(base.where(F.col("_ref")))
    c12 = (
        _bigram_rows(ref_toks)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("_c12"))
    )
    if min_count > 1:
        c12 = c12.where(F.col("_c12") >= min_count)
    c12 = scoped_persist(c12)
    c1 = c12.groupBy("w1").agg(F.sum("_c12").alias("_c1"))
    c2 = scoped_persist(
        ref_toks.select(F.explode(F.col("_toks")).alias("_tok"))
        .groupBy(F.col("_tok").alias("w2"))
        .agg(F.count(F.lit(1)).alias("_c2"))
    )
    # N and V derive from the persisted vocab-sized c2 (Σc2 = total ref
    # tokens; |c2| = vocabulary) and collapse to DRIVER LITERALS (r14): the
    # model relations are already persisted and gated by a driver-side
    # count, so one more 1-row action costs what the former scal
    # broadcast-build job cost — and a literal N+V lets every nv product
    # below PRE-FOLD into the model relations instead of being re-multiplied
    # per scored occurrence.
    vrow = c2.agg(
        F.count(F.lit(1)).alias("_v"), F.sum("_c2").alias("_ntok")
    ).first()
    nv_int = int(vrow["_ntok"] or 0) + int(vrow["_v"])
    # empty reference: the pre-fold form's nv was NULL (sum over no rows),
    # nulling every term — keep that, not a 0-literal that would divide by 0
    nv_lit = F.lit(nv_int if nv_int > 0 else None).cast("decimal(38,0)")
    d0 = F.lit(0).cast("decimal(38,0)")
    d1 = F.lit(1).cast("decimal(38,0)")

    def dec38(c: Column) -> Column:
        return c.cast("decimal(38,0)")

    # Fold the λ constants and the nv scalar INTO the vocab-sized model
    # relations (guide §1.2 "per-task work", §2.3 "shuffle keys and
    # metadata"): every factor of the integer num/den polynomials that
    # depends only on the model row is computed ONCE per model row —
    #   _e12 = λn·c12·nv      (per (w1,w2))
    #   _e1a = (λd−λn)·c1     (per w1)
    #   _e1b = λd·c1·nv       (per w1; also the seen-w1 flag: non-null ⇔ seen)
    #   _c2p1 = c2+1          (per w2)
    # so the per-occurrence arithmetic shrinks to ONE decimal multiply and
    # one add (num) plus the when/coalesce — from ~4 decimal products per
    # scored gram.  The polynomial VALUES are unchanged (integer products
    # reassociated, decimal(38,0) exact): same num/den integers → same
    # single double division → same ln → same micro-nat term.
    c12f = c12.select(
        "w1", "w2", (F.lit(lam_num) * dec38(F.col("_c12")) * nv_lit).alias("_e12")
    )
    c1f = c1.select(
        "w1",
        (F.lit(lam_den - lam_num) * dec38(F.col("_c1"))).alias("_e1a"),
        (F.lit(lam_den) * dec38(F.col("_c1")) * nv_lit).alias("_e1b"),
    )
    c2f = c2.select("w2", (dec38(F.col("_c2")) + d1).alias("_c2p1"))
    grams = _bigram_rows(base.where(~F.col("_ref")))
    c2p1 = F.coalesce(F.col("_c2p1"), d1)
    seen_w1 = F.col("_e1b").isNotNull()
    num = F.when(
        seen_w1, F.coalesce(F.col("_e12"), d0) + c2p1 * F.col("_e1a")
    ).otherwise(c2p1)
    den = F.when(seen_w1, F.col("_e1b")).otherwise(nv_lit)
    term = (
        F.round(F.log(num.cast("double") / den.cast("double")) * LOG_SCALE)
        .cast("long")
        .alias("_term")
    )
    if _model_fits(c12, model_broadcast_rows):
        # flat plan (see MODEL_BROADCAST_ROWS): per-occurrence codegen
        # scoring against broadcast models, ONE exchange — measured
        # 11.5 → 8.2 s at sf10 on this bench row
        scored = (
            grams
            .select("_id", "w1", "w2")
            .join(F.broadcast(c12f), ["w1", "w2"], "left")
            .join(F.broadcast(c1f), ["w1"], "left")
            .join(F.broadcast(c2f), ["w2"], "left")
            .select("_id", term)
        )
        return scored.groupBy(F.col("_id").alias(id_col)).agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(F.col("_term")).cast("long").alias("logprob_scaled"),
            F.expr("CAST(sum(_term) div count(1) AS BIGINT)").alias(
                "avg_logprob_scaled"
            ),
        )
    dg = (
        grams
        .groupBy("_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    scored = (
        dg.join(c12f, ["w1", "w2"], "left")
        .join(c1f, ["w1"], "left")
        .join(c2f, ["w2"], "left")
        .select("_id", "_n", term)
    )
    return scored.groupBy(F.col("_id").alias(id_col)).agg(
        F.sum("_n").cast("long").alias("n_bigrams"),
        F.sum(F.col("_n") * F.col("_term")).cast("long").alias("logprob_scaled"),
        F.expr("CAST(sum(_n * _term) div sum(_n) AS BIGINT)").alias(
            "avg_logprob_scaled"
        ),
    )


def perplexity_buckets(
    scores: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
    labels: tuple[str, ...] = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet's head/middle/tail split: within each group (CCNet: language),
    rank documents by LM score DESC (most reference-like first, ties to
    lowest id) and label equal-size ntiles.

    NTILE is the exact rank-based cut — no percentile-value interpolation,
    so integer micro-nat scores make the assignment engine-identical (both
    engines give earlier tiles the remainder rows, per the SQL standard).

    Scale shape: one hash exchange on the group key + one in-partition sort
    — the same single-window class as every ranking query here; the scored
    relation is doc-cardinality with three scalar columns, not text.

    Output: input columns + ``bucket``.
    """
    from pyspark.sql.window import Window

    n = len(labels)
    if n < 2:
        raise ValueError("perplexity_buckets needs >= 2 labels")
    w = Window.partitionBy(group_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    nt = F.ntile(n).over(w)
    bucket = F.when(nt == 1, F.lit(labels[0]))
    for i in range(1, n):
        bucket = bucket.when(nt == i + 1, F.lit(labels[i]))
    return scores.withColumn("bucket", bucket)


def _trigram_rows(base: DataFrame) -> DataFrame:
    """Explode staged token arrays to (…, w1, w2, w3) trigram rows (zipped
    shifted slices — native expressions, see ``_bigram_rows``)."""
    n = F.size(F.col("_toks"))
    triples = F.arrays_zip(
        F.slice(F.col("_toks"), 1, n - 2).alias("w1"),
        F.slice(F.col("_toks"), 2, n - 2).alias("w2"),
        F.slice(F.col("_toks"), 3, n - 2).alias("w3"),
    )
    return (
        base.where(n >= 3)
        .select("_id", "_ref", F.explode(triples).alias("_g"))
        .select(
            "_id",
            "_ref",
            F.col("_g.w1").alias("w1"),
            F.col("_g.w2").alias("w2"),
            F.col("_g.w3").alias("w3"),
        )
    )


def trigram_lm_scores_interp(
    df: DataFrame,
    id_col: str,
    text_col: str,
    is_ref: Column,
    l3: int = 5,
    l2: int = 3,
    l1: int = 2,
    min_count: int = 1,
    model_broadcast_rows: int = MODEL_BROADCAST_ROWS,
) -> DataFrame:
    """Trigram LM with fixed-weight interpolation down the full backoff
    ladder — the last SQL-provable rung of the KenLM family (bigram add-one
    → bigram interpolated → THIS; beyond it sits modified Kneser–Ney, whose
    discount fitting is not engine-exact arithmetic):

        P(w3 | w1 w2) = λ3·c123/c12 + λ2·c23/c2 + λ1·(c3+1)/(N+V)

    with λi = li/(l3+l2+l1), c12 = Σ_w3 c123 (the trigram-context count, so
    the λ3 term sums to exactly 1 over the vocabulary), c2 = Σ_w3 c23, and
    the same add-one unigram floor as ``bigram_lm_scores_interp``.
    Mass-preserving backoff: an unseen (w1, w2) context renormalizes
    (λ2, λ1) over their sum; an unseen w2 falls to the pure unigram —
    every branch's conditional sums to exactly 1.

    Determinism: numerator and denominator of every branch are exact
    integer polynomials in the six count relations, carried in
    DECIMAL(38,0) (largest term λ·c123·c2·(N+V) — three counts and a
    vocab-plus-token scalar; ~1e24 at sf10, bound documented to ~1e37 /
    1e12-count corpora before the decimal saturates), then ONE double
    division + ONE ln per distinct scored trigram, micro-nat bigint sums —
    the house single-division contract, value-exact vs DuckDB.

    ``min_count`` prunes trigram counts only (c12 derives from the PRUNED
    table, keeping the λ3 term normalized over the pruned model); the
    bigram/unigram floors stay dense — exactly KenLM's pruning posture.

    Scale shape: one tokenize-once persist feeding three explodes (tri/bi/
    uni), every model relation vocab-sized, candidate trigrams collapsed to
    DISTINCT (doc, w1, w2, w3, n) before the five model joins + one
    broadcast scalar row, one final map-combinable groupBy(doc).

    Output: (id, n_trigrams, logprob_scaled, avg_logprob_scaled) — docs
    with < 3 tokens are absent (no trigram evidence).
    """
    if min(l3, l2, l1) <= 0:
        raise ValueError(f"interpolation weights must be positive, got {(l3, l2, l1)}")
    from kafka_flow_spark.cache import scoped_persist, scoped_persist_corpus

    ld = l3 + l2 + l1
    base = df.select(
        F.col(id_col).alias("_id"),
        F.coalesce(is_ref.cast("boolean"), F.lit(False)).alias("_ref"),
        _norm_tokens(F.col(text_col)).alias("_toks"),
    )
    # ref-only persist + scal-from-c3, same rationale as
    # bigram_lm_scores_interp: the model side reuses the reference tokens
    # (tri/bi/uni explodes); the candidate side is scored in one pass and a
    # full-corpus cache is data-scale memory for zero reuse (sf100 OOM, r12)
    ref_toks = scoped_persist_corpus(base.where(F.col("_ref")))
    c123 = (
        _trigram_rows(ref_toks)
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("_c123"))
    )
    if min_count > 1:
        c123 = c123.where(F.col("_c123") >= min_count)
    c123 = scoped_persist(c123)
    c12 = c123.groupBy("w1", "w2").agg(F.sum("_c123").alias("_c12"))
    c23 = (
        _bigram_rows(ref_toks)
        .groupBy(F.col("w1").alias("w2"), F.col("w2").alias("w3"))
        .agg(F.count(F.lit(1)).alias("_c23"))
    )
    c2 = c23.groupBy("w2").agg(F.sum("_c23").alias("_c2"))
    c3 = scoped_persist(
        ref_toks.select(F.explode(F.col("_toks")).alias("_tok"))
        .groupBy(F.col("_tok").alias("w3"))
        .agg(F.count(F.lit(1)).alias("_c3"))
    )
    # N and V derive from the persisted vocab-sized c3 (Σc3 = total ref
    # tokens; |c3| = vocabulary) — no fourth pass over the reference
    scal = c3.agg(
        F.count(F.lit(1)).alias("_v"), F.sum("_c3").alias("_ntok")
    )
    tri = _trigram_rows(base.where(~F.col("_ref")))
    dec = lambda c: F.coalesce(c, F.lit(0)).cast("decimal(38,0)")  # noqa: E731
    nv = (F.col("_ntok") + F.col("_v")).cast("decimal(38,0)")
    v123, v12 = dec(F.col("_c123")), dec(F.col("_c12"))
    v23, v2 = dec(F.col("_c23")), dec(F.col("_c2"))
    c3p1 = (F.coalesce(F.col("_c3"), F.lit(0)) + 1).cast("decimal(38,0)")
    seen12 = F.coalesce(F.col("_c12"), F.lit(0)) > 0
    seen2 = F.coalesce(F.col("_c2"), F.lit(0)) > 0
    num = (
        F.when(
            seen12 & seen2,
            F.lit(l3) * v123 * v2 * nv
            + F.lit(l2) * v23 * v12 * nv
            + F.lit(l1) * c3p1 * v12 * v2,
        )
        .when(seen2, F.lit(l2) * v23 * nv + F.lit(l1) * c3p1 * v2)
        .otherwise(c3p1)
    )
    den = (
        F.when(seen12 & seen2, F.lit(ld) * v12 * v2 * nv)
        .when(seen2, F.lit(l2 + l1) * v2 * nv)
        .otherwise(nv)
    )
    term = (
        F.round(F.log(num.cast("double") / den.cast("double")) * LOG_SCALE)
        .cast("long")
        .alias("_term")
    )
    if _model_fits(c123, model_broadcast_rows):
        # flat plan (see MODEL_BROADCAST_ROWS): all five model joins go
        # map-side, ONE exchange — gated on the trigram table, the largest
        # of the model relations
        scored = (
            tri
            .select("_id", "w1", "w2", "w3")
            .join(F.broadcast(c123), ["w1", "w2", "w3"], "left")
            .join(F.broadcast(c12), ["w1", "w2"], "left")
            .join(F.broadcast(c23), ["w2", "w3"], "left")
            .join(F.broadcast(c2), ["w2"], "left")
            .join(F.broadcast(c3), ["w3"], "left")
            .crossJoin(F.broadcast(scal))
            .select("_id", term)
        )
        return scored.groupBy(F.col("_id").alias(id_col)).agg(
            F.count(F.lit(1)).cast("long").alias("n_trigrams"),
            F.sum(F.col("_term")).cast("long").alias("logprob_scaled"),
            F.expr("CAST(sum(_term) div count(1) AS BIGINT)").alias(
                "avg_logprob_scaled"
            ),
        )
    dg = (
        tri
        .groupBy("_id", "w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    scored = (
        dg.join(c123, ["w1", "w2", "w3"], "left")
        .join(c12, ["w1", "w2"], "left")
        .join(c23, ["w2", "w3"], "left")
        .join(c2, ["w2"], "left")
        .join(c3, ["w3"], "left")
        .crossJoin(F.broadcast(scal))
        .select("_id", "_n", term)
    )
    return scored.groupBy(F.col("_id").alias(id_col)).agg(
        F.sum("_n").cast("long").alias("n_trigrams"),
        F.sum(F.col("_n") * F.col("_term")).cast("long").alias("logprob_scaled"),
        F.expr("CAST(sum(_n * _term) div sum(_n) AS BIGINT)").alias(
            "avg_logprob_scaled"
        ),
    )
