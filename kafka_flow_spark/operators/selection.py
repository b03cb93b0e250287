"""Importance-resampling data selection (DSIR-style).

Selects training documents whose hashed n-gram profile looks like a TARGET
domain, by importance weight under two smoothed bag-of-hashed-bigrams models
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling" — the hashed-ngram variant, which is the one that scales).

Reference parity note: the reference engine (evolution-gaming/kafka-flow) has
no data-selection surface; this belongs to the training-data-pipeline family
the brief adds on top (SURVEY.md §2 LLM-pipeline block, alongside
dedup/curation/quality).

Determinism contract (oracle-gated): every count is an integer; the per-bucket
log-ratio is ONE double division of two bigints followed by ONE ln, rounded to
a scaled BIGINT (micro-nats).  Per-document weights are then exact bigint sums
of those bucket integers — order-independent, so Spark and DuckDB agree
bit-for-bit as long as ln() agrees on the finite set of actual bucket ratios
(pinned by tests/test_selection.py::test_logratio_cross_engine on real data).

Scale shape (100 TB read):
- pass 1 (model fit): explode bigrams -> md5 bucket -> map-combinable
  groupBy(bucket) count.  The model is <= n_buckets rows (default 4096) —
  broadcast material by construction, independent of corpus size.
- pass 2 (scoring): re-explode bigrams -> broadcast-join the bucket model ->
  map-combinable groupBy(doc) sum.  No shuffle carries text; the only
  wide exchanges are the two integer aggregations.
- The (doc_id, bucket) projection between passes is scoped_persist-ed
  (ints only, released by cache.release_all) purely to skip re-tokenizing;
  dropping the persist changes nothing but CPU.
- top-k select is TakeOrderedAndProject (bounded k at the driver).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_flow_spark.cache import scoped_persist_corpus

DEFAULT_BUCKETS = 4096
LOG_SCALE = 1_000_000  # micro-nats: lr_scaled = round(ln(ratio) * 1e6)


def _norm_tokens(text: Column) -> Column:
    """Lowercased whitespace tokens — the ONE shared cross-engine tokenizer
    (operators/text.py), not a re-implementation: a future change to the
    shared definition must reach this path too (review r6).  Mirrors the
    oracle's string_split_regex(trim(lower(regexp_replace(., '\\s+', ' '))))."""
    from kafka_flow_spark.operators.text import normalize_text, tokens

    return tokens(normalize_text(text))


def _bigram_pairs(toks: Column) -> Column:
    """Adjacent-word bigram PAIRS as zipped shifted slices (native
    expressions; null when < 2 tokens, which explode drops).  Callers
    explode first, then join/hash per ROW — both the gram concat and the
    md5/conv chain run in whole-stage codegen instead of inside interpreted
    ``transform`` lambdas (r13: the lambda evaluation was the dominant
    per-gram cost in the DSIR scoring pass)."""
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.arrays_zip(
            F.slice(toks, 1, n - 1).alias("_w1"),
            F.slice(toks, 2, n - 1).alias("_w2"),
        ),
    )


def _bucket_of(gram: Column, n_buckets: int) -> Column:
    """md5 first 6 hex digits mod n_buckets, as a row expression.  Same fold
    the sampling module uses (sampling.hash_bucket), so the DuckDB mirror is
    the established Horner-fold idiom."""
    return (
        F.conv(F.substring(F.md5(gram.cast("binary")), 1, 6), 16, 10).cast("long")
        % n_buckets
    )


def doc_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    is_target: Column,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(id, bucket, is_target) — one row per bigram OCCURRENCE (weights count
    multiplicity, per the paper's bag-of-ngrams)."""
    return (
        df.select(
            F.col(id_col).alias("_id"),
            # NULL-safe: a NULL predicate (e.g. NULL source column) counts as
            # RAW, matching the oracle's CASE...ELSE branch — without this,
            # Spark's SUM skips the NULL rows from BOTH models while DuckDB
            # counts them as raw, a latent parity break (review r6).
            F.coalesce(is_target.cast("boolean"), F.lit(False)).alias("_is_t"),
            _norm_tokens(F.col(text_col)).alias("_toks"),
        )
        .select("_id", "_is_t", F.explode(_bigram_pairs(F.col("_toks"))).alias("_g"))
        .select(
            "_id",
            "_is_t",
            _bucket_of(
                F.concat_ws(" ", F.col("_g._w1"), F.col("_g._w2")), n_buckets
            ).alias("bucket"),
        )
    )


def bucket_logratios(buckets: DataFrame, n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Per-bucket scaled log importance ratio.

    lr_scaled(b) = round(ln( ((t_b+1) * (R+B)) / ((r_b+1) * (T+B)) ) * 1e6)

    with t_b/r_b the target/raw occurrence counts of bucket b, T/R the global
    totals, B the bucket count (add-one smoothing on every bucket).  Both
    products fit comfortably in bigint (counts are << 2^31 even at 100 TB per
    bucket after hashing spreads mass).  Output <= B rows.
    """
    counts = buckets.groupBy("bucket").agg(
        F.sum(F.col("_is_t").cast("long")).alias("t_cnt"),
        F.sum((~F.col("_is_t")).cast("long")).alias("r_cnt"),
    )
    totals = counts.agg(
        F.sum("t_cnt").alias("t_tot"), F.sum("r_cnt").alias("r_tot")
    )
    b = F.lit(n_buckets).cast("long")
    num = (F.col("t_cnt") + 1) * (F.col("r_tot") + b)
    den = (F.col("r_cnt") + 1) * (F.col("t_tot") + b)
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            "t_cnt",
            "r_cnt",
            F.round(F.log(num.cast("double") / den.cast("double")) * LOG_SCALE)
            .cast("long")
            .alias("lr_scaled"),
        )
    )


def importance_weights(
    df: DataFrame,
    text_col: str,
    id_col: str,
    is_target: Column,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Per-document importance weight: exact bigint sum of bucket log-ratios
    over the document's bigram occurrences.  Documents with no bigrams (< 2
    tokens) are absent from the output — they carry no evidence either way.

    Columns: id_col, n_grams (bigram occurrences), weight_scaled (micro-nats).
    """
    raw = doc_buckets(df, text_col, id_col, is_target, n_buckets)
    # DISK_ONLY: this relation is gram-OCCURRENCE-sized (one int row per
    # bigram), i.e. data-scale — the r12 doctrine says such persists never
    # hold memory (sf100 OOM class).  Counter-measured r14: DISK_ONLY costs
    # nothing vs MEMORY_AND_DISK (sf10 4.40 vs 4.32 s, sf0.1 0.79 vs 0.79 s)
    # while the persist itself stays a 2x win over recomputing the explode
    # (sf10 3.45 vs 6.79 s, sf0.1 0.71 vs 1.49 s — VERDICT r13 item 5's
    # counter-measurement).
    buckets = scoped_persist_corpus(raw)
    lr = bucket_logratios(buckets, n_buckets)
    return (
        buckets.join(F.broadcast(lr.select("bucket", "lr_scaled")), "bucket")
        .groupBy(F.col("_id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("lr_scaled").alias("weight_scaled"),
        )
    )


def select_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    is_target: Column,
    k: int,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Top-k RAW documents by importance weight (target docs are the model,
    not candidates), deterministic tie-break on id.  The rank is a global
    TakeOrderedAndProject over per-doc integer weights — bounded-k driver
    material, no full sort at scale."""
    from pyspark.sql.window import Window

    w = importance_weights(df, text_col, id_col, is_target, n_buckets)
    cand = w.join(
        df.where(~is_target).select(F.col(id_col)).distinct(), id_col
    )
    # orderBy().limit(k) compiles to TakeOrderedAndProject — distributed
    # partial top-k per partition, k rows merged at the driver.  The explicit
    # rank window then runs over <= k rows only.
    topk = cand.orderBy(F.col("weight_scaled").desc(), F.col(id_col)).limit(k)
    ranked = topk.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("weight_scaled").desc(), F.col(id_col))
        ),
    )
    return ranked.select(
        id_col, "n_grams", "weight_scaled", F.col("rank").cast("int").alias("rank")
    )


# --- Hashed-linear text classifier (fasttext-style inference) ---------------


def hash_model(spark, tag: str, n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """A deterministic 'pretrained' linear model: one integer micro-weight in
    [-1000, 1000] per hash bucket, derived from md5(tag || ':' || bucket).

    Stands in for weights loaded from a model store — the classifier below
    takes ANY (bucket, w_micro) relation; this generator exists so the
    inference path is exercised end-to-end with a value the DuckDB oracle
    can reproduce (no model file formats in the sandbox).  The table is
    <= n_buckets rows regardless of corpus size — broadcast material."""
    return spark.range(n_buckets).select(
        F.col("id").cast("long").alias("bucket"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(tag + ":"), F.col("id").cast("string")).cast("binary")),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("long")
            % 2001
            - 1000
        ).alias("w_micro"),
    )


def classifier_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    weights: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    threshold_micro: int = 0,
) -> DataFrame:
    """Linear classifier inference over hashed bag-of-unigrams — the
    model-based quality-filter step of CCNet/GPT-3-style pipelines (a linear
    model over hashed n-gram features IS fasttext's architecture; Joulin et
    al. 2016), next to the rule-based gates in operators/quality.py.

    score_micro(doc) = sum over token OCCURRENCES of w_micro(bucket(token));
    label = score_micro >= threshold_micro.  All-integer arithmetic: the sum
    is order-independent, so Spark and DuckDB agree bit-for-bit.

    Scale shape (100 TB read): explode tokens -> map-side bucket projection
    -> broadcast join the <= n_buckets-row weight table -> ONE map-combinable
    groupBy(doc) integer aggregation.  No shuffle carries text; the model is
    broadcast by construction.  Documents with zero tokens carry no features
    and are absent (same contract as importance_weights).

    Columns: id_col, n_tokens, score_micro, label.
    """
    # explode the tokens first, hash per row: the md5/conv chain runs in
    # whole-stage codegen instead of inside an interpreted transform lambda
    # (same values — see _bigrams)
    feats = df.select(
        F.col(id_col).alias("_id"),
        F.explode(_norm_tokens(F.col(text_col))).alias("_tok"),
    ).select("_id", _bucket_of(F.col("_tok"), n_buckets).alias("bucket"))
    # LEFT join + missing-as-zero: a sparse weight table (zero-weight buckets
    # omitted — the normal trimmed-model export) must not drop tokens from
    # n_tokens or documents from the output (review r6).
    return (
        feats.join(
            F.broadcast(weights.select("bucket", "w_micro")), "bucket", "left"
        )
        .groupBy(F.col("_id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce(F.col("w_micro"), F.lit(0).cast("long"))).alias(
                "score_micro"
            ),
        )
        .withColumn("label", F.col("score_micro") >= F.lit(int(threshold_micro)))
    )


def score_bin_report(
    scored: DataFrame,
    score_col: str,
    outcome_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Calibration/lift table for a scoring model against a boolean outcome
    — "does the score actually order the data by outcome rate?", the eval
    artifact behind every keep-threshold choice.

    Bins are FIXED-WIDTH over the observed score range (bin =
    ``(score − min) · n_bins div (max − min + 1)``), not population
    deciles: value bins need only one scalar min/max aggregate and stay
    fully distributed, where rank deciles would demand a global sort (a
    single-reducer non-starter at 100 TB; the top-k queries get away with
    rank windows only because WindowGroupLimit prunes them).

    All integer arithmetic on an integer score column: per bin
    ``(bin, n, mean_score, pos_rate_e6, lift_e6)`` with
    ``lift = bin rate / overall rate`` as one exact rational → e6
    truncating division.  Bins nobody lands in simply don't appear (the
    table is an aggregate, not a grid).  ``mean_score`` handles negative
    sums explicitly (div-vs-floor, the group_trend pattern).

    Scale shape: one scalar min/max aggregate broadcast back (1 row), one
    map-combinable (bin) aggregate, one 1-row totals broadcast — three
    passes of which two are metadata-sized.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    from kafka_flow_spark.cache import scoped_persist

    # the min/max pass and the bin pass each re-execute the (possibly
    # expensive) upstream scoring lineage — stage it once (released by the
    # caller's release_all, the similarity-module pattern).
    scored = scoped_persist(
        scored.select(
            F.col(score_col).cast("long").alias(score_col),
            F.col(outcome_col).cast("boolean").alias(outcome_col),
        )
    )
    rng = scored.agg(
        F.min(score_col).cast("long").alias("_lo"),
        F.max(score_col).cast("long").alias("_hi"),
    )
    binned = scored.crossJoin(F.broadcast(rng)).select(
        F.expr(
            f"(CAST({score_col} AS BIGINT) - _lo) * {n_bins} div (_hi - _lo + 1)"
        ).alias("bin"),
        F.col(score_col).cast("long").alias("_s"),
        F.col(outcome_col).cast("boolean").alias("_y"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_s").alias("_sum_s"),
        F.sum(F.when(F.col("_y"), 1).otherwise(0)).cast("long").alias("_pos"),
    )
    totals = per_bin.agg(
        F.sum("n").alias("_n_tot"), F.sum("_pos").alias("_pos_tot")
    )
    out = per_bin.crossJoin(F.broadcast(totals))
    mean_score = F.when(
        F.col("_sum_s") >= 0, F.expr("_sum_s div n")
    ).otherwise(-F.expr("(-_sum_s) div n"))
    return out.select(
        "bin",
        "n",
        mean_score.alias("mean_score"),
        # DECIMAL(38,0) for both rate products: pos·n_tot·1e6 exceeds int64
        # once the corpus passes ~3e6 rows (ANSI → hard error), and even the
        # per-bin pos·1e6 overflows at trillion-row bins.  Decimal keeps the
        # rationals exact to n ≈ 3e15; div on decimals still returns BIGINT.
        F.expr(
            "CAST(CAST(_pos AS decimal(38,0)) * 1000000 AS decimal(38,0))"
            " div CAST(n AS decimal(38,0))"
        ).alias("pos_rate_e6"),
        F.when(
            F.col("_pos_tot") > 0,
            F.expr(
                "CAST(CAST(_pos AS decimal(38,0)) * _n_tot * 1000000"
                " AS decimal(38,0))"
                " div CAST(CAST(n AS decimal(38,0)) * _pos_tot AS decimal(38,0))"
            ),
        ).alias("lift_e6"),
    )
