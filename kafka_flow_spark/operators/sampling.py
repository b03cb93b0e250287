"""Deterministic, reproducible sampling for training-data pipelines.

``df.sample()`` is seed-stable only for a fixed partitioning — repartition the
input (or rerun at another parallelism) and the sample changes.  Training-data
curation needs *content-addressed* sampling: whether a document is in the
sample depends only on the document, so the decision is reproducible across
runs, engines, and cluster sizes, and is auditable ("why is this doc here?").

Both operators hash with md5 (shared bit-for-bit with the DuckDB oracle) and
stay entirely JVM-side — no shuffle for the bernoulli filter (it's a scan
predicate that stacks with parquet pushdown of other filters), one shuffle for
the stratified top-k (the per-stratum window sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_DIGITS = 6  # 16^6 buckets: fraction resolution ~6e-8, threshold fits a string compare
# the smallest NONZERO keep probability the 16^6 = 2^24 hash space resolves is
# 2^-24 (threshold '000001'); one more halving floors the threshold to
# '000000' and the gate becomes EXACTLY zero — samplers that promise a
# decaying floor instead of a cutoff must clamp their halving count here
_MAX_HALVINGS = 4 * _HEX_DIGITS  # 24


def hash_bucket(col: Column | str) -> Column:
    """First 6 hex chars of md5 — a content-addressed bucket in [0, 16^6)."""
    return F.substring(F.md5(F.col(col).cast("binary") if isinstance(col, str) else col.cast("binary")), 1, _HEX_DIGITS)


def fraction_threshold(fraction: float) -> str:
    """Hex-string threshold t such that P[hash_bucket < t] ≈ fraction."""
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    t = min(int(fraction * 16**_HEX_DIGITS), 16**_HEX_DIGITS - 1)
    return format(t, f"0{_HEX_DIGITS}x")


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Deterministic bernoulli(fraction) sample keyed on the content of
    ``key_col``.  Pure scan-side predicate: no shuffle, no RNG state, stable
    under repartitioning.  Identical keys sample identically (by design —
    dedup upstream if that's unwanted)."""
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    if fraction == 1.0:
        # threshold capping would silently drop keys hashing to bucket
        # 'ffffff'; fraction 1.0 means "everything" — no filter at all.
        return df
    return df.where(hash_bucket(key_col) < F.lit(fraction_threshold(fraction)))


def key_uniform(col: Column | str) -> Column:
    """Content-addressed uniform in [0, 1): md5 bucket / 16^6.  Division by a
    power of two is IEEE-exact, so the value is bit-identical across engines."""
    return F.conv(hash_bucket(col), 16, 10).cast("long") / F.lit(
        float(16**_HEX_DIGITS)
    )


def weighted_sample(
    df: DataFrame, key_col: str, weight_col: Column | str
) -> DataFrame:
    """Deterministic importance sampling: keep a row iff u(key) < weight,
    i.e. P[keep] = clamp(weight, 0, 1) — but with the keep DECISION a pure
    function of the row (content-addressed, stable across runs/engines/
    cluster sizes).  Clamping is implicit: u < 1 always, u >= 0 always, so
    weights >= 1 always keep and weights <= 0 never do.

    The curation use: upsample nothing, downsample by quality/length/domain
    weight in ONE scan-side predicate (stacks with parquet pushdown) — the
    standard way to temper a source mix without a shuffle.  Compare
    ``curation.weighted_mix`` (exact per-group fractions via thresholds) —
    this form takes a per-ROW weight expression instead of a group map."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    return df.where(key_uniform(key_col) < w)


def shuffle_shard(
    df: DataFrame, key_col: str, n_shards: int, salt: str = ""
) -> DataFrame:
    """Deterministic global shuffle + sharding for training order.

    Training runs need the corpus in pseudo-random order, split into N
    shards, and REPRODUCIBLY so — resuming or re-sharding on a different
    cluster must yield the identical order.  Content-addressed: shard =
    md5-bucket(salt||key) mod N, within-shard order by the full md5 then the
    key (total order, no hash-collision ambiguity).  ``salt`` varies the
    permutation per epoch without touching the data.

    One shuffle: the rank window partitions on shard (N partitions, balanced
    by the uniform hash); writing shards is then a partitionBy write with
    sortWithinPartitions — no global sort.  Output adds (shard, shard_rank).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from pyspark.sql import Window

    key = F.concat(F.lit(salt), F.col(key_col).cast("string"))
    df = df.withColumn("_md5", F.md5(key.cast("binary")))
    shard = F.pmod(
        F.conv(F.substring("_md5", 1, _HEX_DIGITS), 16, 10).cast("long"),
        F.lit(n_shards),
    ).cast("int")
    w = Window.partitionBy("shard").orderBy(F.col("_md5"), F.col(key_col).cast("string"))
    return (
        df.withColumn("shard", shard)
        .withColumn("shard_rank", F.row_number().over(w))
        .drop("_md5")
    )


def rebalance_classes(
    df: DataFrame,
    strata_cols: list[str],
    key_col: str,
    target_n: int,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Exactly ``target_n`` rows per stratum, by deterministic over/under-
    sampling — the class-balancing step of a training mix (e.g. equalize
    languages or sources before epoch sharding).

    Every stratum of size n gets, per row of content-addressed rank r
    (ordered by (md5(key), key, *tiebreak) — uniform but reproducible):

        copies(r) = target_n // n  +  (1 if r <= target_n % n else 0)

    which covers BOTH regimes with one formula: n > target_n reduces to
    "keep the first target_n rows once" (a stratified downsample), n <
    target_n replicates the whole stratum floor(target/n) times and the
    hash-ranked remainder once more.  Output adds ``copy_idx`` (1-based) so
    downstream shuffling/packing can distinguish replicas.

    Scale shape: ONE shuffle (the per-stratum rank window; the size count
    rides the same partitioning), then a copies-explode that is pure map-side
    row generation — no join, no driver state.  Content-addressed ranks make
    the result independent of partitioning/cluster size, and md5 is
    bit-shared with SQL engines so the whole operator is oracle-exact."""
    if target_n < 1:
        raise ValueError(f"target_n must be >= 1, got {target_n}")
    from pyspark.sql import Window

    order = [
        hash_bucket(key_col),
        F.col(key_col),
        *[F.col(c) for c in (tiebreak_cols or [])],
    ]
    w = Window.partitionBy(*strata_cols).orderBy(*order)
    wn = Window.partitionBy(*strata_cols)
    copies = (F.lit(target_n) / F.col("_n")).cast("long") + F.when(
        F.col("_rk") <= F.lit(target_n) % F.col("_n"), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(wn))
        .withColumn("_copies", copies)
        .where(F.col("_copies") >= 1)
        .withColumn("copy_idx", F.explode(F.sequence(F.lit(1), F.col("_copies"))))
        .drop("_rk", "_n", "_copies")
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    key_col: str,
    k: int,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample (reservoir analog).

    Rank rows inside each stratum by (md5(key), key, *tiebreak) — a uniform
    but content-addressed order — and keep the first k.  Pass a unique id as
    ``tiebreak_cols`` when ``key_col`` can repeat (dedup corpora!), otherwise
    which duplicate wins is partition-order-dependent.  One shuffle on the
    strata keys; skewed strata are bounded by the rank cutoff (partial top-k
    runs map-side via the window's rank limit pushdown in Spark ≥3.5)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*strata_cols).orderBy(
        hash_bucket(key_col),
        F.col(key_col),
        *[F.col(c) for c in (tiebreak_cols or [])],
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    n_max: int,
) -> DataFrame:
    """Deterministic per-group document cap — the domain-capping move every
    web-corpus recipe applies (keep at most ``n_max`` docs per domain/
    source so no single host dominates the mixture).  Survivors are chosen
    by CONTENT-ADDRESSED rank (md5 bucket of ``key_col``, ties on the key),
    so the capped subset is a reproducible uniform sample of the group:
    stable across runs, engines, partitionings and cluster sizes — never
    "whatever order the scan produced".

    CONTRACT: ``key_col`` must be unique within each group (it is the
    entire order key).  Duplicate keys make the (bucket, key) order non-
    total, so WHICH duplicate survives would again be partition-dependent
    — pass a unique id, or pre-dedup on the key first.

    Output: the input columns + ``cap_rank`` (1-based rank within the
    group), rows with cap_rank <= n_max only.

    Scale shape — two-stage TakeOrdered-per-group, NOT a naive
    window-per-group: a single ``Window.partitionBy(group)`` funnels the
    whole corpus into |groups| reducers, which dies when the group column
    is low-cardinality (a 10-source 100 TB corpus would sort on 10 cores).
    Stage 1 ranks within (group, input-partition) — a BALANCED shuffle
    into |groups|×|partitions| buckets — and keeps each bucket's local
    top-n_max: lossless, because a row in the global per-group top-n_max
    is in its own bucket's top-n_max under the same total order, for ANY
    partition assignment.  Stage 2 ranks exactly over the bounded
    survivor set (≤ |groups|·|partitions|·n_max rows).  Same result as
    the naive form (pinned by the oracle + partition-invariance test),
    one balanced corpus shuffle + one tiny shuffle.
    """
    from pyspark.sql import Window

    if n_max < 1:
        raise ValueError(f"n_max must be >= 1, got {n_max}")
    pre = df.withColumn("_cb", hash_bucket(key_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    w1 = Window.partitionBy(group_col, "_pid").orderBy("_cb", F.col(key_col))
    survivors = (
        pre.withColumn("_lr", F.row_number().over(w1))
        .filter(F.col("_lr") <= n_max)
    )
    w2 = Window.partitionBy(group_col).orderBy("_cb", F.col(key_col))
    return (
        survivors.withColumn("cap_rank", F.row_number().over(w2))
        .filter(F.col("cap_rank") <= n_max)
        .drop("_cb", "_pid", "_lr")
    )


def weighted_reservoir(
    df: DataFrame,
    key_col: str,
    weight_col: Column | str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Exactly-k weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    2006, the exponential-race form): each row draws a content-addressed
    uniform u(salt||key) in (0, 1] and races with score -ln(u)/w; the k
    smallest scores win — P[selected] is proportional-to-weight without
    replacement, and the whole draw is a pure function of the data (stable
    across runs, engines, cluster sizes; vary ``salt`` for fresh draws).

    Complements ``weighted_sample`` (bernoulli, fraction-sized output):
    this one returns EXACTLY k rows (or all rows with positive weight, if
    fewer).  Rows with weight <= 0 or NULL can never win and are filtered.

    Determinism: u = (md5-fold + 1) / 2^24 (the +1 keeps u away from
    ln(0); division by a power of two is IEEE-exact); -ln(u)/w is one ln
    and one division of identical doubles — the same cross-engine ln
    contract DSIR's micro-nat weights rely on (pinned on real data in
    tests/test_selection.py).

    Scale shape: map-side score projection + TakeOrderedAndProject (bounded
    k at the driver) + a rank window over <= k rows.  No full sort.

    Output: the df columns + sel_rank (1..k by ascending score).
    """
    from pyspark.sql.window import Window

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (
        F.conv(hash_bucket(F.concat(F.lit(salt), F.col(key_col))), 16, 10).cast("long")
        + F.lit(1)
    ) / F.lit(float(16**_HEX_DIGITS))
    score = -F.log(u) / w.cast("double")
    scored = df.filter(w.cast("double") > 0).withColumn("_score", score)
    topk = scored.orderBy(F.col("_score").asc(), F.col(key_col).asc()).limit(k)
    wr = Window.orderBy(F.col("_score").asc(), F.col(key_col).asc())
    return (
        topk.withColumn("sel_rank", F.row_number().over(wr).cast("int"))
        .drop("_score")
    )


def weighted_reservoir_per_group(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    weight_col: Column | str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Per-group exactly-k weighted sampling without replacement — the
    stratified form of ``weighted_reservoir`` (same Efraimidis–Spirakis
    race, the top-k taken WITHIN each group): k docs per language, k
    examples per class, weight-proportional within the stratum.

    Scale shape: map-side score projection + one rank window per group key
    (WindowGroupLimit pushes the k-bound into the shuffle: at most k rows
    per (group, input-partition) cross the exchange).

    Output: the df columns + sel_rank (1..k within the group).
    """
    from pyspark.sql.window import Window

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (
        F.conv(hash_bucket(F.concat(F.lit(salt), F.col(key_col))), 16, 10).cast("long")
        + F.lit(1)
    ) / F.lit(float(16**_HEX_DIGITS))
    score = -F.log(u) / w.cast("double")
    wr = Window.partitionBy(*group_cols).orderBy(
        F.col("_score").asc(), F.col(key_col).asc()
    )
    return (
        df.filter(w.cast("double") > 0)
        .withColumn("_score", score)
        .withColumn("sel_rank", F.row_number().over(wr).cast("int"))
        .filter(F.col("sel_rank") <= k)
        .drop("_score")
    )


def negative_samples(
    df: DataFrame,
    id_col: str,
    k: int = 4,
    label_col: str | None = None,
    n_buckets: int = 64,
    salt: str = "neg-v1",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for every
    anchor row, ``k`` pseudo-random partners drawn as its successors on a
    content-addressed HASH RING — reproducible across runs, engines, and
    partitionings (no rand()), which is what makes a training set auditable.

    Ring construction: rows hash into ``n_buckets`` md5 buckets; within a
    bucket they are ordered by an independent md5 position (salted, so a new
    ``salt`` is a fresh permutation — the epoch knob, like shuffle_shard);
    anchor's j-th negative is the row ``j`` steps ahead on the ring, index
    modulo the bucket size (wrap-around).  The fan-out is capped at
    ``least(k, n-1)`` steps per bucket: in a bucket of ``n`` rows the ring
    has only ``n-1`` distinct partners, and letting j wrap past a full lap
    would re-emit the same (anchor, negative) pair under a different j —
    a silently over-weighted negative in the training set (ADVICE r7; the
    cap also makes self-pairs impossible, since 1 ≤ j ≤ n−1 never returns
    to the anchor).  With ``label_col``, same-label collisions are dropped
    (the caller's positives — expected loss ≈ k/|labels| per anchor,
    documented rather than resampled: resample-until-different is
    sequential and non-relational).

    Scale shape: NO global sort — the rank window partitions by the hash
    bucket (n_buckets parallel sorts of n/B rows each), the partner lookup
    is one equi-join on (bucket, rank), and the j fan-out is a k-wide
    explode on the anchor side.  All arithmetic is ROW_NUMBER + modular
    integer — exactly SQL-mirrorable.

    Output: (anchor id, j, negative id [, labels]) — j in [1, k].
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    idc = F.col(id_col)
    bucket = (
        F.conv(hash_bucket(F.concat(F.lit(salt + ":b:"), idc.cast("string"))), 16, 10)
        .cast("long")
        % n_buckets
    )
    pos = hash_bucket(F.concat(F.lit(salt + ":p:"), idc.cast("string")))
    cols = [idc.alias("_id"), bucket.alias("_b"), pos.alias("_p")] + (
        [F.col(label_col).alias("_lbl")] if label_col else []
    )
    ring = df.select(*cols)
    w = Window.partitionBy("_b").orderBy("_p", "_id")
    ring = ring.select(
        "*",
        F.row_number().over(w).alias("_r"),
        F.count(F.lit(1)).over(Window.partitionBy("_b")).alias("_n"),
    )
    anchors = ring.select(
        F.col("_id").alias("anchor_id"),
        F.col("_b"),
        F.col("_r"),
        F.col("_n"),
        *([F.col("_lbl").alias("_albl")] if label_col else []),
        F.explode(F.array(*[F.lit(j) for j in range(1, k + 1)])).alias("j"),
    ).where(
        # least(k, n-1): never lap the ring — a second lap would duplicate
        # (anchor, negative) pairs under new j values (ADVICE r7)
        F.col("j") <= F.col("_n") - 1
    ).select(
        "anchor_id",
        "_b",
        "j",
        *(["_albl"] if label_col else []),
        (((F.col("_r") - 1 + F.col("j")) % F.col("_n")) + 1).alias("_tr"),
    )
    partners = ring.select(
        F.col("_b"), F.col("_r").alias("_tr"), F.col("_id").alias("neg_id"),
        *([F.col("_lbl").alias("_nlbl")] if label_col else []),
    )
    out = anchors.join(partners, ["_b", "_tr"]).where(
        F.col("neg_id") != F.col("anchor_id")
    )
    if label_col:
        out = out.where(~F.col("_albl").eqNullSafe(F.col("_nlbl"))).select(
            "anchor_id",
            F.col("j").cast("int").alias("j"),
            "neg_id",
            F.col("_albl").alias("anchor_label"),
            F.col("_nlbl").alias("neg_label"),
        )
    else:
        out = out.select("anchor_id", F.col("j").cast("int").alias("j"), "neg_id")
    return out


def hard_negatives(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int = 2,
    dim: int = 64,
    n_planes: int = 4,
    seed: int = 7,
    max_pairs: int = 20_000_000,
) -> DataFrame:
    """HARD negative mining for contrastive training — the targeted
    complement of ``negative_samples`` (which draws uniform ring partners):
    for every anchor, the ``k`` most-similar vectors with a DIFFERENT label
    from the anchor's LSH sign-bucket.  Hard negatives (close in embedding
    space, different class) carry most of the contrastive gradient
    (in-batch-negatives folklore; same motivation as ANCE-style mining),
    and a pipeline typically mixes them with the uniform ring samples.

    Determinism / oracle story (the q_knn_lsh pattern): the bucket comes
    from the seeded hyperplane family (operators/similarity._hyperplanes —
    a pure function of (dim, n_planes, seed)), and the ranking key is the
    FLOOR-e6 bigint cosine, so bucket assignment, candidate set, and top-k
    order are all exactly SQL-mirrorable; ties break on partner id.

    Scale shape: one staged sign-fold pass (the HOF rule — the cell id is
    computed once and persisted, not re-derived on both join sides), a
    banded self-equi-join on the int cell key (only same-bucket pairs ever
    materialize), and a rank window that compiles to WindowGroupLimit — at
    most k rows per anchor cross the final exchange.  The in-cell pair scan
    is the quadratic hazard, so it is GATED by a scalar Σ c·(c−1) estimate
    (ORDERED pairs — unlike semantic_dedup's a<b scan, this join evaluates
    both (a,b) and (b,a) since every anchor needs its own top-k; review r8)
    in DECIMAL(38,0) (a >3e9-row hot cell wraps the int64 product): past
    ``max_pairs`` the per-pair interpreted cosine would dominate and the
    call refuses loudly — the knob that scales is ``n_planes`` (2^planes
    cells; each extra plane roughly quarters the volume; measured sf10:
    12 planes = 1.55e7 ordered pairs passes, 10 planes = 5.2e7 refuses).  Recall is LSH-bounded by construction: a
    hard negative in a different bucket is missed — n_planes=0 is exact
    (one bucket, all-pairs) on small corpora, or union multiple seeds.

    Output: (anchor_id, rank, neg_id, cos_e6, anchor_label, neg_label).
    """
    return _bucketed_topk_pairs(
        df, id_col, vec_col, label_col, k, dim, n_planes, seed, max_pairs,
        same_label=False, partner="neg", op_name="hard_negatives",
    )


def positive_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int = 1,
    dim: int = 64,
    n_planes: int = 4,
    seed: int = 7,
    max_pairs: int = 20_000_000,
) -> DataFrame:
    """Positive-pair mining — the anchor→positive half of a contrastive
    dataset: for every anchor, the ``k`` most-cosine-similar vectors with
    the SAME label from its LSH sign-bucket (self excluded).  Exactly
    ``hard_negatives`` with the label predicate flipped — same seeded
    buckets, same FLOOR-e6 ranking, same ordered-pair volume gate, same
    oracle story — so an anchor's positives and hard negatives come from
    one consistent geometry (q_contrastive_dataset composes the two with
    the uniform ring draws).

    Output: (anchor_id, rank, pos_id, cos_e6, anchor_label, pos_label).
    """
    return _bucketed_topk_pairs(
        df, id_col, vec_col, label_col, k, dim, n_planes, seed, max_pairs,
        same_label=True, partner="pos", op_name="positive_pairs",
    )


def _assigned_cells_with_gate(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    dim: int,
    n_planes: int,
    seed: int,
    max_pairs: int,
    op_name: str,
) -> DataFrame:
    """Shared prologue of every in-cell pair miner: seeded sign-bucket
    assignment staged ONCE (persisted — both join sides and the gate probe
    it), then the scalar ORDERED-pair Σ c·(c−1) volume gate in
    DECIMAL(38,0) (a >3e9-row hot cell wraps the int64 product).  Raises
    past ``max_pairs`` — the n_planes knob is the scale dial (each plane
    roughly quarters the volume).  Returns (_id, _lbl, _v, _cell)."""
    from kafka_flow_spark.cache import scoped_persist
    from kafka_flow_spark.operators.similarity import (
        _as_double,
        _hyperplanes,
        lsh_bucket,
    )

    cell = (
        lsh_bucket(F.col(vec_col), _hyperplanes(dim, n_planes, seed=seed))
        if n_planes > 0
        else F.lit(0)
    )
    from kafka_flow_spark.functions import l2_norm

    # the per-vector L2 norm is staged into the persisted relation so each
    # pairwise FLOOR-e6 cosine downstream is one dot fold, not three (r13;
    # same doubles — cosine() is dot/(na*nb))
    assigned = scoped_persist(
        df.select(
            F.col(id_col).alias("_id"),
            F.col(label_col).alias("_lbl"),
            _as_double(F.col(vec_col)).alias("_v"),
            cell.alias("_cell"),
        ).withColumn("_l2", l2_norm(F.col("_v")))
    )
    est = int(
        assigned.groupBy("_cell")
        .agg(F.count(F.lit(1)).alias("_d"))
        .agg(
            F.coalesce(
                F.sum(F.expr("cast(_d as decimal(38,0)) * (_d - 1)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("_p")
        )
        .collect()[0]["_p"]
    )
    if est > max_pairs:
        raise ValueError(
            f"{op_name}: in-cell ORDERED pair volume {est:,} exceeds "
            f"max_pairs={max_pairs:,} — the per-pair cosine scan would emit "
            "that many rows; raise n_planes (each plane quarters the "
            "volume) or max_pairs explicitly"
        )
    return assigned


def _bucketed_topk_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int,
    dim: int,
    n_planes: int,
    seed: int,
    max_pairs: int,
    same_label: bool,
    partner: str,
    op_name: str,
) -> DataFrame:
    """Shared core of hard_negatives / positive_pairs: seeded sign-bucket
    assignment (staged once), gated in-cell ORDERED pair scan, FLOOR-e6
    cosine, WindowGroupLimit top-k per anchor."""
    from kafka_flow_spark.functions import dot
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    assigned = _assigned_cells_with_gate(
        df, id_col, vec_col, label_col, dim, n_planes, seed, max_pairs, op_name
    )
    pid, plbl = f"{partner}_id", f"{partner}_label"
    a = assigned.select(
        F.col("_id").alias("anchor_id"),
        F.col("_lbl").alias("anchor_label"),
        F.col("_v").alias("_va"),
        F.col("_l2").alias("_an"),
        "_cell",
    )
    b = assigned.select(
        F.col("_id").alias(pid),
        F.col("_lbl").alias(plbl),
        F.col("_v").alias("_vb"),
        F.col("_l2").alias("_bn"),
        "_cell",
    )
    match = F.col("anchor_label").eqNullSafe(F.col(plbl))
    pred = (
        # same-label pairs must also exclude the anchor's own row; the
        # different-label predicate excludes self for free
        (match & (F.col(pid) != F.col("anchor_id"))) if same_label else ~match
    )
    cos_e6 = F.floor(
        (dot(F.col("_va"), F.col("_vb")) / (F.col("_an") * F.col("_bn")))
        * F.lit(1_000_000.0)
    ).cast("long")
    pairs = (
        a.join(b, "_cell")
        .where(pred)
        .select("anchor_id", "anchor_label", pid, plbl, cos_e6.alias("cos_e6"))
    )
    w = Window.partitionBy("anchor_id").orderBy(F.desc("cos_e6"), F.asc(pid))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("anchor_id", "rank", pid, "cos_e6", "anchor_label", plbl)
    )


def contrastive_dataset(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k_pos: int = 1,
    k_hard: int = 2,
    k_ring: int = 3,
    dim: int = 64,
    n_planes: int = 4,
    seed: int = 7,
    n_buckets: int = 64,
    ring_salt: str = "neg-v1",
    max_pairs: int = 20_000_000,
) -> DataFrame:
    """The contrastive-training capstone: one long-format dataset composing
    the three pair miners — per anchor its ``k_pos`` nearest SAME-label
    bucket-mates (``role='positive'``), its ``k_hard`` nearest
    DIFFERENT-label bucket-mates (``role='hard_negative'``), and ``k_ring``
    uniform hash-ring draws (``role='ring_negative'``) — restricted to
    anchors that have BOTH a positive and a hard negative (a triple needs
    all sides; ring draws alone don't qualify an anchor).

    NOT a wrapper over ``positive_pairs`` + ``hard_negatives``: those each
    pay the gated in-cell pair scan, and the two scans are identical except
    for the label predicate.  Here ONE scan emits every non-self bucket
    pair once, classifies it by label match, and a single
    (anchor, role)-partitioned rank window (WindowGroupLimit) keeps the
    per-role top-k — half the pair-scan cost of composing the operators,
    same seeded geometry, same FLOOR-e6 ranking, same ordered-pair
    Σ c·(c−1) scalar gate.  The ring draws reuse ``negative_samples``
    verbatim (window over hash buckets, no vectors touched).

    Determinism/oracle story: every branch is the established
    SQL-mirrorable construction (seeded literal hyperplanes, FLOOR-e6
    bigint cosine, md5 ring) — the composed dataset is value-exact against
    one generated DuckDB oracle (plans/llm.q_contrastive_dataset).

    Output: (anchor_id, anchor_label, role, rank, partner_id,
    partner_label, cos_e6) — rank restarts per (anchor, role); cos_e6 is
    NULL for ring draws (no vector math on the ring path, by design).
    """
    from kafka_flow_spark.cache import scoped_persist
    from kafka_flow_spark.functions import dot
    from pyspark.sql import Window

    for name, v in (("k_pos", k_pos), ("k_hard", k_hard), ("k_ring", k_ring)):
        if v < 1:
            raise ValueError(f"{name} must be >= 1, got {v}")
    assigned = _assigned_cells_with_gate(
        df, id_col, vec_col, label_col, dim, n_planes, seed, max_pairs,
        "contrastive_dataset",
    )
    a = assigned.select(
        F.col("_id").alias("anchor_id"),
        F.col("_lbl").alias("anchor_label"),
        F.col("_v").alias("_va"),
        F.col("_l2").alias("_an"),
        "_cell",
    )
    b = assigned.select(
        F.col("_id").alias("partner_id"),
        F.col("_lbl").alias("partner_label"),
        F.col("_v").alias("_vb"),
        F.col("_l2").alias("_bn"),
        "_cell",
    )
    cos_e6 = F.floor(
        (dot(F.col("_va"), F.col("_vb")) / (F.col("_an") * F.col("_bn")))
        * F.lit(1_000_000.0)
    ).cast("long")
    role = F.when(
        F.col("anchor_label").eqNullSafe(F.col("partner_label")),
        F.lit("positive"),
    ).otherwise(F.lit("hard_negative"))
    pairs = (
        a.join(b, "_cell")
        .where(F.col("partner_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "anchor_label",
            role.alias("role"),
            "partner_id",
            "partner_label",
            cos_e6.alias("cos_e6"),
        )
    )
    w = Window.partitionBy("anchor_id", "role").orderBy(
        F.desc("cos_e6"), F.asc("partner_id")
    )
    k_for = F.when(F.col("role") == "positive", F.lit(k_pos)).otherwise(
        F.lit(k_hard)
    )
    mined = scoped_persist(
        pairs.withColumn("rank", F.row_number().over(w).cast("int")).where(
            F.col("rank") <= k_for
        )
    )
    # an anchor qualifies only with BOTH mined sides present — computed from
    # the top-k rows (small: <= k_pos + k_hard per anchor), reused twice,
    # hence the persist above
    qualified = (
        mined.groupBy("anchor_id")
        .agg(
            F.max((F.col("role") == "positive").cast("int")).alias("_hp"),
            F.max((F.col("role") == "hard_negative").cast("int")).alias("_hn"),
        )
        .where((F.col("_hp") == 1) & (F.col("_hn") == 1))
        .select("anchor_id")
    )
    ring = negative_samples(
        df, id_col, k=k_ring, label_col=label_col, n_buckets=n_buckets,
        salt=ring_salt,
    ).select(
        F.col("anchor_id"),
        F.col("anchor_label"),
        F.lit("ring_negative").alias("role"),
        F.col("j").cast("int").alias("rank"),
        F.col("neg_id").alias("partner_id"),
        F.col("neg_label").alias("partner_label"),
        F.lit(None).cast("long").alias("cos_e6"),
    )
    out_cols = [
        "anchor_id", "anchor_label", "role", "rank",
        "partner_id", "partner_label", "cos_e6",
    ]
    return (
        mined.select(*out_cols)
        .unionByName(ring.select(*out_cols))
        .join(qualified, "anchor_id", "left_semi")
    )


# --- Poisson bootstrap ------------------------------------------------------

# Cumulative Poisson(1) thresholds scaled to the 6-hex md5 bucket space:
# replicate weight k(u) = #{t : t <= u}.  Computed once here and shared
# verbatim with the generated oracle, so both engines draw the identical
# integer weights.  The tail is truncated at k=8 (P[k>8|lambda=1] ~ 1.1e-6,
# absorbed into the last bucket — documented bias far below bootstrap noise).
_POISSON1_MAX_K = 8


def poisson1_thresholds() -> list[int]:
    import math

    cdf, acc = [], 0.0
    for k in range(_POISSON1_MAX_K):
        acc += math.exp(-1.0) / math.factorial(k)
        cdf.append(min(int(acc * 16**_HEX_DIGITS), 16**_HEX_DIGITS - 1))
    return cdf


def poisson_bootstrap(
    df: DataFrame,
    key_col: str,
    value_int_col: str,
    replicates: int = 32,
    salt: str = "boot",
) -> DataFrame:
    """Deterministic Poisson bootstrap over an integer metric column — the
    scan-frugal bootstrap (Chamandy et al., "Estimating Uncertainty for
    Massive Data Streams", Google TR 2012): instead of B resampled scans,
    ONE pass assigns every row B independent Poisson(1) weights (the large-n
    limit of multinomial resampling) and aggregates all replicates at once.
    The spread of the replicate means IS the sampling distribution of the
    metric — the error bar a data card should carry at 100 TB, where a real
    resample is unaffordable.

    Weights are content-addressed (md5(salt:replicate:key) bucket against
    the shared Poisson(1) CDF thresholds — ``poisson1_thresholds``), so the
    draw is reproducible across runs/engines/partitionings, like every
    sampler here.  Output: one row per replicate,
    ``(replicate, n_eff, sum_value, mean_value)`` — Σ weights, Σ weight·x,
    and the truncating-division mean (all bigint; callers derive CI bounds
    from the replicate spread).

    Scale shape: explode ×B (the only fan-out; B is a constant 32, not a
    data dimension) into ONE map-combinable (replicate) aggregate — B
    partial rows per task.  No shuffle wider than B rows reaches the reduce.
    """
    if replicates < 2:
        raise ValueError(f"replicates must be >= 2, got {replicates}")
    ts = poisson1_thresholds()
    rep = F.explode(F.sequence(F.lit(0), F.lit(replicates - 1))).alias("replicate")
    fanned = df.select(F.col(key_col), F.col(value_int_col), rep)
    u = F.substring(
        F.md5(
            F.concat_ws(
                ":", F.lit(salt), F.col("replicate"), F.col(key_col)
            ).cast("binary")
        ),
        1,
        _HEX_DIGITS,
    )
    thresh = F.array(*[F.lit(format(t, f"0{_HEX_DIGITS}x")) for t in ts])
    weight = F.size(F.filter(thresh, lambda t: t <= u))
    staged = fanned.select(
        "replicate",
        weight.cast("long").alias("_w"),
        (weight.cast("long") * F.col(value_int_col).cast("long")).alias("_wx"),
    )
    return (
        staged.groupBy("replicate")
        .agg(F.sum("_w").alias("n_eff"), F.sum("_wx").alias("sum_value"))
        .select(
            "replicate",
            "n_eff",
            "sum_value",
            # explicit sign handling: bigint div truncates toward zero while
            # DuckDB's // floors — they only agree on non-negative numerators
            # (the group_trend pattern).
            F.when(
                F.col("n_eff") > 0,
                F.when(
                    F.col("sum_value") >= 0, F.expr("sum_value div n_eff")
                ).otherwise(-F.expr("(-sum_value) div n_eff")),
            ).alias("mean_value"),
        )
    )


# --- recency-weighted sampling ------------------------------------------------


def recency_weighted_sample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    anchor_ts: str,
    half_life_weeks: int = 1,
    max_age_weeks: int = 30,
) -> DataFrame:
    """Freshness-biased deterministic sampling: keep probability HALVES per
    ``half_life_weeks`` of age — the training-mix move that over-weights
    recent data without dropping history outright (news/web corpora decay
    in value; uniform sampling wastes budget on stale text, a hard cutoff
    loses the tail entirely).

    Fully content-addressed, zero RNG state: ``age_weeks = datediff(anchor,
    ts) div 7`` (rows newer than the anchor clamp to age 0 — late arrivals
    sample at full rate rather than dodging the gate) and a row keeps iff
    its md5 bucket clears the LITERAL hex threshold for p = 2^-(age_weeks
    div half_life_weeks), capped at ``max_age_weeks`` (everything older
    competes at one tiny floor probability).  Identical keys sample
    identically across runs, engines and partitionings — the hash_sample
    contract with a time-varying fraction.

    Floor resolution: the md5 bucket space is 16^6 = 2^24, so the smallest
    NONZERO keep probability it can express is 2^-24 — halvings are clamped
    to ``min(max_age_weeks, 24)`` (``_MAX_HALVINGS``) because one more
    halving would floor the threshold to '000000' and turn the documented
    "tiny floor probability" into a silent hard cutoff (review r10).  The
    effective floor is therefore p = 2^-min(max_age_weeks, 24).

    Scale shape: a pure scan predicate (one CASE over ≤ max_age_weeks+1
    literal thresholds — codegen, zero shuffle, stacks with parquet
    pushdown).  Output: input columns + (age_weeks, kept).
    """
    if half_life_weeks < 1:
        raise ValueError(f"half_life_weeks must be >= 1, got {half_life_weeks}")
    if max_age_weeks < 0:
        raise ValueError(f"max_age_weeks must be >= 0, got {max_age_weeks}")
    cap = min(max_age_weeks, _MAX_HALVINGS)
    age = F.greatest(
        F.lit(0),
        F.expr(f"datediff(timestamp '{anchor_ts}', {ts_col}) div 7"),
    ).cast("int")
    hb = hash_bucket(F.col(key_col).cast("string"))
    halvings = F.least(age / F.lit(half_life_weeks), F.lit(cap)).cast("int")
    # literal threshold per halving count: p = 2^-k
    kept = None
    for k in range(cap + 1):
        cond = hb < F.lit(fraction_threshold(2.0 ** -k)) if k > 0 else F.lit(True)
        kept = F.when(halvings == k, cond) if kept is None else kept.when(
            halvings == k, cond
        )
    return df.select(
        "*",
        age.alias("age_weeks"),
        F.coalesce(kept, F.lit(False)).alias("kept"),
    )
