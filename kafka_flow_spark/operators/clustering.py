"""Deterministic, oracle-exact clustering: fixed-iteration Lloyd (k-means)
over FLOOR-e6 quantized vectors with integer-quantized centroids.

Why this exists: the engine's ANN family trains coarse quantizers (IVF lists,
PQ codebooks) with sampled iterative k-means — genuinely not SQL-expressible,
so those queries are rows-only with differential gates.  This module is the
VALUE-EXACT member of the training story: Lloyd's algorithm with

- deterministic init (the k vectors with smallest id),
- a FIXED iteration count (unrolled — no convergence test),
- vectors quantized to FLOOR-e6 bigints (engine-identical by the repo's
  established FLOOR-on-shared-double rule), and
- centroids re-quantized each round by truncating integer division
  ``sum div n`` (Spark ``div`` == DuckDB ``//``, proven truncation-identical)

is a pure integer program: assignment, re-centering, and inertia are exactly
mirrorable into an unrolled DuckDB CTE chain (the PageRank-oracle pattern),
so "did the training converge to THESE cells" is oracle-checkable, not just
recall-tested.  Distances stay in int64 by construction: components are
|x| <= 1e6, so a squared diff is <= 4e12 and a 64-dim sum <= 2.6e14.

On top of the trained cells, ``ivf_exact_knn`` runs the full IVF search
shape — probe the nprobe nearest centroids per query, scan only those cells,
exact FLOOR-e6 cosine re-rank — making the *entire* ANN path (train → probe
→ re-rank) value-exact end to end: the oracle-gated twin of the rows-only
q_knn_ivf (whose sampled trainer remains the production-scale path).

Scale shape (100 TB read): every step is one broadcast-k cross join over the
points (k is tiny; map-side, no shuffle of the corpus) plus one
(cid, dim)-cardinality map-combinable aggregate per iteration — iteration
count is FIXED, so the whole train is O(iters · N · k · dim) flops with
k·dim-sized driver state, and the search scans |probed cells|, never the
corpus.  Reference relation: the reference has no clustering operator
(SURVEY.md §2.2 — absent); this extends the Phase-4 LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

E6 = 1_000_000


def quantize_e6(vec: Column) -> Column:
    """FLOOR-e6 bigint quantization of a float vector — the shared-binary-
    double floor both engines compute bit-identically."""
    return F.transform(
        vec, lambda v: F.floor(v.cast("double") * F.lit(float(E6))).cast("long")
    )


def _sq_dist(a: Column, b: Column) -> Column:
    """Exact squared L2 distance between two e6-quantized bigint vectors.
    int64-safe: diff <= 2e6, square <= 4e12, 64-dim sum <= 2.6e14."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _assign(pts: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest centroid per point: the k centroids collapse to ONE
    broadcast array row, and the argmin runs entirely inside a projection —
    ``transform`` scores each centroid once (exact integer distance), and
    ``array_min`` over (dist, cid) structs is the argmin WITH the
    ties-to-smaller-cid rule for free (struct ordering is lexicographic by
    field position).  ZERO exchanges and no k× row blowup: r10 replaces the
    broadcast cross join + row_number window, which shuffled and sorted a
    k-expanded copy of the corpus EVERY iteration.  Measured at sf10
    (200k×64d, k=8): q_kmeans_cells itself is recenter-bound and unchanged
    (~3.7 s), but q_knn_ivf_exact — whose corpus-wide assignment fed the
    probe join through that window — drops 35.5 → 15.5 s.  Same values,
    same ties, oracles unchanged.  Output: (_id, _xe, cid, _dist)."""
    cents_arr = cents.agg(
        F.array_sort(F.collect_list(F.struct("cid", "_ce"))).alias("_cents")
    )
    best = F.array_min(
        F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                _sq_dist(F.col("_xe"), c["_ce"]).alias("_dist"),
                c["cid"].alias("cid"),
            ),
        )
    )
    return (
        pts.crossJoin(F.broadcast(cents_arr))
        .select("_id", "_xe", best.alias("_b"))
        .select("_id", "_xe", F.col("_b.cid").alias("cid"), F.col("_b._dist").alias("_dist"))
    )


def _recenter(assigned: DataFrame) -> DataFrame:
    """Re-quantized centroids from an assignment: per-(cid, dim) bigint sums
    (ONE map-combinable aggregate, k·dim rows out), centroid component =
    ``sum div n`` (truncating integer division — DuckDB ``//`` identical).
    Empty cells drop, the standard Lloyd behavior."""
    by_dim = (
        assigned.select("cid", F.posexplode("_xe").alias("_d", "_x"))
        .groupBy("cid", "_d")
        .agg(F.sum("_x").alias("_s"), F.count(F.lit(1)).alias("_n"))
    )
    return (
        by_dim.select("cid", "_d", F.expr("_s div _n").alias("_c"))
        .groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_d", "_c"))),
                lambda s: s["_c"],
            ).alias("_ce")
        )
    )


def kmeans_quantized(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Fixed-iteration quantized-centroid Lloyd.  Returns
    ``(centroids, assignments)`` after exactly ``iters`` assignment rounds:
    centroids = (cid, _ce array<bigint>) — the quantized cells the FINAL
    assignment used; assignments = (id, cid, dist_sq).

    Init: the ``k`` rows with smallest ``id_col`` (cid = their ascending-id
    rank) — deterministic, content-addressed, no RNG.  Every subsequent
    round is integer-exact, so the whole train is reproducible across runs,
    partitionings, and engines (the module-docstring contract).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    from kafka_flow_spark.cache import scoped_persist

    pts = scoped_persist(
        df.select(
            F.col(id_col).alias("_id"), quantize_e6(F.col(vec_col)).alias("_xe")
        )
    )
    first_k = pts.orderBy("_id").limit(k)
    cents = first_k.select(
        F.row_number()
        .over(Window.orderBy("_id"))
        .cast("int")
        .alias("cid"),
        F.col("_xe").alias("_ce"),
    )
    assigned = _assign(pts, cents)
    for _ in range(iters - 1):
        cents = _recenter(assigned)
        assigned = _assign(pts, cents)
    out = assigned.select(
        F.col("_id").alias(id_col), "cid", F.col("_dist").alias("dist_sq")
    )
    return cents.select("cid", F.col("_ce").alias("centroid_e6")), out


def kmeans_summary(
    df: DataFrame, id_col: str, vec_col: str, k: int = 8, iters: int = 2
) -> DataFrame:
    """Per-cell training summary: (cid, n_points, inertia_e6) where
    inertia_e6 = (Σ dist_sq) div 1e6 — summed in DECIMAL(38,0) first (a
    worst-case cell at corpus scale can push the raw bigint sum past int64;
    the e6 down-scale returns to bigint exactly, truncating division on a
    positive sum == floor on both engines)."""
    _, assigned = kmeans_quantized(df, id_col, vec_col, k, iters)
    return assigned.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.expr(
            "cast((sum(cast(dist_sq as decimal(38,0))) div 1000000) as bigint)"
        ).alias("inertia_e6"),
    )


def ivf_exact_knn(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    iters: int = 2,
    nprobe: int = 2,
) -> DataFrame:
    """IVF search over the quantized-Lloyd cells, value-exact end to end:
    train ``n_cells`` cells (``kmeans_quantized``), assign the corpus once,
    probe each query's ``nprobe`` nearest centroids (ties to smaller cid),
    and exact-re-rank ONLY the probed cells' points by FLOOR-e6 cosine
    (descending, ties to smaller neighbor id; self-matches excluded).

    The oracle-gated twin of the rows-only sampled-IVF path: same search
    shape (cell shortlist bounds the scan to |probed cells|, top-k crosses
    the final exchange via WindowGroupLimit), but every stage — training
    included — is exactly SQL-mirrorable.  Recall is cell-bounded exactly
    like production IVF: a true neighbor in an unprobed cell is missed, and
    THAT miss is deterministic and oracle-visible rather than seed-luck.

    Output: (query_id, rank, neighbor_id, cos_e6).
    """
    from kafka_flow_spark.cache import scoped_persist
    from kafka_flow_spark.functions import dot, l2_norm
    from kafka_flow_spark.operators.similarity import _as_double

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    cents, assigned = kmeans_quantized(df, id_col, vec_col, n_cells, iters)
    # the per-vector norm is staged INTO the persisted corpus relation —
    # computed once per vector (and cached), not once per (query, neighbor)
    # pair in the re-rank (r13; same doubles as cosine())
    corpus = scoped_persist(
        df.select(
            F.col(id_col).alias("_nid"), _as_double(F.col(vec_col)).alias("_nv")
        )
        .withColumn("_nn", l2_norm(F.col("_nv")))
        .join(
            assigned.select(F.col(id_col).alias("_nid"), "cid"), "_nid"
        )
    )
    qpts = queries.select(
        F.col(id_col).alias("_qid"),
        _as_double(F.col(vec_col)).alias("_qv"),
        quantize_e6(F.col(vec_col)).alias("_qxe"),
    ).withColumn("_qn", l2_norm(F.col("_qv")))
    probed = qpts.crossJoin(F.broadcast(cents)).select(
        "_qid",
        "_qv",
        "_qn",
        "cid",
        _sq_dist(F.col("_qxe"), F.col("centroid_e6")).alias("_cd"),
    )
    wp = Window.partitionBy("_qid").orderBy(F.asc("_cd"), F.asc("cid"))
    shortlist = (
        probed.withColumn("_pr", F.row_number().over(wp))
        .where(F.col("_pr") <= nprobe)
        .select("_qid", "_qv", "_qn", "cid")
    )
    cos_e6 = F.floor(
        (dot(F.col("_qv"), F.col("_nv")) / (F.col("_qn") * F.col("_nn")))
        * F.lit(float(E6))
    ).cast("long")
    cand = (
        shortlist.join(corpus, "cid")
        .where(F.col("_nid") != F.col("_qid"))
        .select("_qid", "_nid", cos_e6.alias("cos_e6"))
    )
    wr = Window.partitionBy("_qid").orderBy(F.desc("cos_e6"), F.asc("_nid"))
    return (
        cand.withColumn("rank", F.row_number().over(wr).cast("int"))
        .where(F.col("rank") <= k)
        .select(
            F.col("_qid").alias("query_id"),
            "rank",
            F.col("_nid").alias("neighbor_id"),
            "cos_e6",
        )
    )
