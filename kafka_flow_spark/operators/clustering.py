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


def _assign_row_py(x, cent_rows):
    """Exact python mirror of the pre-r14 expression argmin for one point —
    the slow path for rows/centroids outside the vectorized contract (null
    vector, null element, ragged dims).  Ordering rule, pinned empirically
    against the expression form (struct array_min, NULLS FIRST): a NULL
    distance sorts BEFORE any valid distance, ties break to the smaller
    cid.  Returns (cid, dist) with dist None when the winning distance is
    null; (None, None) when there are no centroids."""
    best = None
    for cid, c in cent_rows:
        if (
            x is None
            or c is None
            or len(x) != len(c)
            or any(v is None for v in x)
            or any(v is None for v in c)
        ):
            key = (0,)  # null distance: sorts first
            d = None
        else:
            d = sum((a - b) * (a - b) for a, b in zip(x, c))
            key = (1, d)
        if best is None or (key, cid) < best[:2]:
            best = (key, cid, d)
    if best is None:
        return None, None
    return best[1], best[2]


def _make_assign_fn(cent_rows, keep_xe: bool):
    """Build the ``mapInArrow`` nearest-centroid function over (id, _xe)
    batches.  The k centroids ride the task closure (k·dim bigints — driver
    state the size the module docstring already promises), and the argmin
    runs vectorized in int64 numpy: dists[m, k] = Σ(x−c)² by broadcast
    subtraction, ``np.argmin`` row-wise.  Arithmetic is bit-identical to
    the former expression form (int64 adds/multiplies, no overflow by the
    |x| ≤ 1e6 contract), and ``argmin``'s first-minimum rule IS the
    ties-to-smaller-cid rule because centroids are ordered by ascending
    cid.  Rows or centroids outside the uniform no-null contract fall back
    per row to ``_assign_row_py`` (same values as the old expression,
    pinned in tests/test_clustering.py)."""
    cids = [c for c, _ in cent_rows]
    vecs = [list(v) if v is not None else None for _, v in cent_rows]
    uniform = (
        len(vecs) > 0
        and all(v is not None and not any(e is None for e in v) for v in vecs)
        and len({len(v) for v in vecs}) == 1
    )

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        k = len(cids)
        cid_np = np.asarray(cids, dtype=np.int32)
        C = np.asarray(vecs, dtype=np.int64) if uniform else None
        dim = C.shape[1] if uniform else -1
        # bound the (rows × k × dim) int64 diff transient to ~256 MB
        chunk = max(1, (1 << 25) // max(1, k * max(dim, 1)))
        out_schema = None
        for batch in batches:
            n = batch.num_rows
            if out_schema is None:
                fields = [batch.schema.field(0)]
                if keep_xe:
                    fields.append(batch.schema.field(1))
                fields += [
                    pa.field("cid", pa.int32()),
                    pa.field("_dist", pa.int64()),
                ]
                out_schema = pa.schema(fields)
            if n == 0:
                continue
            xe = batch.column(1)
            cid_out = np.zeros(n, dtype=np.int32)
            cid_null = np.zeros(n, dtype=bool)
            dist_out = np.zeros(n, dtype=np.int64)
            dist_null = np.zeros(n, dtype=bool)
            offs = None
            if uniform and xe.null_count == 0:
                xa = xe.combine_chunks() if isinstance(xe, pa.ChunkedArray) else xe
                offs = xa.offsets.to_numpy(zero_copy_only=False)
                vals = xa.values
                fast_all = (
                    vals.null_count == 0 and bool(np.all(np.diff(offs) == dim))
                )
            else:
                fast_all = False
            if fast_all:
                X = vals.to_numpy(zero_copy_only=False).astype(
                    np.int64, copy=False
                )[offs[0] : offs[-1]].reshape(n, dim)
                for lo in range(0, n, chunk):
                    xs = X[lo : lo + chunk]
                    d = xs[:, None, :] - C[None, :, :]
                    dists = np.einsum("mkd,mkd->mk", d, d)
                    j = np.argmin(dists, axis=1)
                    cid_out[lo : lo + chunk] = cid_np[j]
                    dist_out[lo : lo + chunk] = dists[
                        np.arange(len(xs)), j
                    ]
            else:
                for i, x in enumerate(xe.to_pylist()):
                    cid, d = _assign_row_py(x, cent_rows)
                    if cid is None:
                        cid_null[i] = True
                    else:
                        cid_out[i] = cid
                    if d is None:
                        dist_null[i] = True
                    else:
                        dist_out[i] = d
            arrs = [batch.column(0)]
            if keep_xe:
                arrs.append(xe)
            arrs.append(pa.array(cid_out, mask=cid_null))
            arrs.append(pa.array(dist_out, mask=dist_null))
            yield pa.RecordBatch.from_arrays(arrs, schema=out_schema)

    return fn


def _assign(pts: DataFrame, cents_rows: list, keep_xe: bool = True) -> DataFrame:
    """Nearest centroid per point, vectorized through the Arrow boundary
    (guide §4.2).  ``cents_rows`` is the COLLECTED [(cid, _ce), ...] list,
    ascending cid — centroid relations are k·dim bigints by contract, the
    textbook broadcast-side collect.  r14 replaces the r10 in-projection
    ``transform``+``array_min`` argmin: interpreted ``zip_with``/
    ``aggregate`` lambdas cost N·k·dim per assignment round (1M lambda
    evals at sf0.1, ~0.5 s/round; the r13-measured 2–15× unrolled
    ``element_at`` dead end closed the expression-level space), where the
    numpy argmin is three fused passes per batch.  Same values, same ties
    (see _make_assign_fn), same ZERO-exchange shape: MapInArrow is a
    narrow op, and only (id, _xe) cross the boundary.
    Output: (_id[, _xe], cid, _dist)."""
    from pyspark.sql import types as T

    fields = [pts.schema["_id"]]
    if keep_xe:
        fields.append(pts.schema["_xe"])
    fields += [
        T.StructField("cid", T.IntegerType()),
        T.StructField("_dist", T.LongType()),
    ]
    return pts.select("_id", "_xe").mapInArrow(
        _make_assign_fn(cents_rows, keep_xe), T.StructType(fields)
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
    # The centroid relation is k·dim bigints by the module contract, so each
    # round's centroids are COLLECTED (the broadcast-small-side pattern) and
    # ride the assignment function's closure — this is what lets the argmin
    # run in numpy (see _assign).  The ladder stays exactly iters sequential
    # rounds; the collects replace the per-round broadcast-build jobs the
    # lazy form paid anyway, and the first collect doubles as the pts
    # persist fill.  Init: the k rows with smallest id, cid = ascending-id
    # rank (unchanged).
    first_k = sorted(
        pts.orderBy("_id").limit(k).collect(), key=lambda r: r["_id"]
    )
    cent_rows = [(rank + 1, r["_xe"]) for rank, r in enumerate(first_k)]
    assigned = _assign(pts, cent_rows, keep_xe=iters > 1)
    for it in range(iters - 1):
        cent_rows = sorted(
            (r["cid"], r["_ce"]) for r in _recenter(assigned).collect()
        )
        assigned = _assign(pts, cent_rows, keep_xe=it < iters - 2)
    out = assigned.select(
        F.col("_id").alias(id_col), "cid", F.col("_dist").alias("dist_sq")
    )
    cents = df.sparkSession.createDataFrame(
        [(c, None if v is None else list(v)) for c, v in cent_rows],
        "cid INT, centroid_e6 ARRAY<BIGINT>",
    )
    return cents, out


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
