"""Similarity search over embedding columns (array<float>).

- ``knn_bruteforce``: exact top-k cosine — broadcast the (small) query set,
  JVM-side dot products via zip_with/aggregate, per-query top-k via window.
  The scan side streams; nothing is collected to the driver.  This is the
  baseline and the oracle for the approximate variants.
- ``knn_lsh``: random-hyperplane LSH — sign-bit bucket per vector, candidates
  share a bucket (equi-join), exact cosine re-rank within buckets.  Scale path:
  the bucket join shuffles only by bucket id; probing multiple hyperplane
  tables raises recall without any cross join.

No counterpart in the reference (SURVEY.md §7 Phase 4).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafka_flow_spark.cache import scoped_persist
from kafka_flow_spark.functions import cosine


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def knn_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector (excluding itself).

    Output: (q_id, neighbor_id, sim, rank).  Deterministic tie-break on
    (sim DESC, neighbor_id ASC).
    """
    from kafka_flow_spark.functions import dot, l2_norm

    # per-VECTOR norms staged once per side; the per-pair work is one dot
    # fold (same doubles as cosine() — see mmr_rerank, r13)
    q = queries.select(
        F.col(id_col).alias("q_id"), _as_double(F.col(vec_col)).alias("q_vec")
    ).withColumn("_qn", l2_norm(F.col("q_vec")))
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("n_vec")
    ).withColumn("_nn", l2_norm(F.col("n_vec")))
    sim = dot(F.col("q_vec"), F.col("n_vec")) / (F.col("_qn") * F.col("_nn"))
    sims = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .select("q_id", "neighbor_id", sim.alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def knn_bruteforce_arrow(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    max_queries: int = 100_000,
) -> DataFrame:
    """Exact top-k cosine via blocked numpy matmul — the BLAS scale path.

    The probe set must be small: it is collected once (ENFORCED — more than
    ``max_queries`` rows raises instead of silently pulling an unbounded
    result onto the driver; same posture as ``_train_centroids``'s
    ``train_size`` cap), L2-normalized
    into a (m, d) matrix and broadcast to executors; the corpus side STREAMS
    through ``mapInPandas`` in Arrow blocks, each block doing one
    (block × d) @ (d × m) matmul and emitting only its block-local top-k per
    query.  A final window keeps the global top-k — so the shuffle carries at
    most k rows per (query, block), never the full similarity matrix.

    Same output contract as ``knn_bruteforce`` (ties broken on neighbor_id);
    preferred when the corpus is large — SIMD matmul beats per-row expression
    evaluation by orders of magnitude at 100 TB.
    """
    import pandas as pd

    qrows = queries.select(id_col, vec_col).limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"knn_bruteforce_arrow: query set exceeds max_queries={max_queries} — "
            "the probe matrix is collected to the driver and broadcast, which only "
            "scales for small query sets. Batch the queries, or swap sides (query "
            "the smaller set against the larger corpus)."
        )
    q_ids = np.array([r[id_col] for r in qrows])
    Q = np.array([r[vec_col] for r in qrows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    sc = vectors.sparkSession.sparkContext
    bc = sc.broadcast((q_ids, Qn))

    def block(batches):
        ids, Qn = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            sims = Vn @ Qn.T  # (block, m)
            nids = pdf[id_col].to_numpy()
            out = {"q_id": [], "neighbor_id": [], "sim": []}
            for j, qid in enumerate(ids):
                col = sims[:, j]
                mask = nids != qid
                cand_idx = np.nonzero(mask)[0]
                # block-local tie-break must match the final window's ordering
                # (sim DESC, neighbor_id ASC): lexsort keys are (minor, major)
                top = cand_idx[np.lexsort((nids[cand_idx], -col[cand_idx]))][:k]
                out["q_id"].extend([qid] * len(top))
                out["neighbor_id"].extend(nids[top].tolist())
                out["sim"].extend(col[top].tolist())
            yield pd.DataFrame(out)

    local = vectors.select(id_col, vec_col).mapInPandas(
        block, schema="q_id BIGINT, neighbor_id BIGINT, sim DOUBLE"
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return local.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    dim: int = 64,
    n_projections: int = 2,
    seed: int = 7,
) -> DataFrame:
    """All pairs with cosine similarity ≥ ``threshold`` — EXACT (recall 1.0)
    via lossless projection-band blocking.

    For unit vectors, cos(a,b) ≥ t  ⇔  ‖a−b‖ ≤ r = sqrt(2−2t).  Any unit
    direction u gives a 1-Lipschitz scalar p(x) = ⟨x/‖x‖, u⟩, so qualifying
    pairs satisfy |p(a)−p(b)| ≤ r.  Banding each of ``n_projections``
    projections at width r and probing only the 3^P adjacent cells therefore
    loses NOTHING — unlike MinHash/SimHash this is not probabilistic.  The
    pair join shuffles on small int band keys only; candidate volume shrinks
    as t → 1 (the real near-dup regime: t=0.95 ⇒ r≈0.32 ⇒ ~6 bands per
    projection over unit-projection range), and degrades gracefully toward
    all-pairs as t → 0.

    Output: (a_id, b_id, cos_sim) with a_id < b_id, cos_sim rounded to 4.
    No counterpart in the reference (SURVEY.md §7 Phase 4 — embedding-cosine
    near-duplicate detection for training-data dedup).
    """
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_projections, dim)
    planes /= np.linalg.norm(planes, axis=1, keepdims=True)
    r = float(np.sqrt(max(2.0 - 2.0 * threshold, 1e-12)))

    def proj(vec, p):
        return F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(x)) for x in p]),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def with_bands(d: DataFrame) -> DataFrame:
        norm = F.sqrt(
            F.aggregate(
                F.transform(F.col(vec_col), lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        out = d.select(F.col(id_col), F.col(vec_col), norm.alias("_nrm"))
        for i, p in enumerate(planes):
            out = out.withColumn(
                f"_b{i}", F.floor(proj(F.col(vec_col), p) / F.col("_nrm") / F.lit(r)).cast("int")
            )
        # keep _nrm: it IS l2_norm(_as_double(vec)) bit-for-bit, and staging
        # it per side saves the two per-pair norm folds in the verify (r13)
        return out

    banded = with_bands(df)
    band_cols = [f"_b{i}" for i in range(n_projections)]

    # left side probes the full 3^P neighborhood; the right side keeps its own
    # cell, so every qualifying pair matches in EXACTLY one exploded cell
    offsets = [[]]
    for _ in range(n_projections):
        offsets = [o + [d] for o in offsets for d in (-1, 0, 1)]
    probe = F.explode(
        F.array(
            *[
                F.struct(
                    *[(F.col(band_cols[i]) + F.lit(o[i])).alias(band_cols[i]) for i in range(n_projections)]
                )
                for o in offsets
            ]
        )
    ).alias("_cell")
    left = banded.select(
        F.col(id_col).alias("a_id"),
        F.col(vec_col).alias("a_vec"),
        F.col("_nrm").alias("_an"),
        probe,
    ).select(
        "a_id", "a_vec", "_an", *[F.col(f"_cell.{c}").alias(c) for c in band_cols]
    )
    right = banded.select(
        F.col(id_col).alias("b_id"),
        F.col(vec_col).alias("b_vec"),
        F.col("_nrm").alias("_bn"),
        *band_cols,
    )
    from kafka_flow_spark.functions import dot

    sim = dot(_as_double(F.col("a_vec")), _as_double(F.col("b_vec"))) / (
        F.col("_an") * F.col("_bn")
    )
    return (
        left.join(right, band_cols)
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", sim.alias("_sim"))
        .filter(F.col("_sim") >= F.lit(threshold))
        .select("a_id", "b_id", F.round("_sim", 4).alias("cos_sim"))
    )


def _auto_n_blocks(
    n_rows: int,
    dim: int,
    target_block_bytes: int = 32 << 20,
    max_pair_bytes: int = 256 << 20,
    max_block_pairs: int = 100_000,
    parallelism: int = 0,
) -> int:
    """Corpus-size-aware block count for the block-matmul pair scan.

    Two per-task memory budgets bound the rows per block: the collected block
    itself (rows × dim × 8 B ≤ ``target_block_bytes``, the shuffle-row bound)
    and the similarity sub-matrix of a block pair (rows² × 8 B ≤
    ``max_pair_bytes`` — the binding constraint for small dim).  A third,
    scheduling bound kicks in when ``parallelism`` is given: memory-sized
    blocks can leave B(B+1)/2 ≪ cores (measured 10 tasks on 32 cores at a
    20k-vector corpus), so rows-per-block is also capped to yield ≥ ~2×
    ``parallelism`` pair tasks — floored at 1024 rows so small corpora don't
    shatter into pure-overhead micro-tasks.  When the resulting B(B+1)/2
    block-pair task count exceeds ``max_block_pairs`` the corpus is simply too
    large for an exact all-pairs scan — refuse loudly rather than schedule an
    unbounded quadratic job (use the band-blocked ``cosine_near_dup_pairs``
    with a high threshold instead).
    """
    rows_by_bytes = max(1, target_block_bytes // (8 * max(dim, 1)))
    rows_by_pairs = max(1, int((max_pair_bytes // 8) ** 0.5))
    rows_per_block = min(rows_by_bytes, rows_by_pairs)
    if parallelism > 0:
        # B blocks -> B(B+1)/2 tasks; B >= sqrt(4*parallelism) gives >= ~2x
        min_blocks = max(1, int((4 * parallelism) ** 0.5))
        rows_by_sched = max(1024, -(-n_rows // min_blocks))
        rows_per_block = min(rows_per_block, rows_by_sched)
    n_blocks = max(1, -(-n_rows // rows_per_block))
    if n_blocks * (n_blocks + 1) // 2 > max_block_pairs:
        raise ValueError(
            f"cosine_near_dup_pairs_matmul: {n_rows} rows × dim {dim} needs "
            f"{n_blocks} blocks → {n_blocks * (n_blocks + 1) // 2} block-pair "
            f"tasks (> {max_block_pairs}); an exact all-pairs scan at this "
            "scale is quadratic — use cosine_near_dup_pairs (band blocking) "
            "with a high threshold, or pre-cluster the corpus"
        )
    return n_blocks


def cosine_near_dup_pairs_matmul(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_blocks: int | None = None,
) -> DataFrame:
    """All pairs with cosine ≥ ``threshold`` via block-matrix matmul — the
    exact path for LOW thresholds, where no metric blocking can prune.

    ``cosine_near_dup_pairs`` (band blocking) wins when t is high (t=0.95 ⇒
    band width 0.32 ⇒ strong pruning); as t → 0 the candidate set approaches
    all pairs and per-pair expression cosines (interpreted higher-order
    functions) dominate.  Here the corpus is hashed into ``n_blocks`` row
    blocks, the B×(B+1)/2 unordered block pairs are formed with a join on
    small int keys, and each pair's full similarity sub-matrix is ONE numpy
    matmul inside ``mapInPandas`` — SIMD throughput instead of per-pair
    expression trees.  Nothing is collected to the driver and no side is
    broadcast.

    ``n_blocks`` defaults to a corpus-size-aware value (one cheap count +
    one-row dim probe, see ``_auto_n_blocks``) that bounds BOTH the
    collect_list'd block row (≤ 32 MB) and the per-task similarity matrix
    (≤ 256 MB), and refuses outright when the block-pair task count shows
    the job is quadratic-at-scale — a fixed default would OOM a 100 TB run.

    Same output contract as ``cosine_near_dup_pairs``: (a_id, b_id, cos_sim
    rounded to 4), a_id < b_id.
    """
    import pandas as pd

    if n_blocks is None:
        # ONE statistics job, not two (count + dim probe fused): each extra
        # driver job costs a fixed ~80 ms of scheduling floor that dominates
        # at small SF and adds driver latency at any SF
        stats = df.agg(
            F.count(F.lit(1)).alias("n"), F.max(F.size(vec_col)).alias("d")
        ).first()
        n_blocks = _auto_n_blocks(
            int(stats["n"]),
            int(stats["d"] or 1),
            parallelism=df.sparkSession.sparkContext.defaultParallelism,
        )

    blocks = (
        df.select(
            F.pmod(F.hash(F.col(id_col)), F.lit(n_blocks)).alias("blk"),
            F.col(id_col).alias("_id"),
            _as_double(F.col(vec_col)).alias("_vec"),
        )
        .groupBy("blk")
        .agg(
            F.collect_list("_id").alias("ids"),
            F.collect_list("_vec").alias("vecs"),
        )
    )
    pairs = (
        blocks.select(
            F.col("blk").alias("a_blk"), F.col("ids").alias("a_ids"), F.col("vecs").alias("a_vecs")
        )
        .join(
            blocks.select(
                F.col("blk").alias("b_blk"),
                F.col("ids").alias("b_ids"),
                F.col("vecs").alias("b_vecs"),
            ),
            F.col("a_blk") <= F.col("b_blk"),
        )
        .repartition(F.col("a_blk"), F.col("b_blk"))
    )

    def compute(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                a_ids = np.asarray(row["a_ids"], dtype=np.int64)
                b_ids = np.asarray(row["b_ids"], dtype=np.int64)
                A = np.stack([np.asarray(v) for v in row["a_vecs"]])
                B = np.stack([np.asarray(v) for v in row["b_vecs"]])
                An = A / np.linalg.norm(A, axis=1, keepdims=True)
                Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
                S = An @ Bn.T
                mask = S >= threshold
                if row["a_blk"] == row["b_blk"]:
                    # same block on both sides: strict upper triangle by id
                    # avoids self-pairs and double emission
                    mask &= a_ids[:, None] < b_ids[None, :]
                ai, bi = np.nonzero(mask)
                if len(ai):
                    lo = np.minimum(a_ids[ai], b_ids[bi])
                    hi = np.maximum(a_ids[ai], b_ids[bi])
                    yield pd.DataFrame(
                        {"a_id": lo, "b_id": hi, "cos_sim": np.round(S[ai, bi], 4)}
                    )

    return pairs.mapInPandas(compute, schema="a_id BIGINT, b_id BIGINT, cos_sim DOUBLE")


def _hash_sample(
    vectors: DataFrame, id_col: str, vec_col: str, train_size: int
) -> "np.ndarray":
    """Bounded deterministic L2-normalized training sample.

    Ordering by ``xxhash64(id)`` is content-addressed, so the sample (and
    everything trained from it) is identical across runs and partitionings;
    the driver-side collect is capped at ``train_size`` rows — at 100 TB the
    sample-sort is a top-k (no full sort materializes)."""
    rows = (
        vectors.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(train_size)
        .collect()
    )
    X = np.array([r[vec_col] for r in rows], dtype=np.float64)
    return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)


def _train_centroids(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int,
    train_size: int = 4096,
    iters: int = 20,
    sample: "np.ndarray | None" = None,
) -> "np.ndarray":
    """Spherical k-means codebook from a bounded deterministic sample
    (``_hash_sample``; pass ``sample`` to reuse an already-collected one —
    the PQ index builder trains coarse AND residual codebooks from one
    sample job instead of two identical corpus scans).

    Training cost is O(train_size · n_cells · dim · iters), independent of
    corpus size.  Lloyd's iterations run on unit vectors with cosine
    assignment (spherical k-means); empty cells are reseeded from the point
    farthest from its centroid, so exactly ``n_cells`` distinct centroids
    come back.
    """
    X = sample if sample is not None else _hash_sample(
        vectors, id_col, vec_col, train_size
    )
    n_cells = min(n_cells, len(X))
    C = X[:n_cells].copy()  # hash-shuffled sample → first k is a uniform seed
    for _ in range(iters):
        sims = X @ C.T
        assign = np.argmax(sims, axis=1)
        newC = np.zeros_like(C)
        for c in range(n_cells):
            members = X[assign == c]
            if len(members):
                m = members.sum(axis=0)
                norm = np.linalg.norm(m)
                newC[c] = m / norm if norm > 1e-12 else C[c]
            else:
                # reseed from the globally worst-served point (deterministic)
                worst = int(np.argmin(sims[np.arange(len(X)), assign]))
                newC[c] = X[worst]
        if np.allclose(newC, C, atol=1e-9):
            C = newC
            break
        C = newC
    return C


def knn_ivf(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """Approximate top-k cosine via an IVF (inverted-file) coarse quantizer.

    Every corpus vector is assigned to its nearest of ``n_cells`` centroid
    cells (one Arrow-batched matmul pass — the corpus never leaves its
    partitions); each query probes its ``n_probe`` nearest cells and
    brute-forces only those inverted lists.  Cost per query drops from O(N)
    to O(N · n_probe / n_cells); the cell join shuffles on a small int key.

    Centroids are trained with spherical k-means on a deterministic,
    bounded sample (``_train_centroids``): the collect is capped at
    ``train_size`` rows regardless of corpus size — the 100 TB-safe version
    of "train offline, broadcast the codebook".  Same output contract as
    ``knn_bruteforce``.
    """
    import pandas as pd

    Cn = _train_centroids(vectors, id_col, vec_col, n_cells)
    bc = vectors.sparkSession.sparkContext.broadcast(Cn)

    def assign(n_top: int):
        def gen(batches):
            Cn = bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
                Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
                sims = Vn @ Cn.T  # (block, n_cells)
                top = np.argsort(-sims, kind="stable", axis=1)[:, :n_top]
                out = pdf.loc[pdf.index.repeat(n_top), [id_col, vec_col]].reset_index(drop=True)
                out["cell"] = top.reshape(-1).astype("int32")
                yield out

        return gen

    vec_t = vectors.schema[vec_col].dataType.simpleString()
    schema = f"{id_col} BIGINT, {vec_col} {vec_t}, cell INT"
    v = vectors.select(id_col, vec_col).mapInPandas(assign(1), schema=schema).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec"), "cell"
    )
    q = queries.select(id_col, vec_col).mapInPandas(assign(n_probe), schema=schema).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"), "cell"
    )
    from kafka_flow_spark.functions import dot, l2_norm

    v = v.withColumn("_nn", l2_norm(_as_double(F.col("n_vec"))))
    q = q.withColumn("_qn", l2_norm(_as_double(F.col("q_vec"))))
    sim = dot(_as_double(F.col("q_vec")), _as_double(F.col("n_vec"))) / (
        F.col("_qn") * F.col("_nn")
    )
    sims = (
        v.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .select("q_id", "neighbor_id", sim.alias("sim"))
        .groupBy("q_id", "neighbor_id")
        .agg(F.max("sim").alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(float).tolist()


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-bit bucket id of a vector against fixed hyperplanes (JVM-side)."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec_col,
                    F.array(*[F.lit(x) for x in p]),
                    lambda a, b: a.cast("double") * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit(1 << i),
        ).otherwise(F.lit(0))
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def knn_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
    multiprobe_bits: int = 1,
) -> DataFrame:
    """Approximate top-k cosine via multi-table random-hyperplane LSH with
    query-side multiprobe.

    Candidates = vectors sharing a bucket with the query in any of ``n_tables``
    hash tables; with ``multiprobe_bits=1`` each QUERY also probes the
    ``n_planes`` buckets at Hamming distance 1 (the neighbors most likely to
    hold near misses — a near neighbor falls on the wrong side of plane i
    with probability θ/π per plane).  Multiprobe buys recall with query-side
    fan-out only: the corpus is never re-hashed or replicated, so the big
    side's shuffle volume is unchanged (standard multi-probe LSH, Lv et al.,
    VLDB'07).  Exact cosine re-rank on candidates only; cost stays
    equi-join-shaped (shuffle by (table, bucket)).

    Parameter note: P(bucket match) per table is (1 - θ/π)^n_planes; for
    neighbors at cosine ≈ 0.4 (θ ≈ 66°, typical of weakly-clustered corpora)
    4 planes × 8 tables gives ≈ 75% recall, and Hamming-1 multiprobe lifts it
    to ≈ 95% at ~5× query-side candidates (measured on the test corpus).
    """
    tables = [(t, _hyperplanes(dim, n_planes, seed=42 + t)) for t in range(n_tables)]

    def bucketize(df: DataFrame, idc: str, probe_bits: int) -> DataFrame:
        entries = []
        for t, planes in tables:
            b = lsh_bucket(F.col(vec_col), planes)
            entries.append(F.struct(F.lit(t).alias("tbl"), b.alias("bucket")))
            if probe_bits >= 1:
                entries.extend(
                    F.struct(
                        F.lit(t).alias("tbl"),
                        b.bitwiseXOR(F.lit(1 << i)).alias("bucket"),
                    )
                    for i in range(n_planes)
                )
        return df.select(
            F.col(idc), F.col(vec_col), F.explode(F.array(*entries)).alias("tb")
        ).select(F.col(idc), F.col(vec_col), F.col("tb.tbl"), F.col("tb.bucket"))

    vb = bucketize(vectors, id_col, 0).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec"), "tbl", "bucket"
    )
    qb = bucketize(queries, id_col, multiprobe_bits).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"), "tbl", "bucket"
    )
    # dedup multi-table hits AFTER computing the scalar sim: a distinct on
    # (…, q_vec, n_vec) would shuffle full float vectors as grouping keys;
    # max(sim) over (q_id, neighbor_id) shuffles two scalars per candidate
    from kafka_flow_spark.functions import dot, l2_norm

    vb = vb.withColumn("_nn", l2_norm(_as_double(F.col("n_vec"))))
    qb = qb.withColumn("_qn", l2_norm(_as_double(F.col("q_vec"))))
    sim = dot(_as_double(F.col("q_vec")), _as_double(F.col("n_vec"))) / (
        F.col("_qn") * F.col("_nn")
    )
    sims = (
        vb.join(F.broadcast(qb), ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .select("q_id", "neighbor_id", sim.alias("sim"))
        .groupBy("q_id", "neighbor_id")
        .agg(F.max("sim").alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def quantize_int8(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization (the standard 4× memory
    compression for ANN serving: max-abs scale, round-to-nearest codes).

    Output: id, scale (double, = max|v| / 127), codes (array<int> in
    [-127, 127]).  All-zero vectors get scale 0 and all-zero codes.  Pure
    per-row projection — zero shuffle, runs map-side at any corpus size; the
    codes column is what a 100 TB ANN index would persist instead of float32.
    """
    v = _as_double(F.col(vec_col))
    scale = F.array_max(F.transform(v, F.abs)) / F.lit(127.0)
    codes = F.when(scale == 0.0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(v, lambda x: F.round(x / scale).cast("int"))
    )
    return df.select(
        F.col(id_col), scale.alias("scale"), codes.cast("array<int>").alias("codes")
    )


def knn_quantized(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact-rank kNN over the int8-quantized corpus (asymmetric distance:
    queries stay full-precision, the corpus side is dequantized codes — the
    standard ADC setup).  This is what search looks like against the persisted
    100 TB index: the scan reads 4×-smaller int8 codes + one scale per vector
    and reconstructs on the fly; ranking error is bounded by the
    round-to-nearest guarantee (≤ scale/2 per component).

    Same output contract as ``knn_bruteforce`` (q_id, neighbor_id, sim, rank;
    ties on neighbor_id ASC).
    """
    q8 = quantize_int8(vectors, id_col, vec_col)
    deq = q8.select(
        F.col(id_col),
        F.transform("codes", lambda c: c.cast("double") * F.col("scale")).alias(
            vec_col
        ),
    )
    return knn_bruteforce(deq, queries, id_col=id_col, vec_col=vec_col, k=k)


def semantic_dedup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_cells: int = 16,
    n_probe: int = 1,
) -> DataFrame:
    """Within-cluster near-duplicate pairs, SemDeDup-style (Abbas et al. 2023,
    arXiv:2303.09540): spherical-k-means cluster the corpus, then compare
    vectors only INSIDE each cluster — the quadratic pair scan becomes
    per-cell, O(N²/n_cells) expected, and the cell join shuffles on a small
    int key.

    The coarse quantizer is the same bounded-sample trainer the IVF index
    uses (`_train_centroids`: content-addressed sample, deterministic
    Lloyd's — identical centroids across runs/partitionings).  ``n_probe > 1``
    assigns each vector to its n nearest cells (multi-assignment trades
    candidate volume for recall of borderline cross-cell pairs; pairs are
    deduplicated by max-sim groupBy).

    The within-cell pair scan runs as one BLAS matmul per cell inside
    ``applyInPandas`` (row-blocked to bound memory on skewed cells) — NOT
    an expression-evaluated self-join: per-pair higher-order-function
    cosine measured ~1000× slower than the vectorized path at sf10
    (235 s → ~3 s for 200k vectors / 1000 cells), the same reason
    ``knn_bruteforce_arrow`` exists alongside ``knn_bruteforce``.

    Output: (a_id, b_id, cos_sim) with a_id < b_id, cos_sim rounded to 4 —
    the same contract as ``cosine_near_dup_pairs`` (which is the EXACT
    all-pairs operator; this one is its approximate big-corpus sibling).
    """
    import pandas as pd

    Cn = _train_centroids(df, id_col, vec_col, n_cells)
    bc = df.sparkSession.sparkContext.broadcast(Cn)
    n_probe = max(1, min(n_probe, len(Cn)))

    def gen(batches):
        C = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            sims = Vn @ C.T
            top = np.argsort(-sims, kind="stable", axis=1)[:, :n_probe]
            out = pdf.loc[pdf.index.repeat(n_probe), [id_col, vec_col]].reset_index(
                drop=True
            )
            out["cell"] = top.reshape(-1).astype("int32")
            yield out

    vec_t = df.schema[vec_col].dataType.simpleString()
    id_t = df.schema[id_col].dataType.simpleString()
    assigned = df.select(id_col, vec_col).mapInPandas(
        gen, schema=f"{id_col} {id_t}, {vec_col} {vec_t}, cell INT"
    )

    pairs = _cell_pairs_blas(assigned, id_col, vec_col, threshold, id_t)
    return (
        pairs.groupBy("a_id", "b_id")  # n_probe > 1 can match a pair in 2+ cells
        .agg(F.round(F.max("_sim"), 4).alias("cos_sim"))
    )


def _cell_pairs_blas(
    assigned: DataFrame, id_col: str, vec_col: str, threshold: float, id_t: str
) -> DataFrame:
    """Within-cell pair scan as one blocked BLAS matmul per cell
    (applyInPandas over the ``cell`` key) — shared by the trained
    (``semantic_dedup_pairs``) and deterministic-cell
    (``semantic_dedup_lsh``) variants.  Emits (a_id, b_id, _sim) with
    a_id < b_id for every in-cell pair at or above ``threshold``."""
    import pandas as pd

    def cell_pairs(pdf):
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"a_id": [], "b_id": [], "_sim": []})
        ids = pdf[id_col].to_numpy()
        V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        outs = []
        block = 1024  # bounds the sim slab to block×n doubles on skewed cells
        for s in range(0, n, block):
            e = min(s + block, n)
            S = Vn[s:e] @ Vn.T  # (e-s, n)
            ri, ci = np.nonzero(S >= threshold)
            keep = (ri + s) < ci  # strict upper triangle in global indices
            ri, ci = ri[keep], ci[keep] + 0
            if not len(ri):
                continue
            a, b = ids[ri + s], ids[ci]
            outs.append(
                pd.DataFrame(
                    {
                        "a_id": np.minimum(a, b),
                        "b_id": np.maximum(a, b),
                        "_sim": S[ri, ci],
                    }
                )
            )
        if not outs:
            return pd.DataFrame({"a_id": [], "b_id": [], "_sim": []})
        return pd.concat(outs, ignore_index=True)

    return assigned.groupBy("cell").applyInPandas(
        cell_pairs, schema=f"a_id {id_t}, b_id {id_t}, _sim DOUBLE"
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_cells: int = 16,
    n_probe: int = 1,
) -> DataFrame:
    """Semantic deduplication: drop every vector that has a near-duplicate
    (within-cluster cosine ≥ threshold) with a smaller id; keep the rest.

    Keep-first semantics — one deterministic parallel rule, the same contract
    streaming/dedup.py uses.  For component-canonical semantics (duplicate
    CHAINS collapse to one survivor even when the endpoints aren't directly
    similar) feed ``semantic_dedup_pairs`` into ``graph.dedup_clusters``
    instead; keep-first is the SemDeDup paper's per-cluster prune, which
    never compares across clusters by design.

    Returns ``df``'s surviving rows unchanged (all original columns).
    """
    dropped = (
        semantic_dedup_pairs(df, id_col, vec_col, threshold, n_cells, n_probe)
        .select(F.col("b_id").alias(id_col))
        .distinct()
    )
    return df.join(dropped, id_col, "left_anti")


def _train_pq_codebooks(
    X: "np.ndarray",
    m_subspaces: int,
    n_codes: int,
    iters: int = 20,
) -> "np.ndarray":
    """Per-subspace Euclidean k-means codebooks over a training matrix
    (deterministic: hash-shuffled sample order seeds the centroids, empty
    clusters reseed from the worst-served point — same discipline as
    ``_train_centroids``).  Returns (m, n_codes, sub_dim)."""
    n, dim = X.shape
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m_subspaces {m_subspaces}")
    sub = dim // m_subspaces
    ks = min(n_codes, n)
    books = np.zeros((m_subspaces, ks, sub), dtype=np.float64)
    for mi in range(m_subspaces):
        S = X[:, mi * sub : (mi + 1) * sub]
        C = S[:ks].copy()
        row_sq = (S**2).sum(axis=1)
        for _ in range(iters):
            # ||s-c||^2 = ||s||^2 - 2 s·c + ||c||^2; the ||s||^2 term is
            # constant per row, so ARGMIN over centroids needs only the
            # matmul form — but the empty-cluster reseed argmax compares
            # ACROSS rows, where ||s||^2 varies, so it adds the row term back
            d2 = (C**2).sum(axis=1)[None, :] - 2.0 * (S @ C.T)
            assign = np.argmin(d2, axis=1)
            newC = C.copy()
            for c in range(ks):
                members = S[assign == c]
                if len(members):
                    newC[c] = members.mean(axis=0)
                else:
                    true_d2 = row_sq + d2[np.arange(n), assign]
                    worst = int(np.argmax(true_d2))
                    newC[c] = S[worst]
            if np.allclose(newC, C, atol=1e-12):
                C = newC
                break
            C = newC
        books[mi] = C
    return books


def pq_index(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    m_subspaces: int = 8,
    n_codes: int = 256,
    train_size: int = 4096,
):
    """Build an IVF-PQ index: (index DataFrame, coarse centroids, codebooks).

    The index relation is (id, cell, codes) — ``m_subspaces`` one-byte-range
    codes per vector instead of ``dim`` floats (64-dim float32 → 8 codes is
    a 32× scan-size reduction; THIS is what a 100 TB ANN deployment persists
    and scans).  Product quantization is on the RESIDUAL against the
    vector's coarse cell centroid with codebooks pooled across cells — the
    standard IVF-PQ layout (Jégou, Douze & Schmid, TPAMI'11): residuals are
    far better centered than raw vectors, so the same code budget carries
    more precision.

    Training is driver-side on the bounded content-addressed sample
    (``train_size`` cap — identical discipline and determinism as
    ``_train_centroids``); encoding is one mapInPandas pass over the corpus,
    zero shuffle.
    """
    X = _hash_sample(vectors, id_col, vec_col, train_size)
    Cn = _train_centroids(vectors, id_col, vec_col, n_cells, train_size, sample=X)
    res = X - Cn[np.argmax(X @ Cn.T, axis=1)]
    books = _train_pq_codebooks(res, m_subspaces, n_codes)
    return pq_encode(vectors, id_col, vec_col, Cn, books), Cn, books


def pq_encode(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    Cn: "np.ndarray",
    books: "np.ndarray",
) -> DataFrame:
    """Encode a corpus against EXPLICIT coarse centroids + PQ codebooks —
    the (re)encode half of ``pq_index`` split out so trained codebooks can
    be reused on new data (the daily-increment move: train once, encode
    every increment) and so the encode ARITHMETIC is testable against the
    oracle-gated expression form (``pq_encode_grid_expr`` + the
    numpy-vs-Catalyst differential in tests/test_similarity.py).

    One mapInPandas pass, zero shuffle: normalize → coarse-assign (argmax
    cosine) → residual → per-subspace argmin over the codebook (matmul
    form; row term constant per row, first-index tie-break = np.argmin)."""
    sc = vectors.sparkSession.sparkContext
    bc_C, bc_B = sc.broadcast(Cn), sc.broadcast(books)
    m = int(books.shape[0])

    def encode(batches):
        C, B = bc_C.value, bc_B.value
        sub = B.shape[2]
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            cell = np.argmax(Vn @ C.T, axis=1)
            R = Vn - C[cell]
            codes = np.empty((len(R), m), dtype=np.int32)
            for mi in range(m):
                S = R[:, mi * sub : (mi + 1) * sub]
                # matmul form of the squared distance (row term constant)
                d2 = (B[mi] ** 2).sum(axis=1)[None, :] - 2.0 * (S @ B[mi].T)
                codes[:, mi] = np.argmin(d2, axis=1)
            out = pdf[[id_col]].copy()
            out["cell"] = cell.astype("int32")
            out["codes"] = list(codes)
            yield out

    id_t = vectors.schema[id_col].dataType.simpleString()
    return vectors.select(id_col, vec_col).mapInPandas(
        encode, schema=f"{id_col} {id_t}, cell INT, codes ARRAY<INT>"
    )


def _grid_scores_staged(
    df: DataFrame,
    keep_cols: list[str],
    vec_col: str,
    levels: tuple[float, ...],
    m_subspaces: int,
) -> DataFrame:
    """Stage the grid-gate arithmetic as REAL columns: normalized vector,
    then per-(subspace, level) squared distances ``_s_{mi}_{j}``, each
    ROUNDED to 6 decimals (both engines round before any comparison/sum, so
    a sub-1e-6 FP wiggle can never flip a code or an ADC rank).

    Staging matters as much as the math: higher-order functions are
    interpreted per element, and Catalyst does no common-subexpression
    elimination on them — an inline normalized-vector expression referenced
    by 32 slice-folds re-evaluates its length-64 norm fold PER REFERENCE
    (the repetition_stats lesson, PERF.md r5).  Un-staged, the sf10 encode
    of 200k vectors ran >10 min; staged it is seconds.  Sub-length comes
    from the runtime array size (dim % m == 0 by contract, as in
    ``_train_pq_codebooks``) — no hardcoded dimensionality.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    d = df.select(*keep_cols, v.alias("_v"))
    d = d.select(
        *keep_cols,
        "_v",
        F.sqrt(
            F.aggregate(F.col("_v"), F.lit(0.0), lambda acc, x: acc + x * x)
        ).alias("_nrm"),
    )
    d = d.select(
        *keep_cols,
        F.transform(
            F.col("_v"), lambda x: x / F.greatest(F.col("_nrm"), F.lit(1e-12))
        ).alias("_vn"),
    )
    sub_len = F.size(F.col("_vn")) / F.lit(m_subspaces)
    score_cols = []
    for mi in range(m_subspaces):
        start = (F.lit(mi) * sub_len + 1).cast("int")
        s = F.slice(F.col("_vn"), start, sub_len.cast("int"))

        def _sqerr_fold(g: float):
            # closure factory, NOT a default arg: pyspark reads the lambda's
            # arity to bind HOF variables, and `lambda acc, x, g=g` counts 3
            return lambda acc, x: acc + (x - F.lit(g)) * (x - F.lit(g))

        for j, g in enumerate(levels):
            score_cols.append(
                F.round(F.aggregate(s, F.lit(0.0), _sqerr_fold(g)), 6).alias(
                    f"_s_{mi}_{j}"
                )
            )
    return d.select(*keep_cols, *score_cols)


def pq_encode_grid_expr(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    levels: tuple[float, ...] = (-0.3, -0.1, 0.1, 0.3),
    m_subspaces: int = 8,
) -> DataFrame:
    """PQ encode against CONSTANT-GRID codebooks (codebook entry j of every
    subspace = level_j repeated across the sub-dims), entirely in Catalyst
    expressions — the ORACLE GATE for the PQ encode arithmetic.

    k-means codebooks make PQ un-oracle-able (iterative training has no SQL
    form), but the encode math — normalize, subspace slicing, per-code
    squared distance, argmin with first-index tie-break, reconstruction
    error — is codebook-agnostic.  Fixing the codebooks to a deterministic
    grid lets DuckDB reproduce every step, and the numpy-vs-expression
    differential (tests/test_similarity.py) carries the proof over to the
    production ``pq_encode`` path, which runs the identical contract on
    trained codebooks.  This is the ``quantize_int8``/``knn_quantized``
    pattern applied to PQ.

    Per-code scores are rounded to 6 decimals BEFORE the argmin (both
    engines) so a sub-1e-6 cross-engine FP wiggle cannot flip a code;
    genuinely distinct grid scores differ by far more.

    Output: (id, codes array<int>, recon_err double·4dp) — recon_err is
    the summed min-scores, i.e. the total squared quantization error of
    the normalized vector.
    """
    staged = _grid_scores_staged(df, [id_col], vec_col, levels, m_subspaces)
    n_levels = len(levels)
    code_cols = []
    err_cols = []
    for mi in range(m_subspaces):
        scores = [F.col(f"_s_{mi}_{j}") for j in range(n_levels)]
        best = F.least(*scores)
        # first index whose score equals the min — np.argmin tie semantics
        code = F.lit(n_levels - 1)
        for j in range(n_levels - 2, -1, -1):
            code = F.when(scores[j] == best, F.lit(j)).otherwise(code)
        code_cols.append(code)
        err_cols.append(best)
    total_err = err_cols[0]
    for e in err_cols[1:]:
        total_err = total_err + e
    return staged.select(
        F.col(id_col),
        F.array(*code_cols).cast("array<int>").alias("codes"),
        F.round(total_err, 4).alias("recon_err"),
    )


def adc_shortlist_grid(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: tuple[float, ...] = (-0.3, -0.1, 0.1, 0.3),
    m_subspaces: int = 8,
    shortlist: int = 20,
) -> DataFrame:
    """ADC (asymmetric-distance) candidate shortlist against CONSTANT-GRID
    codebooks, entirely in Catalyst expressions — the oracle gate for the
    IVF-PQ shortlist arithmetic (the ``pq_encode_grid_expr`` pattern applied
    to the SEARCH half of ``knn_ivfpq``).

    The arithmetic is codebook-agnostic: corpus vectors are PQ-encoded
    (normalize → subspace argmin, identical to the proven encode gate), each
    QUERY precomputes its per-(subspace, level) squared-distance table —
    exactly the LUT ``knn_ivfpq``'s Arrow path builds per query, here as 6dp-
    rounded expression columns — and a candidate's ADC distance is the sum
    of m table lookups selected by its codes.  Because every term is rounded
    to 6 decimals on both engines and the m-term sum is a left-assoc double
    chain, the ADC value is BIT-IDENTICAL cross-engine; the output carries
    it FLOOR-scaled to bigint (floor of a shared binary double is always
    engine-exact) and ranks by (adc_e6, neighbor_id) — fully deterministic.
    The numpy differential in tests/test_similarity.py runs the same grid
    codebooks through the trained path's LUT arithmetic and matches these
    shortlists exactly, carrying the proof to ``knn_ivfpq``.

    Scale shape: the corpus side is a map-side encode projection (no
    shuffle); queries broadcast (bounded probe set by contract, like every
    knn_* query here); the only exchange is the top-k WindowGroupLimit on
    (q_id) — m integer lookups per candidate instead of a dim-length dot.
    """
    L = len(levels)
    # Pin the encode's parallelism: the corpus parquet is often a handful of
    # row groups (one task), and the 32-fold interpreted encode is CPU-bound
    # — at 200k vectors the unpinned plan ran single-task >10 min at sf10,
    # the pinned one seconds.  Same rationale/knob as the minhash pipeline
    # (dedup.py): a user repartition count is AQE-coalesce-exempt.
    sess = vectors.sparkSession
    n_part = max(
        int(sess.conf.get("spark.sql.shuffle.partitions")),
        sess.sparkContext.defaultParallelism,
    )
    codes = pq_encode_grid_expr(
        vectors.repartition(n_part, F.col(id_col)),
        id_col,
        vec_col,
        levels=levels,
        m_subspaces=m_subspaces,
    ).select(F.col(id_col).alias("neighbor_id"), "codes")
    q = _grid_scores_staged(queries, [id_col], vec_col, levels, m_subspaces)
    q = q.select(
        F.col(id_col).alias("q_id"),
        F.array(
            *[
                F.col(f"_s_{mi}_{j}")
                for mi in range(m_subspaces)
                for j in range(L)
            ]
        ).alias("_qs"),
    )
    joined = codes.crossJoin(F.broadcast(q)).where(
        F.col("neighbor_id") != F.col("q_id")
    )
    adc = None
    for mi in range(m_subspaces):
        term = F.element_at(
            F.col("_qs"),
            (F.lit(mi * L) + F.element_at(F.col("codes"), mi + 1) + 1).cast("int"),
        )
        adc = term if adc is None else adc + term
    scored = joined.select(
        "q_id",
        "neighbor_id",
        F.floor(adc * F.lit(1000000.0)).cast("long").alias("adc_e6"),
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("adc_e6"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= shortlist
    )


def semantic_dedup_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    dim: int = 64,
    n_planes: int = 4,
    seed: int = 7,
    engine: str = "auto",
    max_expr_pairs: int = 20_000_000,
) -> DataFrame:
    """SemDeDup keep-first prune on DETERMINISTIC sign-bucket cells — the
    oracle-gated sibling of ``semantic_dedup``.

    The trained path's spherical k-means quantizer has no SQL form, but the
    PRUNE CONTRACT (compare only within a cell; drop every vector with an
    in-cell cosine ≥ threshold to a smaller id; keep the rest) is quantizer-
    agnostic.  Swapping the cells for seeded hyperplane sign buckets
    (``_hyperplanes`` — the same deterministic matrix family the oracle-
    gated ``q_knn_lsh`` uses) makes every stage exactly SQL-expressible, so
    the driver can value-check the whole dedup decision.  The n_planes=0
    differential in tests/test_similarity.py collapses both variants to ONE
    cell, where each must equal the exact all-pairs keep-first prune —
    carrying the contract proof to the trained/BLAS path.

    Two in-cell scan engines with the same prune semantics (set equality
    pinned on the real fixture for BOTH engines in
    tests/test_similarity.py; note the honest caveat that blas cosines come
    from blocked/SIMD summation, so a pair whose cosine sits within a few
    double ulps of ``threshold`` could in principle decide differently from
    the sequential fold — the same tolerance class documented for
    ``semantic_dedup_pairs``; the oracle-gated q_semantic_dedup runs expr
    at every driver scale):

    - ``expr``: equi-join on the int cell key + per-pair Catalyst cosine —
      exactly SQL-mirrored, the oracle-gate form.  Interpreted per-pair HOF
      cost makes it viable only up to ~10^7 in-cell pairs.
    - ``blas``: the shared blocked-matmul pair scan (``_cell_pairs_blas``,
      same kernel as ``semantic_dedup_pairs``) — the 100 TB form.
    - ``auto`` (default): ONE scalar aggregate — sum(c·(c−1) div 2) over the
      per-cell counts — estimates the pair volume and picks ``expr`` iff it
      fits under ``max_expr_pairs``.  Same estimate-then-choose discipline
      as the triangle wedge gate (operators/graph.py); the decision needs
      one number, so only one number crosses to the driver (a trained
      quantizer can emit millions of cells — a per-cell histogram collect
      would ship them all; review r8).
    """
    cell = (
        lsh_bucket(F.col(vec_col), _hyperplanes(dim, n_planes, seed=seed))
        if n_planes > 0
        else F.lit(0)
    )
    # pin parallelism: the corpus parquet may be one row group, and both the
    # sign folds and the pair scan are CPU-bound (see adc_shortlist_grid)
    sess = df.sparkSession
    n_part = max(
        int(sess.conf.get("spark.sql.shuffle.partitions")),
        sess.sparkContext.defaultParallelism,
    )
    # stage the cell id ONCE (scoped_persist): the interpreted sign fold
    # (n_planes × dim per row) otherwise re-runs for the auto histogram and
    # BOTH sides of the expr self-join — 3× the per-row HOF cost the
    # _grid_scores_staged fix exists to avoid (review r7)
    assigned = scoped_persist(
        df.repartition(n_part, F.col(id_col)).select(
            F.col(id_col), F.col(vec_col), cell.alias("_cell")
        )
    )
    if engine == "auto":
        # DECIMAL(38,0) product, halved driver-side: a 100 TB corpus with
        # few planes can put a hot cell past 3e9 rows, where _d*(_d-1)
        # wraps int64 — and a per-cell `div 2` back to long would re-import
        # the overflow (review r8; same class as key_skew's ppm product)
        est = (
            int(
                assigned.groupBy("_cell")
                .agg(F.count(F.lit(1)).alias("_d"))
                .agg(
                    F.coalesce(
                        F.sum(F.expr("cast(_d as decimal(38,0)) * (_d - 1)")),
                        F.lit(0).cast("decimal(38,0)"),
                    ).alias("_pairs2")
                )
                .collect()[0]["_pairs2"]
            )
            // 2
        )
        engine = "expr" if est <= max_expr_pairs else "blas"
    if engine == "expr":
        from kafka_flow_spark.functions import dot, l2_norm

        withn = assigned.withColumn("_l2", l2_norm(_as_double(F.col(vec_col))))
        a = withn.select(
            F.col(id_col).alias("a_id"),
            F.col(vec_col).alias("_va"),
            F.col("_l2").alias("_an"),
            "_cell",
        )
        b = withn.select(
            F.col(id_col).alias("b_id"),
            F.col(vec_col).alias("_vb"),
            F.col("_l2").alias("_bn"),
            "_cell",
        )
        sim = dot(_as_double(F.col("_va")), _as_double(F.col("_vb"))) / (
            F.col("_an") * F.col("_bn")
        )
        dropped = (
            a.join(b, "_cell")
            .where(F.col("a_id") < F.col("b_id"))
            .where(sim >= F.lit(threshold))
            .select(F.col("b_id").alias(id_col))
            .distinct()
        )
    elif engine == "blas":
        id_t = df.schema[id_col].dataType.simpleString()
        dropped = (
            _cell_pairs_blas(
                assigned.withColumnRenamed("_cell", "cell"),
                id_col,
                vec_col,
                threshold,
                id_t,
            )
            .select(F.col("b_id").alias(id_col))
            .distinct()
        )
    else:
        raise ValueError(f"semantic_dedup_lsh: unknown engine {engine!r}")
    return df.join(dropped, id_col, "left_anti")


def knn_ivfpq(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    m_subspaces: int = 8,
    n_codes: int = 256,
    refine: int = 4,
    max_queries: int = 100_000,
) -> DataFrame:
    """Approximate top-k cosine via IVF-PQ with asymmetric distance (ADC)
    and exact re-rank — the memory-bound tier of the ANN family
    (brute-force → int8 → IVF → LSH → IVF-PQ).

    Search shape: each query probes its ``n_probe`` nearest coarse cells;
    candidates come from the cell equi-join of the CODES index against the
    broadcast query fan-out (the corpus side never shuffles, and the scan
    reads m one-byte-range codes per vector, not the embedding column).
    ADC scores are ``q·c_cell + Σ_m LUT_m[code_m]`` where the per-query
    lookup table ``LUT_m = q_sub · codebook_mᵀ`` is built once per query per
    Arrow batch — O(m·n_codes·sub_dim) amortized over the batch's
    candidates, each of which then costs m table lookups instead of a
    dim-length dot product.  The top ``k·refine`` ADC survivors per query
    are re-ranked with EXACT cosine against the raw vectors (a broadcast
    semi-probe of the corpus — tiny, id-pushed), so reported sims carry no
    quantization error and the contract matches ``knn_bruteforce``
    (q_id, neighbor_id, sim, rank; ties neighbor_id ASC).
    """
    import pandas as pd

    index, Cn, books = pq_index(
        vectors, id_col, vec_col, n_cells, m_subspaces, n_codes
    )
    n_probe = max(1, min(n_probe, len(Cn)))
    bc_B = vectors.sparkSession.sparkContext.broadcast(books)

    qrows = queries.select(id_col, vec_col).limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"knn_ivfpq: query set exceeds max_queries={max_queries} — the probe "
            "fan-out is broadcast; split the query set or raise the cap explicitly."
        )
    spark = vectors.sparkSession
    id_t = vectors.schema[id_col].dataType.simpleString()
    if not qrows:
        # empty query set → empty result, same contract as knn_bruteforce
        return spark.createDataFrame(
            [], schema=f"q_id {id_t}, neighbor_id {id_t}, sim DOUBLE, rank INT"
        )
    Q = np.array([r[vec_col] for r in qrows], dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    qids = [r[id_col] for r in qrows]
    sims_qc = Qn @ Cn.T
    probe = np.argsort(-sims_qc, kind="stable", axis=1)[:, :n_probe]
    fan = [
        (qids[i], Qn[i].tolist(), int(c), float(sims_qc[i, c]))
        for i in range(len(qids))
        for c in probe[i]
    ]
    qdf = spark.createDataFrame(
        fan, schema=f"q_id {id_t}, q_vec ARRAY<DOUBLE>, cell INT, bias DOUBLE"
    )

    cand = index.join(F.broadcast(qdf), "cell").filter(
        F.col(id_col) != F.col("q_id")
    )

    m = m_subspaces

    def adc(batches):
        B = bc_B.value
        sub = B.shape[2]
        for pdf in batches:
            if not len(pdf):
                continue
            outs = []
            for _, grp in pdf.groupby("q_id", sort=False):
                qv = np.asarray(grp["q_vec"].iloc[0], dtype=np.float64)
                lut = np.stack(
                    [
                        qv[mi * sub : (mi + 1) * sub] @ B[mi].T
                        for mi in range(m)
                    ]
                )  # (m, n_codes)
                gc = np.stack(grp["codes"].to_numpy())  # (n_grp, m)
                score = grp["bias"].to_numpy() + lut[
                    np.arange(m)[None, :], gc
                ].sum(axis=1)
                outs.append(
                    pd.DataFrame(
                        {
                            "q_id": grp["q_id"],
                            "neighbor_id": grp[id_col],
                            "adc": score,
                        }
                    )
                )
            yield pd.concat(outs, ignore_index=True)

    scored = cand.mapInPandas(
        adc, schema=f"q_id {id_t}, neighbor_id {id_t}, adc DOUBLE"
    ).groupBy("q_id", "neighbor_id").agg(F.max("adc").alias("adc"))
    w = Window.partitionBy("q_id").orderBy(F.desc("adc"), F.asc("neighbor_id"))
    short = scored.withColumn("_r", F.row_number().over(w)).filter(
        F.col("_r") <= k * refine
    )

    # exact re-rank: broadcast the (queries × k·refine) survivor ids against
    # the raw vectors — id-pushed probe, then full-precision cosine
    nvec = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec")
    )
    qvec = qdf.select("q_id", "q_vec").dropDuplicates(["q_id"])
    exact = (
        nvec.join(F.broadcast(short.select("q_id", "neighbor_id")), "neighbor_id")
        .join(F.broadcast(qvec), "q_id")
        .select(
            "q_id",
            "neighbor_id",
            cosine(F.col("q_vec"), _as_double(F.col("n_vec"))).alias("sim"),
        )
    )
    w2 = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return exact.withColumn("rank", F.row_number().over(w2)).filter(
        F.col("rank") <= k
    )


def bitext_margin_pairs(
    side_a: DataFrame,
    side_b: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    margin_bp_min: int = 10200,
    queries_a: DataFrame | None = None,
) -> DataFrame:
    """Margin-based parallel-pair mining (Artetxe & Schwenk 2019, the
    CCMatrix/LASER criterion): score each forward-kNN pair (x∈A, y∈B) by

        margin(x, y) = cos(x, y) / ( (Σ_{z∈NNk(x)} cos(x,z)
                                      + Σ_{z∈NNk(y)} cos(y,z)) / 2k )

    which normalizes raw cosine by both points' neighborhood density — the
    standard fix for hubness when mining aligned pairs across two embedding
    spaces (languages, modalities, snapshot generations).

    Determinism contract: cosines come from the ordered JVM fold (bit-equal
    to the oracle's list_sum), are scaled to 1e-9 units with FLOOR (floor of
    a shared binary double is engine-exact — no ROUND string-vs-binary
    divergence), neighborhood sums are then exact bigint adds, and the
    margin is ONE double division floored into basis points.  Output:
    (a_id, b_id, sim_e9, margin_bp) for margin_bp >= margin_bp_min.

    Scale read: side_a queries are broadcast by knn_bruteforce (bounded
    probe contract); the backward pass only scores the O(|A|·k) candidate
    y's, never all of B.  At corpus×corpus scale swap both kNN calls for
    knn_ivf and keep the margin algebra unchanged.
    """
    # probes may be a subset of A (bounded broadcast contract), but BOTH
    # backward neighborhoods run against the FULL sides — margins must be
    # normalized by the true neighborhood density, not the probe sample's
    fwd = knn_bruteforce(
        side_b, queries_a if queries_a is not None else side_a,
        id_col=id_col, vec_col=vec_col, k=k,
    )
    f9 = fwd.select(
        "q_id",
        "neighbor_id",
        F.floor(F.col("sim") * F.lit(1e9)).cast("long").alias("sim_e9"),
    )
    sx = f9.groupBy("q_id").agg(F.sum("sim_e9").alias("_sx"))
    cand_b = side_b.join(
        f9.select(F.col("neighbor_id").alias(id_col)).distinct(), id_col
    )
    bwd = knn_bruteforce(side_a, cand_b, id_col=id_col, vec_col=vec_col, k=k)
    sy = (
        bwd.select(
            F.col("q_id").alias("neighbor_id"),
            F.floor(F.col("sim") * F.lit(1e9)).cast("long").alias("_s9"),
        )
        .groupBy("neighbor_id")
        .agg(F.sum("_s9").alias("_sy"))
    )
    den = F.col("_sx") + F.col("_sy")
    return (
        f9.join(sx, "q_id")
        .join(sy, "neighbor_id")
        .where(den > 0)
        .withColumn(
            "margin_bp",
            F.floor(
                (F.lit(float(2 * k * 10000)) * F.col("sim_e9")) / den.cast("double")
            ).cast("long"),
        )
        .where(F.col("margin_bp") >= margin_bp_min)
        .select(
            F.col("q_id").alias("a_id"),
            F.col("neighbor_id").alias("b_id"),
            "sim_e9",
            "margin_bp",
        )
    )


# --- Binary quantization + Hamming search -----------------------------------


def binary_quantize(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Sign-bit binary quantization: each vector becomes ceil(dim/32) integer
    words, word w an MSB-first fold of the sign bits of components
    [w*32, w*32+31] (bit set iff the component is strictly positive) — the
    1-bit-per-dimension code of binary ANN indexes (faiss IndexBinaryFlat /
    SimHash-style sign codes), a 32× shrink of a float32 embedding column.

    32-bit words on purpose: the ``acc*2 + bit`` fold tops out at 2^32-1,
    comfortably inside bigint under ANSI overflow checking, and needs no
    shift primitives — the identical fold runs in DuckDB, so the words are
    engine-exact.  Components are read with ``F.get`` (NULL past the array
    end — short vectors zero-fill).

    Output: (id_col, sig array<long> of ceil(dim/32) words).
    """
    if dim <= 0:
        raise ValueError(f"dim must be positive, got {dim}")
    n_words = (dim + 31) // 32
    vec = F.col(vec_col)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(n_words - 1)),
        lambda w: F.aggregate(
            F.sequence(F.lit(0), F.lit(31)),
            F.lit(0).cast("long"),
            lambda acc, i: acc * 2
            + F.when(
                F.coalesce(
                    F.get(vec, w * F.lit(32) + i).cast("double") > 0.0, F.lit(False)
                ),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        ),
    )
    # a NULL vector must yield a NULL sig (the fold runs over literal index
    # sequences, so it would otherwise silently produce the all-zero code and
    # match every all-negative vector at distance 0)
    return df.select(
        F.col(id_col), F.when(vec.isNotNull(), sig).alias("sig")
    )


def knn_hamming(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
) -> DataFrame:
    """Exact top-k by Hamming distance over sign-bit codes — the binary-index
    scale path: distance is xor + popcount on a few integer words instead of a
    d-dim float dot product (~100× less arithmetic AND 32× less corpus I/O
    than float cosine; sign-code Hamming approximates angular distance, the
    same guarantee SimHash banding relies on).

    Plan shape: corpus quantized map-side (no shuffle), query codes broadcast,
    per-query top-k via the same window contract as ``knn_bruteforce`` (dist
    ASC, neighbor_id ASC).  At 100 TB the candidate relation entering the
    window is corpus × |queries| rows of three integers — for large query
    sets compose with the block-local top-k of ``knn_bruteforce_arrow``
    (the signatures column is 8 bytes/word, so even the naive window carries
    no vector payload).

    Output: (q_id, neighbor_id, dist int, rank int).
    """
    # NULL vectors quantize to NULL sigs -> NULL distances, which Spark's
    # ASC window ranks FIRST but DuckDB ranks LAST — drop them on both sides
    # so a null row can never silently claim a top-k slot (review r6).
    sigs = binary_quantize(vectors, id_col, vec_col, dim).filter(
        F.col("sig").isNotNull()
    )
    qsigs = (
        binary_quantize(queries, id_col, vec_col, dim)
        .filter(F.col("sig").isNotNull())
        .select(F.col(id_col).alias("q_id"), F.col("sig").alias("q_sig"))
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("q_sig"), F.col("sig"), lambda a, b: F.bit_count(a.bitwiseXOR(b))
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    cand = (
        sigs.withColumnRenamed(id_col, "neighbor_id")
        .crossJoin(F.broadcast(qsigs))
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .select("q_id", "neighbor_id", dist.cast("int").alias("dist"))
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    return cand.withColumn("rank", F.row_number().over(w).cast("int")).filter(
        F.col("rank") <= k
    )


# --- Random projection (Johnson-Lindenstrauss dimensionality reduction) -----


def random_projection(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    in_dim: int = 64,
    out_dim: int = 8,
    tag: str = "rp-v1",
    scale: int = 1_000_000,
) -> DataFrame:
    """JL dimensionality reduction with the Achlioptas sparse sign matrix
    (Achlioptas 2003: entries +1/-1 with prob 1/6 each, 0 with prob 2/3 —
    distance-preserving like Gaussian projections at a third of the work).
    The matrix is deterministic: entry (j, i) is md5('{tag}:{j}:{i}')'s
    6-hex Horner fold mod 6 mapped {0: +1, 1: -1, else: 0}, so any engine
    regenerates it — the same loaded-model stand-in as hash_model.

    Each output component is a LEFT FOLD of signed float-to-double terms in
    ascending input order — bit-identical across engines — surfaced as
    FLOOR(sum * scale) bigints (floor of a shared binary double is always
    engine-exact; ROUND-on-double is not).

    Scale shape: zero shuffles — one map-side projection per row; the
    matrix is folded into the expression as literals (out_dim × in_dim
    CASE terms), never a join.  For large out_dim swap in the Arrow matmul
    pattern of knn_bruteforce_arrow; at out_dim 8-32 the expression form
    keeps the whole plan in one codegen stage.

    Output: (id_col, p0 .. p{out_dim-1} bigint).
    """
    import hashlib

    def entry(j: int, i: int) -> int:
        h = int(hashlib.md5(f"{tag}:{j}:{i}".encode()).hexdigest()[:6], 16) % 6
        return 1 if h == 0 else (-1 if h == 1 else 0)

    vec = F.col(vec_col)
    cols = [F.col(id_col)]
    for j in range(out_dim):
        signs = [entry(j, i) for i in range(in_dim)]
        total = None
        for i, s in enumerate(signs):
            if s == 0:
                continue
            term = F.get(vec, i).cast("double")
            term = term if s > 0 else -term
            total = term if total is None else (total + term)
        if total is None:
            total = F.lit(0.0)
        cols.append(
            F.floor(total * F.lit(float(scale))).cast("long").alias(f"p{j}")
        )
    return df.select(*cols)


def knn_hamming_rerank(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    m: int | None = None,
) -> DataFrame:
    """Two-stage binary-index search — the production pattern for 1-bit
    codes: Hamming top-``m`` candidates over sign codes (cheap xor+popcount
    scan, 32× less I/O), then EXACT cosine re-rank of only |queries|·m rows
    to the final top-``k``.  Recall is the Hamming stage's (sign-code
    Hamming approximates angle); the re-rank removes its ordering noise —
    the same shape as faiss binary-index + refine.

    Scale shape: the expensive stage scans signatures only; the re-rank
    joins the tiny candidate relation back to the float vectors by id
    (AQE-sized; |Q|·m rows vs the corpus) and windows over m rows per
    query.  Deterministic end-to-end: both stages break ties on
    (metric, neighbor_id).

    Output: (q_id, neighbor_id, sim, rank) like knn_bruteforce.
    """
    m = m if m is not None else 4 * k
    if m < k:
        raise ValueError(f"m={m} must be >= k={k}")
    cand = knn_hamming(vectors, queries, id_col, vec_col, dim, k=m).select(
        "q_id", "neighbor_id"
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("n_vec")
    )
    q = queries.select(
        F.col(id_col).alias("q_id"), _as_double(F.col(vec_col)).alias("q_vec")
    )
    sims = (
        cand.join(v, "neighbor_id")
        .join(F.broadcast(q), "q_id")
        .select("q_id", "neighbor_id", cosine(F.col("q_vec"), F.col("n_vec")).alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# --- MMR diversity re-ranking ------------------------------------------------


def mmr_rerank(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_pool: int = 10,
    k_select: int = 3,
    lam_e2: int = 70,
    retrieve: str = "exact",
    n_cells: int = 8,
    iters: int = 2,
    nprobe: int = 2,
) -> DataFrame:
    """Maximal Marginal Relevance diversity re-ranking (Carbonell &
    Goldstein, SIGIR'98) in EXACT integers — the step between "top-k most
    similar" and "top-k most USEFUL": a RAG / few-shot-mining pipeline that
    feeds a model k near-identical contexts wastes k-1 slots, so after
    retrieval it greedily re-picks

        pick_j = argmax over remaining candidates of
                 (lam·rel(c) − (100−lam)·max_{s∈selected} sim(c, s)) div 100

    with ``rel`` and ``sim`` both FLOOR-e6 cosines (the repo's established
    engine-identical quantization) and ``lam_e2`` the relevance weight in
    percent.  Pick 1 is plain argmax relevance (no selected set yet;
    reported score = rel_e6); ties everywhere break to the smaller id, so
    the greedy trajectory is fully deterministic and the whole k_select-step
    program unrolls into an exact DuckDB oracle (the kmeans/pagerank
    pattern).  The truncating div-by-100 is negative-safe (explicit sign
    split — cosines can be negative).

    Retrieval modes (``retrieve``): ``"exact"`` scans the corpus once per
    query batch (broadcast-query cross join + WindowGroupLimit top-k_pool —
    the knn_bruteforce plan); ``"ivf"`` is the PRODUCTION 100 TB shape —
    train ``n_cells`` quantized-Lloyd cells (operators/clustering.
    kmeans_quantized, value-exact), probe each query's ``nprobe`` nearest
    centroids, and pool only within probed cells, bounding the corpus scan
    to |probed cells| exactly like ivf_exact_knn.  Recall is cell-bounded
    and DETERMINISTIC (a true pool member in an unprobed cell is missed
    oracle-visibly, not seed-luckily); ``nprobe == n_cells`` degrades to
    the exact pool bit-identically (pinned by test).  Everything after the
    pool — pairwise sims, greedy rounds — is mode-independent.

    Scale shape: the candidate pool is ``k_pool`` rows per query, so after
    the retrieval's top-k window the WHOLE greedy is a per-query in-row
    program (r13): the pool collapses to one array row per query (the
    window's exchange is reused — zero extra shuffles), pairwise sims are a
    k_pool×k_pool in-row matrix, and each greedy round is an argmin over at
    most k_pool array slots — no pair self-join, no per-round anti-joins /
    max-aggregates, no persisted intermediates (the r12 shape ran ~10
    joins over two persisted relations; the array program cut
    q_mmr_rerank's sf0.1 wall ~2×).  At 100 TB the corpus appears ONLY in
    the initial retrieval — and under ``"ivf"`` only its probed cells do.

    Output: (query_id, pick_rank, neighbor_id, mmr_e6).
    """
    if k_pool < 1:
        raise ValueError(f"k_pool must be >= 1, got {k_pool}")
    if not 1 <= k_select <= k_pool:
        raise ValueError(
            f"k_select must be in [1, k_pool={k_pool}], got {k_select}"
        )
    if not 0 <= lam_e2 <= 100:
        raise ValueError(f"lam_e2 must be in [0, 100], got {lam_e2}")
    if retrieve not in ("exact", "ivf"):
        raise ValueError(f"retrieve must be 'exact' or 'ivf', got {retrieve!r}")
    if retrieve == "ivf" and nprobe < 1:
        # mirror ivf_exact_knn's guard (review r11): nprobe=0 produced an
        # empty shortlist and a silently empty result
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    from kafka_flow_spark.functions import dot, l2_norm

    E6 = 1_000_000
    _dot, _l2 = dot, l2_norm
    # Per-VECTOR norms are staged once on each side (corpus rows and query
    # rows) instead of being re-derived inside every pairwise cosine — the
    # cosine value is unchanged (same dot / (norm_a * norm_b) doubles), but
    # the per-pair work drops to one dot-product fold (r13: the norm folds
    # were ~2/3 of the pair cost — pool scan 1.29 → 0.40 s at sf0.1).
    v = vectors.select(
        F.col(id_col).alias("_nid"), _as_double(F.col(vec_col)).alias("_nv")
    ).withColumn("_nn", _l2(F.col("_nv")))
    rel_e6 = F.floor(
        (_dot(F.col("_qv"), F.col("_nv")) / (F.col("_qn") * F.col("_nn")))
        * F.lit(float(E6))
    ).cast("long")
    wp = Window.partitionBy("_qid").orderBy(F.desc("_rel"), F.asc("_nid"))
    if retrieve == "exact":
        q = queries.select(
            F.col(id_col).alias("_qid"), _as_double(F.col(vec_col)).alias("_qv")
        ).withColumn("_qn", _l2(F.col("_qv")))
        cand = v.crossJoin(F.broadcast(q)).where(F.col("_nid") != F.col("_qid"))
    else:
        from kafka_flow_spark.operators.clustering import (
            _sq_dist,
            kmeans_quantized,
            quantize_e6,
        )

        sqd = _sq_dist
        cents, assigned = kmeans_quantized(
            vectors, id_col, vec_col, n_cells, iters
        )
        corpus = v.join(
            assigned.select(F.col(id_col).alias("_nid"), "cid"), "_nid"
        )
        qpts = queries.select(
            F.col(id_col).alias("_qid"),
            _as_double(F.col(vec_col)).alias("_qv"),
            quantize_e6(F.col(vec_col)).alias("_qxe"),
        ).withColumn("_qn", _l2(F.col("_qv")))
        wc = Window.partitionBy("_qid").orderBy(F.asc("_cd"), F.asc("cid"))
        shortlist = (
            qpts.crossJoin(F.broadcast(cents))
            .select(
                "_qid",
                "_qv",
                "_qn",
                "cid",
                sqd(F.col("_qxe"), F.col("centroid_e6")).alias("_cd"),
            )
            .withColumn("_cr", F.row_number().over(wc))
            .where(F.col("_cr") <= nprobe)
            .select("_qid", "_qv", "_qn", "cid")
        )
        # the corpus scan is bounded to probed cells: an equi-join on cid,
        # never a per-query full pass
        cand = shortlist.join(corpus, "cid").where(
            F.col("_nid") != F.col("_qid")
        )
    pool = (
        cand.select("_qid", "_nid", "_nv", "_nn", rel_e6.alias("_rel"))
        .withColumn("_pr", F.row_number().over(wp))
        .where(F.col("_pr") <= k_pool)
    )
    # ---- in-row greedy (r13) ------------------------------------------------
    # The pool is ≤ k_pool rows per query, so everything after retrieval fits
    # one array row per query: collect the pool ordered by pool rank (rank 1
    # IS argmax relevance with the (rel DESC, id ASC) tie-break), build the
    # k_pool×k_pool sim matrix in-row, and unroll the k_select greedy rounds
    # as staged columns.  The groupBy reuses the top-k window's hash
    # partitioning on _qid — no additional exchange, no persisted
    # intermediates, and the old shape's per-round joins disappear.
    parr = pool.groupBy("_qid").agg(
        F.array_sort(
            F.collect_list(F.struct("_pr", "_nid", "_rel", "_nv", "_nn"))
        ).alias("_P")
    )

    def _sim(a, b):
        # identical arithmetic to the pairwise sim of the join shape:
        # floor((dot / (norm_a * norm_b)) * 1e6) as long
        return F.floor(
            (_dot(a["_nv"], b["_nv"]) / (a["_nn"] * b["_nn"])) * F.lit(float(E6))
        ).cast("long")

    cur = (
        parr.withColumn(
            "_S",
            F.transform(
                F.col("_P"),
                lambda a: F.transform(F.col("_P"), lambda b: _sim(a, b)),
            ),
        )
        .withColumn("_n", F.size("_P"))
        .withColumn("_sel1", F.array(F.lit(1)))
        .withColumn(
            "_picks1",
            F.array(
                F.struct(
                    F.element_at(F.col("_P"), 1)["_nid"].alias("_nid"),
                    F.lit(1).alias("_rank"),
                    F.element_at(F.col("_P"), 1)["_rel"].alias("_score"),
                )
            ),
        )
    )
    for j in range(2, k_select + 1):
        sel = F.col(f"_sel{j - 1}")

        def _score_of(i, sel=sel):
            # lam·rel − (100−lam)·max_{s∈selected} sim, then the sign-split
            # truncating div-by-100 of the join shape.  |num| ≤ 100·1e6 ≪ 2^53
            # and the distance to the next integer multiple is ≥ 0.01, so
            # floor(num / 100.0) is exactly `num div 100` on the non-negative
            # branch (double division is correctly rounded; no boundary can
            # flip the floor).
            r = F.element_at(F.col("_P"), i)["_rel"]
            ms = F.array_max(
                F.transform(
                    sel, lambda s: F.element_at(F.element_at(F.col("_S"), i), s)
                )
            )
            num = F.lit(lam_e2).cast("long") * r - F.lit(100 - lam_e2).cast(
                "long"
            ) * ms
            return F.when(num >= 0, F.floor(num / F.lit(100.0))).otherwise(
                -F.floor((-num) / F.lit(100.0))
            )

        cur = cur.withColumn(
            f"_cand{j}",
            F.transform(
                F.filter(
                    # NB: must stay a ONE-parameter lambda — pyspark treats a
                    # second parameter as the element index
                    F.sequence(F.lit(1), F.col("_n")),
                    lambda i: ~F.array_contains(sel, i),
                ),
                lambda i: F.struct(
                    _score_of(i).alias("_sc"),
                    F.element_at(F.col("_P"), i)["_nid"].alias("_nid"),
                    i.alias("_idx"),
                ),
            ),
        )
        # argmax score, ties to smaller id: array_min over (−score, id)
        # structs — score is always a long here, so negation is safe for
        # any orderable id type (the r10 min_by rationale, kept)
        cur = cur.withColumn(
            f"_pick{j}",
            F.array_min(
                F.transform(
                    F.col(f"_cand{j}"),
                    lambda c: F.struct(
                        (-c["_sc"]).alias("_ns"),
                        c["_nid"].alias("_nid"),
                        c["_idx"].alias("_idx"),
                        c["_sc"].alias("_sc"),
                    ),
                )
            ),
        )
        pick = F.col(f"_pick{j}")
        cur = cur.withColumn(
            f"_sel{j}",
            F.when(
                pick.isNotNull(),
                F.concat(F.col(f"_sel{j - 1}"), F.array(pick["_idx"])),
            ).otherwise(F.col(f"_sel{j - 1}")),
        ).withColumn(
            f"_picks{j}",
            F.when(
                pick.isNotNull(),
                F.concat(
                    F.col(f"_picks{j - 1}"),
                    F.array(
                        F.struct(
                            pick["_nid"].alias("_nid"),
                            F.lit(j).alias("_rank"),
                            pick["_sc"].alias("_score"),
                        )
                    ),
                ),
            ).otherwise(F.col(f"_picks{j - 1}")),
        )
    # Aggregate barrier before the explode (measured, r13): extract-value
    # simplification rewrites field accesses on computed structs by inlining
    # the struct's whole expression tree per access — exploding the picks
    # array straight off the staged columns re-expanded the round chain into
    # an exponentially-duplicated tree (10.2 s for 20 queries at sf0.1).  An
    # Aggregate's output is a fresh attribute the optimizer cannot inline
    # through, so the rounds evaluate exactly once per query (0.43 s).  The
    # groupBy reuses the existing _qid hash partitioning (one row per group
    # — no exchange, a trivial first()).
    barrier = cur.groupBy("_qid").agg(
        F.first(F.col(f"_picks{k_select}")).alias("_pk")
    )
    return barrier.select("_qid", F.explode("_pk").alias("_p")).select(
        F.col("_qid").alias("query_id"),
        F.col("_p._rank").cast("int").alias("pick_rank"),
        F.col("_p._nid").alias("neighbor_id"),
        F.col("_p._score").alias("mmr_e6"),
    )


# --- per-dimension embedding profile + min-max scaling -----------------------


def embedding_dim_profile(
    vectors: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-DIMENSION corpus statistics of an embedding column, exact: the
    preprocessing pass an ANN/clustering pipeline runs before training a
    quantizer (a dimension with 100× the spread of the rest dominates every
    L2 distance; min-max scaling or dropping it is a training decision this
    profile feeds).

    Vectors quantize to FLOOR-e6 bigints (the engine-identical rule); per
    dimension the output carries n, mean_e6 (truncating, negative-safe),
    var_e12 = (n·Σx² − (Σx)²) div n² (exact population variance in e12
    units, DECIMAL(38,0) internals — n·Σx² passes int64 at ~9e6 rows, the
    kappa overflow class), min_e6, max_e6, and sum_scaled_e6: the per-dim
    sum of min-max-scaled values z = (x − min)·1e6 div (max − min) (0 when
    the dimension is constant), which pins every element's scaled value
    corpus-wide through one order-insensitive exact aggregate.

    Scale shape: ONE posexplode + ONE map-combinable (dim) aggregate for
    the stats, one broadcast of the 64-row stats relation back onto the
    exploded stream + a second (dim) aggregate for the scaled sum — output
    cardinality is the dimensionality, never the corpus.
    """
    from kafka_flow_spark.operators.clustering import quantize_e6

    dec = "decimal(38,0)"
    ex = vectors.select(
        F.posexplode(quantize_e6(F.col(vec_col))).alias("dim", "x")
    )
    ex = scoped_persist(ex)
    stats = ex.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(dec)).cast(dec).alias("_sx"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).cast(dec).alias("_sxx"),
        F.min("x").alias("min_e6"),
        F.max("x").alias("max_e6"),
    )
    mean = F.when(
        F.col("_sx") >= F.lit(0).cast(dec),
        F.expr("CAST(_sx AS decimal(38,0)) div CAST(n AS decimal(38,0))"),
    ).otherwise(-F.expr("CAST(-_sx AS decimal(38,0)) div CAST(n AS decimal(38,0))"))
    # n·Σx² − (Σx)² >= 0 by Cauchy-Schwarz: plain truncating div is safe
    var = F.expr(
        "CAST(CAST(n AS decimal(38,0)) * _sxx - _sx * _sx AS decimal(38,0))"
        " div CAST(CAST(n AS decimal(38,0)) * n AS decimal(38,0))"
    )
    stats = stats.select(
        "dim", "n", mean.alias("mean_e6"), var.alias("var_e12"),
        "min_e6", "max_e6",
    )
    # scaled pass: z = (x - min) * 1e6 div (max - min); numerator >= 0
    scaled = (
        ex.join(F.broadcast(stats.select("dim", "min_e6", "max_e6")), "dim")
        .select(
            "dim",
            F.when(
                F.col("max_e6") > F.col("min_e6"),
                # DECIMAL product: (x-min)*1e6 passes int64 once components
                # exceed ~4.6e6 e6-units (|v| > ~4.6) — same hardening class
                # as the kappa rationals; div still returns BIGINT
                F.expr(
                    "CAST((x - min_e6) AS decimal(38,0)) * 1000000"
                    " div CAST(max_e6 - min_e6 AS decimal(38,0))"
                ),
            )
            .otherwise(F.lit(0))
            .alias("z"),
        )
        .groupBy("dim")
        .agg(F.sum(F.col("z").cast(dec)).cast("long").alias("sum_scaled_e6"))
    )
    return stats.join(scaled, "dim").select(
        "dim", "n", "mean_e6", "var_e12", "min_e6", "max_e6", "sum_scaled_e6"
    )


def minmax_scale(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Min-max scale every vector to per-dimension [0, 1e6] integer units:
    z_d = (x_d − min_d)·1e6 div (max_d − min_d) over FLOOR-e6 quantized
    inputs (constant dimensions scale to 0).  The materialized counterpart
    of ``embedding_dim_profile``'s checksum column — feed it to the
    quantizer trainers when one raw dimension would dominate L2.

    Scale shape: the stats pass is dim-bounded; the rewrite is one
    posexplode + one broadcast stats join + one group-back per id (the
    exchange any per-row array rebuild pays).  Output: (id, vec_scaled
    array<bigint>).
    """
    from kafka_flow_spark.operators.clustering import quantize_e6

    ex = vectors.select(
        F.col(id_col).alias("_id"),
        F.posexplode(quantize_e6(F.col(vec_col))).alias("dim", "x"),
    )
    stats = ex.groupBy("dim").agg(
        F.min("x").alias("_mn"), F.max("x").alias("_mx")
    )
    z = F.when(
        F.col("_mx") > F.col("_mn"),
        F.expr(
            "CAST((x - _mn) AS decimal(38,0)) * 1000000"
            " div CAST(_mx - _mn AS decimal(38,0))"
        ),
    ).otherwise(F.lit(0))
    return (
        ex.join(F.broadcast(stats), "dim")
        .select("_id", "dim", z.alias("_z"))
        .groupBy("_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "_z"))
            ).alias("_a")
        )
        .select(
            F.col("_id").alias(id_col),
            F.transform("_a", lambda s: s["_z"]).alias("vec_scaled"),
        )
    )
