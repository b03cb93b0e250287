"""Distributed connected components for dedup clustering.

Near-dup pair generators (``operators.dedup``) emit edges ``(a_id, b_id)``;
grouping them into clusters (so one canonical doc per cluster survives) is a
connected-components problem.  Reference parity: kafka-flow itself stops at
per-key folds, but any dedup pipeline built on it needs this step — it is part
of the "training-data pipeline" surface (SURVEY.md §2, LLM ops).

Algorithm: the alternating **large-star / small-star** method of Kiveris et
al., "Connected Components in MapReduce and Beyond" (SOCC'14).  Each round is
two rounds of (aggregate + join); the edge set converges to star graphs whose
centers are the component minima in O(log^2 n) rounds (≈5 in practice).

Scale notes (the 100 TB read):

- **No adjacency-list materialization.**  The textbook formulation groups
  ``collect_list(neighbors)`` per node; a viral node at web scale has 10^8
  neighbors and that row OOMs the task.  Here each star step is
  ``groupBy(u).agg(min(v))`` (map-side-combinable, skew-immune) followed by an
  equi-join of that tiny min-table back to the edges — both sides hash on
  ``u`` so AQE co-partitions, and a skewed u is split by AQE skew-join.
- **Lineage is truncated every round** — iterative self-joins otherwise grow
  the plan exponentially and re-execute prior rounds.  Every iterator takes
  ``checkpoint_dir``: None → ``localCheckpoint`` (zero setup; in local mode
  the iteration history lives in the one JVM), a path → reliable
  ``checkpoint()`` on cluster storage (the 100 TB deployment shape — a
  parameter, not a comment to re-learn).
- **Convergence is checked with one aggregate** (count + xor-ish hash sum),
  not a full ``except``-style set compare: per round it costs one reduce, and
  a false "converged" requires a hash-sum collision across rounds (~2^-64).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_log = logging.getLogger(__name__)

def _truncate(
    df: DataFrame, checkpoint_dir: str | None, eager: bool = False
) -> DataFrame:
    """Per-round lineage truncation for the iterative operators.

    ``checkpoint_dir=None`` → ``localCheckpoint``: blocks live in the
    running executors — zero setup, but in local mode the whole iteration
    history sits in ONE JVM (the 48g-driver knob the sf10 graph audits used
    to need).  A path → reliable ``checkpoint()`` to cluster storage: the
    100 TB deployment shape, survives executor loss, and keeps local-mode
    driver memory flat — this parameter replaces the former "swap for
    checkpoint() on a cluster" comment."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    # setCheckpointDir materializes a UUID subdir, so getCheckpointDir never
    # echoes the raw path back — remember (requested, materialized) ON THIS
    # SparkContext object (a module global outlives a restarted context and
    # would skip the set on a fresh JVM — review r10) and re-set whenever
    # the context's CURRENT dir is not the one we materialized (any other
    # code calling setCheckpointDir in between must not silently win)
    recorded = getattr(sc, "_kfs_checkpoint_dir", None)
    if (
        recorded is None
        or recorded[0] != checkpoint_dir
        or sc.getCheckpointDir() != recorded[1]
    ):
        sc.setCheckpointDir(checkpoint_dir)
        sc._kfs_checkpoint_dir = (checkpoint_dir, sc.getCheckpointDir())
    return df.checkpoint(eager=eager)


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor v > u to m(u) = min(Γ(u) ∪ {u})."""
    both = edges.select("u", "v").union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = both.groupBy("u").agg(F.min("v").alias("_minv"))
    mins = mins.select("u", F.least("u", "_minv").alias("m"))
    return (
        both.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Canonicalize u > v, then connect v ∈ Γ(u) ∪ {u} to the minimum."""
    canon = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    mins = canon.groupBy("u").agg(F.min("v").alias("m"))
    neighbor_edges = (
        canon.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    center_edges = mins.select(F.col("u"), F.col("m").alias("v"))
    return (
        neighbor_edges.union(center_edges)
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _checksum(edges: DataFrame) -> tuple[int, int]:
    # bit_xor (not sum): order-insensitive set signature over the distinct
    # edge set with no ANSI long-overflow hazard.
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components_status(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    max_iter: int = 12,
    checkpoint_dir: str | None = None,
) -> tuple[DataFrame, bool, int]:
    """``connected_components`` plus the convergence contract: returns
    ``(assignments, converged, rounds_run)``.  ``converged=False`` means
    ``max_iter`` exhausted before the star-contraction fixpoint — the
    output is a well-defined partial contraction (components may still be
    split), and a 100 TB pipeline should ALERT on the flag rather than
    silently ship it (review r9: every capped fixpoint here exposes this).
    ``checkpoint_dir`` switches per-round lineage truncation from
    localCheckpoint to reliable checkpoint() (see ``_truncate``)."""
    cur = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).where(
        F.col(src) != F.col(dst)
    )
    cur = _truncate(cur, checkpoint_dir, eager=True)
    prev_sig = _checksum(cur)
    converged, rounds = False, 0
    for rounds in range(1, max_iter + 1):
        nxt = _truncate(_small_star(_large_star(cur)), checkpoint_dir, eager=True)
        sig = _checksum(nxt)
        cur = nxt
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    # converged edge set is a union of stars (v -> component min)
    members = cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
    centers = cur.select(F.col("v").alias("node"), F.col("v").alias("component")).distinct()
    out = (
        members.union(centers)
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )
    return out, converged, rounds


def connected_components(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    max_iter: int = 12,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Assign each node the minimum node id of its connected component.

    ``edges`` is an undirected pair list (one row per edge, either direction).
    Returns ``(node, component)`` covering every node that appears in an edge;
    isolated nodes never enter and callers left-join + coalesce them back.

    Cap-exhaustion (star contraction not at fixpoint after ``max_iter``)
    logs a loud warning; use ``connected_components_status`` where the
    caller needs the flag programmatically.
    """
    out, converged, rounds = connected_components_status(
        edges, src, dst, max_iter, checkpoint_dir
    )
    if not converged:
        _log.warning(
            "connected_components: max_iter=%d exhausted before the "
            "star-contraction fixpoint — components may still be split; "
            "raise max_iter or call connected_components_status",
            max_iter,
        )
    return out


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a_id",
    b_col: str = "b_id",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Cluster documents by near-dup pair edges; singletons form their own
    cluster.  Output: (doc_id, cluster_id) for EVERY doc — ``cluster_id`` is
    the minimum doc id of the cluster, i.e. the canonical survivor."""
    cc = connected_components(
        pairs, src=a_col, dst=b_col, checkpoint_dir=checkpoint_dir
    )
    return (
        docs.select(F.col(id_col))
        .join(cc, docs[id_col] == cc["node"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
        )
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    scale: int = 10**12,
    damping: tuple[int, int] = (85, 100),
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank in EXACT integer arithmetic.

    Ranks are unscaled integers (``scale`` = 1.0 of total mass / N at init);
    every step is bigint ``div`` division:

        base        = (d_den - d_num) * scale // (d_den * N)
        r_{i+1}(v)  = base + d_num * SUM_{u->v}( r_i(u) // outdeg(u) ) // d_den

    Floor division loses a few units of mass per step (bounded by N * iters
    ulps of the scaled domain — at scale 1e12 that is a 1e-12-relative bias),
    in exchange for bit-reproducibility on ANY engine with 64-bit integer
    division — no float summation order, no ln/round divergence.  Dangling
    nodes are absent by construction when the caller passes a symmetrized
    (undirected) edge set; with directed edges their mass is dropped (the
    standard simplification — document per use).

    Scale shape: outdeg is ONE map-combinable aggregate; each iteration is
    one equi-join of ranks onto edges (both hash-partitioned on src — AQE
    co-partitions, skewed hubs split by skew-join) + one map-combinable
    groupBy(dst) SUM + one left join onto the node set.  Lineage is
    truncated per round (``checkpoint_dir=None`` → localCheckpoint; a path
    → reliable checkpoint(), the cluster deployment shape — see
    ``_truncate``), so plan depth stays constant.  N is one bounded scalar
    aggregate.  Output: (node, rank_scaled), one row per node.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    # ONE implementation: delegate to the converged variant with a tolerance
    # no residual can reach (tol < 0 also skips the per-round residual
    # aggregate entirely) — the two forms' bit-identity is by construction,
    # not by keeping two copies of the arithmetic in sync (review r7).
    ranks, _, _, _ = pagerank_converged(
        edges,
        src=src,
        dst=dst,
        max_iterations=iterations,
        tol_scaled=-1,
        scale=scale,
        damping=damping,
        checkpoint_dir=checkpoint_dir,
    )
    return ranks


def pagerank_converged(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
    tol_scaled: int = 0,
    scale: int = 10**12,
    damping: tuple[int, int] = (85, 100),
    checkpoint_dir: str | None = None,
) -> tuple[DataFrame, int, int, bool]:
    """PageRank with early exit on the L1 residual — the answer to "how many
    iterations do I actually need?" that ``pagerank``'s fixed count leaves to
    the caller.

    Identical integer arithmetic to ``pagerank`` (same base/contrib/div
    steps, bit-reproducible), but after each iteration one extra scalar
    aggregate computes ``residual = SUM(|r_i - r_{i-1}|)`` in scaled units
    and the loop stops when ``residual <= tol_scaled``.  With
    ``tol_scaled=0`` the result is BIT-IDENTICAL to
    ``pagerank(iterations=j)`` for every j >= the convergence point — the
    integer fixpoint is exact, so extra iterations are no-ops (differential
    in tests/test_graph.py) — while costing one join + one map-combinable
    aggregate per round on top of the fixed-iteration plan (the same price
    CC pays for its convergence checksum).

    A useful tolerance is ``n_nodes * 10`` scaled units (each rank within
    ~10 integer ulps of its fixpoint ≈ 1e-11 relative at the default scale).

    Returns ``(ranks, iterations_run, final_residual, converged)``.
    ``converged`` is True when the residual met ``tol_scaled`` (trivially
    True in fixed-iteration mode, ``tol_scaled < 0``, where the iteration
    count IS the contract); False means ``max_iterations`` exhausted with
    the residual still above tolerance — alert, don't silently ship
    (review r9: the capped-fixpoint contract shared by the graph family).
    ``checkpoint_dir`` switches lineage truncation to reliable
    checkpoint() (see ``_truncate``).
    """
    if max_iterations < 1:
        raise ValueError(f"max_iterations must be >= 1, got {max_iterations}")
    d_num, d_den = damping
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ewd = _truncate(e.join(deg, "src"), checkpoint_dir)
    nodes = _truncate(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct(),
        checkpoint_dir,
    )
    n = nodes.count()
    if n == 0:
        raise ValueError(
            "pagerank_converged: empty edge set (an upstream filter matched nothing?)"
        )
    base = (d_den - d_num) * scale // (d_den * n)
    ranks = nodes.select("node", F.lit(scale // n).cast("long").alias("r"))
    ranks = _truncate(ranks, checkpoint_dir)
    residual = -1
    it = 0
    converged = tol_scaled < 0  # fixed-iteration mode: the count IS the contract
    for it in range(1, max_iterations + 1):
        contrib = (
            ewd.join(ranks, ewd.src == ranks.node)
            .select("dst", F.expr("r div outdeg").alias("_c"))
            .groupBy("dst")
            .agg(F.sum("_c").alias("_s"))
        )
        nxt = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr(f"({d_num} * coalesce(_s, 0L)) div {d_den}")
                ).alias("r"),
            )
        )
        nxt = _truncate(nxt, checkpoint_dir)
        # one scalar per round (the CC-checksum pattern): equi-join old/new
        # ranks on the shared node hash, map-combinable abs-diff sum.
        # tol_scaled < 0 = fixed-iteration mode (pagerank() delegates here):
        # no residual is ever negative, so skip the aggregate entirely.
        if tol_scaled >= 0:
            residual = int(
                nxt.join(ranks.select("node", F.col("r").alias("_pr")), "node")
                .agg(F.sum(F.abs(F.col("r") - F.col("_pr"))).alias("_d"))
                .collect()[0]["_d"]
            )
            ranks = nxt
            if residual <= tol_scaled:
                converged = True
                break
        else:
            ranks = nxt
    return (
        ranks.select("node", F.col("r").alias("rank_scaled")),
        it,
        residual,
        converged,
    )


def triangle_count(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    max_wedges: int = 5_000_000_000,
) -> DataFrame:
    """Global triangle count of an undirected graph — the third
    iterative-graph-analytics entry next to connected components and
    PageRank (clustering-coefficient numerator, community-density signal).

    Algorithm: degree orientation (Suri & Vassilvitskii, WWW'11 — "the
    curse of the last reducer").  Canonicalize each undirected edge once,
    then orient every edge from its lower-(degree, id) endpoint to the
    higher one; every triangle has exactly ONE node with two out-edges
    under this order, so counting (u→v, u→w, v→w) matches counts each
    triangle exactly once AND bounds the wedge fan-out per node by
    O(sqrt(m)) instead of max-degree — the hub that would generate deg²
    wedges generates almost none, which is what makes the plan survive a
    skewed 100 TB graph.

    Scale shape: one map-combinable degree aggregate, one join of edges to
    degrees per endpoint, then ONE self-equi-join on the wedge apex u and
    ONE semi-join of wedges against the oriented edge set on (v, w) — all
    hash-partitionable, no cartesian anywhere, AQE splits residual skew.

    Output: single row (n_nodes, n_edges, n_triangles) — counts of the
    de-duplicated undirected graph.
    """
    canon = _canonical_edges(edges, src, dst).localCheckpoint(eager=False)
    deg, tri = _oriented_closure(canon, max_wedges)
    return (
        deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .crossJoin(
            F.broadcast(canon.agg(F.count(F.lit(1)).cast("long").alias("n_edges")))
        )
        .crossJoin(
            F.broadcast(tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles")))
        )
    )


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """De-duplicated canonical (a < b) undirected edge set, self-loops gone."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _oriented_closure(canon: DataFrame, max_wedges: int):
    """Degree-orient ``canon``, gate on wedge volume, emit one row per
    triangle — the shared core of the exact and DOULION-sampled counters.
    Returns (deg, tri): the per-node degree table (node-count source) and the
    closed-wedge relation."""
    deg = (
        canon.select(F.col("a").alias("n"))
        .union(canon.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("_da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("_db"))
    withdeg = canon.join(da, "a").join(db, "b")
    lower_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))
    )
    oriented = withdeg.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    oriented = oriented.localCheckpoint(eager=False)
    # volume gate (the quadratic-hazard house pattern): the wedge join emits
    # EXACTLY Σ_u C(outdeg(u), 2) rows — one cheap aggregate predicts the
    # whole cost, so refuse loudly instead of launching a week-long stage.
    # Near-regular co-occurrence graphs defeat orientation's hub pruning
    # (measured: 45M-edge sf10 supplier co-graph → ~1e10 oriented wedges);
    # raise max_wedges deliberately, pre-filter the edge set (per-nation /
    # per-community), or switch to triangle_count_approx — DOULION sampling
    # at p shrinks the wedge volume by ~p², so the gate passes where the
    # exact count cannot.
    est = (
        oriented.groupBy("u")
        .agg(F.count(F.lit(1)).alias("_d"))
        .agg(F.sum(F.expr("_d * (_d - 1) div 2")).alias("_w"))
        .collect()[0]["_w"]
    ) or 0
    if est > max_wedges:
        raise ValueError(
            f"triangle_count: oriented wedge volume {est:,} exceeds "
            f"max_wedges={max_wedges:,} — the closure join would emit that "
            "many rows; pre-filter the edge set, raise max_wedges explicitly, "
            "or use triangle_count_approx (DOULION edge sampling)"
        )
    e1 = oriented.select(F.col("u"), F.col("v").alias("x"))
    e2 = oriented.select(F.col("u"), F.col("v").alias("y"))
    # x < y keeps each unordered out-pair of the apex once; the closing edge
    # between x and y is then exactly the CANONICAL pair (x, y), so one
    # semi-join against the canonical edge set decides closure
    wedges = e1.join(e2, "u").where(F.col("x") < F.col("y"))
    closing = canon.select(F.col("a").alias("x"), F.col("b").alias("y"))
    tri = wedges.join(closing, ["x", "y"], "left_semi")
    return deg, tri


def triangle_count_approx(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    p_num: int = 1,
    p_den: int = 10,
    salt: str = "tri-v1",
    max_wedges: int = 5_000_000_000,
) -> DataFrame:
    """DOULION triangle estimate (Tsourakakis, Kang, Miller & Faloutsos,
    KDD'09): keep each canonical edge independently with probability
    p = p_num/p_den, count triangles EXACTLY on the sparsified graph with the
    same degree-oriented plan, and scale by 1/p³ — the answer past the exact
    counter's wedge gate.  Sampling at p cuts the oriented wedge volume by
    ~p² and the closure work by ~p³, so the sf10 supplier co-graph (~1e10
    wedges, a refusal for the exact count) returns an estimate in one gate-
    passing run at p = 1/10.

    The estimator is unbiased: each triangle survives with probability p³,
    so E[t_sampled / p³] = T (differential vs the exact count in
    tests/test_graph.py: p=1 is bit-equal; a multi-salt mean converges on
    the true count).  Variance (paper, Lemma 2):
    Var = T·(1/p³ − 1) + 2k·(1/p² − 1) with k = # triangle pairs sharing an
    edge — relative error shrinks as 1/sqrt(T), so the dense graphs that
    NEED sampling are exactly the ones it estimates tightest.

    Determinism (the house sampling discipline, same as hash_sample): the
    keep decision is a pure function of the edge content — md5 bucket of
    ``salt:a:b`` mod p_den < p_num — reproducible across runs, partitionings
    and engines (SQL-mirrorable, so the full estimate is oracle-gated in
    q_supplier_triangles_approx).  A new ``salt`` is a fresh sample — average
    a few salts for a tighter estimate.

    ``est_triangles = t_sampled · p_den³ div p_num³`` in DECIMAL(38,0) →
    BIGINT (floor; exact integer whenever p_num = 1).  Output: one row
    (n_nodes, n_edges, sampled_edges, sampled_triangles, est_triangles) —
    node/edge counts are the FULL graph's (they need no sampling).
    """
    if not (0 < p_num <= p_den):
        raise ValueError(f"need 0 < p_num <= p_den, got {p_num}/{p_den}")
    from kafka_flow_spark.operators.sampling import hash_bucket

    canon = _canonical_edges(edges, src, dst).localCheckpoint(eager=False)
    keep = (
        F.conv(
            hash_bucket(
                F.concat(
                    F.lit(f"{salt}:"),
                    F.col("a").cast("string"),
                    F.lit(":"),
                    F.col("b").cast("string"),
                )
            ),
            16,
            10,
        ).cast("long")
        % p_den
        < p_num
    )
    sampled = canon.where(keep).localCheckpoint(eager=False)
    _, tri = _oriented_closure(sampled, max_wedges)
    den3, num3 = p_den**3, p_num**3
    n_nodes = (
        canon.select(F.col("a").alias("n"))
        .union(canon.select(F.col("b").alias("n")))
        .agg(F.count_distinct("n").cast("long").alias("n_nodes"))
    )
    return (
        n_nodes.crossJoin(
            F.broadcast(canon.agg(F.count(F.lit(1)).cast("long").alias("n_edges")))
        )
        .crossJoin(
            F.broadcast(
                sampled.agg(F.count(F.lit(1)).cast("long").alias("sampled_edges"))
            )
        )
        .crossJoin(
            F.broadcast(
                tri.agg(F.count(F.lit(1)).cast("long").alias("sampled_triangles"))
            )
        )
        .withColumn(
            "est_triangles",
            F.expr(
                f"cast(cast(sampled_triangles as decimal(38,0)) * {den3}"
                f" div {num3} as bigint)"
            ),
        )
    )


def canonical_per_cluster(
    assign: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    score_col: str = "score",
) -> DataFrame:
    """Survivor selection — the step that turns a cluster assignment into an
    actually-deduplicated corpus: per cluster, keep the highest-``score_col``
    member (ties broken by LOWEST id, deterministic).

    ``dedup_clusters``'s min-id canonical is the arbitrary-but-stable choice;
    real pipelines keep the BEST member (longest text, highest quality score
    — e.g. the near-dedup recipes in RefinedWeb/SlimPajama keep one
    representative per cluster by a quality criterion, not by id).

    Scale shape (100 TB read): one equi-join of the assignment with the
    per-doc score relation (both keyed by id — co-partitioned after the CC
    shuffle), then ONE map-combinable ``max_by`` aggregate per cluster
    (struct-ordered: score desc, id asc via negated id), broadcast back onto
    the assignment when the cluster-count relation is small or shuffle-joined
    otherwise (size decided by AQE — both sides are post-aggregation).

    Output: (id_col, cluster_col, score_col, canonical_id, keep) for EVERY
    clustered doc; ``keep`` marks the survivor.  Docs absent from ``scores``
    carry a NULL score and can never win while a scored member exists.
    """
    joined = assign.select(
        F.col(id_col), F.col(cluster_col)
    ).join(scores.select(F.col(id_col), F.col(score_col)), id_col, "left")
    # LEFT join + NULL-loses ordering: a doc missing from the score relation
    # stays in the output (keep=False unless its whole cluster is unscored,
    # where the min-id member wins) instead of silently vanishing — the
    # 'EVERY clustered doc' contract (review r6).  Ordering struct:
    # (scored?, score, -id) — scored beats unscored, then score, then low id.
    best = joined.groupBy(cluster_col).agg(
        F.max_by(
            F.col(id_col),
            F.struct(
                F.col(score_col).isNotNull().alias("_scored"),
                F.col(score_col),
                (-F.col(id_col)).alias("_nid"),
            ),
        ).alias("canonical_id")
    )
    return joined.join(best, cluster_col).select(
        id_col,
        cluster_col,
        score_col,
        "canonical_id",
        (F.col(id_col) == F.col("canonical_id")).alias("keep"),
    )


def label_propagation_status(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    checkpoint_dir: str | None = None,
) -> tuple[DataFrame, bool, int]:
    """``label_propagation`` plus the convergence contract: returns
    ``(labels, converged, rounds_run)``.  A label-table checksum (the CC
    pattern, one map-combinable aggregate per round) detects the exact
    fixpoint: once labels stop changing, further synchronous generations
    are the identity, so early exit computes the SAME output as the full
    fixed budget — the flag is free information, not a semantics change.
    ``converged=False`` after ``iterations`` rounds means labels were still
    moving (including the 2-cycle oscillation synchronous LPA can enter on
    bipartite-ish regions): the output is the well-defined generation-N
    labeling, and a pipeline at scale should alert rather than silently
    treat it as final (review r9).  ``checkpoint_dir``: see ``_truncate``.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).where(
        F.col(src) != F.col(dst)
    )
    e = _truncate(e, checkpoint_dir)
    labels = _truncate(
        e.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label")),
        checkpoint_dir,
    )

    def _sig(lb: DataFrame) -> tuple[int, int]:
        return _checksum(
            lb.select(F.col("node").alias("u"), F.col("label").alias("v"))
        )

    prev_sig = _sig(labels)
    converged, rounds = False, 0
    for rounds in range(1, iterations + 1):
        freq = (
            e.join(labels, e.src == labels.node)
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        labels = _truncate(
            freq.groupBy("dst")
            .agg(
                F.max_by(
                    F.col("label"),
                    F.struct(F.col("_c"), (-F.col("label")).alias("_nl")),
                ).alias("label")
            )
            .select(F.col("dst").alias("node"), "label"),
            checkpoint_dir,
        )
        sig = _sig(labels)
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    return labels.select("node", F.col("label").alias("community")), converged, rounds


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et al.,
    "Near linear time algorithm to detect community structures in large-scale
    networks", Phys. Rev. E 76, 2007) — deterministic variant.

    Communities differ from connected components: a component can contain
    several densely-knit groups joined by thin bridges, and LPA finds those
    groups without a cluster-count parameter.  Each node starts labeled with
    its own id; every iteration each node adopts the label that is most
    frequent among its neighbors, breaking count ties toward the SMALLEST
    label (the determinism knob — the textbook algorithm breaks ties
    randomly, which is un-oracle-able).  Updates are synchronous (all nodes
    flip on generation i together), so a fixed iteration budget yields a
    bit-reproducible labeling on any engine — no floats anywhere.

    ``edges`` must be the symmetrized pair list (both directions present, as
    for ``connected_components``); a node's neighborhood is exactly the rows
    where it appears as ``dst``.

    Scale shape per iteration: one equi-join of the label table onto the
    edges (both hash on ``src``; AQE co-partitions and splits skewed hubs) +
    ONE map-combinable groupBy((dst, label)) count + ONE groupBy(dst)
    max_by aggregate — the argmax is (count, -label) struct ordering, not a
    window, so no per-node sort materializes.  Lineage is truncated per
    round (``checkpoint_dir`` switches localCheckpoint → reliable
    checkpoint(), see ``_truncate``).  Early exit at the exact label
    fixpoint (identity-preserving — see ``label_propagation_status``; a
    budget exhausted with labels still moving logs a loud warning).
    Output: (node, community), one row per node appearing in the edge set.
    """
    labels, converged, _ = label_propagation_status(
        edges, src, dst, iterations, checkpoint_dir
    )
    if not converged:
        _log.warning(
            "label_propagation: iterations=%d exhausted with labels still "
            "changing (possibly a synchronous 2-cycle) — output is the "
            "generation-%d labeling, not a fixpoint; raise iterations or "
            "call label_propagation_status",
            iterations,
            iterations,
        )
    return labels


def k_core_status(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 12,
    checkpoint_dir: str | None = None,
) -> tuple[DataFrame, bool, int]:
    """``k_core`` plus the convergence contract: returns ``(core, converged,
    rounds_run)``.  ``converged=False`` means ``max_rounds`` exhausted
    before the peel fixpoint — the output is the well-defined N-round peel
    (a SUPERSET of the true core: more rounds only remove nodes), not the
    core itself, and a 100 TB pipeline should alert on the flag instead of
    silently shipping a shallow peel on an adversarially deep graph (a path
    graph peels one layer per round; review r9).  The checksum loop already
    knew — this exposes it.  ``checkpoint_dir``: see ``_truncate``."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    cur = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).where(
        F.col(src) != F.col(dst)
    )
    cur = _truncate(cur, checkpoint_dir)
    prev_sig = _checksum(cur.select(F.col("src").alias("u"), F.col("dst").alias("v")))
    converged, rounds = False, 0
    for rounds in range(1, max_rounds + 1):
        deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
        keep = deg.where(F.col("_deg") >= k).select(F.col("src").alias("_n"))
        nxt = _truncate(
            cur.join(keep, cur.src == keep._n, "left_semi")
            .join(keep, cur.dst == keep._n, "left_semi"),
            checkpoint_dir,
        )
        sig = _checksum(nxt.select(F.col("src").alias("u"), F.col("dst").alias("v")))
        cur = nxt
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    core = (
        cur.groupBy("src")
        .agg(F.count(F.lit(1)).alias("degree"))
        .where(F.col("degree") >= k)
        .select(F.col("src").alias("node"), "degree")
    )
    return core, converged, rounds


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 12,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """The k-core of an undirected graph: the maximal subgraph where every
    node has degree >= k (Seidman, "Network structure and minimum degree",
    Social Networks 5, 1983) — the graph family's density filter next to
    connected_components' reachability and label_propagation's communities
    (a dedup-pair graph's k-core is its "heavily duplicated" kernel; a
    co-transaction graph's k-core is its active core market).

    Algorithm: synchronous peeling.  Each round drops every node whose
    CURRENT degree is < k and keeps only edges between survivors; the
    fixpoint is the k-core.  Rounds are capped at ``max_rounds`` with a
    convergence early-exit (the CC checksum pattern) — and because peeling
    past the fixpoint is the identity, an engine running MORE rounds
    computes the identical answer, which is what makes a fixed-round
    unrolled oracle exact whenever either side converges within the cap.
    If the cap exhausts first the output is the well-defined ``max_rounds``-
    round peel (the final >= k filter mirrors the oracle's), not the true
    core — raise the cap for adversarially deep graphs (a path graph peels
    one layer per round).

    ``edges`` must be the symmetrized pair list (both directions), as for
    the other graph operators.  Returns ``(node, degree)`` for k-core
    members, degree measured INSIDE the core.

    Scale shape per round: one map-combinable groupBy(src) degree count +
    two semi-joins of the survivor set back onto the edges (hash on src/dst
    — AQE co-partitions; the survivor relation shrinks monotonically and is
    broadcast once it fits).  Lineage truncated per round
    (``checkpoint_dir`` switches localCheckpoint → reliable checkpoint(),
    see ``_truncate``).  Peeling is O(rounds) shuffles regardless of graph
    size — the degeneracy-ordering sequential algorithm is O(m) total work
    but inherently serial; at 100 TB rounds win.

    Cap-exhaustion logs a loud warning; ``k_core_status`` returns the
    ``converged`` flag for programmatic alerting.
    """
    core, converged, _ = k_core_status(
        edges, k, src, dst, max_rounds, checkpoint_dir
    )
    if not converged:
        _log.warning(
            "k_core: max_rounds=%d exhausted before the peel fixpoint — "
            "output is the %d-round peel (a superset of the true core); "
            "raise max_rounds or call k_core_status",
            max_rounds,
            max_rounds,
        )
    return core
