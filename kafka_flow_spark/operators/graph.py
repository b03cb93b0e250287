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
- **Lineage is truncated every round** with ``localCheckpoint`` — iterative
  self-joins otherwise grow the plan exponentially and re-execute prior
  rounds.  On a cluster, swap for ``checkpoint()`` on reliable storage.
- **Convergence is checked with one aggregate** (count + xor-ish hash sum),
  not a full ``except``-style set compare: per round it costs one reduce, and
  a false "converged" requires a hash-sum collision across rounds (~2^-64).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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


def connected_components(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    max_iter: int = 12,
) -> DataFrame:
    """Assign each node the minimum node id of its connected component.

    ``edges`` is an undirected pair list (one row per edge, either direction).
    Returns ``(node, component)`` covering every node that appears in an edge;
    isolated nodes never enter and callers left-join + coalesce them back.
    """
    cur = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).where(
        F.col(src) != F.col(dst)
    )
    cur = cur.localCheckpoint(eager=True)
    prev_sig = _checksum(cur)
    for _ in range(max_iter):
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        sig = _checksum(nxt)
        cur = nxt
        if sig == prev_sig:
            break
        prev_sig = sig
    # converged edge set is a union of stars (v -> component min)
    members = cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
    centers = cur.select(F.col("v").alias("node"), F.col("v").alias("component")).distinct()
    return (
        members.union(centers)
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a_id",
    b_col: str = "b_id",
) -> DataFrame:
    """Cluster documents by near-dup pair edges; singletons form their own
    cluster.  Output: (doc_id, cluster_id) for EVERY doc — ``cluster_id`` is
    the minimum doc id of the cluster, i.e. the canonical survivor."""
    cc = connected_components(pairs, src=a_col, dst=b_col)
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
    truncated per round (localCheckpoint — swap for checkpoint() on a
    cluster), so plan depth stays constant.  N is one bounded scalar
    aggregate.  Output: (node, rank_scaled), one row per node.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    # ONE implementation: delegate to the converged variant with a tolerance
    # no residual can reach (tol < 0 also skips the per-round residual
    # aggregate entirely) — the two forms' bit-identity is by construction,
    # not by keeping two copies of the arithmetic in sync (review r7).
    ranks, _, _ = pagerank_converged(
        edges,
        src=src,
        dst=dst,
        max_iterations=iterations,
        tol_scaled=-1,
        scale=scale,
        damping=damping,
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
) -> tuple[DataFrame, int, int]:
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

    Returns ``(ranks, iterations_run, final_residual)`` — the residual lets
    the caller log convergence quality instead of trusting a fixed budget.
    """
    if max_iterations < 1:
        raise ValueError(f"max_iterations must be >= 1, got {max_iterations}")
    d_num, d_den = damping
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ewd = e.join(deg, "src").localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        raise ValueError(
            "pagerank_converged: empty edge set (an upstream filter matched nothing?)"
        )
    base = (d_den - d_num) * scale // (d_den * n)
    ranks = nodes.select("node", F.lit(scale // n).cast("long").alias("r"))
    ranks = ranks.localCheckpoint(eager=False)
    residual = -1
    it = 0
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
            .localCheckpoint(eager=False)
        )
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
                break
        else:
            ranks = nxt
    return ranks.select("node", F.col("r").alias("rank_scaled")), it, residual


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


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
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
    round (localCheckpoint — swap for checkpoint() on a cluster).  Output:
    (node, community), one row per node appearing in the edge set.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).where(
        F.col(src) != F.col(dst)
    )
    e = e.localCheckpoint(eager=False)
    labels = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=False)
    )
    for _ in range(iterations):
        freq = (
            e.join(labels, e.src == labels.node)
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        labels = (
            freq.groupBy("dst")
            .agg(
                F.max_by(
                    F.col("label"),
                    F.struct(F.col("_c"), (-F.col("label")).alias("_nl")),
                ).alias("label")
            )
            .select(F.col("dst").alias("node"), "label")
            .localCheckpoint(eager=False)
        )
    return labels.select("node", F.col("label").alias("community"))


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 12,
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
    broadcast once it fits).  Lineage truncated per round (localCheckpoint;
    checkpoint() on a cluster).  Peeling is O(rounds) shuffles regardless
    of graph size — the degeneracy-ordering sequential algorithm is O(m)
    total work but inherently serial; at 100 TB rounds win.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    cur = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).where(
        F.col(src) != F.col(dst)
    )
    cur = cur.localCheckpoint(eager=False)
    prev_sig = _checksum(cur.select(F.col("src").alias("u"), F.col("dst").alias("v")))
    for _ in range(max_rounds):
        deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
        keep = deg.where(F.col("_deg") >= k).select(F.col("src").alias("_n"))
        nxt = (
            cur.join(keep, cur.src == keep._n, "left_semi")
            .join(keep, cur.dst == keep._n, "left_semi")
            .localCheckpoint(eager=False)
        )
        sig = _checksum(nxt.select(F.col("src").alias("u"), F.col("dst").alias("v")))
        cur = nxt
        if sig == prev_sig:
            break
        prev_sig = sig
    return (
        cur.groupBy("src")
        .agg(F.count(F.lit(1)).alias("degree"))
        .where(F.col("degree") >= k)
        .select(F.col("src").alias("node"), "degree")
    )
