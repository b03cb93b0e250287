"""connected_components / dedup_clusters unit tests on known graphs, plus the
end-to-end dedup chain (pairs → clusters → canonical survivors) against
brute-force union-find truth at sf0.001."""

from __future__ import annotations

import duckdb
import pytest

from kafka_flow_spark.operators.dedup import minhash_lsh_pairs
from kafka_flow_spark.operators.graph import connected_components, dedup_clusters
from kafka_flow_spark.tables import load
from tests.conftest import SF_SMALL


def _cc(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges or [(0, 0)], "u: long, v: long")
    if not edges:
        df = df.where("u <> u")  # empty frame with schema
    out = connected_components(df)
    return {r["node"]: r["component"] for r in out.collect()}


def test_chain(spark):
    assert _cc(spark, [(1, 2), (2, 3), (3, 4)]) == {1: 1, 2: 1, 3: 1, 4: 1}


def test_star(spark):
    # high-id center: every leaf still maps to the global min (a leaf)
    assert _cc(spark, [(9, 1), (9, 2), (9, 3)]) == {1: 1, 2: 1, 3: 1, 9: 1}


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_self_loop_ignored(spark):
    assert _cc(spark, [(5, 5), (1, 2)]) == {1: 1, 2: 1}


def test_empty_edges(spark):
    assert _cc(spark, []) == {}


def test_long_path_converges(spark):
    # path of 33 nodes exercises multiple large/small-star rounds
    n = 33
    got = _cc(spark, [(i, i + 1) for i in range(n)])
    assert got == {i: 0 for i in range(n + 1)}


def test_dedup_clusters_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id: long")
    pairs = spark.createDataFrame([(1, 4), (4, 5)], "a_id: long, b_id: long")
    out = dedup_clusters(docs, pairs)
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 1, 5: 1}


class _UnionFind:
    def __init__(self):
        self.p: dict[int, int] = {}

    def find(self, x: int) -> int:
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def test_e2e_dedup_chain_vs_bruteforce(spark):
    """Full Phase-4 chain: minhash-LSH pairs → connected components → keep the
    min-id survivor per cluster.  Truth: brute-force all-pairs jaccard in
    DuckDB + union-find in Python."""
    docs = load(spark, SF_SMALL, "documents")
    pairs = minhash_lsh_pairs(docs, id_col="doc_id", text_col="text", k=64, bands=16, threshold=0.7)
    clusters = dedup_clusters(docs, pairs)
    survivors = {r["cluster_id"] for r in clusters.select("cluster_id").distinct().collect()}

    con = duckdb.connect()
    truth_pairs = con.sql(
        f"""
        WITH t AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   range(1, greatest(len(string_split_regex(trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) - 2, 0) + 1),
                   i -> list_aggr(list_slice(string_split_regex(trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), ' '), i, i + 2),
                                 'string_agg', ' '))) AS sh
          FROM '{SF_SMALL}/documents.parquet')
        SELECT a.doc_id, b.doc_id FROM t a JOIN t b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.sh, b.sh)) * 1.0
              / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.7
        """
    ).fetchall()
    all_ids = {
        r[0] for r in con.sql(f"SELECT doc_id FROM '{SF_SMALL}/documents.parquet'").fetchall()
    }
    uf = _UnionFind()
    for a, b in truth_pairs:
        uf.union(a, b)
    truth_survivors = {i for i in all_ids if uf.find(i) == i}
    assert survivors == truth_survivors


def test_random_graph_matches_union_find(spark):
    """1000-node seeded random graph (mixed sparse/dense regions, self-loops,
    duplicate edges): operator output must equal union-find exactly."""
    import random

    rng = random.Random(777)
    edges = [(rng.randrange(1000), rng.randrange(1000)) for _ in range(1500)]
    edges += [(i, i) for i in range(0, 1000, 97)]          # self-loops
    edges += edges[:50]                                     # duplicates
    got = _cc(spark, edges)
    uf = _UnionFind()
    for a, b in edges:
        if a != b:
            uf.union(a, b)
    # operator covers every node appearing in a non-self-loop edge
    non_loop_nodes = {x for a, b in edges if a != b for x in (a, b)}
    want = {n: uf.find(n) for n in non_loop_nodes}
    assert got == want


# --- pagerank (integer arithmetic) ----------------------------------------


def _py_pagerank(edge_list, iterations=5, scale=10**12, dn=85, dd=100):
    """Independent reference: pure-python mirror of graph.pagerank."""
    from collections import defaultdict

    outdeg = defaultdict(int)
    in_edges = defaultdict(list)
    nodes = set()
    for s, d in edge_list:
        outdeg[s] += 1
        in_edges[d].append(s)
        nodes.update((s, d))
    n = len(nodes)
    base = (dd - dn) * scale // (dd * n)
    r = {v: scale // n for v in nodes}
    for _ in range(iterations):
        r = {
            v: base + dn * sum(r[u] // outdeg[u] for u in in_edges[v]) // dd
            for v in nodes
        }
    return r


@pytest.mark.parametrize(
    "edge_list",
    [
        [(1, 2), (2, 3), (3, 1)],  # directed 3-cycle: uniform fixed point
        # undirected star: hub 0 <-> spokes 1,2,3 (hub concentrates rank)
        [(0, 1), (1, 0), (0, 2), (2, 0), (0, 3), (3, 0)],
        # two components of different sizes
        [(1, 2), (2, 1), (3, 4), (4, 5), (5, 3)],
    ],
)
def test_pagerank_matches_python_mirror(spark, edge_list):
    from kafka_flow_spark.operators.graph import pagerank

    df = spark.createDataFrame(edge_list, "src BIGINT, dst BIGINT")
    got = {r["node"]: r["rank_scaled"] for r in pagerank(df).collect()}
    assert got == _py_pagerank(edge_list)


def test_pagerank_mass_nearly_conserved(spark):
    """Floor division only ever LOSES mass, and at most ~(N * iters) units."""
    from kafka_flow_spark.operators.graph import pagerank

    edge_list = [(i, (i * 7 + 3) % 11) for i in range(11)]
    df = spark.createDataFrame(edge_list, "src BIGINT, dst BIGINT")
    total = sum(r["rank_scaled"] for r in pagerank(df, iterations=5).collect())
    scale = 10**12
    assert total <= scale
    assert total >= scale - 11 * 6 * 100  # N*(iters+1) floor ulps, generous


def test_pagerank_converged_tol0_equals_fixed_iterations(spark):
    """With tol=0 the early-exit variant stops AT the integer fixpoint, so it
    must be bit-identical to the fixed-iteration form run for >= that many
    iterations (extra fixed iterations are no-ops once the residual is 0)."""
    from kafka_flow_spark.operators.graph import pagerank, pagerank_converged

    # directed 3-cycle reaches the exact uniform fixpoint in one step
    edge_list = [(1, 2), (2, 3), (3, 1)]
    df = spark.createDataFrame(edge_list, "src BIGINT, dst BIGINT")
    ranks, its, residual, conv = pagerank_converged(df, max_iterations=10, tol_scaled=0)
    assert residual == 0 and conv is True
    assert its < 10  # actually early-exited
    got = {r["node"]: r["rank_scaled"] for r in ranks.collect()}
    fixed = {
        r["node"]: r["rank_scaled"] for r in pagerank(df, iterations=8).collect()
    }
    assert got == fixed


def test_pagerank_converged_matches_fixed_at_same_iteration_count(spark):
    """On a graph that has NOT converged by max_iterations, the variant must
    equal pagerank(iterations=iterations_run) exactly — the residual check
    never perturbs the ranks."""
    from kafka_flow_spark.operators.graph import pagerank, pagerank_converged

    edge_list = [(0, 1), (1, 0), (0, 2), (2, 0), (0, 3), (3, 0)]
    df = spark.createDataFrame(edge_list, "src BIGINT, dst BIGINT")
    ranks, its, residual, conv = pagerank_converged(df, max_iterations=3, tol_scaled=0)
    assert its == 3 and conv is False
    got = {r["node"]: r["rank_scaled"] for r in ranks.collect()}
    fixed = {
        r["node"]: r["rank_scaled"] for r in pagerank(df, iterations=3).collect()
    }
    assert got == fixed
    # python-mirror residual agreement: |r_3 - r_2| summed
    r3, r2 = _py_pagerank(edge_list, 3), _py_pagerank(edge_list, 2)
    assert residual == sum(abs(r3[v] - r2[v]) for v in r3)


def test_pagerank_converged_loose_tol_stops_early(spark):
    from kafka_flow_spark.operators.graph import pagerank_converged

    edge_list = [(i, (i * 7 + 3) % 11) for i in range(11)]
    df = spark.createDataFrame(edge_list, "src BIGINT, dst BIGINT")
    _, its_tight, _, _ = pagerank_converged(df, max_iterations=15, tol_scaled=0)
    _, its_loose, res, _ = pagerank_converged(
        df, max_iterations=15, tol_scaled=10**9
    )
    assert its_loose <= its_tight
    assert res <= 10**9


# --- triangle counting -------------------------------------------------------


def test_triangle_count_hand_worked(spark):
    from kafka_flow_spark.operators.graph import triangle_count

    # K4 on {1,2,3,4} (4 triangles) + pendant 5 + separate triangle {6,7,8},
    # with duplicate and reversed edges thrown in
    edges = (
        [(a, b) for a in range(1, 5) for b in range(1, 5) if a != b]
        + [(4, 5), (6, 7), (7, 8), (8, 6), (6, 7)]
    )
    df = spark.createDataFrame(edges, "u BIGINT, v BIGINT")
    [r] = triangle_count(df).collect()
    assert r["n_nodes"] == 8
    assert r["n_edges"] == 6 + 1 + 3  # K4 + pendant + triangle, deduped
    assert r["n_triangles"] == 4 + 1


def test_triangle_count_matches_bruteforce_random(spark):
    import itertools
    import random

    from kafka_flow_spark.operators.graph import triangle_count

    rng = random.Random(13)
    nodes = list(range(30))
    edges = [
        (a, b) for a, b in itertools.combinations(nodes, 2) if rng.random() < 0.2
    ]
    eset = {frozenset(e) for e in edges}
    expected = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if {a, b} in eset and {b, c} in eset and {a, c} in eset
    )
    df = spark.createDataFrame(edges, "u BIGINT, v BIGINT")
    [r] = triangle_count(df).collect()
    assert r["n_triangles"] == expected


def test_triangle_count_wedge_guard(spark):
    import pytest as _pytest

    from kafka_flow_spark.operators.graph import triangle_count

    # star K1,20 has 0 oriented wedges from spokes but the hub... orientation
    # sends spoke->hub, so hub outdeg 0: guard must NOT fire on a star.
    star = [(0, i) for i in range(1, 21)]
    df = spark.createDataFrame(star, "u BIGINT, v BIGINT")
    [r] = triangle_count(df, max_wedges=5).collect()
    assert r["n_triangles"] == 0
    # a clique K8 has C(8,2)=28 edges and plenty of wedges: tiny cap trips
    clique = [(a, b) for a in range(8) for b in range(a + 1, 8)]
    df2 = spark.createDataFrame(clique, "u BIGINT, v BIGINT")
    with _pytest.raises(ValueError, match="wedge volume"):
        triangle_count(df2, max_wedges=5)


def test_triangle_count_approx_p1_equals_exact(spark):
    """DOULION at p=1 keeps every edge: the 'estimate' must be bit-equal to
    the exact count (the differential that pins the shared closure core)."""
    import itertools
    import random

    from kafka_flow_spark.operators.graph import triangle_count, triangle_count_approx

    rng = random.Random(7)
    nodes = list(range(25))
    edges = [
        (a, b) for a, b in itertools.combinations(nodes, 2) if rng.random() < 0.25
    ]
    df = spark.createDataFrame(edges, "u BIGINT, v BIGINT")
    [exact] = triangle_count(df).collect()
    [est] = triangle_count_approx(df, p_num=1, p_den=1).collect()
    assert est["est_triangles"] == est["sampled_triangles"] == exact["n_triangles"]
    assert est["sampled_edges"] == est["n_edges"] == exact["n_edges"]
    assert est["n_nodes"] == exact["n_nodes"]


def test_triangle_count_approx_unbiased_over_salts(spark):
    """Multi-salt mean of the DOULION estimator converges on the exact count
    (unbiasedness; deterministic — the salts are fixed, so this is a pinned
    numeric fact, not a flaky statistical assertion)."""
    import itertools
    import random

    from kafka_flow_spark.operators.graph import triangle_count, triangle_count_approx

    rng = random.Random(99)
    nodes = list(range(24))
    edges = [
        (a, b) for a, b in itertools.combinations(nodes, 2) if rng.random() < 0.35
    ]
    df = spark.createDataFrame(edges, "u BIGINT, v BIGINT")
    [exact] = triangle_count(df).collect()
    t_true = exact["n_triangles"]
    assert t_true > 50  # dense enough for the estimator to be tight
    ests = []
    for i in range(12):
        [r] = triangle_count_approx(
            df, p_num=1, p_den=2, salt=f"unbias-{i}"
        ).collect()
        ests.append(r["est_triangles"])
    mean = sum(ests) / len(ests)
    # 12 half-density samples of a >50-triangle graph: the mean sits well
    # inside ±30% of truth (measured ~±10%; bound left loose on purpose —
    # it's pinning unbiasedness, not variance)
    assert abs(mean - t_true) / t_true < 0.30
    assert any(e != t_true for e in ests)  # it IS sampling, not a pass-through


def test_triangle_count_approx_deterministic_and_partition_stable(spark):
    from kafka_flow_spark.operators.graph import triangle_count_approx

    clique = [(a, b) for a in range(12) for b in range(a + 1, 12)]
    df = spark.createDataFrame(clique, "u BIGINT, v BIGINT")
    [a] = triangle_count_approx(df, p_num=1, p_den=3).collect()
    [b] = triangle_count_approx(df.repartition(7), p_num=1, p_den=3).collect()
    assert tuple(a) == tuple(b)


def test_triangle_count_approx_passes_gate_where_exact_refuses(spark):
    """The whole point: a graph whose exact wedge volume trips the gate can
    still be ESTIMATED, because sampling shrinks wedges ~p²."""
    import pytest as _pytest

    from kafka_flow_spark.operators.graph import triangle_count, triangle_count_approx

    clique = [(a, b) for a in range(16) for b in range(a + 1, 16)]
    df = spark.createDataFrame(clique, "u BIGINT, v BIGINT")
    with _pytest.raises(ValueError, match="wedge volume"):
        triangle_count(df, max_wedges=100)
    [r] = triangle_count_approx(df, p_num=1, p_den=3, max_wedges=100).collect()
    # K16 has C(16,3) = 560 triangles; p=1/3 estimate scaled by 27
    assert r["est_triangles"] == r["sampled_triangles"] * 27
    assert r["n_edges"] == 120 and r["n_nodes"] == 16
    assert 0 < r["sampled_edges"] < 120


def test_triangle_count_approx_p_guard(spark):
    import pytest as _pytest

    from kafka_flow_spark.operators.graph import triangle_count_approx

    df = spark.createDataFrame([(1, 2)], "u BIGINT, v BIGINT")
    with _pytest.raises(ValueError, match="p_num"):
        triangle_count_approx(df, p_num=0, p_den=3)
    with _pytest.raises(ValueError, match="p_num"):
        triangle_count_approx(df, p_num=4, p_den=3)


# --- canonical survivor selection -------------------------------------------


def test_canonical_per_cluster_hand_worked(spark):
    from kafka_flow_spark.operators.graph import canonical_per_cluster

    assign = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)],
        ["doc_id", "cluster_id"],
    )
    scores = spark.createDataFrame(
        # cluster 1: doc 2 wins on score; cluster 5: tie -> lowest id (5)
        [(1, 10), (2, 30), (3, 20), (4, 7), (5, 9), (6, 9)],
        ["doc_id", "score"],
    )
    rows = {
        r["doc_id"]: (r["canonical_id"], r["keep"])
        for r in canonical_per_cluster(assign, scores).collect()
    }
    assert rows == {
        1: (2, False),
        2: (2, True),
        3: (2, False),
        4: (4, True),
        5: (5, True),
        6: (5, False),
    }


def test_canonical_exactly_one_survivor_per_cluster(spark):
    from pyspark.sql import functions as F

    from kafka_flow_spark.plans.registry import all_queries

    out = all_queries()["q_cluster_canonical"](spark, SF_SMALL)
    per = (
        out.groupBy("cluster_id")
        .agg(
            F.sum(F.col("keep").cast("int")).alias("n_keep"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert per and all(r["n_keep"] == 1 for r in per)
    # every doc assigned, survivor is a member of its own cluster
    assert out.where(F.col("canonical_id") == F.col("doc_id")).count() == len(per)


def test_canonical_unscored_docs_survive_and_lose(spark):
    from kafka_flow_spark.operators.graph import canonical_per_cluster

    assign = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 3)], ["doc_id", "cluster_id"]
    )
    # doc 2 unscored (must stay, can't win); cluster 3 fully unscored -> min id
    scores = spark.createDataFrame([(1, 5)], ["doc_id", "score"])
    rows = {
        r["doc_id"]: (r["canonical_id"], r["keep"], r["score"])
        for r in canonical_per_cluster(assign, scores).collect()
    }
    assert rows[1] == (1, True, 5)
    assert rows[2] == (1, False, None)
    assert rows[3] == (3, True, None)
    assert rows[4] == (3, False, None)


# --- label_propagation ---


def _lp(spark, edges: list[tuple[int, int]], iterations: int = 5) -> dict[int, int]:
    from kafka_flow_spark.operators.graph import label_propagation

    sym = edges + [(b, a) for a, b in edges]
    df = spark.createDataFrame(sym, "src: long, dst: long")
    out = label_propagation(df, iterations=iterations)
    return {r["node"]: r["community"] for r in out.collect()}


def test_lp_two_cliques_with_bridge(spark):
    # two triangles joined by one bridge edge: LPA keeps them as two
    # communities (connected components would merge them into one).
    tri1 = [(1, 2), (1, 3), (2, 3)]
    tri2 = [(10, 11), (10, 12), (11, 12)]
    got = _lp(spark, tri1 + tri2 + [(3, 10)])
    assert got[1] == got[2] == got[3]
    assert got[10] == got[11] == got[12]
    assert got[1] != got[10]


def test_lp_tie_breaks_to_smallest_label(spark):
    # node 2 sees neighbors 1 and 3 once each on generation 1: tie -> 1.
    got = _lp(spark, [(1, 2), (2, 3)], iterations=1)
    assert got[2] == 1


def test_lp_deterministic_across_runs(spark):
    edges = [(i, (i * 7) % 23) for i in range(23) if i != (i * 7) % 23]
    assert _lp(spark, edges) == _lp(spark, edges)


def test_lp_validates_iterations(spark):
    import pytest as _pytest

    from kafka_flow_spark.operators.graph import label_propagation

    df = spark.createDataFrame([(1, 2)], "src: long, dst: long")
    with _pytest.raises(ValueError, match="iterations"):
        label_propagation(df, iterations=0)


# --- k_core ---


def _kcore(spark, edges, k, **kw):
    from kafka_flow_spark.operators.graph import k_core

    sym = edges + [(b, a) for a, b in edges]
    df = spark.createDataFrame(sym, "src: long, dst: long")
    return {r["node"]: r["degree"] for r in k_core(df, k, **kw).collect()}


def test_kcore_triangle_with_tail(spark):
    # triangle 1-2-3 plus tail 3-4: the 2-core is the triangle only.
    got = _kcore(spark, [(1, 2), (2, 3), (1, 3), (3, 4)], k=2)
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_peeling_cascades(spark):
    # path graph: removing the endpoints re-exposes new degree-1 nodes each
    # round; the 2-core is empty (needs a cycle).
    got = _kcore(spark, [(1, 2), (2, 3), (3, 4), (4, 5)], k=2)
    assert got == {}


def test_kcore_degree_is_in_core_degree(spark):
    # K4 plus a pendant on node 1: 3-core = K4, and node 1's degree is 3
    # (the pendant edge does not count).
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    got = _kcore(spark, k4 + [(1, 99)], k=3)
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_round_cap_is_exact_contract(spark):
    # path of 5 with cap=1: one synchronous peel drops only the original
    # endpoints; survivors keep edges among {2,3,4} and the final >= k
    # filter reports the still-qualifying middle node only.
    got = _kcore(spark, [(1, 2), (2, 3), (3, 4), (4, 5)], k=2, max_rounds=1)
    assert got == {3: 2}


def test_kcore_validates_args(spark):
    import pytest as _pytest

    from kafka_flow_spark.operators.graph import k_core

    df = spark.createDataFrame([(1, 2)], "src: long, dst: long")
    with _pytest.raises(ValueError, match="k must be"):
        k_core(df, k=0)
    with _pytest.raises(ValueError, match="max_rounds"):
        k_core(df, k=2, max_rounds=0)


# --- convergence flags + checkpoint_dir (review r9 #4/#5) ---


def _sym_df(spark, edges):
    sym = edges + [(b, a) for a, b in edges]
    return spark.createDataFrame(sym, "src: long, dst: long")


def test_kcore_status_converged_and_cap_exhausted(spark):
    from kafka_flow_spark.operators.graph import k_core_status

    # triangle: every degree >= 2, round 1 removes nothing -> fixpoint
    core, conv, rounds = k_core_status(
        _sym_df(spark, [(1, 2), (2, 3), (1, 3)]), k=2
    )
    assert conv is True and rounds == 1
    assert {r["node"] for r in core.collect()} == {1, 2, 3}
    # long path with cap=2: peeling needs one round per layer -> exhausts
    path = [(i, i + 1) for i in range(1, 10)]
    core, conv, rounds = k_core_status(_sym_df(spark, path), k=2, max_rounds=2)
    assert conv is False and rounds == 2
    assert core.count() > 0  # the shallow peel is a superset of the (empty) core


def test_cc_status_converged_and_cap_exhausted(spark):
    from kafka_flow_spark.operators.graph import (
        connected_components,
        connected_components_status,
    )

    df = _sym_df(spark, [(1, 2), (2, 3), (10, 11)])
    out, conv, rounds = connected_components_status(df, src="src", dst="dst")
    assert conv is True
    got = {r["node"]: r["component"] for r in out.collect()}
    assert got[1] == got[2] == got[3] == 1 and got[10] == got[11] == 10
    # a long path with max_iter=1 cannot reach the star fixpoint
    path = _sym_df(spark, [(i, i + 1) for i in range(1, 40)])
    _, conv1, rounds1 = connected_components_status(
        path, src="src", dst="dst", max_iter=1
    )
    assert conv1 is False and rounds1 == 1
    # the plain wrapper still returns the same assignments (flag is logged)
    plain = {
        r["node"]: r["component"]
        for r in connected_components(df, src="src", dst="dst").collect()
    }
    assert plain == got


def test_lp_status_fixpoint_and_oscillation(spark):
    from kafka_flow_spark.operators.graph import (
        label_propagation,
        label_propagation_status,
    )

    # two disjoint triangles: labels settle -> converged, early exit is
    # identity-preserving (same labels as the full fixed budget)
    tri = _sym_df(spark, [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)])
    out, conv, rounds = label_propagation_status(tri, iterations=8)
    assert conv is True and rounds < 8
    got = {r["node"]: r["community"] for r in out.collect()}
    full = {
        r["node"]: r["community"]
        for r in label_propagation(tri, iterations=8).collect()
    }
    assert got == full
    # a single symmetrized edge 2-cycles forever under synchronous updates
    edge = _sym_df(spark, [(1, 2)])
    _, conv2, rounds2 = label_propagation_status(edge, iterations=4)
    assert conv2 is False and rounds2 == 4


def test_pagerank_converged_flag_cap_exhausted(spark):
    from kafka_flow_spark.operators.graph import pagerank_converged

    df = _sym_df(spark, [(0, 1), (0, 2), (0, 3)])
    _, its, residual, conv = pagerank_converged(df, max_iterations=1, tol_scaled=0)
    assert its == 1 and conv is False and residual > 0


def test_checkpoint_dir_is_equivalent_and_used(spark, tmp_path):
    """checkpoint_dir switches lineage truncation to reliable checkpoint()
    without changing any result — and actually writes there (the 48g
    local-mode driver knob becomes a parameter, review r9 #5)."""
    import os

    from kafka_flow_spark.operators.graph import (
        connected_components,
        k_core_status,
        label_propagation,
        pagerank,
    )

    ckpt = str(tmp_path / "ckpt")
    edges = [(i, (i * 7) % 23) for i in range(23) if i != (i * 7) % 23]
    df = _sym_df(spark, edges)
    for build in (
        lambda d, **kw: connected_components(d, src="src", dst="dst", **kw),
        lambda d, **kw: pagerank(d, iterations=3, **kw),
        lambda d, **kw: label_propagation(d, iterations=3, **kw),
        lambda d, **kw: k_core_status(d, k=2, **kw)[0],
    ):
        local = {tuple(r) for r in build(df).collect()}
        reliable = {tuple(r) for r in build(df, checkpoint_dir=ckpt).collect()}
        assert reliable == local
    assert os.path.isdir(ckpt) and any(os.scandir(ckpt))  # actually used


def test_truncate_recovers_from_external_checkpoint_dir_change(spark, tmp_path):
    """Review r10: the checkpoint-dir cache was a module global keyed only
    by the requested path — stale after any OTHER code calls
    setCheckpointDir (writes land in the wrong directory) and wrong after a
    context restart (fresh context never had setCheckpointDir called).  The
    record now lives on the SparkContext object and is verified against
    getCheckpointDir before skipping the set."""
    import os

    from kafka_flow_spark.operators.graph import _truncate

    ours = str(tmp_path / "ours")
    theirs = str(tmp_path / "theirs")
    sc = spark.sparkContext
    df = spark.range(5)
    _truncate(df, ours, eager=True)
    assert os.path.isdir(ours) and any(os.scandir(ours))
    # another component moves the context's checkpoint dir out from under us
    sc.setCheckpointDir(theirs)
    before = sum(len(fs) for _, _, fs in os.walk(ours))
    _truncate(df, ours, eager=True)  # must detect the move and re-set
    after = sum(len(fs) for _, _, fs in os.walk(ours))
    assert after > before, "checkpoint blocks landed outside the requested dir"
    # and a fresh context attribute (simulating a restarted context) re-sets
    del sc._kfs_checkpoint_dir
    _truncate(df, ours, eager=True)
    assert sc._kfs_checkpoint_dir[0] == ours
