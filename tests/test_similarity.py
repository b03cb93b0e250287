"""Similarity search: LSH recall against the exact brute-force baseline."""

from __future__ import annotations

from kafka_flow_spark.operators.similarity import knn_bruteforce, knn_lsh
from kafka_flow_spark.tables import load
from tests.conftest import SF_SMALL


def test_lsh_recall_against_bruteforce(spark):
    emb = load(spark, SF_SMALL, "embeddings")
    queries = emb.limit(20)
    exact = knn_bruteforce(emb, queries, k=5)
    truth = {(r["q_id"], r["neighbor_id"]) for r in exact.collect()}
    dim = len(emb.first()["embedding"])
    # plain multi-table sign-LSH: deterministic seeds -> stable floor
    plain = knn_lsh(emb, queries, k=5, dim=dim, multiprobe_bits=0)
    got0 = {(r["q_id"], r["neighbor_id"]) for r in plain.collect()}
    assert len(truth & got0) / len(truth) >= 0.6
    # Hamming-1 multiprobe (the default): near-complete recall at 5x
    # query-side probes, corpus shuffle volume unchanged (measured 1.0 here)
    approx = knn_lsh(emb, queries, k=5, dim=dim)
    got = {(r["q_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, f"multiprobe LSH recall {recall:.2f}"


def test_lsh_ranks_are_dense_per_query(spark):
    emb = load(spark, SF_SMALL, "embeddings")
    approx = knn_lsh(emb, emb.limit(5), k=3, dim=len(emb.first()["embedding"]))
    rows = approx.collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_cosine_near_dup_blocking_is_lossless(spark):
    """Projection-band blocking must find EXACTLY the brute-force pair set —
    the whole point of the lossless design (recall 1.0, not probabilistic)."""
    from pyspark.sql import functions as F

    from kafka_flow_spark.functions import cosine
    from kafka_flow_spark.operators.similarity import cosine_near_dup_pairs

    emb = load(spark, SF_SMALL, "embeddings")
    for threshold in (0.35, 0.45):
        got = {
            (r["a_id"], r["b_id"])
            for r in cosine_near_dup_pairs(emb, threshold=threshold, dim=64).collect()
        }
        a = emb.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_vec"))
        b = emb.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_vec"))
        dbl = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
        truth = {
            (r["a_id"], r["b_id"])
            for r in a.crossJoin(b)
            .filter(F.col("a_id") < F.col("b_id"))
            .filter(cosine(dbl(F.col("a_vec")), dbl(F.col("b_vec"))) >= threshold)
            .collect()
        }
        assert got == truth, f"t={threshold}: missed {truth - got}, extra {got - truth}"


def test_cosine_near_dup_matmul_equals_band_blocked(spark):
    """The BLAS block-matmul path and the band-blocked path are the same
    operator: identical pair sets and (rounded) sims at every threshold."""
    from kafka_flow_spark.operators.similarity import (
        cosine_near_dup_pairs,
        cosine_near_dup_pairs_matmul,
    )

    emb = load(spark, SF_SMALL, "embeddings")
    for threshold in (0.35, 0.45):
        a = {
            (r["a_id"], r["b_id"]): r["cos_sim"]
            for r in cosine_near_dup_pairs(emb, threshold=threshold, dim=64).collect()
        }
        b = {
            (r["a_id"], r["b_id"]): r["cos_sim"]
            for r in cosine_near_dup_pairs_matmul(emb, threshold=threshold).collect()
        }
        assert set(a) == set(b), f"t={threshold}: {set(a) ^ set(b)}"
        for key in a:
            assert abs(a[key] - b[key]) < 1e-9


def test_auto_n_blocks_bounds_block_and_pair_matrix_sizes():
    """The derived block count must respect both per-task budgets at any
    corpus size, and refuse when the job is quadratic-at-scale."""
    import pytest as _pytest

    from kafka_flow_spark.operators.similarity import _auto_n_blocks

    for n_rows, dim in [(500, 64), (1_000_000, 64), (1_000_000, 1024), (200_000, 8192)]:
        b = _auto_n_blocks(n_rows, dim)
        rows_per_block = -(-n_rows // b)  # ceil — max rows any block can get
        assert rows_per_block * dim * 8 <= (32 << 20) + dim * 8  # block bytes
        assert rows_per_block**2 * 8 <= (256 << 20) * 1.05  # pair matrix bytes
    # a billion-row corpus: exact all-pairs is quadratic — must refuse
    with _pytest.raises(ValueError, match="band blocking"):
        _auto_n_blocks(1_000_000_000, 1024)


def test_ivf_recall_against_bruteforce(spark):
    from pyspark.sql import functions as F

    from kafka_flow_spark.operators.similarity import knn_ivf

    emb = load(spark, SF_SMALL, "embeddings")
    # hash-selected queries, NOT limit(20): the lowest-id vectors coincide
    # with the old untrained-centroid stand-in, which made recall numbers an
    # artifact of the quantizer being trained on the query points themselves
    queries = emb.orderBy(F.xxhash64("vec_id")).limit(20)
    exact = knn_bruteforce(emb, queries, k=5)
    approx = knn_ivf(emb, queries, k=5, n_cells=16, n_probe=4)
    truth = {(r["q_id"], r["neighbor_id"]) for r in exact.collect()}
    got = {(r["q_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(truth & got) / len(truth)
    # trained spherical-k-means centroids: probing 4/16 cells (~25% scan)
    # recovers >0.8 of the exact top-5 (measured 0.83; untrained balanced
    # cells sit near 0.5) — the trained codebook earns ~2× scan efficiency
    assert recall >= 0.75, f"IVF recall {recall:.2f}"


def test_arrow_bruteforce_equals_expr_bruteforce(spark):
    """The BLAS path and the expression path are the same operator: identical
    neighbor sets and sims (to float tolerance) for every query."""
    from kafka_flow_spark.operators.similarity import knn_bruteforce_arrow

    emb = load(spark, SF_SMALL, "embeddings")
    queries = emb.limit(10)
    a = {(r["q_id"], r["neighbor_id"]): r["sim"] for r in knn_bruteforce(emb, queries, k=5).collect()}
    b = {(r["q_id"], r["neighbor_id"]): r["sim"] for r in knn_bruteforce_arrow(emb, queries, k=5).collect()}
    assert set(a) == set(b)
    for key in a:
        assert abs(a[key] - b[key]) < 1e-9


def test_arrow_bruteforce_refuses_oversized_query_set(spark):
    """The probe set is collected to the driver — an unbounded query side
    must refuse loudly, not silently pull the corpus into driver memory."""
    import pytest

    from kafka_flow_spark.operators.similarity import knn_bruteforce_arrow

    emb = load(spark, SF_SMALL, "embeddings")
    with pytest.raises(ValueError, match="max_queries"):
        knn_bruteforce_arrow(emb, emb, k=5, max_queries=100)


def test_quantized_knn_recall_against_bruteforce(spark):
    """int8 asymmetric-distance kNN must nearly reproduce the exact ranking —
    quantization noise is ≤ scale/2 per component, far below the cosine gaps
    between distinct 64-dim vectors."""
    from kafka_flow_spark.operators.similarity import knn_quantized

    emb = load(spark, SF_SMALL, "embeddings")
    queries = emb.limit(20)
    truth = {(r["q_id"], r["neighbor_id"]) for r in knn_bruteforce(emb, queries, k=5).collect()}
    got = {(r["q_id"], r["neighbor_id"]) for r in knn_quantized(emb, queries, k=5).collect()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.95, f"quantized kNN recall {recall:.2f}"


# --- SemDeDup: cluster-then-prune semantic dedup (Abbas et al. 2023) ---


def _semdedup_corpus(spark):
    """Two tight near-dup groups on orthogonal axes + two isolated vectors."""
    import numpy as np

    rows = []
    base_a = np.zeros(8); base_a[0] = 1.0
    base_b = np.zeros(8); base_b[1] = 1.0
    for i, eps in enumerate([0.0, 0.01, 0.02]):        # group A: ids 0,1,2
        v = base_a.copy(); v[7] = eps
        rows.append((i, (v / np.linalg.norm(v)).tolist()))
    for i, eps in enumerate([0.0, 0.015]):             # group B: ids 10,11
        v = base_b.copy(); v[6] = eps
        rows.append((10 + i, (v / np.linalg.norm(v)).tolist()))
    lone = np.zeros(8); lone[2] = 1.0
    rows.append((20, lone.tolist()))                   # isolated
    lone2 = np.zeros(8); lone2[3] = 1.0
    rows.append((21, lone2.tolist()))                  # isolated
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semantic_dedup_keeps_min_id_per_group(spark):
    from kafka_flow_spark.operators.similarity import semantic_dedup

    df = _semdedup_corpus(spark)
    kept = sorted(
        r.vec_id
        for r in semantic_dedup(df, threshold=0.95, n_cells=1).collect()
    )
    assert kept == [0, 10, 20, 21]


def test_semantic_dedup_pairs_subset_of_exact(spark):
    """Cell blocking may MISS cross-cell pairs but must never invent one:
    every semantic pair must appear in the exact all-pairs operator's output
    with the same rounded similarity."""
    from kafka_flow_spark.operators.similarity import (
        cosine_near_dup_pairs,
        semantic_dedup_pairs,
    )
    from kafka_flow_spark.tables import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    exact = {
        (r.a_id, r.b_id): r.cos_sim
        for r in cosine_near_dup_pairs(emb, threshold=0.40, n_projections=2).collect()
    }
    approx = {
        (r.a_id, r.b_id): r.cos_sim
        for r in semantic_dedup_pairs(emb, threshold=0.40, n_cells=8, n_probe=4).collect()
    }
    assert set(approx) <= set(exact)
    assert all(exact[p] == s for p, s in approx.items())
    # high-threshold near-dups are intra-cluster by construction: recall is
    # the operator's fitness signal
    if exact:
        recall = len(approx) / len(exact)
        assert recall >= 0.9, f"recall {recall}"


def test_semantic_dedup_multi_probe_recall_monotone(spark):
    from kafka_flow_spark.operators.similarity import semantic_dedup_pairs
    from kafka_flow_spark.tables import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    p1 = set(
        (r.a_id, r.b_id)
        for r in semantic_dedup_pairs(emb, threshold=0.40, n_cells=8, n_probe=1).collect()
    )
    p2 = set(
        (r.a_id, r.b_id)
        for r in semantic_dedup_pairs(emb, threshold=0.40, n_cells=8, n_probe=2).collect()
    )
    assert p1 <= p2  # extra probes only ADD candidate pairs


def test_semantic_dedup_deterministic_under_repartition(spark):
    from kafka_flow_spark.operators.similarity import semantic_dedup

    df = _semdedup_corpus(spark)
    a = sorted(r.vec_id for r in semantic_dedup(df, threshold=0.95, n_cells=4).collect())
    b = sorted(
        r.vec_id
        for r in semantic_dedup(df.repartition(7), threshold=0.95, n_cells=4).collect()
    )
    assert a == b


def test_ivfpq_recall_against_bruteforce(spark):
    from pyspark.sql import functions as F

    from kafka_flow_spark.operators.similarity import knn_ivfpq

    emb = load(spark, SF_SMALL, "embeddings")
    queries = emb.orderBy(F.xxhash64("vec_id")).limit(20)
    exact = knn_bruteforce(emb, queries, k=5)
    approx = knn_ivfpq(emb, queries, k=5, n_cells=16, n_probe=4)
    truth = {(r["q_id"], r["neighbor_id"]) for r in exact.collect()}
    got = {(r["q_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(truth & got) / len(truth)
    # same probe budget as the IVF test (4/16 cells): PQ codes only SHORTLIST
    # candidates (k*refine ADC survivors) and exact re-rank removes the
    # quantization error, so recall must track the IVF bound
    assert recall >= 0.75, f"IVF-PQ recall {recall:.2f}"
    # re-ranked sims are exact: every overlapping (q, neighbor) pair agrees
    # with brute force to float tolerance
    es = {(r["q_id"], r["neighbor_id"]): r["sim"] for r in exact.collect()}
    for r in approx.collect():
        key = (r["q_id"], r["neighbor_id"])
        if key in es:
            assert abs(r["sim"] - es[key]) < 1e-9


def test_ivfpq_refuses_unbounded_query_collect(spark):
    import pytest as _pytest
    from kafka_flow_spark.operators.similarity import knn_ivfpq

    emb = load(spark, SF_SMALL, "embeddings")
    with _pytest.raises(ValueError, match="max_queries"):
        knn_ivfpq(emb, emb, max_queries=10)


def test_pq_encode_numpy_matches_expression_form(spark):
    """The production numpy encode path (pq_encode, mapInPandas) and the
    oracle-gated Catalyst form (pq_encode_grid_expr) produce IDENTICAL
    codes when given the same constant-grid codebooks — this differential
    carries q_pq_codes' DuckDB-exact proof of the encode arithmetic over
    to the trained-codebook path (VERDICT r5 #5)."""
    import numpy as np

    from kafka_flow_spark.operators.similarity import (
        pq_encode,
        pq_encode_grid_expr,
    )

    emb = load(spark, SF_SMALL, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    m, levels = 8, (-0.3, -0.1, 0.1, 0.3)
    sub = dim // m
    # grid codebooks: entry j of every subspace = level_j on every sub-dim;
    # single zero coarse centroid -> cell 0, residual = normalized vector
    books = np.array([[[g] * sub for g in levels] for _ in range(m)])
    Cn = np.zeros((1, dim))
    got_np = {
        r["vec_id"]: (r["cell"], tuple(r["codes"]))
        for r in pq_encode(emb, "vec_id", "embedding", Cn, books).collect()
    }
    got_expr = {
        r["vec_id"]: tuple(r["codes"])
        for r in pq_encode_grid_expr(
            emb, "vec_id", "embedding", levels=levels, m_subspaces=m
        ).collect()
    }
    assert len(got_np) == len(got_expr) > 0
    for vid, (cell, codes) in got_np.items():
        assert cell == 0
        assert codes == got_expr[vid], f"vec {vid}: {codes} != {got_expr[vid]}"


def test_adc_shortlist_numpy_lut_matches_expression_form(spark):
    """The Catalyst grid-ADC shortlist (adc_shortlist_grid, the oracle gate
    q_ivfpq_adc_shortlist) and a numpy mirror of knn_ivfpq's LUT arithmetic
    (per-query LUT = squared distances to codebook entries; candidate score
    = sum of code-selected LUT cells) produce IDENTICAL shortlists on the
    same grid codebooks — carrying the DuckDB-exact proof of the search
    half over to the trained-codebook ADC path."""
    import numpy as np

    from kafka_flow_spark.operators.similarity import (
        adc_shortlist_grid,
        pq_encode,
    )

    emb = load(spark, SF_SMALL, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    m, levels = 8, (-0.3, -0.1, 0.1, 0.3)
    L = len(levels)
    sub = dim // m
    books = np.array([[[g] * sub for g in levels] for _ in range(m)])
    Cn = np.zeros((1, dim))
    codes = {
        r["vec_id"]: np.array(r["codes"])
        for r in pq_encode(emb, "vec_id", "embedding", Cn, books).collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    expected = {}
    for qid in sorted(v for v in vecs if v < 10):
        qv = vecs[qid]
        qn = qv / max(np.linalg.norm(qv), 1e-12)
        # knn_ivfpq's LUT shape, with squared distance instead of dot (the
        # grid gate's metric): LUT[mi][j] = ||q_sub - book[mi][j]||^2, 6dp
        lut = np.round(
            np.stack(
                [
                    ((qn[mi * sub : (mi + 1) * sub] - books[mi]) ** 2).sum(axis=1)
                    for mi in range(m)
                ]
            ),
            6,
        )
        scored = []
        for nid, cd in codes.items():
            if nid == qid:
                continue
            adc = 0.0
            for mi in range(m):
                adc = adc + lut[mi][cd[mi]]
            scored.append((int(np.floor(adc * 1e6)), nid))
        scored.sort()
        expected[qid] = scored[:20]
    got = {}
    for r in adc_shortlist_grid(
        emb, emb.filter("vec_id < 10"), levels=levels, m_subspaces=m, shortlist=20
    ).collect():
        got.setdefault(r["q_id"], []).append((r["rank"], r["adc_e6"], r["neighbor_id"]))
    assert set(got) == set(expected)
    for qid, exp in expected.items():
        g = sorted(got[qid])
        assert [(e[0], e[1]) for e in exp] == [(adc, nid) for _, adc, nid in g], qid


def test_semantic_dedup_lsh_one_cell_equals_trained_one_cell(spark):
    """n_planes=0 collapses the LSH variant to ONE cell; n_cells=1 does the
    same for the trained/BLAS variant.  In one cell both are the exact
    all-pairs keep-first prune, so the kept sets must be IDENTICAL — the
    differential that carries q_semantic_dedup's oracle proof of the prune
    contract to the spherical-k-means path."""
    from kafka_flow_spark.operators.similarity import (
        semantic_dedup,
        semantic_dedup_lsh,
    )

    emb = load(spark, SF_SMALL, "embeddings")
    a = sorted(
        r["vec_id"]
        for r in semantic_dedup_lsh(emb, threshold=0.40, n_planes=0).collect()
    )
    b = sorted(
        r["vec_id"]
        for r in semantic_dedup(emb, threshold=0.40, n_cells=1).collect()
    )
    assert a == b and len(a) > 0


def test_semantic_dedup_lsh_blas_engine_equals_expr_engine(spark):
    """The blas (blocked-matmul) and expr (Catalyst fold) in-cell engines
    must keep the SAME set on the real corpus — the empirical pin for the
    scale path that the oracle never exercises (auto picks expr at driver
    scales; blas engages at sf10)."""
    from kafka_flow_spark.operators.similarity import semantic_dedup_lsh

    emb = load(spark, SF_SMALL, "embeddings")
    a = sorted(
        r["vec_id"]
        for r in semantic_dedup_lsh(
            emb, threshold=0.40, n_planes=4, engine="expr"
        ).collect()
    )
    b = sorted(
        r["vec_id"]
        for r in semantic_dedup_lsh(
            emb, threshold=0.40, n_planes=4, engine="blas"
        ).collect()
    )
    assert a == b and len(a) > 0


def test_semantic_dedup_lsh_keep_first_and_pairwise_contract(spark):
    """Every dropped vector has an in-cell near-dup with a smaller id, and
    every kept pair within a cell is below threshold (keep-first semantics
    verified against a brute-force python scan of the sign buckets)."""
    import numpy as np

    from kafka_flow_spark.operators.similarity import (
        _hyperplanes,
        semantic_dedup_lsh,
    )

    emb = load(spark, SF_SMALL, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    planes = np.array(_hyperplanes(64, 4, seed=7))
    cells = {
        vid: int(sum((1 << i) for i in range(4) if planes[i] @ v >= 0))
        for vid, v in vecs.items()
    }
    kept = sorted(
        r["vec_id"]
        for r in semantic_dedup_lsh(emb, threshold=0.40, n_planes=4).collect()
    )
    # python mirror of the keep-first prune
    def cos(u, v):
        return (u @ v) / max(np.linalg.norm(u) * np.linalg.norm(v), 1e-12)

    dropped = set()
    for b_id in sorted(vecs):
        for a_id in sorted(vecs):
            if a_id >= b_id or cells[a_id] != cells[b_id]:
                continue
            if cos(vecs[a_id], vecs[b_id]) >= 0.40:
                dropped.add(b_id)
                break
    assert kept == sorted(set(vecs) - dropped)


# --- bitext_margin_pairs ---------------------------------------------------


def _py_margin(a_vecs, b_vecs, k, queries=None):
    """Pure-python mirror: a_vecs/b_vecs are {id: list[float]}."""
    import math

    def cos(u, v):
        dot = 0.0
        for x, y in zip(u, v):
            dot += x * y
        nu = math.sqrt(sum(x * x for x in u))
        nv = math.sqrt(sum(x * x for x in v))
        return dot / (nu * nv)

    def knn(corpus, q):
        sims = sorted(
            ((cos(q[1], v), -i) for i, v in corpus.items() if i != q[0]),
            reverse=True,
        )[:k]
        return [(-i, s) for s, i in sims]

    f9 = {}
    for qid in (queries or a_vecs):
        for nid, s in knn(b_vecs, (qid, a_vecs[qid])):
            f9[(qid, nid)] = math.floor(s * 1e9)
    sx = {}
    for (x, _), s9 in f9.items():
        sx[x] = sx.get(x, 0) + s9
    sy = {}
    for y in {y for _, y in f9}:
        sy[y] = sum(
            math.floor(s * 1e9) for _, s in knn(a_vecs, (y, b_vecs[y]))
        )
    out = {}
    for (x, y), s9 in f9.items():
        den = sx[x] + sy[y]
        if den > 0:
            out[(x, y)] = math.floor((2 * k * 10000.0 * s9) / den)
    return out


def test_bitext_margin_matches_python_mirror(spark):
    import random

    from kafka_flow_spark.operators.similarity import bitext_margin_pairs

    rng = random.Random(7)
    a = {i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(0, 20, 2)}
    b = {i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(1, 21, 2)}
    # plant one near-identical cross-side pair -> must mine with high margin
    b[21] = [x * 1.01 for x in a[4]]
    rows = [(i, v) for i, v in a.items()] + [(i, v) for i, v in b.items()]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    from pyspark.sql import functions as F

    side_a = df.where(F.col("vec_id") % 2 == 0)
    side_b = df.where(F.col("vec_id") % 2 == 1)
    got = {
        (r["a_id"], r["b_id"]): r["margin_bp"]
        for r in bitext_margin_pairs(side_a, side_b, k=3, margin_bp_min=0).collect()
    }
    want = _py_margin(a, b, k=3)
    assert got == want
    # the planted pair is the top margin
    assert max(got, key=got.get) == (4, 21)


# --- binary quantization + Hamming kNN ---------------------------------------


def test_binary_quantize_matches_python_mirror(spark):
    import numpy as np

    from kafka_flow_spark.operators.similarity import binary_quantize

    rng = np.random.RandomState(11)
    rows = [(i, [float(x) for x in rng.randn(64)]) for i in range(20)]
    # plant exact zeros and negative zeros: strictly-positive rule
    rows.append((100, [0.0] * 64))
    rows.append((101, [-0.0] * 32 + [1.0] * 32))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {
        r["vec_id"]: r["sig"]
        for r in binary_quantize(df, "vec_id", "embedding", dim=64).collect()
    }

    def py_sig(vec):
        words = []
        for w in range(2):
            acc = 0
            for i in range(32):
                acc = acc * 2 + (1 if vec[w * 32 + i] > 0 else 0)
            words.append(acc)
        return words

    for vid, vec in rows:
        assert got[vid] == py_sig(vec), vid
    assert got[100] == [0, 0]
    assert got[101] == [0, (1 << 32) - 1]


def test_knn_hamming_matches_python_mirror(spark):
    import numpy as np

    from kafka_flow_spark.operators.similarity import knn_hamming

    rng = np.random.RandomState(5)
    vecs = {i: rng.randn(64) for i in range(30)}
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()], ["vec_id", "embedding"]
    )
    got = [
        (r["q_id"], r["neighbor_id"], r["dist"], r["rank"])
        for r in knn_hamming(df, df.where("vec_id < 3"), dim=64, k=4)
        .orderBy("q_id", "rank")
        .collect()
    ]

    def sig(v):
        return [(v[s * 32 : s * 32 + 32] > 0) for s in range(2)]

    want = []
    for q in range(3):
        dists = []
        for n, v in vecs.items():
            if n == q:
                continue
            d = sum(
                int((a != b).sum()) for a, b in zip(sig(vecs[q]), sig(v))
            )
            dists.append((d, n))
        dists.sort()
        want += [(q, n, d, r + 1) for r, (d, n) in enumerate(dists[:4])]
    assert got == want


def test_knn_hamming_self_distance_zero_excluded(spark):
    from kafka_flow_spark.operators.similarity import binary_quantize, knn_hamming

    df = spark.createDataFrame(
        [(1, [1.0, -1.0] * 32), (2, [1.0, -1.0] * 32), (3, [-1.0, 1.0] * 32)],
        ["vec_id", "embedding"],
    )
    out = knn_hamming(df, df.where("vec_id = 1"), dim=64, k=2).collect()
    by_rank = {r["rank"]: (r["neighbor_id"], r["dist"]) for r in out}
    # identical vector at distance 0, antipodal at 64; self excluded
    assert by_rank == {1: (2, 0), 2: (3, 64)}


def test_random_projection_matches_numpy_mirror(spark):
    """Independent reference: rebuild the Achlioptas matrix in numpy and
    check FLOOR-e6 values (fold order matched via math.fsum-free left adds)."""
    import hashlib
    import math

    import numpy as np

    from kafka_flow_spark.operators.similarity import random_projection

    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.randn(64).astype(np.float32)]) for i in range(25)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {r["vec_id"]: [r[f"p{j}"] for j in range(8)] for r in random_projection(df).collect()}

    def entry(j, i):
        h = int(hashlib.md5(f"rp-v1:{j}:{i}".encode()).hexdigest()[:6], 16) % 6
        return 1 if h == 0 else (-1 if h == 1 else 0)

    for vid, vec in rows:
        for j in range(8):
            total = None
            for i in range(64):
                s = entry(j, i)
                if s == 0:
                    continue
                t = float(vec[i]) if s > 0 else -float(vec[i])
                total = t if total is None else total + t
            want = math.floor((total or 0.0) * 1_000_000.0)
            assert got[vid][j] == want, (vid, j)


def test_random_projection_preserves_distances_approximately(spark):
    """JL property smoke: relative squared-distance distortion across random
    pairs stays bounded (loose bound — 8 dims from 64 is a coarse sketch)."""
    import numpy as np

    from kafka_flow_spark.operators.similarity import random_projection

    rng = np.random.RandomState(9)
    V = rng.randn(40, 64)
    df = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(40)], ["vec_id", "embedding"]
    )
    P = {r["vec_id"]: np.array([r[f"p{j}"] for j in range(8)], dtype=np.float64) / 1e6
         for r in random_projection(df).collect()}
    # E[||Px - Py||^2] = (in-dim sparsity factor) * ||x-y||^2 / 3... normalize
    # empirically: the MEDIAN distortion ratio should be within 3x either way
    ratios = []
    for a in range(0, 20):
        b = a + 20
        d_hi = np.sum((V[a] - V[b]) ** 2)
        # E[||Px - Py||^2] = out_dim * Var(entry) * ||x - y||^2 = 8/3 * d_hi
        d_lo = np.sum((P[a] - P[b]) ** 2) * 3.0 / 8.0
        ratios.append(d_lo / d_hi)
    med = sorted(ratios)[len(ratios) // 2]
    assert 1 / 3 < med < 3, med


def test_knn_hamming_null_vectors_never_rank(spark):
    df = spark.createDataFrame(
        [(1, [1.0] * 64), (2, [1.0] * 64), (3, None)],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    from kafka_flow_spark.operators.similarity import knn_hamming

    out = knn_hamming(df, df.where("vec_id = 1"), dim=64, k=5).collect()
    assert [r["neighbor_id"] for r in out] == [2]


def test_hamming_rerank_recall_and_exact_sims(spark):
    """The refine stage must output EXACT cosines (equal to bruteforce for
    shared pairs) and recover most of the exact top-k through the binary
    prefilter."""
    emb = load(spark, SF_SMALL, "embeddings")
    queries = emb.limit(10)
    from kafka_flow_spark.operators.similarity import knn_hamming_rerank

    exact = {
        (r["q_id"], r["neighbor_id"]): r["sim"]
        for r in knn_bruteforce(emb, queries, k=5).collect()
    }
    got = {
        (r["q_id"], r["neighbor_id"]): r["sim"]
        for r in knn_hamming_rerank(emb, queries, k=5, m=40).collect()
    }
    recall = len(set(exact) & set(got)) / len(exact)
    assert recall >= 0.5, f"binary prefilter recall {recall:.2f}"
    for key in set(exact) & set(got):
        assert abs(exact[key] - got[key]) < 1e-9


def test_hamming_rerank_m_guard(spark):
    import pytest

    from kafka_flow_spark.operators.similarity import knn_hamming_rerank

    emb = load(spark, SF_SMALL, "embeddings")
    with pytest.raises(ValueError, match="must be >= k"):
        knn_hamming_rerank(emb, emb.limit(1), k=5, m=3)


# --- mmr_rerank --------------------------------------------------------------


def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")


def test_mmr_skips_duplicate_for_diverse_pick(spark):
    """The defining MMR property: with diversity weighted (lam=30), the
    second pick skips an exact duplicate of pick 1 in favor of a less
    relevant but diverse candidate; with lam=100 (pure relevance) the
    duplicate wins.  Hand-geometry: q=[1,0.2], a=b=[1,0] (dup pair),
    c=[0,1] (orthogonal to a, mildly relevant)."""
    from kafka_flow_spark.operators.similarity import mmr_rerank

    df = _emb_df(
        spark,
        [(0, [1.0, 0.2]), (1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
    )
    qs = df.where("vec_id = 0")

    def picks(lam):
        out = mmr_rerank(df, qs, k_pool=3, k_select=2, lam_e2=lam)
        return {r["pick_rank"]: r["neighbor_id"] for r in out.collect()}

    diverse = picks(30)
    assert diverse[1] == 1  # rel tie between 1 and 2 -> smaller id
    assert diverse[2] == 3  # duplicate (id 2, sim=1) penalized away
    greedy = picks(100)
    assert greedy[1] == 1 and greedy[2] == 2  # pure relevance keeps the dup


def test_mmr_rank1_equals_knn_top1_and_picks_distinct(spark, tmp_path):
    from kafka_flow_spark.operators.similarity import knn_bruteforce, mmr_rerank
    from kafka_flow_spark.session import get_spark

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = e.where("vec_id < 5")
    out = mmr_rerank(e, qs, k_pool=6, k_select=3, lam_e2=70).collect()
    top1 = {
        r["q_id"]: r["neighbor_id"]
        for r in knn_bruteforce(e, qs, k=1).collect()
    }
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["pick_rank"], r["neighbor_id"]))
    for qid, picks in by_q.items():
        ids = [n for _, n in sorted(picks)]
        assert len(ids) == 3 and len(set(ids)) == 3  # distinct picks
        assert ids[0] == top1[qid]  # pick 1 is plain argmax relevance
        assert qid not in ids  # self excluded


def test_mmr_string_ids(spark):
    """Review r10: the tie-break used to negate the id column (max_by over
    struct(score, -id)), which fails analysis for non-numeric ids while the
    sibling knn_* operators accept string ids.  The min_by(-score, id)
    formulation must give the SAME trajectory for string ids — same
    geometry as test_mmr_skips_duplicate_for_diverse_pick, ids renamed to
    strings whose lexicographic order matches ('a'<'b'<'c'<'d')."""
    from kafka_flow_spark.operators.similarity import mmr_rerank

    df = spark.createDataFrame(
        [("a", [1.0, 0.2]), ("b", [1.0, 0.0]), ("c", [1.0, 0.0]), ("d", [0.0, 1.0])],
        "vec_id STRING, embedding ARRAY<FLOAT>",
    )
    qs = df.where("vec_id = 'a'")
    out = mmr_rerank(df, qs, k_pool=3, k_select=2, lam_e2=30)
    picks = {r["pick_rank"]: r["neighbor_id"] for r in out.collect()}
    assert picks[1] == "b"  # rel tie between b and c -> smaller id
    assert picks[2] == "d"  # duplicate (c, sim=1) penalized away


def test_mmr_validates_args(spark):
    import pytest as _pytest

    from kafka_flow_spark.operators.similarity import mmr_rerank

    df = _emb_df(spark, [(0, [1.0, 0.0])])
    with _pytest.raises(ValueError, match="k_select"):
        mmr_rerank(df, df, k_pool=3, k_select=4)
    with _pytest.raises(ValueError, match="lam_e2"):
        mmr_rerank(df, df, lam_e2=101)
    with _pytest.raises(ValueError, match="k_pool"):
        mmr_rerank(df, df, k_pool=0)
    with _pytest.raises(ValueError, match="retrieve"):
        mmr_rerank(df, df, retrieve="magic")
    # r11 advice: nprobe=0 under retrieve='ivf' produced an empty shortlist
    # and a silently empty result — now refused, mirroring ivf_exact_knn
    with _pytest.raises(ValueError, match="nprobe"):
        mmr_rerank(df, df, retrieve="ivf", nprobe=0)


def test_mmr_ivf_full_probe_equals_exact_and_recall_bounded(spark):
    """The composition law (review r10 #3): retrieving the MMR pool through
    the IVF probe with nprobe == n_cells (every cell probed) must equal the
    brute-force retrieval BIT-IDENTICALLY — same picks, same scores.  With
    nprobe < n_cells, recall loss is deterministic and cell-bounded: the
    output keeps the MMR invariants (k_select distinct picks per query)
    and pick-overlap vs the exact pool is measured, not assumed."""
    from kafka_flow_spark.operators.similarity import mmr_rerank

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = e.where("vec_id < 10")
    exact = sorted(
        tuple(r) for r in mmr_rerank(e, qs, k_pool=10, k_select=3).collect()
    )
    full = sorted(
        tuple(r)
        for r in mmr_rerank(
            e, qs, k_pool=10, k_select=3,
            retrieve="ivf", n_cells=8, iters=2, nprobe=8,
        ).collect()
    )
    assert full == exact  # every cell probed == brute force, scores included

    probed = mmr_rerank(
        e, qs, k_pool=10, k_select=3,
        retrieve="ivf", n_cells=8, iters=2, nprobe=2,
    ).collect()
    by_q = {}
    for r in probed:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert len(by_q) == 10
    assert all(len(p) == 3 for p in by_q.values())  # distinct picks survive
    # deterministic recall vs the exact picks — on this fixed corpus the
    # 2-of-8-cells probe keeps the strong majority of the exact trajectory
    exact_pairs = {(q, n) for q, _, n, _ in exact}
    got_pairs = {(r["query_id"], r["neighbor_id"]) for r in probed}
    recall = len(exact_pairs & got_pairs) / len(exact_pairs)
    assert recall >= 0.7, recall


# --- embedding_dim_profile / minmax_scale ------------------------------------


def test_dim_profile_hand_checked(spark):
    from kafka_flow_spark.operators.similarity import embedding_dim_profile

    df = _emb_df(spark, [(1, [0.0, 1.0]), (2, [0.5, 3.0]), (3, [1.0, 2.0])])
    rows = {r["dim"]: r for r in embedding_dim_profile(df).collect()}
    d0, d1 = rows[0], rows[1]
    assert (d0["n"], d0["mean_e6"], d0["min_e6"], d0["max_e6"]) == (3, 500_000, 0, 1_000_000)
    # var = (3*(0 + 0.25e12 + 1e12) - (1.5e6)^2) / 9 = 1.5e12/9 (trunc)
    assert d0["var_e12"] == 1_500_000_000_000 // 9
    assert d0["sum_scaled_e6"] == 0 + 500_000 + 1_000_000
    assert (d1["mean_e6"], d1["min_e6"], d1["max_e6"]) == (2_000_000, 1_000_000, 3_000_000)
    assert d1["var_e12"] == 6_000_000_000_000 // 9
    assert d1["sum_scaled_e6"] == 0 + 1_000_000 + 500_000


def test_dim_profile_negative_mean_truncates_toward_zero(spark):
    from kafka_flow_spark.operators.similarity import embedding_dim_profile

    # float32-exact inputs (powers of two) so FLOOR-e6 is the literal value
    # and the only rounding under test is the mean division
    df = _emb_df(spark, [(1, [-0.5]), (2, [-0.25]), (3, [-0.125])])
    r = embedding_dim_profile(df).collect()[0]
    # sum = -875000, n=3: trunc toward zero -> -291666 (floor would -291667)
    assert r["mean_e6"] == -291_666


def test_dim_profile_constant_dimension_scales_to_zero(spark):
    from kafka_flow_spark.operators.similarity import embedding_dim_profile

    df = _emb_df(spark, [(1, [0.25]), (2, [0.25])])
    r = embedding_dim_profile(df).collect()[0]
    assert r["var_e12"] == 0 and r["sum_scaled_e6"] == 0


def test_minmax_scale_hand_checked(spark):
    from kafka_flow_spark.operators.similarity import minmax_scale

    df = _emb_df(spark, [(1, [0.0, 1.0]), (2, [0.5, 3.0]), (3, [1.0, 2.0])])
    got = {r["vec_id"]: r["vec_scaled"] for r in minmax_scale(df).collect()}
    assert got[1] == [0, 0]
    assert got[2] == [500_000, 1_000_000]
    assert got[3] == [1_000_000, 500_000]
