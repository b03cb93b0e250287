"""Quantized-centroid Lloyd + exact-IVF search (operators/clustering.py):
python-mirror differential (the whole train is integer arithmetic, so the
mirror is exact, not approximate), separated-cluster recovery, repartition
stability, and cell-bounded recall vs brute force."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kafka_flow_spark.operators.clustering import (
    ivf_exact_knn,
    kmeans_quantized,
    kmeans_summary,
)

SCHEMA = "vec_id BIGINT, embedding ARRAY<DOUBLE>"


def _blob_rows(n_per=12, dim=6):
    """Three well-separated blobs on coordinate axes + deterministic jitter."""
    rows = []
    centers = [
        [1.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0, 0.0, 0.0],
    ]
    i = 0
    for b, c in enumerate(centers):
        for j in range(n_per):
            v = [x + ((i * 7 + d * 3) % 5 - 2) * 0.01 for d, x in enumerate(c)]
            rows.append((i, v))
            i += 1
    return rows


def _py_kmeans(rows, k, iters):
    """Exact integer mirror of kmeans_quantized."""
    pts = {i: [math.floor(x * 1_000_000) for x in v] for i, v in rows}
    cents = {
        rank + 1: pts[i][:] for rank, i in enumerate(sorted(pts)[:k])
    }

    def assign(cents):
        out = {}
        for i, x in pts.items():
            best = None
            for cid in sorted(cents):
                d = sum((a - b) * (a - b) for a, b in zip(x, cents[cid]))
                if best is None or d < best[0]:
                    best = (d, cid)
            out[i] = best
        return out

    a = assign(cents)
    for _ in range(iters - 1):
        sums, ns = {}, {}
        for i, (_, cid) in a.items():
            ns[cid] = ns.get(cid, 0) + 1
            s = sums.setdefault(cid, [0] * len(pts[i]))
            for d, x in enumerate(pts[i]):
                s[d] += x
        # python // floors; Spark div truncates toward zero — match div
        cents = {
            cid: [
                (s // n) if s >= 0 else -((-s) // n)
                for s in sums[cid]
            ]
            for cid, n in ns.items()
        }
        a = assign(cents)
    return a


def test_kmeans_matches_python_mirror_and_is_partition_stable(spark):
    rows = _blob_rows()
    df = spark.createDataFrame(rows, SCHEMA)
    _, got = kmeans_quantized(df, "vec_id", "embedding", k=3, iters=2)
    by_id = {r["vec_id"]: (r["dist_sq"], r["cid"]) for r in got.collect()}
    assert by_id == _py_kmeans(rows, 3, 2)
    _, got2 = kmeans_quantized(
        df.repartition(7), "vec_id", "embedding", k=3, iters=2
    )
    assert {tuple(r) for r in got2.collect()} == {
        (i, c, d) for i, (d, c) in by_id.items()
    }


def test_kmeans_recovers_separated_blobs(spark):
    """Lloyd must end with blob-pure cells even though init picks ids
    0,1,2 — all from blob 0 — so purity is a real re-centering claim, not
    an init artifact."""
    rows = _blob_rows()
    df = spark.createDataFrame(rows, SCHEMA)
    _, a = kmeans_quantized(df, "vec_id", "embedding", k=3, iters=4)
    cells = {}
    for r in a.collect():
        cells.setdefault(r["cid"], set()).add(r["vec_id"] // 12)
    # every final cell is blob-pure
    assert all(len(blobs) == 1 for blobs in cells.values())


def test_kmeans_summary_shape_and_totals(spark):
    rows = _blob_rows()
    df = spark.createDataFrame(rows, SCHEMA)
    s = kmeans_summary(df, "vec_id", "embedding", k=3, iters=2)
    got = s.collect()
    assert sum(r["n_points"] for r in got) == len(rows)
    assert all(r["inertia_e6"] >= 0 for r in got)


def test_kmeans_guards(spark):
    df = spark.createDataFrame([(1, [1.0])], SCHEMA)
    with pytest.raises(ValueError, match="k must be"):
        kmeans_quantized(df, "vec_id", "embedding", k=0)
    with pytest.raises(ValueError, match="iters must be"):
        kmeans_quantized(df, "vec_id", "embedding", iters=0)


def test_ivf_exact_knn_recall_and_self_exclusion(spark):
    """On the separated blobs, each query's top-1 neighbor under IVF equals
    the brute-force top-1 (its blob-mates dominate and the blob's cell is
    always probed first), and the query never returns itself."""
    rows = _blob_rows()
    df = spark.createDataFrame(rows, SCHEMA)
    out = ivf_exact_knn(
        df, "vec_id", "embedding",
        queries=df.where(F.col("vec_id") < 6),
        k=3, n_cells=3, iters=4, nprobe=1,
    ).collect()
    assert all(r["neighbor_id"] != r["query_id"] for r in out)

    def cos_e6(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return math.floor(dot / (na * nb) * 1_000_000)

    by_id = dict(rows)
    top1 = {
        r["query_id"]: (r["neighbor_id"], r["cos_e6"])
        for r in out
        if r["rank"] == 1
    }
    for q in range(6):
        want = max(
            ((cos_e6(by_id[q], by_id[j]), -j) for j in by_id if j != q),
        )
        assert top1[q] == (-want[1], want[0])


def test_ivf_exact_knn_more_probes_never_lose_candidates(spark):
    """nprobe=全cells equals brute force over all points — the cell shortlist
    only ever REMOVES candidates, so widening probes is monotone."""
    rows = _blob_rows()
    df = spark.createDataFrame(rows, SCHEMA)
    q = df.where(F.col("vec_id") < 4)
    full = {
        (r["query_id"], r["rank"], r["neighbor_id"], r["cos_e6"])
        for r in ivf_exact_knn(
            df, "vec_id", "embedding", q, k=2, n_cells=3, iters=2, nprobe=3
        ).collect()
    }
    one = ivf_exact_knn(
        df, "vec_id", "embedding", q, k=2, n_cells=3, iters=2, nprobe=1
    ).collect()
    # nprobe=1 rows are a subset of the nprobe=all candidate RELATION in
    # (query, neighbor) terms; scores must agree exactly where both rank
    full_scores = {(a, c): s for a, _, c, s in full}
    for r in one:
        key = (r["query_id"], r["neighbor_id"])
        if key in full_scores:
            assert full_scores[key] == r["cos_e6"]


def test_assign_arrow_matches_expression_null_semantics(spark):
    """The r14 numpy assignment (operators/clustering._assign) must keep the
    pre-r14 expression argmin's EXACT semantics, pinned empirically against
    the struct-array_min form before the rewrite:

    - valid rows: exact integer argmin, ties to the smaller cid;
    - null vector / null element / ragged dims: the distance is NULL, and a
      NULL distance sorts BEFORE any valid one (struct ordering NULLS
      FIRST), ties to the smaller cid — so such rows land on the smallest
      cid with dist NULL;
    - a ragged/null CENTROID therefore wins every row it null-distances;
    - no centroids at all: (NULL cid, NULL dist).
    """
    from kafka_flow_spark.operators.clustering import _assign, quantize_e6

    pts = spark.createDataFrame(
        [(1, [1.0, 1.0]), (2, None), (3, [1.0]), (4, [1.0, None]), (5, [3.0, 3.0])],
        SCHEMA,
    ).select(F.col("vec_id").alias("_id"), quantize_e6("embedding").alias("_xe"))
    got = {
        r["_id"]: (r["cid"], r["_dist"])
        for r in _assign(pts, [(1, [0, 0]), (2, [3000000, 3000000])]).collect()
    }
    assert got == {
        1: (1, 2_000_000_000_000),  # closest to origin, exact int distance
        2: (1, None),  # null vector -> null dist -> NULLS FIRST -> cid 1
        3: (1, None),  # ragged row
        4: (1, None),  # null element
        5: (2, 0),  # exact hit on centroid 2
    }
    one = spark.createDataFrame([(1, [0, 0])], "x BIGINT, e ARRAY<BIGINT>").select(
        F.col("x").alias("_id"), F.col("e").alias("_xe")
    )
    # a ragged centroid's null distance beats a valid one, smaller cid wins
    assert [tuple(r) for r in _assign(one, [(1, [0, 0]), (2, [0])], keep_xe=False).collect()] == [(1, 2, None)]
    assert [tuple(r) for r in _assign(one, [(1, [0]), (2, [5, 5])], keep_xe=False).collect()] == [(1, 1, None)]
    assert [tuple(r) for r in _assign(one, [], keep_xe=False).collect()] == [(1, None, None)]


def test_assign_arrow_fast_slow_paths_agree_across_batches(spark):
    """Vectorized fast path == per-row fallback on uniform data, including
    across Arrow batch boundaries (maxRecordsPerBatch=7 forces several
    batches per partition)."""
    from kafka_flow_spark.operators.clustering import (
        _assign,
        _assign_row_py,
        quantize_e6,
    )

    rows = _blob_rows(n_per=17, dim=6)
    df = spark.createDataFrame(rows, SCHEMA)
    pts = df.select(
        F.col("vec_id").alias("_id"), quantize_e6("embedding").alias("_xe")
    )
    cents = [
        (1, [1_000_000, 0, 0, 0, 0, 0]),
        (2, [0, 1_000_000, 0, 0, 0, 0]),
        (3, [0, 0, 1_000_000, 0, 0, 0]),
    ]
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        got = {
            r["_id"]: (r["cid"], r["_dist"])
            for r in _assign(pts, cents, keep_xe=False).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    xe = {
        i: [math.floor(x * 1_000_000) for x in v] for i, v in rows
    }
    assert got == {i: _assign_row_py(x, cents) for i, x in xe.items()}
