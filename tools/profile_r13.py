"""Round-13 profiling harness: time isolated sub-stages of the slow bench
queries at sf0.1 (noop sink, min-of-N, small profile — the exact bench
context) to locate where each query's seconds go before changing anything.

Usage: python tools/profile_r13.py <piece> [piece...]
Pieces: mmr_pool, mmr_full, mmr_ivf, kmeans, pool_only, pairs_only
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from kafka_flow_spark.cache import release_all, scoped_persist
from kafka_flow_spark.session import get_spark
from kafka_flow_spark.tables import load

SF_DIR = "/root/testdata/sf0.1"

EXTRA = {
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.shuffle.partitions": "8",
    "spark.sql.files.openCostInBytes": "131072",
    "spark.shuffle.compress": "false",
    "spark.broadcast.compress": "false",
    "spark.rdd.compress": "false",
    "spark.shuffle.spill.compress": "false",
}


def timed(label, build, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        build().write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
        release_all()
    print(f"{label:40s} {best:7.3f} s")
    return best


def main():
    spark = get_spark("r13-profile", extra_conf=EXTRA)
    spark.sparkContext.setLogLevel("ERROR")
    pieces = sys.argv[1:] or ["mmr"]

    from kafka_flow_spark.plans import registry

    registry.load_all_plans()
    e = load(spark, SF_DIR, "embeddings")

    if "counts" in pieces:
        print("embeddings rows:", e.count())
        print("dims:", len(e.select("embedding").head()[0]))

    if "mmr" in pieces:
        from kafka_flow_spark.functions import cosine
        from kafka_flow_spark.operators.similarity import _as_double

        _MMR_Q = 20  # mirrors plans/llm.py constants
        from kafka_flow_spark.plans import llm as _llm

        _MMR_Q = _llm._MMR_Q
        _MMR_POOL = _llm._MMR_POOL
        q = e.where(F.col("vec_id") < _MMR_Q)

        # stage 0: corpus scan + cosine vs broadcast queries, no top-k
        def sims_only():
            qq = q.select(
                F.col("vec_id").alias("_qid"),
                _as_double(F.col("embedding")).alias("_qv"),
            )
            v = e.select(
                F.col("vec_id").alias("_nid"),
                _as_double(F.col("embedding")).alias("_nv"),
            )
            rel = F.floor(
                cosine(F.col("_qv"), F.col("_nv")) * F.lit(1e6)
            ).cast("long")
            return (
                v.crossJoin(F.broadcast(qq))
                .where(F.col("_nid") != F.col("_qid"))
                .select("_qid", "_nid", rel.alias("_rel"))
            )

        timed("mmr: sims only (no topk)", sims_only)

        # stage 1: pool = top-k window, persisted (as the operator does)
        from pyspark.sql.window import Window

        def pool_noop():
            qq = q.select(
                F.col("vec_id").alias("_qid"),
                _as_double(F.col("embedding")).alias("_qv"),
            )
            v = e.select(
                F.col("vec_id").alias("_nid"),
                _as_double(F.col("embedding")).alias("_nv"),
            )
            rel = F.floor(
                cosine(F.col("_qv"), F.col("_nv")) * F.lit(1e6)
            ).cast("long")
            wp = Window.partitionBy("_qid").orderBy(
                F.desc("_rel"), F.asc("_nid")
            )
            return (
                v.crossJoin(F.broadcast(qq))
                .where(F.col("_nid") != F.col("_qid"))
                .select("_qid", "_nid", "_nv", rel.alias("_rel"))
                .withColumn("_pr", F.row_number().over(wp))
                .where(F.col("_pr") <= _MMR_POOL)
                .drop("_pr")
            )

        timed("mmr: pool (topk, no persist)", pool_noop)

        # staged-norm variant of sims
        def sims_staged_norm():
            from kafka_flow_spark.functions import dot, l2_norm

            qq = q.select(
                F.col("vec_id").alias("_qid"),
                _as_double(F.col("embedding")).alias("_qv"),
            ).withColumn("_qn", l2_norm(F.col("_qv")))
            v = e.select(
                F.col("vec_id").alias("_nid"),
                _as_double(F.col("embedding")).alias("_nv"),
            ).withColumn("_nn", l2_norm(F.col("_nv")))
            cos = dot(F.col("_qv"), F.col("_nv")) / (
                F.col("_qn") * F.col("_nn")
            )
            rel = F.floor(cos * F.lit(1e6)).cast("long")
            return (
                v.crossJoin(F.broadcast(qq))
                .where(F.col("_nid") != F.col("_qid"))
                .select("_qid", "_nid", rel.alias("_rel"))
            )

        timed("mmr: sims staged norms", sims_staged_norm)

        # full operator for reference
        timed(
            "mmr: full q_mmr_rerank",
            lambda: registry.QUERIES["q_mmr_rerank"](spark, SF_DIR),
        )
        timed(
            "mmr_ivf: full q_mmr_rerank_ivf",
            lambda: registry.QUERIES["q_mmr_rerank_ivf"](spark, SF_DIR),
        )

    if "kmeans" in pieces:
        from kafka_flow_spark.operators.clustering import kmeans_quantized

        def km():
            cents, assigned = kmeans_quantized(e, "vec_id", "embedding", 8, 2)
            return assigned

        timed("kmeans: assignments (k=8, iters=2)", km)
        timed(
            "kmeans: full q_kmeans_cells",
            lambda: registry.QUERIES["q_kmeans_cells"](spark, SF_DIR),
        )


if __name__ == "__main__":
    main()
