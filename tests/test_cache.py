"""cache.scoped_persist: tracked operator caches, harness-releasable."""

from pyspark.sql import functions as F

from kafka_flow_spark import cache


def test_scoped_persist_tracks_and_releases(spark):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    p = cache.scoped_persist(df)
    assert p.storageLevel.useMemory
    assert p.count() == 100
    n = cache.release_all()
    assert n >= 1
    assert not p.storageLevel.useMemory  # back to NONE
    # releasing is safe: the frame recomputes
    assert p.count() == 100
    assert cache.release_all() == 0


def test_operator_persists_are_released(spark):
    """An operator that scoped-persists internally leaves NO cached blocks
    behind after the harness's release_all() (r6 ADVICE leak finding)."""
    from kafka_flow_spark.operators.dedup import simhash_pairs

    df = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " + str(i % 3))
         for i in range(20)],
        "doc_id LONG, text STRING",
    )
    simhash_pairs(df, "doc_id", "text", max_hamming=10).count()
    assert cache.release_all() >= 1
    # nothing tracked remains
    assert cache.release_all() == 0


def test_score_buckets_cache_is_released(spark):
    """score_buckets persists an internally-owned projection.  Spark's cache
    manager is PLAN-keyed, so the caller's identical plan still reads as
    cached while the operator's cache lives (that sharing is how the cache
    works, not a leak) — the contract is that the harness's release_all()
    returns the caller's plan to uncached, which a bare untracked persist()
    never did (r6 ADVICE finding)."""
    from kafka_flow_spark.operators.quality import score_buckets

    df = spark.createDataFrame(
        [(str(i), float(i)) for i in range(40)], "k STRING, s DOUBLE"
    )
    out = score_buckets(df, "s", "k", labels=("lo", "hi"), sample_fraction=1.0)
    out.count()
    assert cache.release_all() >= 1
    assert not df.storageLevel.useMemory
