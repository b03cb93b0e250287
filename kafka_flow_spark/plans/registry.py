"""Central registry of oracle-gated queries.

Every operator claimed "done" (SURVEY.md §2) registers here with:
- a Spark implementation ``fn(spark, sf_dir) -> DataFrame``
- an equivalent ANSI-SQL oracle string runnable by DuckDB over the same parquet
  tables (``None`` for genuinely non-SQL-expressible ops → driver does a
  rows-only check)
- optionally ``bench=True`` to include it in bench.py's headline set.

Column names are the contract: every computed column is aliased identically in
the Spark plan and the oracle SQL (the driver sorts columns by name and hashes
values).  Aggregate arithmetic is done in DECIMAL on both sides and cast to
DOUBLE at the end, so sums are order-insensitive-exact and hash-identical.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
BENCH: list[str] = []

_LOADED = False


def register(name: str, oracle: str | None = None, bench: bool = False):
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            # duplicate registration silently REPLACED the first function for
            # a whole round once (q_curation_pipeline r5-r6: the rule-gate
            # variant was unreachable and unswept) — fail loudly instead
            raise ValueError(
                f"duplicate query registration: {name!r} is already registered"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        if bench:
            BENCH.append(name)
        return fn

    return deco


def load_all_plans() -> None:
    """Import every plan module so registration side effects run once."""
    global _LOADED
    if _LOADED:
        return
    from kafka_flow_spark.plans import (  # noqa: F401
        events,
        llm,
        media,
        pipeline,
        quality,
        relational,
        search,
        tpch,
        udx,
    )

    _LOADED = True


def all_queries() -> dict[str, QueryFn]:
    load_all_plans()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all_plans()
    return dict(ORACLES)


def bench_queries() -> list[str]:
    load_all_plans()
    return list(BENCH)


def rows_only_queries() -> list[str]:
    """Queries registered WITHOUT an oracle — rows-only BY DESIGN, not by
    omission: trained-quantizer ANN retrieval (q_knn_ivf/ivfpq — k-means
    training has no SQL form; recall-tested in pytest, with the encode/ADC
    arithmetic oracle-gated on grid codebooks via q_pq_codes /
    q_ivfpq_adc_shortlist), trained semantic dedup pairs
    (q_semantic_dedup_pairs — same k-means constraint; the prune contract
    is oracle-gated on sign-bucket cells via q_semantic_dedup), HLL
    estimates (q_approx_distinct_users — sketch internals are
    engine-specific), and iterative BPE training (q_bpe_merges/segment —
    differential-tested against a reference trainer).  q_knn_lsh and
    q_semantic_dedup left this list in r7: seeded hyperplanes are
    deterministic, so both are fully oracle-gated.  A driver correctness
    sampler should expect `no_oracle` for exactly this list and treat it
    as by-design, not failure."""
    load_all_plans()
    return sorted(set(QUERIES) - set(ORACLES))
