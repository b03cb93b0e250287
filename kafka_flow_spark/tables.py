"""Loaders for the driver's deterministic TPC-H-ish tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events documents
embeddings — one parquet file each under ``{sf_dir}/{name}.parquet``.

Reads are plain ``spark.read.parquet`` so Catalyst gets full predicate pushdown
and column pruning; never collect or cache *data* here (at 100 TB the scan must
stream).  The DataFrame *handles* are memoized per (session, dir, table): a
handle is only schema + plan, and re-deriving it costs a py4j round trip plus a
parquet footer read per call — pure driver-side constant overhead (measured
0.1–0.5 s per multi-table query), exactly what a catalog amortizes on a real
cluster.  Plan-level reuse shares no execution state, so pushdown/pruning per
query is unaffected.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # the cache lives ON the session object so it dies with the session —
    # no stale handles across session restarts
    handles = spark.__dict__.setdefault("_kfs_table_handles", {})
    key = (sf_dir.rstrip("/"), name)
    cached = handles.get(key)
    if cached is not None:
        return cached
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS).  Version matrix:
        #   Spark 3.x:  the read ERRORS unless nanosAsLong is on; with it the
        #               column arrives as bigint and the branch below converts.
        #   Spark 4.1+: nanosAsLong is a NO-OP — the column reads natively as
        #               timestamp_ntz with ns truncated to µs (identical to
        #               DuckDB's ns→µs cast, so oracles agree) and the bigint
        #               branch below never fires.
        # The conf is runtime-settable and harmless where ignored; set it so
        # load() works in a vanilla externally-built session on either version.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # Spark 3.x path only (see matrix above): TIMESTAMP(NANOS) read as
        # long; truncate to µs — same conversion DuckDB applies for ns→µs.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    handles[key] = df
    return df


def table_bytes(sf_dir: str, name: str) -> int:
    """On-disk size of a table — the same file-level statistic Catalyst's
    relation sizing uses.  Driver-side metadata probe only (no data read);
    returns a huge sentinel when the path is unreadable so size-gated
    broadcast decisions fail SAFE (no hint → planner decides from stats)."""
    path = f"{sf_dir}/{name}.parquet"
    try:
        if os.path.isdir(path):
            return sum(
                os.path.getsize(os.path.join(path, f)) for f in os.listdir(path)
            )
        return os.path.getsize(path)
    except OSError:
        return 1 << 60


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so ``spark.sql`` queries can use them."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
