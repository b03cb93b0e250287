"""Count-min sketch: fixed-memory frequency estimation + heavy hitters.

The mergeable-sketch family beyond the built-ins (HLL via
``approx_count_distinct``, KLL via ``percentile_approx``): a count-min
sketch (Cormode & Muthukrishnan, J.Alg'05) summarizes ANY key-frequency
distribution in ``depth × width`` counters regardless of key cardinality —
the 100 TB shape for "how often does X occur" when the key space (n-grams,
URLs, user ids) is too large to hash-aggregate exactly.

Scale posture: the build is one map-side-combinable aggregate whose shuffle
cardinality is bounded by ``depth × width`` CELLS (not rows, not keys) per
map task — the sketch itself is the only state that moves.  Probes fan each
candidate key to ``depth`` (row, bucket) pairs and take the min cell count:
an equi-join on two small ints.

Hashing is the repo's cross-engine scheme (first 15 hex digits of md5,
seed-prefixed — the same construction the winnowing/simhash oracles
reproduce in DuckDB), so estimates are bit-identical across engines and the
sketch arithmetic is oracle-gated, unlike the rows-only HLL estimates.

No counterpart in the reference (SURVEY.md §7 Phase 4 / §2.2 approx
sketches).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _bucket(col: Column, seed: int, width: int, hash_mode: str = "md5") -> Column:
    """Deterministic bucket in [0, width).

    ``md5``: Horner value of the first 15 md5 hex digits of "seed:value"
    (60 bits — inside long range) mod width — the cross-engine mode the
    DuckDB oracle reproduces (same precedent as the winnowing operator's
    md5 mode).  ``xxhash64``: the fast JVM hash for production sketches
    (~2× cheaper per cell at sf10); pmod keeps the bucket non-negative."""
    if hash_mode == "md5":
        h = F.md5(F.concat_ws(":", F.lit(str(seed)), col.cast("string")))
        return (F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % width).cast("int")
    if hash_mode == "xxhash64":
        return F.pmod(F.xxhash64(F.lit(seed), col), F.lit(width)).cast("int")
    raise ValueError(f"hash_mode must be 'md5' or 'xxhash64', got {hash_mode!r}")


def _cell_fanout(c: Column, depth: int, width: int, hash_mode: str) -> Column:
    """The exploded (r, b) cell stream of a key column — the ONE place the
    sketch's cell addressing lives; build, probe, and the windowed streaming
    form all consume it, so bucket agreement between them is structural."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"), _bucket(c, r, width, hash_mode).alias("b")
                )
                for r in range(depth)
            ]
        )
    )


def cms_build(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    hash_mode: str = "md5",
) -> DataFrame:
    """Build the sketch: (r, b, cnt) cells, at most ``depth × width`` rows.

    One exploded projection + one hash aggregate; partial aggregation caps
    every map task's output at the cell count, so shuffle volume is
    O(depth·width·tasks) — independent of input rows AND key cardinality.
    """
    cells = df.select(
        _cell_fanout(F.col(col), depth, width, hash_mode).alias("_rb")
    ).select("_rb.r", "_rb.b")
    return cells.groupBy("r", "b").agg(F.count("*").alias("cnt"))


def cms_probe(
    sketch: DataFrame,
    keys: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    hash_mode: str = "md5",
) -> DataFrame:
    """Point-query the sketch for each distinct key: est = min over rows of
    the key's bucket count (the classic one-sided ≥-truth estimator).
    Output: (col, est)."""
    probes = (
        keys.select(F.col(col).alias("_v"))
        .distinct()
        .select("_v", _cell_fanout(F.col("_v"), depth, width, hash_mode).alias("_rb"))
        .select("_v", "_rb.r", "_rb.b")
    )
    return (
        probes.join(sketch, ["r", "b"], "left")
        .groupBy("_v")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("est"))
        .select(F.col("_v").alias(col), "est")
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 10,
    depth: int = 4,
    width: int = 1024,
    hash_mode: str = "md5",
) -> DataFrame:
    """Top-k keys by exact count, each with its count-min estimate alongside
    the truth — (col, rank, exact_cnt, cms_est), cms_est ≥ exact_cnt always,
    equality iff no colliding key inflated every one of the key's cells.

    The exact pass is a map-combinable hash aggregate + TakeOrdered top-k
    (this is the candidate generator; production pipelines over unbounded
    key spaces substitute their candidate stream and keep the sketch
    probe).  Ties break toward the smaller key — deterministic across
    engines and partitionings.
    """
    sketch = cms_build(df, col, depth, width, hash_mode)
    exact = df.groupBy(col).agg(F.count("*").alias("exact_cnt"))
    top = exact.orderBy(F.desc("exact_cnt"), F.asc(col)).limit(k)
    w = Window.orderBy(F.desc("exact_cnt"), F.asc(col))  # k rows — one task
    ranked = top.withColumn("rank", F.row_number().over(w))
    est = cms_probe(sketch, ranked.select(col), col, depth, width, hash_mode)
    return ranked.join(F.broadcast(est), col).select(
        col, "rank", "exact_cnt", F.col("est").alias("cms_est")
    )


def windowed_cms(
    records: DataFrame,
    ts_col: str,
    col: str,
    duration: str = "5 minutes",
    depth: int = 4,
    width: int = 1024,
    watermark: str = "0 seconds",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Per-event-time-window count-min cells — the streaming form of
    ``cms_build`` (CMS cells are counters, so the sketch is mergeable and
    drops straight into a watermarked windowed aggregate).

    Works identically on batch and streaming inputs (the streaming state is
    one row per (window, r, b) — at most depth×width rows per open window,
    evicted when the watermark passes).  Downstream, ``cms_probe`` over any
    one window's emitted cells answers per-window frequency queries; batch
    equivalence per window is pinned in tests/test_sketches.py.

    Output: (window_start, window_end, r, b, cnt).
    """
    cells = records.withWatermark(ts_col, watermark).select(
        F.col(ts_col),
        _cell_fanout(F.col(col), depth, width, hash_mode).alias("_rb"),
    )
    agged = cells.groupBy(
        F.window(ts_col, duration).alias("w"), F.col("_rb.r"), F.col("_rb.b")
    ).agg(F.count("*").alias("cnt"))
    return agged.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "r",
        "b",
        "cnt",
    )


def linear_counting_sketch(
    df: DataFrame, group_cols: list[str], value_col: str, m: int = 4096
) -> DataFrame:
    """Linear-counting occupancy sketch (Whang, Vander-Zanden & Taylor,
    TODS 1990): the DISTINCT (group…, bucket) pairs of a content-addressed
    ``m``-bucket hash of ``value_col`` — the approximate-distinct sketch
    whose every bit is engine-reproducible, unlike HLL (whose register
    internals keep q_approx_distinct_users rows-only by design).

    The occupancy SET is the sketch, and it is fully mergeable: the sketch
    of a union is the distinct-union of the shards' sketches (law pinned in
    tests/test_sketches.py) — shards sketch map-side, merge = one distinct.
    Standard-error/size guidance from the paper: load factor n/m up to ~10
    still estimates within ~1–2% (m = n/10 memory), far past HLL accuracy
    at small n; saturation (every bucket hit) returns NULL from the
    estimator rather than +inf.

    Scale shape: one map-side hash projection + one distinct over at most
    |groups|·m rows — group-times-m cardinality from there on, never row
    volume.
    """
    if m < 2:
        raise ValueError(f"m must be >= 2, got {m}")
    from kafka_flow_spark.operators.sampling import hash_bucket

    bucket = F.pmod(
        F.conv(hash_bucket(F.col(value_col).cast("string")), 16, 10).cast("long"),
        F.lit(m),
    )
    # COUNT(DISTINCT) semantics: NULL is not a value — unfiltered, md5(NULL)
    # survives distinct() as a phantom NULL bucket that inflates every
    # estimate and breaks occupied <= m (review r8)
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, bucket.alias("bucket"))
        .distinct()
    )


def linear_counting_estimate(
    sketch: DataFrame, group_cols: list[str], m: int
) -> DataFrame:
    """Finalize a linear-counting sketch: n̂ = m·ln(m/z) with z = m −
    occupied empty buckets, emitted as FLOOR-e6 micro-scaled BIGINT
    (``est_e6``; divide by 1e6 for the estimate) — one double division +
    one ln per GROUP, the house single-division determinism contract, so
    the estimate is value-exact against the SQL mirror.  A saturated group
    (occupied == m, z = 0) yields NULL: the sketch carries no information
    beyond "n ≫ m"; resize m.  Output: (group…, occupied, est_e6)."""
    occ = sketch.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("occupied"))
    est = F.when(
        F.col("occupied") < m,
        F.floor(
            F.lit(float(m))
            * F.log(
                F.lit(float(m)) / (F.lit(m) - F.col("occupied")).cast("double")
            )
            * F.lit(1000000.0)
        ).cast("long"),
    )
    return occ.select(*group_cols, "occupied", est.alias("est_e6"))
