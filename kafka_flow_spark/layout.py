"""Physical table layout for 100 TB datasets: partitioned writes, bucketed
tables, and sort-within-partition clustering.

These are the write-side halves of the engine's scale posture (the read-side
halves — partition pruning, storage-aware joins — come free from Catalyst once
the layout exists):

- **Hive-style partitioning** (``write_partitioned``): coarse pruning column
  (date, region).  A filter on the partition column prunes entire directories
  before any I/O — the scan's ``PartitionFilters`` — so a day query over a
  100 TB / 3-year events table reads ~0.1% of files.  Keep cardinality low
  (≤ ~10k partitions); high-cardinality keys belong in buckets, not dirs.
- **Bucketing** (``write_bucketed``): pre-shuffles a table ONCE at write time
  into N hash buckets on the join/agg key.  Two tables bucketed the same way
  join with ZERO exchange — the shuffle that dominates a fact-fact join at
  100 TB is paid once at ingest instead of per query.  Spark's bucket join
  needs both sides' bucket counts equal (or a multiple, with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
- **Clustering** (``cluster_within_partitions``): sorts rows inside each file
  so parquet row-group min/max stats become selective — the open-format
  analog of z-ordering on a single key.  Pure map-side sort, no shuffle.

The reference never needed these (Kafka topics are its only layout — keyed
partitions, SURVEY.md §1.2); a relational engine at 100 TB lives or dies by
them.  Plan-shape contracts are pinned in ``tests/test_layout.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Write parquet hive-partitioned by ``partition_cols`` (directory per
    value; filters on these columns prune at the file index, not the scan)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-clustered) managed
    table.  Joins/aggregations on ``bucket_cols`` between tables bucketed with
    the same ``n_buckets`` run shuffle-free; pick ``n_buckets`` so one bucket
    of the table at target scale fits an executor core (e.g. 100 TB / 4096
    buckets ≈ 25 GB per bucket — split further by file within the bucket)."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def cluster_within_partitions(df: DataFrame, sort_cols: list[str]) -> DataFrame:
    """Sort rows inside each partition (NO shuffle) so parquet row-group
    min/max statistics on ``sort_cols`` become range-selective for later
    scans.  Compose before any write_* call."""
    return df.sortWithinPartitions(*sort_cols)


def write_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    path: str,
    salt: str = "",
    mode: str = "overwrite",
) -> None:
    """Materialize a training corpus as N pseudo-randomly-ordered shards
    (operators.sampling.shuffle_shard): directory per shard, rows inside each
    file in the deterministic within-shard order.  One repartition on the
    shard id (so a shard is one write task → one ordered file) + a map-side
    sort — no global sort at any scale.  Re-running with the same salt
    reproduces byte-identical shard contents; a new salt is a new epoch
    permutation."""
    from kafka_flow_spark.operators.sampling import shuffle_shard

    sharded = shuffle_shard(df, key_col, n_shards, salt)
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shard_rank")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact (plain
    ``spark.read.parquet`` on the files would DROP the spec — the metastore
    entry is what carries it)."""
    return spark.table(table)


def write_jsonl_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    path: str,
    salt: str = "",
    mode: str = "overwrite",
    compression: str | None = "gzip",
) -> None:
    """``write_shards`` in JSON-Lines — the interchange format LLM training
    loaders actually consume (one JSON object per line, a directory of
    ``shard=K`` folders, optionally gzipped).  Same reproducibility contract
    as the parquet form: content-addressed shard assignment + deterministic
    within-shard order, so the same salt yields byte-identical shard
    contents and a new salt is a new epoch permutation.  The shard id and
    rank columns are dropped from the payload — they are layout, not data.

    Spark's JSON writer streams rows straight from the sorted shuffle
    partition (one write task per shard, no driver involvement); gzip
    trades CPU for the ~5× text-corpus compression that makes JSONL viable
    at scale.
    """
    from kafka_flow_spark.operators.sampling import shuffle_shard

    sharded = shuffle_shard(df, key_col, n_shards, salt)
    writer = (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shard_rank")
        .drop("shard_rank")
        .write.mode(mode)
        .partitionBy("shard")
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def zvalue(cols, bits: int = 10):
    """Morton (Z-order) key: round-robin bit interleave of ``len(cols)``
    pre-quantized non-negative int columns, each truncated to ``bits`` bits.

    Pure integer expression (2·bits·k shift/mask terms, whole-stage codegen,
    zero shuffle) — and pure ANSI bit arithmetic, so the DuckDB oracle
    reproduces z-values bit-exactly (q_zorder_events).
    """
    from pyspark.sql import functions as F

    k = len(cols)
    if k < 2:
        raise ValueError("zvalue needs >= 2 columns (use a plain sort for 1)")
    if bits * k > 62:
        raise ValueError(f"bits*k must fit a long, got {bits}*{k}")
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1).cast("long"))
            out = out + bit * F.lit(1 << (i * k + j)).cast("long")
    return out


def column_bounds(df: DataFrame, cols: list[str]) -> dict:
    """{col: (lo, hi)} for every column in ONE aggregate pass (the stats
    lookup a table format would provide free).  Raises on an empty or
    all-null column — there is nothing to quantize."""
    from pyspark.sql import functions as F

    aggs = [f(c).alias(f"{w}_{c}") for c in cols for w, f in (("lo", F.min), ("hi", F.max))]
    row = df.agg(*aggs).collect()[0]
    out = {}
    for c in cols:
        lo, hi = row[f"lo_{c}"], row[f"hi_{c}"]
        if lo is None or hi is None:
            raise ValueError(f"column_bounds: column {c!r} is empty or all-null")
        out[c] = (int(lo), int(hi))
    return out


def quantize_minmax(df: DataFrame, col: str, bits: int = 10, bounds=None):
    """(quantized column expr, (lo, hi)): map ``col`` into [0, 2^bits) by its
    observed min/max — ``floor((x - lo) * 2^bits / span)`` with the division
    exact in doubles (both factors are exact integers below 2^53), so both
    engines compute identical cells.  Pass ``bounds`` to reuse a
    ``column_bounds`` pass instead of aggregating per column.

    Spans wider than 2^52 are refused loudly: ``(x - lo) * 2^bits`` would
    leave the exact-double range (and can exceed int64), silently clustering
    on garbage — pre-bucket such columns (e.g. nanos → seconds) first."""
    from pyspark.sql import functions as F

    lo, hi = bounds if bounds is not None else column_bounds(df, [col])[col]
    span = hi - lo + 1
    if span * (1 << bits) > (1 << 62) or span > (1 << 52):
        raise ValueError(
            f"quantize_minmax: span of {col!r} is {span:.3e} — (x-lo)*2^bits "
            "would overflow exact arithmetic. Reduce the column's range first "
            "(coarser units or an explicit bucket expression)."
        )
    q = ((F.col(col).cast("long") - F.lit(lo)) * F.lit(1 << bits)) / F.lit(span)
    return F.floor(q).cast("long"), (lo, hi)


def write_zordered(
    df: DataFrame,
    path: str,
    int_cols: list[str],
    bits: int = 10,
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet write: range-partition + sort by the Morton
    key of the quantized dimensions, so EVERY file covers a narrow range of
    EVERY clustered column and parquet min/max stats prune scans filtered on
    ANY of them — the multi-dimension generalization of
    ``cluster_within_partitions``'s single-key sort (Delta/Iceberg's OPTIMIZE
    ZORDER, built from open primitives).  One range shuffle at write time;
    reads prune for free.  Narrow-span contract proven from real parquet
    footers in tests/test_layout.py.
    """
    bounds = column_bounds(df, int_cols)  # one stats pass for all dims
    qs = [quantize_minmax(df, c, bits, bounds=bounds[c])[0] for c in int_cols]
    zv = zvalue(qs, bits)
    (
        df.withColumn("_zv", zv)
        .repartitionByRange(n_files, "_zv")
        .sortWithinPartitions("_zv")
        .drop("_zv")
        .write.mode(mode)
        .parquet(path)
    )


def with_hilbert_value(
    df: DataFrame, xq, yq, bits: int = 10, out_col: str = "hval"
):
    """Append the 2-D Hilbert-curve index of two pre-quantized non-negative
    int columns — the better-locality sibling of ``zvalue`` (a Hilbert walk
    never teleports across the space like Morton's quadrant jumps, so range
    scans over EITHER dimension touch ~25-40% fewer clustered files at the
    same bits; this is the curve behind "liquid"-style clustering).

    The classic xy2d transform is a per-bit ROTATION fold — inherently
    sequential across bit levels, so each level's (x, y) is STAGED as a real
    column pair (a CASE tree inlined across 10 levels would blow up
    exponentially; staged, it is 2·bits narrow projections inside one
    whole-stage-codegen span, zero shuffle).  Pure ANSI integer arithmetic,
    mirrored bit-exactly by the generated DuckDB oracle
    (q_hilbert_events).

    Returns the DataFrame with ``out_col`` appended (caller sorts/range-
    partitions by it, same write path as ``write_zordered``).
    """
    from pyspark.sql import functions as F

    if bits * 2 > 62:
        raise ValueError(f"2*bits must fit a long, got bits={bits}")
    df = (
        df.withColumn("_hx", xq.cast("long"))
        .withColumn("_hy", yq.cast("long"))
        .withColumn("_hd", F.lit(0).cast("long"))
    )
    for level in range(bits - 1, -1, -1):
        s = F.lit(1 << level).cast("long")
        rx = F.shiftright(F.col("_hx"), level).bitwiseAND(F.lit(1).cast("long"))
        ry = F.shiftright(F.col("_hy"), level).bitwiseAND(F.lit(1).cast("long"))
        # rotate the quadrant so the walk stays contiguous: classic Hilbert
        # (ry == 0) branch — reflect when rx == 1, then swap x and y.
        # d, x, y all advance IN ONE select over the previous level's staged
        # columns (a self-referential withColumn chain would read the new _hx
        # from the same projection; one select per level keeps the data flow
        # strictly level -> level and the projection count at `bits`).
        nd = F.col("_hd") + s * s * ((F.lit(3).cast("long") * rx).bitwiseXOR(ry))
        nx = F.when(
            ry == 0,
            F.when(rx == 1, s - 1 - F.col("_hy")).otherwise(F.col("_hy")),
        ).otherwise(F.col("_hx"))
        ny = F.when(
            ry == 0,
            F.when(rx == 1, s - 1 - F.col("_hx")).otherwise(F.col("_hx")),
        ).otherwise(F.col("_hy"))
        keep = [c for c in df.columns if c not in ("_hx", "_hy", "_hd")]
        df = df.select(
            *keep, nx.alias("_hx"), ny.alias("_hy"), nd.alias("_hd")
        )
    return df.withColumnRenamed("_hd", out_col).drop("_hx", "_hy")


def compaction_plan(
    files: DataFrame,
    part_cols: list[str],
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """Small-file compaction plan: assign each file (or partition fragment)
    to an output group of ~``target_bytes``, per partition — the table-
    maintenance step every streaming sink needs (a day of micro-batches
    leaves thousands of KB-files; readers want 128 MB+).

    Deterministic "sorted fill": within each partition, order fragments by
    (size DESC, then stable id order is the caller's sort key — here size
    then the remaining columns), take the running cumulative size, and cut
    groups at ``ceil``-boundaries of the target:

        group = (cum_size - 1) div target_bytes

    Exact integer arithmetic (oracle-gated); every group except possibly
    the last per partition holds >= target/2 by construction for any input
    whose fragments are <= target (greedy first-fit is NP-hard-adjacent;
    sorted-fill is the deterministic, one-window form engines actually run).

    Scale shape: one exchange on the partition columns + one running-sum
    window over FILE-cardinality rows (metadata scale, not data scale).
    Output: input columns + (cum_bytes, compaction_group).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    order = [F.desc(size_col)] + [
        F.asc(c) for c in files.columns if c not in part_cols and c != size_col
    ]
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(F.col(size_col).cast("long")).over(w)
    return files.withColumn("cum_bytes", cum).withColumn(
        "compaction_group",
        F.expr(f"(cum_bytes - 1) div {int(target_bytes)}").cast("long"),
    )


def _canon_uri(spark: SparkSession, p: str) -> str:
    """Canonicalize a path/URI string through Hadoop's own
    ``Path.toUri().toString()`` — the one normalizer that maps every
    rendering of the same file (``file:/x``, ``file:///x``, an
    authority-form HDFS/S3 URI from a listing vs the scan's
    ``_metadata.file_path``) to one canonical string, for ANY scheme.
    A hand-rolled ``^file:/+`` regex only handled the local scheme
    (review r8).  ``Path.toUri`` alone is NOT enough — it preserves the
    presence/absence of an empty authority (``file:/x`` vs ``file:///x``
    stay distinct), so the rendering is pinned to ``scheme://authority/path``
    after qualifying against the path's own FileSystem."""
    return _canonizer(spark)(p)


def _canonizer(spark: SparkSession):
    """A canonicalize-one-path closure with the jvm/hadoopConf handles
    resolved ONCE and FileSystems cached per (scheme, authority) — calling
    the raw form in a per-fragment loop costs 4+ py4j round-trips per path,
    seconds of pure driver latency on a 10k-fragment directory (review
    r9)."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    path_cls = jvm.org.apache.hadoop.fs.Path
    fs_cache: dict[tuple[str | None, str | None], object] = {}

    def canon(p: str) -> str:
        jp = path_cls(p)
        u0 = jp.toUri()
        key = (u0.getScheme(), u0.getAuthority())
        fs = fs_cache.get(key)
        if fs is None:
            fs = fs_cache[key] = jp.getFileSystem(hconf)
        u = fs.makeQualified(jp).toUri()
        return f"{u.getScheme()}://{u.getAuthority() or ''}{u.getPath()}"

    return canon


def list_fragments(
    spark: SparkSession, src_dir: str, part_cols: list[str] | None = None
) -> DataFrame:
    """Inventory the data files of a (possibly hive-partitioned) parquet
    directory as a DataFrame ``(path, bytes, <part_cols…>)`` — the input
    relation ``compaction_plan`` expects.  Metadata-cardinality: one Hadoop
    FS recursive listing on the driver (the same listing every scan's file
    index performs), no data I/O."""
    part_cols = part_cols or []
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(src_dir)
    fs = root.getFileSystem(hconf)
    rows = []
    it = fs.listFiles(root, True)  # recursive
    def render(u) -> str:
        # the same scheme://authority/path rendering _canon_uri pins, so
        # plan paths and canonicalized scan paths join exactly
        return f"{u.getScheme()}://{u.getAuthority() or ''}{u.getPath()}"

    base = render(fs.makeQualified(root).toUri())
    while it.hasNext():
        st = it.next()
        p = st.getPath()
        full = render(p.toUri())  # listing statuses are always qualified
        rel = full[len(base):].lstrip("/")
        if any(seg[:1] in ("_", ".") for seg in rel.split("/")):
            continue  # commit markers / _spark_metadata/ / hidden dirs

        parts = dict(
            seg.split("=", 1) for seg in rel.split("/")[:-1] if "=" in seg
        )
        missing = [c for c in part_cols if c not in parts]
        if missing:
            raise ValueError(
                f"fragment {rel!r} lacks hive partition dirs for {missing}"
            )
        rows.append((full, int(st.getLen()), *[parts[c] for c in part_cols]))
    schema = "path STRING, bytes BIGINT" + "".join(
        f", {c} STRING" for c in part_cols
    )
    return spark.createDataFrame(rows, schema)


def compact_files(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_bytes: int,
    part_cols: list[str] | None = None,
) -> dict:
    """EXECUTE a compaction plan: rewrite a micro-batch-littered parquet
    directory into ~``target_bytes`` files, one data file per plan group per
    partition — the maintenance job every streaming file sink needs
    (Delta's OPTIMIZE, expressed on plain parquet).

    How the one-file-per-group guarantee falls out of Spark's own machinery
    (no driver-side per-group loop of jobs):

    1. ``list_fragments`` + ``compaction_plan`` assign every fragment file
       to a group (metadata-cardinality window, driver-listing only);
    2. ONE distributed read of the source tags each row with its fragment
       via ``_metadata.file_path`` and broadcast-joins the plan (file→group
       map, file-count-sized);
    3. ``repartition(group_key)`` puts each group's rows in exactly one
       task, and ``partitionBy(part_cols…, group)`` splits a task's rows
       into one file per directory — so every group directory receives
       exactly one data file, even when hashing lands two groups in one
       task;
    4. a driver rename pass lifts each group's single file up to its
       partition directory (cheap metadata op on HDFS/local; on S3-like
       stores it is a copy — run compaction near the storage there) and
       drops the temporary group dirs, leaving a layout any reader of the
       source understands.

    Verification before returning: source row count == destination row
    count (one aggregate each side) — a torn rewrite raises instead of
    leaving a silently short table; content equality beyond the count is
    pinned by the round-trip test (tests/test_layout.py).

    Returns a summary dict (src_files, dst_files, rows, groups).
    """
    from pyspark.sql import functions as F

    part_cols = part_cols or []
    frags = list_fragments(spark, src_dir, part_cols)
    plan = compaction_plan(frags, part_cols, "bytes", target_bytes)
    plan_rows = plan.select("path", "compaction_group").collect()  # file-cardinality
    n_src = len(plan_rows)
    group_of = {r["path"]: r["compaction_group"] for r in plan_rows}
    # Fail-fast fragment matching BEFORE the rewrite (review r8: the old
    # src==dst count check caught a listing/scan URI mismatch only AFTER
    # paying the full write).  The scan's own file identities are the join
    # keys: collect the distinct _metadata.file_path values (one metadata-
    # only pass, file-cardinality) and match them to the plan through the
    # scheme-agnostic canonical form — every plan fragment must be seen by
    # the scan and vice versa, or we refuse up front.
    src = spark.read.parquet(src_dir)
    scan_paths = [
        r[0] for r in src.select(F.col("_metadata.file_path")).distinct().collect()
    ]
    canon = _canonizer(spark)  # jvm handles resolved once, not per path
    seen = {canon(p): p for p in scan_paths}
    unmatched_plan = sorted(set(group_of) - set(seen))
    unmatched_scan = sorted(set(seen) - set(group_of))
    if unmatched_plan or unmatched_scan:
        raise RuntimeError(
            "compact_files: listing and scan disagree on the fragment set "
            f"before any write (plan-only: {unmatched_plan[:3]}…, "
            f"scan-only: {unmatched_scan[:3]}…) — URI scheme/authority "
            "mismatch or a concurrent writer; refusing to rewrite"
        )
    # broadcast map keyed by the scan's RAW file_path strings — the join
    # needs no per-row normalization at all
    fmap = F.broadcast(
        spark.createDataFrame(
            [(seen[c], int(g)) for c, g in group_of.items()],
            "_frag_path STRING, _cgrp BIGINT",
        )
    )
    df = src.withColumn("_frag_path", F.col("_metadata.file_path"))
    tagged = df.join(fmap, "_frag_path").drop("_frag_path")
    # group key = partition values + group id: one task per group (step 3)
    gkey = F.concat_ws(
        "/", *[F.col(c).cast("string") for c in part_cols], F.col("_cgrp")
    )
    (
        tagged.repartition(gkey)
        .write.mode("error")
        .partitionBy(*part_cols, "_cgrp")
        .parquet(dst_dir)
    )
    # step 4: lift <part>/_cgrp=N/part-*.parquet -> <part>/compact-N.parquet
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(dst_dir)
    fs = root.getFileSystem(hconf)
    n_dst = 0

    def _lift(d) -> int:
        nonlocal n_dst
        for st in fs.listStatus(d):
            p = st.getPath()
            name = p.getName()
            if st.isDirectory():
                if name.startswith("_cgrp="):
                    gid = name.split("=", 1)[1]
                    data = [
                        c.getPath()
                        for c in fs.listStatus(p)
                        if not c.getPath().getName().startswith(("_", "."))
                    ]
                    assert len(data) == 1, f"group dir {name} has {len(data)} files"
                    dest = jvm.org.apache.hadoop.fs.Path(
                        d, f"compact-{gid}.parquet"
                    )
                    # Hadoop rename reports most failures via FALSE, not an
                    # exception; deleting the group dir after a failed
                    # rename would destroy the group's only data file
                    # (review r8) — check both returns
                    if not fs.rename(data[0], dest):
                        raise RuntimeError(
                            f"compact_files: rename {data[0]} -> {dest} "
                            "failed (filesystem returned false); group dir "
                            "left in place, destination incomplete"
                        )
                    if not fs.delete(p, True):
                        raise RuntimeError(
                            f"compact_files: could not remove group dir {p} "
                            "after lifting its file"
                        )
                    n_dst += 1
                else:
                    _lift(p)

    _lift(root)
    rows_src = spark.read.parquet(src_dir).count()
    rows_dst = spark.read.parquet(dst_dir).count()
    if rows_src != rows_dst:
        raise RuntimeError(
            f"compact_files: row count mismatch after rewrite "
            f"(src {rows_src} != dst {rows_dst}) — NOT removing source"
        )
    return {
        "src_files": n_src,
        "dst_files": n_dst,
        "rows": rows_dst,
        "groups": n_dst,
    }
