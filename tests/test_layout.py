"""Physical-layout contracts: bucketed joins are exchange-free, partitioned
writes prune at the file index, clustering stays map-side.

These pin the WRITE-side scale mechanics (layout.py): at 100 TB the dominant
cost of a fact-fact join is the shuffle, and bucketing is how the engine pays
it once at ingest instead of per query.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_flow_spark.layout import (
    cluster_within_partitions,
    read_bucketed,
    write_bucketed,
    write_partitioned,
)
from kafka_flow_spark.tables import load
from tests.conftest import SF_SMALL


@pytest.fixture()
def no_broadcast(spark):
    """Force shuffle-join planning so the bucket spec (not broadcast) is what
    removes the exchange."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    """Write the two bucketed tables once per module.  The in-memory metastore
    forgets tables between pytest sessions while their warehouse directories
    survive, so clear both the catalog entry AND any orphaned location first."""
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("t_orders_b", "t_lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    orders = load(spark, SF_SMALL, "orders").select("o_orderkey", "o_orderdate")
    lineitem = load(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "t_orders_b", ["o_orderkey"], 4, sort_cols=["o_orderkey"])
    write_bucketed(lineitem, "t_lineitem_b", ["l_orderkey"], 4, sort_cols=["l_orderkey"])
    return spark


def _executed(df) -> str:
    df.write.mode("overwrite").format("noop").save()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_is_exchange_free(bucketed_tables, no_broadcast):
    spark = no_broadcast
    orders = load(spark, SF_SMALL, "orders").select("o_orderkey", "o_orderdate")
    lineitem = load(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    ob, lb = read_bucketed(spark, "t_orders_b"), read_bucketed(spark, "t_lineitem_b")
    joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey)
    plan = _executed(joined)
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan

    # same rows as the layout-free join
    expected = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).count()
    assert joined.count() == expected


def test_bucketed_aggregation_is_exchange_free(bucketed_tables, no_broadcast):
    spark = no_broadcast
    lb = read_bucketed(spark, "t_lineitem_b")
    agg = lb.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("qty"))
    plan = _executed(agg)
    assert "Exchange" not in plan, f"bucketed agg still shuffles:\n{plan}"
    expected = (
        load(spark, SF_SMALL, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .count()
    )
    assert agg.count() == expected


def test_partitioned_write_prunes_at_file_index(spark, tmp_path):
    ev = load(spark, SF_SMALL, "events").withColumn(
        "day", F.to_date("ts").cast("string")
    )
    path = str(tmp_path / "events_by_day")
    write_partitioned(ev, path, ["day"])

    days = [r.day for r in spark.read.parquet(path).select("day").distinct().collect()]
    target = sorted(days)[0]
    q = spark.read.parquet(path).where(F.col("day") == target)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "day" in plan.split("PartitionFilters")[1][:200]
    # pruned read returns exactly that day's rows
    assert q.count() == ev.where(F.col("day") == target).count()


def test_cluster_within_partitions_no_shuffle(spark):
    l = load(spark, SF_SMALL, "lineitem")
    plan = cluster_within_partitions(l, ["l_shipdate"])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Sort" in plan


def test_write_shards_reproducible_ordered_files(spark, tmp_path):
    """write_shards: one ordered file per shard dir; same salt -> byte-stable
    contents; new salt -> different permutation."""
    import glob
    import pandas as pd

    from kafka_flow_spark.layout import write_shards
    from kafka_flow_spark.tables import load
    from tests.conftest import SF_SMALL

    orders = load(spark, SF_SMALL, "orders").select("o_orderkey").withColumn(
        "_key", F.col("o_orderkey").cast("string")
    )
    p1 = str(tmp_path / "ep0")
    write_shards(orders, "_key", 4, p1, salt="ep0")
    dirs = sorted(glob.glob(p1 + "/shard=*"))
    assert len(dirs) == 4
    total = 0
    for d in dirs:
        files = [f for f in glob.glob(d + "/*.parquet")]
        assert len(files) == 1  # one write task per shard -> one ordered file
        pdf = pd.read_parquet(files[0])
        total += len(pdf)
        assert list(pdf["shard_rank"]) == sorted(pdf["shard_rank"])  # ordered
        assert pdf["shard_rank"].iloc[0] == 1
    assert total == orders.count()
    # reproducibility: same salt -> identical (key, rank) assignment
    p2 = str(tmp_path / "ep0b")
    write_shards(orders, "_key", 4, p2, salt="ep0")
    a = pd.read_parquet(p1).sort_values("_key").reset_index(drop=True)
    b = pd.read_parquet(p2).sort_values("_key").reset_index(drop=True)
    assert a[["_key", "shard_rank"]].equals(b[["_key", "shard_rank"]])
    # a new salt is a different permutation
    p3 = str(tmp_path / "ep1")
    write_shards(orders, "_key", 4, p3, salt="ep1")
    c = pd.read_parquet(p3).sort_values("_key").reset_index(drop=True)
    assert not a[["_key", "shard_rank"]].equals(c[["_key", "shard_rank"]])


def test_write_jsonl_shards_reproducible(spark, tmp_path):
    import gzip
    import json
    import os

    from kafka_flow_spark.layout import write_jsonl_shards
    from kafka_flow_spark.tables import load
    from tests.conftest import SF_SMALL

    docs = load(spark, SF_SMALL, "documents").select("doc_id", "text", "lang")
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_jsonl_shards(docs, "doc_id", 4, out1, salt="epoch0")
    write_jsonl_shards(docs, "doc_id", 4, out2, salt="epoch0")

    def slurp(root):
        shards = {}
        for d in sorted(os.listdir(root)):
            if not d.startswith("shard="):
                continue
            lines = []
            for f in sorted(os.listdir(os.path.join(root, d))):
                if f.endswith(".gz"):
                    with gzip.open(os.path.join(root, d, f), "rt") as fh:
                        lines += fh.read().splitlines()
            shards[d] = lines
        return shards

    a, b = slurp(out1), slurp(out2)
    assert set(a) == {f"shard={i}" for i in range(4)}
    assert a == b  # same salt -> byte-identical shard contents
    total = sum(len(v) for v in a.values())
    assert total == docs.count()
    # payload rows are clean JSON without layout columns
    rec = json.loads(a["shard=0"][0])
    assert set(rec) <= {"doc_id", "text", "lang"} and "shard_rank" not in rec
    # a new salt is a different permutation
    out3 = str(tmp_path / "c")
    write_jsonl_shards(docs, "doc_id", 4, out3, salt="epoch1")
    assert slurp(out3) != a


def test_zorder_write_narrows_every_dimension(spark, tmp_path):
    """Z-order contract, proven from real parquet footers: every output file
    covers a narrow range of EVERY clustered column (so min/max stats prune
    filters on any of them), while a single-key sort leaves the other
    column's per-file span near the full range."""
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from kafka_flow_spark.functions import cents
    from kafka_flow_spark.layout import write_zordered
    from kafka_flow_spark.tables import load
    from tests.conftest import SF_SMALL

    e = load(spark, SF_SMALL, "events").withColumn("vc", cents("value"))

    def spans(path, col):
        lo_g, hi_g = None, None
        file_spans = []
        files = [
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
        ]
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
            file_spans.append((lo, hi))
            lo_g = lo if lo_g is None else min(lo_g, lo)
            hi_g = hi if hi_g is None else max(hi_g, hi)
        full = hi_g - lo_g + 1
        return sum((hi - lo + 1) / full for lo, hi in file_spans) / len(file_spans)

    zpath = str(tmp_path / "z")
    write_zordered(e, zpath, ["user_id", "vc"], bits=10, n_files=16)
    z_user, z_vc = spans(zpath, "user_id"), spans(zpath, "vc")

    spath = str(tmp_path / "s")
    (
        e.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(spath)
    )
    s_user, s_vc = spans(spath, "user_id"), spans(spath, "vc")

    # single-key sort: perfect on its key, near-useless on the other
    # (sf0.001 carries mild user→value correlation; the other-dim span still
    # sits near the full range while z-order more than halves it)
    assert s_user < 0.2 and s_vc > 0.6, (s_user, s_vc)
    # z-order: BOTH dims narrow (16 files = 4 z-bits = 2 bits/dim → ~1/4)
    assert z_user < 0.5 and z_vc < 0.5, (z_user, z_vc)
    # round-trip sanity: same rows
    assert spark.read.parquet(zpath).count() == e.count()


# --- Hilbert clustering key ---------------------------------------------------


def _py_xy2d(bits, x, y):
    d = 0
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        rx = (x >> level) & 1
        ry = (y >> level) & 1
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - y, s - 1 - x
            else:
                x, y = y, x
    return d


def test_hilbert_matches_python_mirror_and_is_bijective(spark):
    import pyspark.sql.functions as F

    from kafka_flow_spark.layout import with_hilbert_value

    bits = 4
    n = 1 << bits
    rows = [(x * n + y, x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "id BIGINT, x BIGINT, y BIGINT")
    got = {
        (r["x"], r["y"]): r["hval"]
        for r in with_hilbert_value(df, F.col("x"), F.col("y"), bits)
        .select("x", "y", "hval")
        .collect()
    }
    assert len(set(got.values())) == n * n  # bijection onto [0, n^2)
    assert set(got.values()) == set(range(n * n))
    for (x, y), h in got.items():
        assert h == _py_xy2d(bits, x, y)
    # THE Hilbert property: consecutive indices are grid-adjacent
    inv = {h: xy for xy, h in got.items()}
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = inv[d], inv[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_hilbert_beats_zorder_on_range_scan_locality(spark):
    """The reason to prefer Hilbert: for a 1-D slice of the keyspace, the
    set of touched curve positions is more contiguous.  Measure: quantize a
    16x16 grid, take the slice x == 7, and compare the SPREAD (max-min) of
    curve values — the proxy for how many clustered files a range scan
    opens.  Not a tight bound, but the ordering must hold."""
    import pyspark.sql.functions as F

    from kafka_flow_spark.layout import with_hilbert_value, zvalue

    bits = 4
    n = 1 << bits
    rows = [(x * n + y, x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "id BIGINT, x BIGINT, y BIGINT")
    h = {
        r["y"]: r["hval"]
        for r in with_hilbert_value(df, F.col("x"), F.col("y"), bits)
        .where(F.col("x") == 7)
        .select("y", "hval")
        .collect()
    }
    z = {
        r["y"]: r["zval"]
        for r in df.where(F.col("x") == 7)
        .select("y", zvalue([F.col("x"), F.col("y")], bits).alias("zval"))
        .collect()
    }
    # number of distinct "runs" when sorting the slice's curve positions and
    # splitting on gaps > 1: fewer runs = fewer file ranges touched
    def runs(vals):
        vs = sorted(vals)
        return 1 + sum(1 for a, b in zip(vs, vs[1:]) if b - a > 1)

    assert runs(h.values()) <= runs(z.values())


def test_compaction_plan_sorted_fill_properties(spark):
    from kafka_flow_spark.layout import compaction_plan

    rows = [("p1", i, s) for i, s in enumerate([90, 80, 40, 30, 20, 10])] + [
        ("p2", 0, 55)
    ]
    df = spark.createDataFrame(rows, "part STRING, fid BIGINT, bytes BIGINT")
    out = compaction_plan(df, ["part"], "bytes", 100).collect()
    by_part = {}
    for r in out:
        by_part.setdefault(r["part"], []).append(r)
    # p1: sorted-fill 90,80,40,30,20,10 -> cum 90,170,210,240,260,270
    # groups (cum-1) div 100 -> 0,1,2,2,2,2
    g = {r["fid"]: r["compaction_group"] for r in by_part["p1"]}
    assert g == {0: 0, 1: 1, 2: 2, 3: 2, 4: 2, 5: 2}
    # every non-final group in a partition carries >= target/2 bytes
    sizes = {}
    for r in by_part["p1"]:
        sizes[r["compaction_group"]] = sizes.get(r["compaction_group"], 0) + r["bytes"]
    last = max(sizes)
    assert all(v >= 50 for k, v in sizes.items() if k != last)
    assert [r["compaction_group"] for r in by_part["p2"]] == [0]


def test_compact_files_collapses_streaming_litter_roundtrip(spark, tmp_path):
    """Execute the plan (layout.compact_files) on a directory littered by the
    streaming parquet sink: per partition the file count collapses to
    ceil(partition_bytes / target) (the plan's group count) and the row
    content round-trips exactly."""
    import math
    import os

    from kafka_flow_spark.layout import compact_files, list_fragments
    from kafka_flow_spark.streaming.flow import run_to_parquet_sink

    src = str(tmp_path / "littered")
    # litter: 6 micro-batches, each appending a tiny file per partition —
    # the exact debris a day of streaming leaves behind
    in_dir, chk = str(tmp_path / "in"), str(tmp_path / "chk")
    for b in range(6):
        spark.createDataFrame(
            [(b * 10 + i, f"p{i % 2}", f"payload-{b}-{i}") for i in range(8)],
            "id BIGINT, part STRING, payload STRING",
        ).coalesce(1).write.mode("append").parquet(in_dir)
        stream = spark.readStream.schema(
            "id BIGINT, part STRING, payload STRING"
        ).parquet(in_dir)
        q = (
            stream.writeStream.format("parquet")
            .outputMode("append")
            .option("path", src)
            .option("checkpointLocation", chk)
            .partitionBy("part")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    frags = list_fragments(spark, src, ["part"]).collect()
    assert len(frags) >= 10  # genuinely littered
    per_part_bytes = {}
    for r in frags:
        per_part_bytes[r["part"]] = per_part_bytes.get(r["part"], 0) + r["bytes"]
    target = max(per_part_bytes.values()) // 2 + 1  # force ~2 groups somewhere

    dst = str(tmp_path / "compacted")
    summary = compact_files(spark, src, dst, target, ["part"])
    # file count per partition == ceil(bytes/target) of the plan's groups
    out_frags = list_fragments(spark, dst, ["part"]).collect()
    per_part_out = {}
    for r in out_frags:
        per_part_out.setdefault(r["part"], []).append(r["path"])
    for part, total in per_part_bytes.items():
        want = math.ceil(total / target)
        assert len(per_part_out[part]) == want, (part, total, target)
    assert summary["dst_files"] == sum(len(v) for v in per_part_out.values())
    assert summary["src_files"] == len(frags)
    # byte-identical row content (same rows, all columns)
    a = sorted(map(tuple, spark.read.parquet(src).collect()))
    b = sorted(map(tuple, spark.read.parquet(dst).collect()))
    assert a == b and len(a) == 48
    # no temporary group dirs survive
    for root, dirs, _ in os.walk(dst):
        assert not any(d.startswith("_cgrp=") for d in dirs)


def test_compact_files_unpartitioned_dir(spark, tmp_path):
    from kafka_flow_spark.layout import compact_files, list_fragments

    src = str(tmp_path / "src")
    for b in range(5):
        spark.createDataFrame(
            [(b, i) for i in range(100)], "b BIGINT, i BIGINT"
        ).coalesce(1).write.mode("append").parquet(src)
    total = sum(r["bytes"] for r in list_fragments(spark, src).collect())
    dst = str(tmp_path / "dst")
    summary = compact_files(spark, src, dst, total + 1)  # everything: 1 file
    assert summary["dst_files"] == 1
    assert sorted(map(tuple, spark.read.parquet(dst).collect())) == sorted(
        map(tuple, spark.read.parquet(src).collect())
    )


def test_compact_files_authority_form_uri_and_canonicalizer(spark, tmp_path):
    """src/dst given in ``file://`` authority form must compact identically —
    the listing↔scan fragment match goes through Hadoop's Path.toUri
    canonicalizer, not a local-scheme-only regex (review r8)."""
    from kafka_flow_spark.layout import _canon_uri, compact_files

    # the canonicalizer itself: every rendering of the same file collapses
    assert (
        _canon_uri(spark, "file:/x/y.parquet")
        == _canon_uri(spark, "file:///x/y.parquet")
        == _canon_uri(spark, "/x/y.parquet")
    )
    src = str(tmp_path / "src")
    for b in range(4):
        spark.createDataFrame(
            [(b, i) for i in range(50)], "b BIGINT, i BIGINT"
        ).coalesce(1).write.mode("append").parquet(src)
    dst = str(tmp_path / "dst")
    summary = compact_files(spark, f"file://{src}", f"file://{dst}", 10**9)
    assert summary["dst_files"] == 1 and summary["rows"] == 200
    assert sorted(map(tuple, spark.read.parquet(dst).collect())) == sorted(
        map(tuple, spark.read.parquet(src).collect())
    )


def test_compact_files_refuses_on_fragment_mismatch_before_write(
    spark, tmp_path, monkeypatch
):
    """A plan fragment the scan never reports (URI mismatch, concurrent
    writer) must abort BEFORE the rewrite — not after paying the full write
    (review r8)."""
    import pytest as _pytest

    import kafka_flow_spark.layout as layout

    src = str(tmp_path / "src")
    spark.createDataFrame([(1, 2)], "a BIGINT, b BIGINT").write.parquet(src)
    real = layout.list_fragments

    def with_phantom(spark_, src_dir, part_cols=None):
        frags = real(spark_, src_dir, part_cols)
        phantom = spark_.createDataFrame(
            [("file:///nowhere/phantom.parquet", 123)], "path STRING, bytes BIGINT"
        )
        return frags.unionByName(phantom)

    monkeypatch.setattr(layout, "list_fragments", with_phantom)
    dst = str(tmp_path / "dst")
    with _pytest.raises(RuntimeError, match="listing and scan disagree"):
        layout.compact_files(spark, src, dst, 10**9)
    import os

    assert not os.path.exists(dst)  # nothing was written


def test_compaction_plan_rejects_bad_target(spark):
    import pytest as _pytest

    from kafka_flow_spark.layout import compaction_plan

    df = spark.createDataFrame([("a", 1, 10)], "part STRING, fid BIGINT, bytes BIGINT")
    with _pytest.raises(ValueError, match="target_bytes"):
        compaction_plan(df, ["part"], "bytes", 0)
