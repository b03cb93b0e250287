"""Measured write-cost of the delta-proportional CDC view path (PERF.md
"Round 9: delta-proportional view writes") — the TRACKED home of the
experiment behind the published numbers (review r9: published measurements
must cite scripts that live in git and re-run).

Shape: a 2M-row CDC base across 1000 groups into a MaterializedAggView with
n_buckets=256; batch 0 is the full snapshot, batches 1-3 are 100-scattered-pk
deltas.  Reports bytes written and bucket-dir count per version — the claim
under test is per-batch bytes ≈ touched_buckets × (|table|/n_buckets), never
|snapshot|.

Usage: python tools/exp_view_write_cost.py [workdir]
(workdir defaults to a fresh temp dir; ~1 min on local[32].)
Prints ONE JSON line: {"snapshot_mb": ..., "deltas": [{"buckets": n,
"mb": ...}, ...]}.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _dir_bytes(root: str) -> int:
    total = 0
    for dirpath, _, files in os.walk(root):
        for f in files:
            total += os.path.getsize(os.path.join(dirpath, f))
    return total


def _bucket_dirs(path: str, version: int, table: str) -> list[str]:
    d = f"{path}/v={version}/{table}"
    return [e.name for e in os.scandir(d) if e.is_dir() and e.name.startswith("_bkt=")]


def main() -> None:
    from pyspark.sql import functions as F

    from kafka_flow_spark.session import get_spark
    from kafka_flow_spark.streaming.materialize import MaterializedAggView

    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="expview_")
    path = f"{workdir}/view"
    spark = get_spark("exp-view-write-cost")
    spark.sparkContext.setLogLevel("ERROR")

    n_rows, n_groups, n_buckets, delta_keys = 2_000_000, 1000, 256, 100
    sink = MaterializedAggView(path, ["k"], "v", row_pk=["pk"], n_buckets=n_buckets)

    base = spark.range(n_rows).select(
        F.col("id").alias("pk"),
        F.concat(F.lit("g"), F.col("id") % n_groups).alias("k"),
        (F.col("id") % 997).cast("double").alias("v"),
        F.lit("added").alias("status"),
    )
    sink(base, 0)
    snapshot_mb = round(_dir_bytes(f"{path}/v=0") / 1e6, 1)

    deltas = []
    for b in range(1, 4):
        # 100 scattered pks (stride keeps them spread over buckets — the
        # worst case short of n_buckets distinct buckets)
        delta = spark.range(delta_keys).select(
            (F.col("id") * 19997 + b).alias("pk"),
            F.concat(F.lit("gX"), F.col("id") % 7).alias("k"),
            (F.col("id") + 100000 * b).cast("double").alias("v"),
            F.lit("changed").alias("status"),
        )
        sink(delta, b)
        v = sink.last_committed(spark)
        deltas.append(
            {
                "buckets": len(_bucket_dirs(path, v, "base")),
                "mb": round(_dir_bytes(f"{path}/v={v}") / 1e6, 1),
            }
        )

    print(
        json.dumps(
            {
                "n_rows": n_rows,
                "n_buckets": n_buckets,
                "delta_keys": delta_keys,
                "snapshot_mb": snapshot_mb,
                "deltas": deltas,
            }
        )
    )


if __name__ == "__main__":
    main()
