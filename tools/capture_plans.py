"""Dump ``explain("formatted")`` for bench (or named) queries into
``plans/r<round>/<query>_<suffix>.txt`` — the before/after plan evidence the
optimization rounds commit (guide §1: capture the plan shape — Exchange
count, join strategy, PushedFilters, codegen spans — before and after every
change).

AQE is pinned OFF so Exchange counts are structural (what the optimizer
planned), not runtime-elided; the rest of the fixed profile matches
tools/quick_bench.py so plan text diffs cleanly against its timings.

Usage: python tools/capture_plans.py <round> <suffix> [q_a,q_b,...] [sf_dir]
e.g.:  python tools/capture_plans.py r13 after
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_flow_spark.cache import release_all
from kafka_flow_spark.plans import registry
from kafka_flow_spark.session import get_spark

EXTRA = {
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.shuffle.partitions": "8",
    "spark.sql.files.openCostInBytes": "131072",
    "spark.shuffle.compress": "false",
    "spark.broadcast.compress": "false",
    "spark.rdd.compress": "false",
    "spark.shuffle.spill.compress": "false",
}


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    rnd, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans", extra_conf=EXTRA)
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all_plans()
    for name in names or registry.bench_queries():
        df = registry.QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        release_all()
        print(name, "ok")


if __name__ == "__main__":
    main()
