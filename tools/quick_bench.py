"""Min-of-N noop-sink timer for individual registry queries at any scale
dir — the sub-stage isolation harness used throughout optimization round 13
(guide §1.4: time the computation, not the sink; §1.2: isolate before
changing anything).

Differences from bench.py (which stays the driver-contract headline):
takes query names + sf dir on the command line, pins a fixed small-input
profile (AQE off, 8 shuffle partitions, compression off) so run-to-run
plans are byte-stable for A/B work, and rebuilds cache-using queries each
iteration with ``release_all`` so every timed run is the FULL computation.

Usage: python tools/quick_bench.py q_a[,q_b,...] [sf_dir] [runs]
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_flow_spark.cache import release_all
from kafka_flow_spark.plans.registry import all_queries
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
    spark = get_spark("quick-bench", extra_conf=EXTRA)
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    names = sys.argv[1].split(",")
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    for name in names:
        df = qs[name](spark, sf)
        df.write.mode("overwrite").format("noop").save()  # warm, untimed
        checkpointed = "LogicalRDD" in df._jdf.queryExecution().optimizedPlan().toString()
        uses_cache = release_all() > 0 or checkpointed
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            if uses_cache:
                qs[name](spark, sf).write.mode("overwrite").format("noop").save()
            else:
                df.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
            if uses_cache:
                release_all()
        print(f"{name:38s} {best:7.3f} s  (cache={uses_cache})")
        release_all()
        gc.collect()
        spark.sparkContext._jvm.System.gc()


if __name__ == "__main__":
    main()
