"""Spark-side wall-clock probe of named registry queries at an arbitrary
scale dir — the tracked home of PERF.md's sf100 inversion-trend audit
(review r11 #4: extend the 0.32×@sf10 story one decade and turn any row
whose SHAPE breaks — driver OOM, skew stall — into a defect).

Unlike bench.py (the fixed headline set at the driver's sf0.1), this takes
the query list on the command line so a partial scale dir works: the sf100
fixture generates only the tables the audited families touch
(tools/scale_testdata.py's ``tables_csv`` arg — documents + embeddings;
replicating lineitem would be 14 GB of dead weight for a text/vector
audit).

Methodology: warm pass (noop write, not timed) then min/median of N timed
noop writes per query — same warm+min-of-N floor rule as bench.py and
exp_brand_floor.py.  DuckDB is intentionally absent: at sf100 the unrolled
training oracles (kmeans CTEs over 2M vectors) are intractable, and the
audit question is whether SPARK's plan shape survives the decade, not the
ratio.

Usage: python tools/probe_scale.py <sf_dir> <runs> <query> [<query> ...]
Prints ONE JSON line {query: {"min": s, "median": s}, ...}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 4:
        raise SystemExit(__doc__)
    sf_dir, runs, names = sys.argv[1], int(sys.argv[2]), sys.argv[3:]

    from kafka_flow_spark.plans.registry import all_queries
    from kafka_flow_spark.session import get_spark

    # Probe-only resilience: local[N] embeds maxFailures=1, so ONE flaky
    # Python-worker crash (the intermittent Arrow reader-stall seen ~1-in-8
    # full-query runs at sf100) aborts a multi-hour probe.  local[N,4]
    # matches the cluster default (spark.task.maxFailures=4) — a retried
    # task is re-timed as part of its run, so a genuine slowdown still
    # shows; bench.py keeps the driver-contract master untouched.
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark("probe-scale", extra_conf={"spark.master": f"local[{cpus},4]"})
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown queries {unknown}")

    from kafka_flow_spark.cache import release_all

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        # each run re-registers its scoped persists; release them so
        # repeated timings measure the full query (and the session does not
        # accumulate one cache set per run — at probe scales that
        # accumulation alone can exhaust the local heap)
        release_all()
        return dt

    out: dict = {"sf_dir": sf_dir, "runs": runs}
    for name in names:
        run_once(name)  # warm (page cache + JIT), not timed
        ts = [run_once(name) for _ in range(runs)]
        out[name] = {"min": round(min(ts), 2), "median": round(statistics.median(ts), 2)}
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
