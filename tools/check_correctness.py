"""Local mirror of the driver's correctness gate at an arbitrary sf dir.

Runs every registered query against its DuckDB oracle (tests/oracle.py compare
semantics: columns sorted by name, rows sorted by value, exact equality) and
prints one summary line per query plus a final tally.  Default sf dir is the
driver's sf0.01.

Usage: python tools/check_correctness.py [sf_dir] [only_prefix]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_flow_spark.cache import release_all
from kafka_flow_spark.plans.registry import all_oracles, all_queries
from kafka_flow_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefix = sys.argv[2] if len(sys.argv) > 2 else ""
    sys.path.insert(0, "tests")
    from oracle import compare, run_oracle

    spark = get_spark("kafka-flow-spark-check")
    spark.sparkContext.setLogLevel("ERROR")
    queries, oracles = all_queries(), all_oracles()
    bad = 0
    for name in sorted(queries):
        if prefix and not name.startswith(prefix):
            continue
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, sf_dir)
            if name in oracles:
                cols, rows = run_oracle(oracles[name], sf_dir)
                problems = compare(df, cols, rows)
            else:
                problems = [] if df.count() >= 0 else ["count failed"]
        except Exception as exc:  # noqa: BLE001 - report and continue
            problems = [f"EXC {type(exc).__name__}: {exc}"[:300]]
        dt = time.perf_counter() - t0
        status = "ok" if not problems else "FAIL"
        tag = "" if name in oracles else " (rows-only)"
        print(f"{status:4} {name}{tag} [{dt:.2f}s] {'; '.join(problems)[:300]}")
        bad += bool(problems)
        release_all()  # free operator-internal scoped persists per query
    print(f"TOTAL: {len([q for q in queries if q.startswith(prefix)])} checked, {bad} failing")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
