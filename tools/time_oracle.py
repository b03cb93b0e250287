"""Time the DuckDB oracle SQL for the bench's comparable queries at a given
sf dir — the same-engine-same-data counterpart of bench.py (min of 3 warm
runs, all cores).  Quadratic-oracle queries (minhash/cosine/knn brute force
truths) are excluded exactly as in PERF.md's comparison methodology.

Usage: python tools/time_oracle.py [sf_dir] > duck.json
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from kafka_flow_spark.plans.registry import all_oracles
from kafka_flow_spark.tables import TABLE_NAMES

COMPARABLE = [
    "q_fold_running_totals",
    "q_asof_purchase_click",
    "q_dedup_exact",
    "q_text_stats",
    "q_hash_sample",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q_broadcast_brand_qty",
    "q_window_top_orders_per_customer",
    # joined the bench set in r5: zero-shuffle Spark scan vs explode+groupBy
    # oracle — practical to re-time (oracle ~30 s at sf10, sub-second below)
    "q_repetition_stats",
    # joined the bench set in r6: DSIR importance resampling — its oracle is
    # a full SQL mirror (two hashed-bigram passes), practical at sf10
    "q_dsir_sample",
    # joined in r6 close-out: model-based quality filtering + SCD2 history —
    # both full SQL mirrors, practical at every scale
    "q_quality_classifier",
    "q_scd2_history",
    # joined the bench set in r9: url canonicalization — the oracle is the
    # literal same regexp chain (RE2 vs java.util.regex), scan-speed both ways
    "q_url_canonicalize",
    # joined in r10 (review r9 #6: bench rows with full oracles deserve
    # oracle timings): quantized Lloyd k-means (unrolled-CTE oracle, 2.0 s
    # at sf10), interpolated LM perplexity (6.5 s), Gopher/C4 rule gate
    # (4.0 s) — all practical at every scale
    "q_kmeans_cells",
    "q_lm_perplexity_interp",
    "q_quality_rules",
    # joined in r10: MMR diversity re-ranking — its oracle is the full
    # 3-round greedy CTE mirror (~36 s at sf10: the 20-query × corpus
    # cosine pool, linear not quadratic, so it stays re-runnable)
    "q_mmr_rerank",
    # joined in r11: MMR over the IVF-probed pool — oracle = kmeans CTEs +
    # probe shortlist + the shared greedy chain, practical at every scale
    "q_mmr_rerank_ivf",
    # joined in r12: content-addressed media dedup — the oracle is the same
    # sha256-of-payload hash-aggregate, scan-speed both ways
    "q_media_dedup_exact",
    # q_dedup_incremental (bench r5 continuation) is NOT here: like
    # minhash/cosine/knn its oracle is the quadratic brute-force pair truth.
    # q_resample_ffill_hourly is deliberately NOT here: its oracle SQL (per-key
    # hour grid x as-of fill) costs 140+ s per run at sf10, so including it
    # makes this tool impractical to re-run and would break comparability of
    # DUCK_sf*.json with the 10-query subtotals in PERF.md.  Its head-to-head
    # (Spark 0.38x at sf1, ~0.07x at sf10) is recorded in PERF.md's
    # supplementary section.
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    oracles = all_oracles()
    con = duckdb.connect()
    con.execute(f"SET threads = {os.cpu_count() or 8}")
    for name in TABLE_NAMES:
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    timings: dict[str, float] = {}
    for q in COMPARABLE:
        sql = oracles[q]
        con.sql(sql).fetchall()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            con.sql(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[q] = round(best, 3)
    print(
        json.dumps(
            {
                "engine": f"duckdb-{duckdb.__version__}",
                "sf_dir": sf_dir,
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
            }
        )
    )


if __name__ == "__main__":
    main()
