"""Floor decomposition of q_broadcast_brand_qty vs the DuckDB oracle — the
TRACKED home of the measurements behind PERF.md's "engine-constant gap"
analysis (review r9: published numbers must cite scripts that live in git
and re-run).  Replaces the gitignored _exp/exp_brand_sf10_r9.py /
exp_brand_floor_r9.py / exp_brand_dict_r9.py trio with one script.

Methodology (the warm+interleaved rule): both engines' inputs are pre-read
once (OS page cache warm for all tables the query touches), then Spark and
DuckDB runs INTERLEAVE and each side reports min-of-N — the same floor
methodology that exposed the r8 "session noise" theory as drift.

Variants measured on the Spark side:
  scan_agg   — lineitem scan + global sum/count, no grouping (scan floor)
  group_agg  — 25-group agg on pmod(l_partkey, 25), NO join (agg floor)
  query      — the registered plan (broadcast join + 25-group agg)
  dict       — tinyint-dictionary broadcast payload (brand id instead of
               string; rejected alternative kept re-runnable)
  preagg     — partial-agg lineitem by partkey before the join (rejected r11)
  bucketed   — BOTH sides pre-bucketed+sorted by partkey (layout.py
               write_bucketed), exchange-free zipper (sort-merge) join —
               tests whether the broadcast hash-probe constant is avoidable
               by LAYOUT rather than plan (r11 verdict #3, the last
               untried alternative).  The one-time bucketed write is NOT
               timed: it is the layout cost, amortized over every query on
               the table.

Usage: python tools/exp_brand_floor.py [sf_dir] [runs]
(default _scaled/sf10 — generate with tools/scale_testdata.py; 5 interleaved
runs; ~3 min warm at sf10.)  Prints ONE JSON line with min/median per
variant + duckdb.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import duckdb
    from pyspark.sql import functions as F

    from kafka_flow_spark.plans.registry import all_oracles, all_queries
    from kafka_flow_spark.session import get_spark
    from kafka_flow_spark.tables import load

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else f"{repo}/_scaled/sf10"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    spark = get_spark("exp-brand-floor")
    spark.sparkContext.setLogLevel("ERROR")

    # warm: pre-read every table the query touches, BOTH engines
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    l.select("l_partkey", "l_quantity").write.format("noop").mode("overwrite").save()
    p.select("p_partkey", "p_brand").write.format("noop").mode("overwrite").save()
    con = duckdb.connect()
    for t in ("lineitem", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracle_sql = all_oracles()["q_broadcast_brand_qty"]
    con.execute(oracle_sql).fetchall()  # duckdb warm pass

    def spark_run(df_builder) -> float:
        t0 = time.perf_counter()
        df_builder().write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    query = all_queries()["q_broadcast_brand_qty"]
    brands = p.select("p_brand").distinct()
    brand_ids = brands.select(
        "p_brand",
        (F.dense_rank().over(__import__("pyspark").sql.window.Window.orderBy("p_brand")) - 1)
        .cast("tinyint")
        .alias("_bid"),
    )

    def dict_variant():
        pd_ = p.select("p_partkey", "p_brand").join(F.broadcast(brand_ids), "p_brand")
        probe = l.join(
            F.broadcast(pd_.select("p_partkey", "_bid")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        agg = probe.groupBy("_bid").agg(
            F.sum("l_quantity").alias("sum_qty"), F.count("*").alias("n_items")
        )
        return agg.join(F.broadcast(brand_ids), "_bid").select(
            "p_brand", "sum_qty", "n_items"
        )

    def preagg_variant():
        # r11 rejected alternative: partial-agg lineitem by l_partkey (200k
        # groups) BEFORE the broadcast join — measured 3.1 s vs the probe
        # plan's 2.0 s at sf10: the 200k-entry hash-agg over 60M rows costs
        # more than the hash probe it replaces (the probe's 25-group agg is
        # nearly free).  Kept re-runnable.
        pre = l.groupBy("l_partkey").agg(
            F.sum("l_quantity").alias("_q"), F.count(F.lit(1)).alias("_n")
        )
        j = pre.join(
            F.broadcast(p.select("p_partkey", "p_brand")),
            pre["l_partkey"] == F.col("p_partkey"),
        )
        return j.groupBy("p_brand").agg(
            F.sum("_q").alias("sum_qty"), F.sum("_n").alias("n_items")
        )

    # one-time bucketed layout (NOT timed — the amortized layout cost):
    # both sides bucketed AND sorted by partkey with the same count, so the
    # join is a zipper merge with no exchange and no sort
    from kafka_flow_spark.layout import read_bucketed, write_bucketed

    n_bkt = 32
    for tbl in ("exp_brand_l_bkt", "exp_brand_p_bkt"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    write_bucketed(
        l.select("l_partkey", "l_quantity"),
        "exp_brand_l_bkt", ["l_partkey"], n_bkt, sort_cols=["l_partkey"],
    )
    write_bucketed(
        p.select("p_partkey", "p_brand"),
        "exp_brand_p_bkt", ["p_partkey"], n_bkt, sort_cols=["p_partkey"],
    )

    def bucketed_variant():
        lb = read_bucketed(spark, "exp_brand_l_bkt")
        pb = read_bucketed(spark, "exp_brand_p_bkt")
        j = lb.hint("merge").join(pb, lb["l_partkey"] == pb["p_partkey"])
        return j.groupBy("p_brand").agg(
            F.sum("l_quantity").alias("sum_qty"), F.count("*").alias("n_items")
        )

    variants = {
        "scan_agg": lambda: l.agg(
            F.sum("l_quantity").alias("s"), F.count("*").alias("n")
        ),
        "group_agg": lambda: l.groupBy(F.pmod("l_partkey", F.lit(25)).alias("g")).agg(
            F.sum("l_quantity").alias("s"), F.count("*").alias("n")
        ),
        "query": lambda: query(spark, sf_dir),
        "dict": dict_variant,
        "preagg": preagg_variant,
        "bucketed": bucketed_variant,
    }

    times: dict[str, list[float]] = {k: [] for k in variants}
    times["duckdb"] = []
    for _ in range(runs):  # interleaved: one round per engine per variant
        for name, builder in variants.items():
            times[name].append(spark_run(builder))
        t0 = time.perf_counter()
        con.execute(oracle_sql).fetchall()
        times["duckdb"].append(time.perf_counter() - t0)

    out = {
        name: {
            "min": round(min(ts), 3),
            "median": round(statistics.median(ts), 3),
        }
        for name, ts in times.items()
    }
    out["sf_dir"] = sf_dir
    out["runs"] = runs
    print(json.dumps(out))


if __name__ == "__main__":
    main()
