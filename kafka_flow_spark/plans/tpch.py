"""TPC-H-analog query set 2: Q7-Q22 analogs over the slimmed testdata schema.

The testdata is TPC-H-shaped but slimmed (no partsupp table; lineitem lacks
commitdate/receiptdate/shipmode/shipinstruct; part lacks container/mfgr;
customer lacks phone) — each analog keeps the original query's *plan
challenge* (the operator combination Catalyst must handle) and re-targets the
predicates onto existing columns:

- Q7  two-nation volume join (6-way join, disjunctive nation-pair filter)
- Q8  market share (8-way join, conditional-aggregate ratio)
- Q9  product profit (profit expression across part x lineitem, group by
      nation x year; supplycost replaced by retailprice-based cost)
- Q10 returned-item report (group-by with wide key, top-k)
- Q11 important parts (HAVING against a scalar-subquery total;
      partsupp value replaced by shipped disc-price value)
- Q12 late-shipment priority classes (conditional counts; receipt-late
      replaced by shipdate > orderdate + 60 days)
- Q15 top supplier (aggregate view joined against its own MAX)
- Q16 supplier counts per part group (COUNT DISTINCT + NOT IN subquery)
- Q17 small-quantity revenue (correlated per-part average threshold)
- Q19 disjunctive OR-of-ANDs predicate (pushdown stress)
- Q20 part-promotion suppliers (nested semi-join via grouped HAVING)
- Q21 only-late-supplier on multi-supplier orders (EXISTS + NOT EXISTS)
- Q22 idle customers (anti-join + scalar-subquery threshold)

Scale notes (100 TB rule): every plan is fact-first — the lineitem/orders
fact streams once past size-gated broadcast dims (``_bc``: the hint
disappears when the dim side outgrows the threshold, falling back to
Catalyst stats + AQE).  All money arithmetic runs on unscaled-LONG cents
(functions.cents) so partial aggregation is exact and the final DOUBLE is
bit-identical to the DuckDB oracle's decimal chain.

Reference parity note: kafka-flow has no relational layer (SURVEY.md §2.2);
this module is part of the Spark-native surface that subsumes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flow_spark.functions import cents, csum, unscaled
from kafka_flow_spark.plans.registry import register
from kafka_flow_spark.plans.relational import _bc
from kafka_flow_spark.tables import load

# shared money expressions (unscaled-LONG, see functions.cents)
_DISC4 = "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4))"


def _disc4() -> F.Column:
    return cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))


# --- Q7 analog: two-nation volume shipping ---
@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           EXTRACT(YEAR FROM l_shipdate) AS l_year,
           CAST(SUM({_DISC4}) AS DOUBLE) AS revenue
    FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                  JOIN orders ON o_orderkey = l_orderkey
                  JOIN customer ON c_custkey = o_custkey
                  JOIN nation n1 ON s_nationkey = n1.n_nationkey
                  JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, EXTRACT(YEAR FROM l_shipdate)
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n = load(spark, sf_dir, "nation")
    # nation is fixed-cardinality: resolve names onto supplier/customer first so
    # the big fact only carries two small string columns through the join chain
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(_bc(s, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(_bc(o, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(_bc(c, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(csum(_disc4(), "revenue", scale=4))
    )


# --- Q8 analog: market share of one nation inside a region ---
@register(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_2' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
             {_DISC4} AS volume,
             n2.n_name AS nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders ON o_orderkey = l_orderkey
                JOIN customer ON c_custkey = o_custkey
                JOIN nation n1 ON c_nationkey = n1.n_nationkey
                JOIN region ON n1.n_regionkey = r_regionkey
                JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    # customers restricted to the region: nation ⨝ region prunes first
    c = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    vol4 = _disc4()
    return (
        load(spark, sf_dir, "lineitem")
        .join(_bc(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .join(_bc(s, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            _bc(o.select("o_orderkey", "o_custkey", "o_orderdate"), sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(_bc(c, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                unscaled(
                    F.sum(F.when(F.col("nation") == "NATION_2", vol4).otherwise(F.lit(0))),
                    4,
                )
                / unscaled(F.sum(vol4), 4)
            ).alias("mkt_share")
        )
    )


# --- Q9 analog: product profit by nation x year ---
@register(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS o_year,
           CAST(SUM(CAST({_DISC4} AS DECIMAL(28,4))
                  - CAST(CAST(p_retailprice AS DECIMAL(18,2))
                         * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,4)))
                AS DOUBLE) AS profit
    FROM part JOIN lineitem ON p_partkey = l_partkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN orders ON o_orderkey = l_orderkey
              JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit expression: disc price minus a retailprice-based cost stand-in
    (the slimmed schema has no partsupp.ps_supplycost).  Both terms are exact
    unscaled-LONG at scale 4, so the SUM partial-aggregates exactly."""
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = load(spark, sf_dir, "nation")
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    amount4 = _disc4() - cents("p_retailprice") * cents("l_quantity")
    return (
        load(spark, sf_dir, "lineitem")
        .join(_bc(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .join(_bc(s, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(_bc(o, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(csum(amount4, "profit", scale=4))
    )


# --- Q10 analog: returned-item reporting, top 20 customers ---
@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(SUM({_DISC4}) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer").join(
        F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
    )
    return (
        l.join(
            _bc(o.select("o_orderkey", "o_custkey"), sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            _bc(c.select("c_custkey", "c_name", "c_acctbal", "n_name"), sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(csum(_disc4(), "revenue", scale=4))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --- Q11 analog: important parts by shipped value (HAVING vs scalar total) ---
@register(
    "q11_important_parts",
    oracle=f"""
    SELECT l_partkey, CAST(SUM({_DISC4}) AS DOUBLE) AS part_value
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
    GROUP BY l_partkey
    HAVING CAST(SUM({_DISC4}) AS DOUBLE) >
      (SELECT CAST(SUM({_DISC4}) AS DOUBLE) * 0.001
       FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                     JOIN nation ON s_nationkey = n_nationkey
                     JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = 'EUROPE')
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalar total is a 1-row aggregate cross-joined (auto-broadcast) onto
    the per-part aggregate — the same 2-pass shape the oracle's scalar subquery
    plans to; both passes reuse one filtered join pipeline."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    shipped = load(spark, sf_dir, "lineitem").join(
        _bc(s, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey")
    )
    per_part = shipped.groupBy("l_partkey").agg(csum(_disc4(), "part_value", scale=4))
    total = shipped.agg((unscaled(F.sum(_disc4()), 4) * F.lit(0.001)).alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
    )


# --- Q12 analog: late shipments by priority class ---
@register(
    "q12_late_shipment_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(_bc(o, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --- Q15 analog: top supplier(s) by quarterly revenue ---
@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, CAST(SUM({_DISC4}) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = (
        load(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01"))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(csum(_disc4(), "total_revenue", scale=4))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(_bc(s, sf_dir, "supplier"), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --- Q16 analog: supplier counts per part group, NOT IN subquery ---
@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45' AND p_type <> 'MEDIUM'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        load(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#45")
            & (F.col("p_type") != "MEDIUM")
            & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(_bc(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            _bc(bad_supp, sf_dir, "supplier"),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# --- Q17 analog: small-quantity-order revenue (correlated avg threshold) ---
@register(
    "q17_small_qty_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (
        SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * 0.2 / COUNT(*)
        FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated per-part average is decorrelated into a grouped aggregate
    joined back on partkey — the rewrite Catalyst/DuckDB both apply.  The
    threshold is computed with the identical op order (exact decimal SUM →
    DOUBLE, × 0.2, ÷ count) so the float compare is bit-deterministic."""
    l = load(spark, sf_dir, "lineitem")
    per_part = l.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        ((unscaled(F.sum(cents("l_quantity")), 2) * F.lit(0.2)) / F.count("*")).alias(
            "qty_threshold"
        )
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    return (
        l.join(_bc(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((unscaled(F.sum(cents("l_extendedprice")), 2) / F.lit(7.0)).alias("avg_yearly"))
    )


# --- Q19 analog: disjunctive OR-of-ANDs pushdown ---
@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(SUM({_DISC4}) AS DOUBLE) AS revenue, COUNT(*) AS n_rows
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & (F.col("l_quantity") >= 1)
            & (F.col("l_quantity") <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & (F.col("l_quantity") >= 20)
            & (F.col("l_quantity") <= 30)
        )
    )
    return (
        load(spark, sf_dir, "lineitem")
        .join(_bc(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(csum(_disc4(), "revenue", scale=4), F.count("*").alias("n_rows"))
    )


# --- Q20 analog: suppliers shipping heavy volume of a part family ---
@register(
    "q20_part_promotion_suppliers",
    oracle="""
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_5', 'NATION_6')
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE '%red%'
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 50)
    """,
)
def q20_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select("p_partkey")
    heavy = (
        load(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01"))
        .join(_bc(p, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(cents("l_quantity")).alias("qty_c"))
        .filter(F.col("qty_c") > 50 * 100)
        .select("l_suppkey")
    )
    n = load(spark, sf_dir, "nation").filter(F.col("n_name").isin("NATION_5", "NATION_6"))
    return (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "n_name")
    )


# --- Q21 analog: the only late supplier on multi-supplier orders ---
@register(
    "q21_waiting_orders",
    oracle="""
    WITH ol AS (
      SELECT l_orderkey, l_suppkey,
             CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F')
    SELECT s_name, COUNT(*) AS numwait
    FROM ol l1 JOIN supplier ON s_suppkey = l1.l_suppkey
               JOIN nation ON s_nationkey = n_nationkey
    WHERE l1.late = 1
      AND n_name IN ('NATION_3', 'NATION_4')
      AND EXISTS (SELECT 1 FROM ol l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM ol l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late = 1)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS/NOT EXISTS pair expressed as one per-order aggregate: per order
    count the distinct suppliers and the distinct *late* suppliers — l1 rows
    survive iff (suppliers > 1) AND (late suppliers with another supplier = 1
    == l1's own).  One aggregate + one equi-join replaces the oracle's two
    correlated self-joins (the plan Spark would otherwise execute twice over
    the fact)."""
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    ol = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(_bc(o, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
            .cast("int")
            .alias("late"),
        )
    )
    per_order = ol.groupBy(F.col("l_orderkey").alias("g_orderkey")).agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("n_late_supp"),
        F.max(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("late_supp_max"),
        F.min(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("late_supp_min"),
    )
    n = load(spark, sf_dir, "nation").filter(F.col("n_name").isin("NATION_3", "NATION_4"))
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    return (
        ol.filter(F.col("late") == 1)
        .join(per_order, F.col("l_orderkey") == F.col("g_orderkey"))
        # >1 supplier on the order, and this supplier is the ONLY late one
        .filter(
            (F.col("n_supp") > 1)
            & (F.col("n_late_supp") == 1)
            & (F.col("late_supp_min") == F.col("l_suppkey"))
        )
        .join(_bc(s, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


# --- Q22 analog: idle customers with above-average balances ---
@register(
    "q22_idle_customers",
    oracle="""
    SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      AND c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        FROM customer
        WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    codes = [1, 3, 5, 7, 9, 11, 13]
    c = load(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(codes))
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (unscaled(F.sum(cents("c_acctbal")), 2) / F.count("*")).alias("avg_bal")
    )
    o = load(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            csum(cents("c_acctbal"), "totacctbal"),
        )
    )
