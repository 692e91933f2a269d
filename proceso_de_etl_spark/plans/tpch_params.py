"""Alternate-parameter variants of the analytic q-suite families
(q1/q3/q5/q6/q9/q10/q12/q14/q18/q19): proof the plans are not
constant-specific.

TPC-H defines each query as a TEMPLATE with substitution parameters;
plans/tpch.py registers one instantiation per family. Each builder
here takes the family's parameters explicitly and derives BOTH the
DataFrame plan and the DuckDB oracle SQL from the SAME dict, so the
two sides can never drift and a typo'd parameter can't silently make
a predicate vacuous. Variant parameters were validated against the
actual testdata domains (c_mktsegment enum, r_name enum, orderdate
1995-01-01..2001-08-01, shipdate ..2001-11-04, discount 0..0.1,
quantity 1..50) — see tests/test_tpch_params.py, which also asserts
each variant's filters are genuinely selective (non-empty, and a
proper subset where the family filters a scan).

Scale notes are the family's (see plans/tpch.py docstring): only
fixed-size dims carry broadcast hints; filters sit on scan columns
so they push into the parquet reader regardless of the constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from proceso_de_etl_spark.functions.columns import davg, dsum
from proceso_de_etl_spark.plans.tpch import CHARGE, DISC_PRICE
from proceso_de_etl_spark.sources.catalog import load_table

ORACLES: dict[str, str] = {}


def _ts(d: str):
    return F.expr(f"TIMESTAMP '{d} 00:00:00'")


# --- q1 family: pricing summary at an alternate ship cutoff --------

Q1_PARAMS = {"ship_cutoff": "1998-09-02"}


def q1_pricing_summary_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q1 template at ship_cutoff 1998-09-02 (the TPC-H spec's own
    canonical substitution) instead of tpch.py's 2001-09-01: same
    one-shuffle partial-agg plan, ~half the scan selected."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= _ts(Q1_PARAMS["ship_cutoff"]))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum(DISC_PRICE(), 6).alias("sum_disc_price"),
            dsum(CHARGE(), 6).alias("sum_charge"),
            davg(F.col("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


ORACLES["q1_pricing_summary_v2"] = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_PARAMS["ship_cutoff"]} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --- q3 family: shipping priority for another segment/date --------

Q3_PARAMS = {"segment": "MACHINERY", "cutoff": "1996-09-15"}


def q3_shipping_priority_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q3 template at (MACHINERY, 1996-09-15): identical join tree —
    customer unhinted (SF-scaling), top-10 with orderkey tie-break."""
    cutoff = _ts(Q3_PARAMS["cutoff"])
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == Q3_PARAMS["segment"]
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(dsum(DISC_PRICE(), 6).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


ORACLES["q3_shipping_priority_v2"] = f"""
SELECT o_orderkey, o_orderdate,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{Q3_PARAMS["segment"]}'
  AND o_orderdate < TIMESTAMP '{Q3_PARAMS["cutoff"]} 00:00:00'
  AND l_shipdate  > TIMESTAMP '{Q3_PARAMS["cutoff"]} 00:00:00'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# --- q5 family: local-supplier volume, another region/year --------

Q5_PARAMS = {"region": "EUROPE", "year_start": "1997-01-01", "year_end": "1998-01-01"}


def q5_local_supplier_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q5 template at (EUROPE, 1997): same 6-table join, fixed-size
    nation/region broadcast by hint, customer/supplier left to AQE."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts(Q5_PARAMS["year_start"]))
        & (F.col("o_orderdate") < _ts(Q5_PARAMS["year_end"]))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == Q5_PARAMS["region"]
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(DISC_PRICE(), 6).alias("revenue"))
    )


ORACLES["q5_local_supplier_v2"] = f"""
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = '{Q5_PARAMS["region"]}'
  AND o_orderdate >= TIMESTAMP '{Q5_PARAMS["year_start"]} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{Q5_PARAMS["year_end"]} 00:00:00'
GROUP BY n_name
"""


# --- q6 family: forecast revenue, another year/band ---------------

Q6_PARAMS = {
    "year_start": "1998-01-01",
    "year_end": "1999-01-01",
    "disc_lo": 0.05,
    "disc_hi": 0.09,
    "qty_max": 35,
}


def q6_forecast_revenue_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q6 template at (1998, discount 0.05..0.09, qty<35): still a
    pure scan-filter-aggregate; every predicate pushes to parquet."""
    p = Q6_PARAMS
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= _ts(p["year_start"]))
        & (F.col("l_shipdate") < _ts(p["year_end"]))
        & (F.col("l_discount") >= p["disc_lo"])
        & (F.col("l_discount") <= p["disc_hi"])
        & (F.col("l_quantity") < p["qty_max"])
    ).agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), 6).alias("revenue"))


ORACLES["q6_forecast_revenue_v2"] = f"""
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_PARAMS["year_start"]} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{Q6_PARAMS["year_end"]} 00:00:00'
  AND l_discount BETWEEN {Q6_PARAMS["disc_lo"]} AND {Q6_PARAMS["disc_hi"]}
  AND l_quantity < {Q6_PARAMS["qty_max"]}
"""


# --- q14 family: promo effect, another month ----------------------

Q14_PARAMS = {"month_start": "1997-05-01", "month_end": "1997-06-01"}


def q14_promo_effect_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q14 template at 1997-05: conditional agg over the part join,
    part unhinted (SF-scaling), AQE broadcasts while it fits."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts(Q14_PARAMS["month_start"]))
        & (F.col("l_shipdate") < _ts(Q14_PARAMS["month_end"]))
    )
    part = load_table(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", DISC_PRICE()).otherwise(F.lit(0.0))
    return li.join(part, li.l_partkey == part.p_partkey).agg(
        (100.0 * dsum(promo, 6) / dsum(DISC_PRICE(), 6)).alias("promo_revenue_pct")
    )


ORACLES["q14_promo_effect_v2"] = f"""
SELECT 100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
       AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '{Q14_PARAMS["month_start"]} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{Q14_PARAMS["month_end"]} 00:00:00'
"""


# --- q10 family: returned items, another quarter ------------------

Q10_PARAMS = {"quarter_start": "1997-01-01", "quarter_end": "1997-04-01"}


def q10_returned_items_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q10 template at 1997-Q1: same join tree — nation the only
    hinted broadcast, top-20 with custkey tie-break."""
    p = Q10_PARAMS
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts(p["quarter_start"]))
        & (F.col("o_orderdate") < _ts(p["quarter_end"]))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(DISC_PRICE(), 6).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


ORACLES["q10_returned_items_v2"] = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
     JOIN lineitem ON l_orderkey = o_orderkey
     JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '{Q10_PARAMS["quarter_start"]} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{Q10_PARAMS["quarter_end"]} 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# --- q18 family: large orders at a higher quantity threshold ------

Q18_PARAMS = {"qty_threshold": 140}


def q18_large_orders_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q18 template at sum_qty > 140: the group-having still runs on
    the fact side FIRST (one lineitem pass), joins pick up labels."""
    thr = Q18_PARAMS["qty_threshold"]
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > thr)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            F.col("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


ORACLES["q18_large_orders_v2"] = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > {Q18_PARAMS["qty_threshold"]}) big
JOIN orders ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


# --- q9 family: product profit for another part word / cost rate --

Q9_PARAMS = {"part_word": "gear", "cost_rate": 0.55}


def q9_product_profit_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q9 template at (part_word 'gear', supply-cost rate 0.55): same
    5-table star join; the substring filter still lands scan-side and
    only nation is hinted broadcast."""
    p = Q9_PARAMS
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like(f"%{p['part_word']}%")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    profit = disc_price - F.lit(p["cost_rate"]) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(part.select("p_partkey", "p_retailprice"), li.l_partkey == F.col("p_partkey"))
        .join(supp.select("s_suppkey", "s_nationkey"), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(orders.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(dsum(profit, 6).alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


ORACLES["q9_product_profit_v2"] = f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     - {Q9_PARAMS["cost_rate"]} * p_retailprice * l_quantity
                AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
FROM lineitem JOIN part ON l_partkey = p_partkey
     JOIN supplier ON l_suppkey = s_suppkey
     JOIN nation ON s_nationkey = n_nationkey
     JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%{Q9_PARAMS["part_word"]}%'
GROUP BY 1, 2
ORDER BY nation ASC, o_year DESC
"""


# --- q12 family: conditional class counts at another year/rule ----

Q12_PARAMS = {"year_lo": "1997-01-01", "year_hi": "1998-01-01", "high_prefixes": ("1",)}


def q12_priority_classes_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q12 template at ship year 1997 with a STRICTER high class
    (only 1-URGENT counts as high — the class rule is a parameter,
    not a constant): same one-join one-agg plan as the family."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts(Q12_PARAMS["year_lo"]))
        & (F.col("l_shipdate") < _ts(Q12_PARAMS["year_hi"]))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.when(
        F.col("o_orderpriority").startswith(Q12_PARAMS["high_prefixes"][0]), 1
    ).otherwise(0)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(1 - high).alias("low_line_count"),
        )
    )


ORACLES["q12_priority_classes_v2"] = f"""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority LIKE '{Q12_PARAMS["high_prefixes"][0]}%'
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority LIKE '{Q12_PARAMS["high_prefixes"][0]}%'
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{Q12_PARAMS["year_lo"]} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{Q12_PARAMS["year_hi"]} 00:00:00'
GROUP BY l_linestatus
"""


# --- q19 family: disjunctive bands over other brands/ranges --------

Q19_PARAMS = {
    "bands": (
        {"brand": "Brand#13", "size_hi": 20, "qty_lo": 5, "qty_hi": 15},
        {"brand": "Brand#34", "size_hi": 30, "qty_lo": 15, "qty_hi": 25},
        {"brand": "Brand#45", "size_hi": 40, "qty_lo": 25, "qty_hi": 35},
    )
}


def q19_disjunctive_filter_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q19 template over three OTHER (brand, size, quantity) bands —
    the whole OR-of-ANDs is built from the parameter dict, so band
    count/shape is data, and it stays one scan-side codegen'd
    residual filter like the family."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    cond = None
    for b in Q19_PARAMS["bands"]:
        c = (
            (F.col("p_brand") == b["brand"])
            & (F.col("p_size").between(1, b["size_hi"]))
            & (F.col("l_quantity").between(b["qty_lo"], b["qty_hi"]))
        )
        cond = c if cond is None else cond | c
    return j.filter(cond).agg(
        dsum(DISC_PRICE(), 6).alias("revenue"), F.count("*").alias("n_lines")
    )


ORACLES["q19_disjunctive_filter_v2"] = f"""
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {" OR ".join(
    f"(p_brand = '{b['brand']}' AND p_size BETWEEN 1 AND {b['size_hi']}"
    f" AND l_quantity BETWEEN {b['qty_lo']} AND {b['qty_hi']})"
    for b in Q19_PARAMS["bands"]
)}
"""


# --- q4 family: order-priority at another window, spec lateness ----

Q4_PARAMS = {"start": "1997-03-01", "end": "1997-09-01", "late_days": 90}


def q4_order_priority_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q4 template at window [1997-03-01, 1997-09-01) with lateness
    at 90 days instead of the family's 60 (this testdata has no
    commit/receipt dates, so the spec's l_commitdate < l_receiptdate
    substitution is out of domain): same correlated-comparison
    semi-join shape on a different window AND threshold."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts(Q4_PARAMS["start"]))
        & (F.col("o_orderdate") < _ts(Q4_PARAMS["end"]))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.expr(f"o_orderdate + INTERVAL {Q4_PARAMS['late_days']} DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


ORACLES["q4_order_priority_v2"] = f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{Q4_PARAMS["start"]} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{Q4_PARAMS["end"]} 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL {Q4_PARAMS["late_days"]} DAY)
GROUP BY o_orderpriority
"""


# --- q17 family: small-quantity revenue for another brand/factor ---

Q17_PARAMS = {"brand": "Brand#45", "factor": 0.25}


def q17_small_qty_revenue_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q17 template at (Brand#45, factor 0.25): same de-correlated
    per-part-average join-back with the semi-filtered aggregate
    input; a different brand proves the left-semi prune isn't keyed
    to one partkey set."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == Q17_PARAMS["brand"]
    )
    per_part = (
        li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("ap_partkey"))
        .agg((F.sum("l_quantity") / F.count("l_quantity")).alias("avg_qty"))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < Q17_PARAMS["factor"] * F.col("avg_qty"))
        .agg((dsum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


ORACLES["q17_small_qty_revenue_v2"] = f"""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = '{Q17_PARAMS["brand"]}'
  AND l_quantity < {Q17_PARAMS["factor"]} * (SELECT SUM(l_quantity) / COUNT(l_quantity)
                          FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


QUERIES = {
    "q1_pricing_summary_v2": q1_pricing_summary_v2,
    "q4_order_priority_v2": q4_order_priority_v2,
    "q17_small_qty_revenue_v2": q17_small_qty_revenue_v2,
    "q12_priority_classes_v2": q12_priority_classes_v2,
    "q19_disjunctive_filter_v2": q19_disjunctive_filter_v2,
    "q9_product_profit_v2": q9_product_profit_v2,
    "q10_returned_items_v2": q10_returned_items_v2,
    "q18_large_orders_v2": q18_large_orders_v2,
    "q3_shipping_priority_v2": q3_shipping_priority_v2,
    "q5_local_supplier_v2": q5_local_supplier_v2,
    "q6_forecast_revenue_v2": q6_forecast_revenue_v2,
    "q14_promo_effect_v2": q14_promo_effect_v2,
}
