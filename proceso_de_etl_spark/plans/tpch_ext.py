"""Extended analytic suite — more TPC-H-shaped operator patterns
adapted to the testdata columns (SURVEY.md §2.2): argmin-per-group,
ratio-of-conditional-sums, multi-attribute distinct counting,
disjunctive pushdown, and windowed multi-exists.

Same engineering rules as plans/tpch.py: fixed-size dims
(nation/region) broadcast by hint, SF-scaling tables
(customer/supplier/part) unhinted so AQE decides, exact decimal
aggregation for doubles, deterministic tie-breaks on every top-N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from proceso_de_etl_spark.functions.columns import dsum
from proceso_de_etl_spark.plans.tpch import DISC_PRICE
from proceso_de_etl_spark.sources.catalog import load_table

ORACLES: dict[str, str] = {}


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape — cheapest supplier per part (argmin-per-group): unit
    price observed in lineitem plays partsupp's supplycost; the
    min-cost row per part is selected with a rank window, ties broken
    by suppkey. Restricted to EUROPE suppliers like the original."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)

    cost = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg((dsum("l_extendedprice") / F.sum("l_quantity")).alias("unit_cost"))
    )
    eu_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    w = W.partitionBy("l_partkey").orderBy(F.asc("unit_cost"), F.asc("l_suppkey"))
    best = (
        cost.join(eu_supp, cost.l_suppkey == eu_supp.s_suppkey)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
    )
    return (
        best.join(part, best.l_partkey == part.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.round("unit_cost", 6).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), F.asc("p_partkey"))
        .limit(50)
    )


ORACLES["q2_min_cost_supplier"] = """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / SUM(l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
eu_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
best AS (
  SELECT *, row_number() OVER (PARTITION BY l_partkey
            ORDER BY unit_cost ASC, l_suppkey ASC) AS rk
  FROM cost JOIN eu_supp ON l_suppkey = s_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       ROUND(unit_cost, 6) AS unit_cost
FROM best JOIN part ON l_partkey = p_partkey
WHERE rk = 1 AND p_size <= 10
ORDER BY s_acctbal DESC, p_partkey ASC
LIMIT 50
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape — national market share: CANADA's fraction of AMERICA
    region revenue per order year (ratio of conditional exact sums)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n_cust = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n_supp = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")

    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(n_supp), supp.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(region), F.col("cn_region") == region.r_regionkey)
    )
    canada_vol = F.when(F.col("supp_nation") == "CANADA", DISC_PRICE()).otherwise(F.lit(0.0))
    return (
        joined.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg((dsum(canada_vol, 6) / dsum(DISC_PRICE(), 6)).alias("mkt_share"))
    )


ORACLES["q8_market_share"] = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(CASE WHEN n2.n_name = 'CANADA'
                          THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END
                     AS DECIMAL(18,6))) AS DOUBLE)
     / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
       AS mkt_share
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
     JOIN customer ON o_custkey = c_custkey
     JOIN supplier ON l_suppkey = s_suppkey
     JOIN nation n1 ON c_nationkey = n1.n_nationkey
     JOIN nation n2 ON s_nationkey = n2.n_nationkey
     JOIN region ON n1.n_regionkey = r_regionkey
WHERE r_name = 'AMERICA'
GROUP BY 1
"""


def q16_parts_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape — distinct supplier count per part attribute combo,
    with an excluded brand (NOT-semantics + multi-key distinct agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#23")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


ORACLES["q16_parts_supplier_cnt"] = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#23'
GROUP BY p_brand, p_type, p_size
"""


def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape — disjunction of conjunctive band predicates. The
    entire OR-of-ANDs stays a single scan-side filter (Catalyst
    pushes the common l_partkey join key and evaluates the residual
    disjunction in codegen — no union-of-scans rewrite needed)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 15)) & (F.col("l_quantity").between(1, 11)))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 25)) & (F.col("l_quantity").between(10, 20)))
        | ((F.col("p_brand") == "Brand#34") & (F.col("p_size").between(1, 35)) & (F.col("l_quantity").between(20, 30)))
    )
    return j.filter(cond).agg(dsum(DISC_PRICE(), 6).alias("revenue"), F.count("*").alias("n_lines"))


ORACLES["q19_disjunctive_filter"] = """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape — the supplier who held up multi-supplier orders:
    per order, the unique latest-shipping supplier where at least one
    OTHER supplier shipped earlier. The original's EXISTS/NOT-EXISTS
    pair becomes two window aggregates over one shuffle of the fact —
    no self-joins."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    w = W.partitionBy("l_orderkey")
    per_line = li.select(
        "l_orderkey",
        "l_suppkey",
        "l_shipdate",
        F.max("l_shipdate").over(w).alias("max_ship"),
        F.min("l_shipdate").over(w).alias("min_ship"),
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supps"),
    )
    blockers = (
        per_line.filter(
            (F.col("n_supps") >= 2)
            & (F.col("l_shipdate") == F.col("max_ship"))
            & (F.col("min_ship") < F.col("max_ship"))
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
        # "uniquely latest": drop orders where two suppliers tie at max
        .withColumn("n_latest", F.count("*").over(W.partitionBy("l_orderkey")))
        .filter(F.col("n_latest") == 1)
    )
    return (
        blockers.join(supp, blockers.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


ORACLES["q21_waiting_supplier"] = """
WITH per_line AS (
  SELECT l_orderkey, l_suppkey, l_shipdate,
         MAX(l_shipdate) OVER (PARTITION BY l_orderkey) AS max_ship,
         MIN(l_shipdate) OVER (PARTITION BY l_orderkey) AS min_ship,
         COUNT(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey) AS n_supps
  FROM lineitem
),
blockers AS (
  SELECT l_orderkey, l_suppkey,
         COUNT(*) OVER (PARTITION BY l_orderkey) AS n_latest
  FROM (SELECT DISTINCT l_orderkey, l_suppkey
        FROM per_line
        WHERE n_supps >= 2 AND l_shipdate = max_ship AND min_ship < max_ship)
)
SELECT s_name, COUNT(*) AS numwait
FROM blockers JOIN supplier ON l_suppkey = s_suppkey
WHERE n_latest = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 10
"""

QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q8_market_share": q8_market_share,
    "q16_parts_supplier_cnt": q16_parts_supplier_cnt,
    "q19_disjunctive_filter": q19_disjunctive_filter,
    "q21_waiting_supplier": q21_waiting_supplier,
}
