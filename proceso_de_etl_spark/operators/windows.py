"""Window-function operators (SURVEY.md §2.2 A11-A14).

All windows are keyed (partitioned) — the data for one key fits one
task at any scale; there is no global window anywhere in the engine's
fact paths. Running sums accumulate in DECIMAL inside the frame so
the running values are exact and engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from proceso_de_etl_spark.functions.columns import money
from proceso_de_etl_spark.sources.catalog import load_table

ORACLES: dict[str, str] = {}


def ranked_topk(df: DataFrame, order, k: int, rank_col: str = "rank") -> DataFrame:
    """Distributed global top-k with rank numbers — the scale-safe
    replacement for ``row_number() OVER (ORDER BY ...) <= k``, which
    funnels the ENTIRE input through one task (WindowExec warns
    "Moving all data to a single partition"; at 100 TB that task is
    the job). ``orderBy(...).limit(k)`` instead compiles to
    TakeOrderedAndProject: each partition keeps its own top-k and the
    driver merges k×partitions rows. The k survivors are then ranked
    WITHOUT a window at all: coalesce(1) + sortWithinPartitions puts
    the k rows (a query constant, not data-sized) in one bounded
    partition in rank order, and monotonically_increasing_id — which
    numbers rows sequentially within a partition and, being flagged
    nondeterministic, cannot be reordered past the sort — yields the
    rank directly. (A window over partitionBy(lit(1)) does NOT work:
    Catalyst constant-folds the literal out of the partition spec and
    WindowExec is back to its single-partition warning.) ``order``
    must be a total order (unique tie-break column) for the ranks to
    be deterministic cross-engine."""
    top = df.orderBy(*order).limit(k)
    return (
        top.coalesce(1)
        .sortWithinPartitions(*order)
        .withColumn(rank_col, (F.monotonically_increasing_id() + 1).cast("bigint"))
    )


def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 — top-3 parts by retail price per brand; row_number with a
    total order (price desc, partkey) so results are deterministic."""
    part = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        part.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "rk", "p_partkey", "p_name", "p_retailprice")
    )


ORACLES["window_topk_per_group"] = """
SELECT p_brand, rk, p_partkey, p_name, p_retailprice
FROM (SELECT p_brand, p_partkey, p_name, p_retailprice,
             CAST(row_number() OVER (PARTITION BY p_brand
                  ORDER BY p_retailprice DESC, p_partkey ASC) AS BIGINT) AS rk
      FROM part)
WHERE rk <= 3
"""


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 — running spend per customer over order date. The frame
    accumulates DECIMAL (exact at every prefix), cast to double at
    the edge."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(money("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


ORACLES["window_running_sum"] = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
FROM orders
"""


def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13 — per-user event value delta vs previous event (lag over a
    total order: ts then event_id)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return ev.select(
        "event_id",
        "user_id",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


ORACLES["window_lag_delta"] = """
SELECT event_id, user_id, value,
       value - lag(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS delta
FROM events
"""


def window_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14 — dense_rank + quartile bucket of customers by balance
    within market segment."""
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return cust.select(
        "c_mktsegment",
        "c_custkey",
        "c_acctbal",
        F.dense_rank().over(w).cast("bigint").alias("bal_rank"),
        F.ntile(4).over(w).cast("bigint").alias("bal_quartile"),
    )


ORACLES["window_rank_ntile"] = """
SELECT c_mktsegment, c_custkey, c_acctbal,
       CAST(dense_rank() OVER (PARTITION BY c_mktsegment
            ORDER BY c_acctbal DESC, c_custkey ASC) AS BIGINT) AS bal_rank,
       CAST(ntile(4) OVER (PARTITION BY c_mktsegment
            ORDER BY c_acctbal DESC, c_custkey ASC) AS BIGINT) AS bal_quartile
FROM customer
"""

def window_function_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A44 — analytic-function parity matrix: percent_rank /
    cume_dist / nth_value / first_value / last_value per customer
    order history, every frame spelled EXPLICITLY (rows unbounded
    preceding → current row for the value functions) because default
    frames are where engines silently disagree. All windows keyed by
    o_custkey — one partition per customer, parallel at any scale.
    The rank ratios are (rank−1)/(n−1)-style doubles computed
    identically from identical integer inputs, so 6dp rounding is
    belt-and-braces only."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    frame = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume_dist"),
        F.first("o_totalprice").over(frame).alias("first_price"),
        F.nth_value("o_totalprice", 2).over(frame).alias("second_price"),
        F.last("o_totalprice").over(frame).alias("running_last_price"),
    )


ORACLES["window_function_matrix"] = """
SELECT o_custkey, o_orderkey,
       ROUND(percent_rank() OVER w, 6) AS pct_rank,
       ROUND(cume_dist() OVER w, 6) AS cume_dist,
       first_value(o_totalprice) OVER wf AS first_price,
       nth_value(o_totalprice, 2) OVER wf AS second_price,
       last_value(o_totalprice) OVER wf AS running_last_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
       wf AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


QUERIES = {
    "window_topk_per_group": window_topk_per_group,
    "window_function_matrix": window_function_matrix,
    "window_running_sum": window_running_sum,
    "window_lag_delta": window_lag_delta,
    "window_rank_ntile": window_rank_ntile,
}
