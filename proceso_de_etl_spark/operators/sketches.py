"""Mergeable-sketch aggregate library (SURVEY.md §2.2 A21 extended;
theta set-algebra, KLL quantiles, HLL rollup-by-union).

Why sketches at 100 TB: a sketch is a fixed-size mergeable binary
summary built map-side in ONE scan; re-aggregating along a coarser
dimension unions the sketch bytes instead of rescanning the fact
table, and set algebra (union / intersection / difference) that is
unanswerable from plain per-group counts falls out of the sketch
representation. The reference's pandas rollups (main.py:120-170
recompute aggregates per run) have no equivalent — this is the
capability a 100 TB corpus needs instead.

All three families ride Spark's built-in Apache Datasketches
bindings (`theta_*`, `kll_*`, `hll_*` in pyspark.sql.functions) —
JVM-side partial aggregation with map-side combine, zero Python in
the data path. Estimates are engine-specific by design, so these are
rows-only contract queries; tests/test_sketches.py pins every
estimate to its exact twin with the sketch family's error bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from proceso_de_etl_spark.sources.catalog import load_table

ORACLES: dict[str, str] = {}


def sketch_theta_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra over part-key sets: which parts ship
    as returns (flag A) vs refused (flag R), and how much they
    overlap. One scan builds a sketch per flag (partial agg +
    map-side combine); union / intersection / difference are then
    pure sketch ops on two binary values — no re-scan, no join. An
    exact answer needs a self-join or two COUNT(DISTINCT) passes plus
    an intersection join; at 100 TB the sketch route touches the
    fact table once."""
    li = load_table(spark, sf_dir, "lineitem")
    per_flag = (
        li.filter(F.col("l_returnflag").isin("A", "R"))
        .groupBy("l_returnflag")
        .agg(F.theta_sketch_agg("l_partkey").alias("sk"))
    )
    wide = per_flag.agg(
        F.first(F.when(F.col("l_returnflag") == "A", F.col("sk")), ignorenulls=True).alias("ska"),
        F.first(F.when(F.col("l_returnflag") == "R", F.col("sk")), ignorenulls=True).alias("skr"),
    )
    return wide.select(
        F.theta_sketch_estimate("ska").cast("bigint").alias("est_parts_a"),
        F.theta_sketch_estimate("skr").cast("bigint").alias("est_parts_r"),
        F.theta_sketch_estimate(F.theta_union("ska", "skr")).cast("bigint").alias("est_union"),
        F.theta_sketch_estimate(F.theta_intersection("ska", "skr")).cast("bigint").alias("est_intersection"),
        F.theta_sketch_estimate(F.theta_difference("ska", "skr")).cast("bigint").alias("est_a_only"),
    )


def sketch_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantile sketches of extended price, per return flag AND
    merged to a global row — the merge consumes the per-flag sketch
    BYTES (kll_merge_agg), not the data, which is the scale story:
    per-partition/per-day sketches roll up to any coarser grain for
    free. get_n is exact by construction; quantiles carry the KLL
    rank-error bound (~1.65% at default k=200), pinned in tests.

    Both output branches derive from the same per-flag aggregate;
    AQE's exchange reuse shares it at runtime (the final adaptive
    plan carries one ReusedExchange), so lineitem is scanned ONCE
    even though the subtree appears twice in the logical plan."""
    li = load_table(spark, sf_dir, "lineitem")
    per_flag = li.groupBy("l_returnflag").agg(
        F.kll_sketch_agg_double("l_extendedprice").alias("sk")
    )

    def _quantiles(df: DataFrame, scope_col) -> DataFrame:
        return df.select(
            scope_col.alias("scope"),
            F.kll_sketch_get_n_double("sk").cast("bigint").alias("n"),
            F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.25)), 2).alias("p25"),
            F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.50)), 2).alias("p50"),
            F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.75)), 2).alias("p75"),
        )

    flags = _quantiles(per_flag, F.col("l_returnflag"))
    merged = _quantiles(
        per_flag.agg(F.kll_merge_agg_double("sk").alias("sk")), F.lit("ALL")
    )
    return flags.unionByName(merged)


def sketch_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL rollup-by-union: distinct-customer sketches built at the
    fine (year, priority) grain, then rolled up to per-year distinct
    estimates by unioning sketches — the fact table is scanned once
    and every coarser grain is answered from the stored sketches.
    Plain COUNT(DISTINCT) per cell can NOT be rolled up (distinct is
    not additive); the sketch union is, which is why 100 TB metric
    stores persist sketches, not counts."""
    orders = load_table(spark, sf_dir, "orders")
    per_cell = orders.groupBy(
        F.year("o_orderdate").cast("bigint").alias("yr"), "o_orderpriority"
    ).agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count("*").alias("n_orders"),
    )
    return per_cell.groupBy("yr").agg(
        F.count("*").cast("bigint").alias("n_cells"),
        F.sum("n_orders").cast("bigint").alias("n_orders"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("bigint").alias("est_customers"),
    )


CMS_EPS = 0.0005  # over-estimate bound: est - exact <= eps * totalCount
CMS_CONF = 0.99
CMS_SEED = 42
CMS_PROBES = ("join", "hash", "row", "scan", "data", "the", "merge", "zzz_absent_token")


def sketch_count_min_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A45 — count-min frequency sketch over the corpus token stream:
    point-frequency estimates from a fixed-size mergeable summary —
    the streaming/observability answer to "how often does THIS token
    appear" without storing the vocabulary-sized exact count table.
    One scan builds the sketch (JVM partial agg, map-side combine,
    width 2e/eps x depth ln(1/δ) counters regardless of corpus
    size); the probe set is answered by decoding the sketch bytes ON
    THE DRIVER — a bounded round-trip (one binary value, like the
    k-means centroid collect), not a data collect. CMS never
    under-estimates and over-estimates by at most eps·N with
    confidence δ (test-pinned vs exact counts). Estimates are
    hash-layout-specific, so rows-only."""
    from proceso_de_etl_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    row = tok.agg(
        F.count_min_sketch(
            "tok", F.lit(CMS_EPS), F.lit(CMS_CONF), F.lit(CMS_SEED)
        ).alias("sk")
    ).collect()[0]
    sk = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes(row.sk))
    rows = [(t, int(sk.estimateCount(t)), int(sk.totalCount())) for t in CMS_PROBES]
    return spark.createDataFrame(rows, "token string, est_count long, n_total long")


QUERIES = {
    "sketch_theta_setops": sketch_theta_setops,
    "sketch_count_min_tokens": sketch_count_min_tokens,
    "sketch_kll_quantiles": sketch_kll_quantiles,
    "sketch_hll_rollup": sketch_hll_rollup,
}
