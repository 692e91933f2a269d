"""Sketch library error bounds: every estimate pinned to an exact
twin computed in the same session. Theta/HLL default configs hold
well under 5% relative error at these cardinalities; KLL's default
k=200 gives ~1.65% rank error, so p50 must land between the exact
45th and 55th percentiles (a 3x margin)."""

import pytest
from pyspark.sql import functions as F

from proceso_de_etl_spark.operators import sketches
from proceso_de_etl_spark.sources.catalog import load_table

SF_SMOKE = "/root/testdata/sf0.001"


def _rel_err(est: float, exact: float) -> float:
    return abs(est - exact) / max(exact, 1)


def test_theta_setops_bounds(spark):
    row = sketches.sketch_theta_setops(spark, SF_SMOKE).collect()[0]
    li = load_table(spark, SF_SMOKE, "lineitem")
    a = {r[0] for r in li.filter(F.col("l_returnflag") == "A").select("l_partkey").distinct().collect()}
    r = {r[0] for r in li.filter(F.col("l_returnflag") == "R").select("l_partkey").distinct().collect()}
    assert _rel_err(row.est_parts_a, len(a)) <= 0.05
    assert _rel_err(row.est_parts_r, len(r)) <= 0.05
    assert _rel_err(row.est_union, len(a | r)) <= 0.05
    # intersection/difference error scales with the union size
    assert abs(row.est_intersection - len(a & r)) <= 0.05 * len(a | r)
    assert abs(row.est_a_only - len(a - r)) <= 0.05 * len(a | r)


def test_kll_quantile_rank_bounds(spark):
    got = {r.scope: r for r in sketches.sketch_kll_quantiles(spark, SF_SMOKE).collect()}
    li = load_table(spark, SF_SMOKE, "lineitem")
    # exact counts: get_n is lossless, also through the merge
    counts = {r[0]: r[1] for r in li.groupBy("l_returnflag").count().collect()}
    for flag, n in counts.items():
        assert got[flag].n == n
    assert got["ALL"].n == sum(counts.values())
    # p50 must sit between the exact 45th and 55th percentiles
    bounds = li.agg(
        F.percentile("l_extendedprice", 0.45).alias("lo"),
        F.percentile("l_extendedprice", 0.55).alias("hi"),
    ).collect()[0]
    assert bounds.lo <= got["ALL"].p50 <= bounds.hi


def test_hll_rollup_union_matches_direct_sketch(spark):
    got = {r.yr: r for r in sketches.sketch_hll_rollup(spark, SF_SMOKE).collect()}
    orders = load_table(spark, SF_SMOKE, "orders")
    exact = {
        r[0]: r[1]
        for r in orders.groupBy(F.year("o_orderdate").alias("yr"))
        .agg(F.countDistinct("o_custkey").alias("d"))
        .collect()
    }
    assert set(got) == set(exact)
    for yr, d in exact.items():
        assert _rel_err(got[yr].est_customers, d) <= 0.05
    # mergeability: union of per-(yr,priority) sketches must give the
    # SAME estimate as sketching each year directly — HLL union with
    # matching lgK merges registers losslessly
    direct = {
        r[0]: r[1]
        for r in orders.groupBy(F.year("o_orderdate").cast("bigint").alias("yr"))
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("e"))
        .collect()
    }
    for yr in exact:
        assert got[yr].est_customers == direct[yr]


def test_count_min_bounds(spark):
    """CMS never under-estimates; over-estimate bounded by eps x
    totalCount (one-sided, with confidence — eps=5e-4 on this corpus
    leaves generous room). The absent probe must estimate ~0."""
    from proceso_de_etl_spark.functions.text import tokens
    from proceso_de_etl_spark.operators.sketches import CMS_EPS, CMS_PROBES

    got = {r.token: r for r in sketches.sketch_count_min_tokens(spark, SF_SMOKE).collect()}
    assert set(got) == set(CMS_PROBES)
    docs = load_table(spark, SF_SMOKE, "documents")
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    n_total = tok.count()
    exact = {
        r.tok: r.n
        for r in tok.filter(F.col("tok").isin(*CMS_PROBES)).groupBy("tok").agg(F.count("*").alias("n")).collect()
    }
    for t in CMS_PROBES:
        e = exact.get(t, 0)
        assert got[t].n_total == n_total
        assert e <= got[t].est_count <= e + CMS_EPS * n_total, (t, e, got[t].est_count)


def test_hash_split_fractions_and_stability(spark):
    """The hash split must land near its designed fractions, be
    disjoint+exhaustive, and assign every doc independently of
    partitioning (repartition → identical assignment)."""
    from proceso_de_etl_spark.operators.sampling import sample_split_train_eval

    got = sample_split_train_eval(spark, SF_SMOKE)
    rows = got.collect()
    n = len(rows)
    frac = {s: sum(r.split == s for r in rows) / n for s in ("train", "val", "test")}
    assert abs(frac["train"] - 204 / 256) < 0.15
    assert frac["train"] + frac["val"] + frac["test"] == 1.0
    reparted = {
        r.doc_id: r.split
        for r in sample_split_train_eval(spark, SF_SMOKE).repartition(13).collect()
    }
    assert reparted == {r.doc_id: r.split for r in rows}


def test_sketch_store_roundtrip(spark, tmp_path):
    """The sketch-store pattern: per-cell sketches persisted as a
    parquet binary column must survive the round-trip and union to
    the same estimates — this is what lets a metric store answer
    coarser grains months later without rescanning facts."""
    from proceso_de_etl_spark.sources.catalog import load_table

    orders = load_table(spark, SF_SMOKE, "orders")
    per_cell = orders.groupBy(
        F.year("o_orderdate").cast("bigint").alias("yr"), "o_orderpriority"
    ).agg(F.hll_sketch_agg("o_custkey").alias("sk"))
    store = str(tmp_path / "sketch_store.parquet")
    per_cell.write.parquet(store)

    live = {
        r.yr: r.est
        for r in per_cell.groupBy("yr")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()
    }
    stored = {
        r.yr: r.est
        for r in spark.read.parquet(store)
        .groupBy("yr")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()
    }
    assert stored == live
