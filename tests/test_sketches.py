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


# --- portable companions (r7): transparent integer sketch state ---

SF_GATE = "/root/testdata/sf0.01"


def test_kmv_exact_mode_below_k(spark):
    """At sf0.001 each flag has < K distinct part keys, so the KMV
    sketch IS the exact set and every estimate must equal the exact
    count — the estimator's exact-mode branch, pinned."""
    from proceso_de_etl_spark.operators.sketches import KMV_K

    row = sketches.sketch_kmv_setops(spark, SF_SMOKE).collect()[0]
    li = load_table(spark, SF_SMOKE, "lineitem")
    a = {r[0] for r in li.filter(F.col("l_returnflag") == "A").select("l_partkey").distinct().collect()}
    r = {r[0] for r in li.filter(F.col("l_returnflag") == "R").select("l_partkey").distinct().collect()}
    assert len(a) < KMV_K and len(r) < KMV_K  # precondition for this SF
    assert row.est_parts_a == len(a)
    assert row.est_parts_r == len(r)
    assert row.est_union == len(a | r)
    assert row.est_intersection == len(a & r)
    assert row.est_a_only == len(a - r)


def test_kmv_sketch_mode_bounds(spark):
    """At sf0.01 the distinct sets exceed K: estimator mode. KMV with
    K=256 has σ ≈ 1/sqrt(K-2) ≈ 6.3%; allow 3σ for the marginals and
    a union-scaled absolute bound for the set-algebra outputs."""
    from proceso_de_etl_spark.operators.sketches import KMV_K

    row = sketches.sketch_kmv_setops(spark, SF_GATE).collect()[0]
    li = load_table(spark, SF_GATE, "lineitem")
    a = {r[0] for r in li.filter(F.col("l_returnflag") == "A").select("l_partkey").distinct().collect()}
    r = {r[0] for r in li.filter(F.col("l_returnflag") == "R").select("l_partkey").distinct().collect()}
    assert row.n_a == KMV_K and row.n_r == KMV_K  # precondition: sketch mode
    assert _rel_err(row.est_parts_a, len(a)) <= 0.19
    assert _rel_err(row.est_parts_r, len(r)) <= 0.19
    assert _rel_err(row.est_union, len(a | r)) <= 0.19
    assert abs(row.est_intersection - len(a & r)) <= 0.25 * len(a | r)
    assert abs(row.est_a_only - len(a - r)) <= 0.25 * len(a | r)


def test_hll_portable_registers_match_python_replay(spark):
    """The register table is EXACT state, not an estimate: replay
    bucket/rho in pure Python (hashlib.md5 — the same function) and
    the per-year (buckets_hit, reg_sum, denom_scaled) triple must
    match bit-for-bit. Also pins both estimator regimes: sf0.001
    (n/m < 2.5 → linear counting, σ ≈ 5% at n≈120/m=256 — bound at
    3σ) via the 15% bound; the gate-SF raw regime is bound-tested by
    the oracle parity itself (exact integers) plus the 5% check in
    test_hll_portable_raw_regime_bound."""
    import hashlib
    from collections import defaultdict

    from proceso_de_etl_spark.operators.sketches import HLLP_M

    got = {r.yr: r for r in sketches.sketch_hll_portable(spark, SF_SMOKE).collect()}
    orders = load_table(spark, SF_SMOKE, "orders").select(
        F.year("o_orderdate").cast("bigint").alias("yr"), "o_custkey"
    ).collect()
    regs: dict = defaultdict(dict)
    for r in orders:
        h = hashlib.md5(str(r.o_custkey).encode()).hexdigest()
        bucket = int(h[:2], 16)
        v = int(h[2:15], 16)
        rho = 53 if v == 0 else 53 - v.bit_length()
        regs[r.yr][bucket] = max(regs[r.yr].get(bucket, 0), rho)
    for yr, by_bucket in regs.items():
        hit = len(by_bucket)
        denom = sum(1 << (53 - g) for g in by_bucket.values()) + (HLLP_M - hit) * (1 << 53)
        assert got[yr].buckets_hit == hit, yr
        assert got[yr].reg_sum == sum(by_bucket.values()), yr
        assert got[yr].denom_scaled == denom, yr
    exact = defaultdict(set)
    for r in orders:
        exact[r.yr].add(r.o_custkey)
    for yr, custs in exact.items():
        assert _rel_err(got[yr].est_customers, len(custs)) <= 0.15, yr


def test_hll_portable_raw_regime_bound(spark):
    """At sf0.01 every year sits in the raw-estimator regime (n ≈ 4.7m);
    HLL raw σ ≈ 1.04/sqrt(256) ≈ 6.5% — bound marginals at ~1.5σ
    (empirically ~2-7% on this data)."""
    got = {r.yr: r for r in sketches.sketch_hll_portable(spark, SF_GATE).collect()}
    orders = load_table(spark, SF_GATE, "orders")
    exact = {
        r[0]: r[1]
        for r in orders.groupBy(F.year("o_orderdate").cast("bigint").alias("yr"))
        .agg(F.countDistinct("o_custkey").alias("d"))
        .collect()
    }
    assert set(got) == set(exact)
    for yr, d in exact.items():
        assert got[yr].est_raw == got[yr].est_customers, yr  # raw regime
        assert _rel_err(got[yr].est_customers, d) <= 0.10, yr


def test_hll_portable_linear_count_margin(spark):
    """The one non-integer step with an engine-libm input is the
    linear-counting ln(); a cross-engine 1-ulp difference only matters
    if the pre-round value sits ON a .5 boundary. Measure the margin
    on both gate SFs so an erosion fails here, not as a silent oracle
    mismatch (lsh_bucket_ctes discipline)."""
    import math

    from proceso_de_etl_spark.operators.sketches import HLLP_M

    for sf in (SF_SMOKE, SF_GATE):
        for row in sketches.sketch_hll_portable(spark, sf).collect():
            zeros = HLLP_M - row.buckets_hit
            if zeros > 0 and row.est_raw <= 2.5 * HLLP_M:
                val = -HLLP_M * math.log(zeros / HLLP_M)
                margin = abs((val % 1) - 0.5)
                assert margin > 1e-6, (sf, row.yr, val)


def test_cms_portable_bounds_and_twin_shape(spark):
    """Portable CMS: never under-estimates, over-estimate ≤ eps·N with
    eps = e/width (Cormode & Muthukrishnan) — generous here; absent
    probe stays near 0; and the output shape matches the Datasketches
    twin row-for-row in token order."""
    import math

    from proceso_de_etl_spark.functions.text import tokens
    from proceso_de_etl_spark.operators.sketches import CMS_PROBES, CMSP_WIDTH

    got = {r.token: r for r in sketches.sketch_cms_portable(spark, SF_SMOKE).collect()}
    assert set(got) == set(CMS_PROBES)
    docs = load_table(spark, SF_SMOKE, "documents")
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    n_total = tok.count()
    exact = {
        r.tok: r.n
        for r in tok.filter(F.col("tok").isin(*CMS_PROBES)).groupBy("tok").agg(F.count("*").alias("n")).collect()
    }
    eps = math.e / CMSP_WIDTH
    for t in CMS_PROBES:
        e = exact.get(t, 0)
        assert got[t].n_total == n_total
        assert e <= got[t].est_count <= e + eps * n_total, (t, e, got[t].est_count)
    twin = {r.token: r for r in sketches.sketch_count_min_tokens(spark, SF_SMOKE).collect()}
    assert set(twin) == set(got)
    for t in got:
        assert got[t].n_total == twin[t].n_total
