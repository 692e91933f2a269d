"""Parameterized q-suite variants: oracle parity at sf0.001 plus
non-vacuity — each variant's parameters must actually select data
(and, where the family filters a scan, a PROPER subset), so a
nonexistent enum value or out-of-domain date can't pass vacuously."""

from pyspark.sql import functions as F

from proceso_de_etl_spark.plans import tpch_params
from proceso_de_etl_spark.sources.catalog import load_table
from tests.oracle_harness import compare, duckdb_con

SF_SMOKE = "/root/testdata/sf0.001"


def test_variants_match_oracles(spark):
    con = duckdb_con(SF_SMOKE)
    for key, fn in tpch_params.QUERIES.items():
        compare(fn(spark, SF_SMOKE), con, tpch_params.ORACLES[key], key)


def test_parameters_are_not_vacuous(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    cust = load_table(spark, SF_SMOKE, "customer")
    total_li = li.count()

    n_seg = cust.filter(F.col("c_mktsegment") == tpch_params.Q3_PARAMS["segment"]).count()
    assert 0 < n_seg < cust.count()

    p = tpch_params.Q6_PARAMS
    n_q6 = li.filter(
        (F.col("l_shipdate") >= F.expr(f"TIMESTAMP '{p['year_start']} 00:00:00'"))
        & (F.col("l_shipdate") < F.expr(f"TIMESTAMP '{p['year_end']} 00:00:00'"))
        & (F.col("l_discount").between(p["disc_lo"], p["disc_hi"]))
        & (F.col("l_quantity") < p["qty_max"])
    ).count()
    assert 0 < n_q6 < total_li

    # every variant returns rows (top-N families return their full N)
    assert tpch_params.q1_pricing_summary_v2(spark, SF_SMOKE).count() > 0
    assert tpch_params.q3_shipping_priority_v2(spark, SF_SMOKE).count() == 10
    assert tpch_params.q5_local_supplier_v2(spark, SF_SMOKE).count() > 0
    row = tpch_params.q14_promo_effect_v2(spark, SF_SMOKE).collect()[0]
    assert row.promo_revenue_pct is not None and 0.0 < row.promo_revenue_pct < 100.0
