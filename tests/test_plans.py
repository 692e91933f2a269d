"""Physical-plan assertions (SURVEY.md §4): the plans must stay the
plans we designed — pushdown reaching parquet, dims broadcast, no
accidental row-at-a-time Python in JVM-able paths.
"""

import __spark_entry__ as entrymod
from proceso_de_etl_spark.plans import tpch
from tests.conftest import SF_CORRECT


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_q6_filters_pushed_to_scan(spark):
    df = tpch.q6_forecast_revenue(spark, SF_CORRECT)
    plan = plan_of(df)
    assert "PushedFilters: [" in plan
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in plan.split("PushedFilters")[1][:400], f"{col} not pushed"


def test_q6_column_pruning(spark):
    df = tpch.q6_forecast_revenue(spark, SF_CORRECT)
    plan = plan_of(df)
    read_schema = plan.split("ReadSchema:")[1][:400]
    assert "l_extendedprice" in read_schema
    # pruned: columns the query never touches must not be scanned
    for col in ("l_orderkey", "l_partkey", "l_returnflag", "l_tax"):
        assert col not in read_schema, f"{col} should be pruned from scan"


def test_q5_dimensions_broadcast(spark):
    plan = plan_of(tpch.q5_local_supplier(spark, SF_CORRECT))
    assert plan.count("BroadcastHashJoin") >= 4, plan[:2000]


def test_q1_partial_aggregation_and_codegen(spark):
    df = tpch.q1_pricing_summary(spark, SF_CORRECT)
    plan = plan_of(df)
    # map-side combine: the shuffle carries ≤|groups| rows per task
    assert "partial_sum" in plan
    # codegen markers (the "*(n)" stage prefix) only appear in the
    # final adaptive plan, after execution
    df.collect()
    final = plan_of(df)
    assert "isFinalPlan=true" in final and "*(" in final


def test_no_python_udf_in_jvm_paths(spark):
    """Every query except the explicitly-Arrow ones must compile to a
    pure JVM plan: no BatchEvalPython (row-at-a-time Python)."""
    arrow_ok = {"multimodal_features"}
    streaming = {"stream_tumbling_window", "stream_session_window", "stream_dedup"}
    for name, fn in entrymod.queries().items():
        if name in streaming:
            continue  # materialized via memory sink; inner plan checked via batch twins
        df = fn(spark, SF_CORRECT)
        plan = plan_of(df)
        assert "BatchEvalPython" not in plan, f"{name} uses row-at-a-time Python"
        if name not in arrow_ok:
            assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan, (
                f"{name} unexpectedly uses a Python stage"
            )


def test_semi_filter_is_semi_join(spark):
    from proceso_de_etl_spark.operators.etl import etl_semi_filter

    plan = optimized_of(etl_semi_filter(spark, SF_CORRECT))
    assert "LeftSemi" in plan


def test_incremental_is_anti_join(spark):
    from proceso_de_etl_spark.operators.etl import etl_incremental_antijoin

    plan = optimized_of(etl_incremental_antijoin(spark, SF_CORRECT))
    assert "LeftAnti" in plan
