"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship plan at sf0.001;
``queries()`` maps every implemented operator from SURVEY.md §2 to a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` pairs each
SQL-expressible one with ANSI SQL for the DuckDB gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from proceso_de_etl_spark.operators import (
    dedup,
    etl,
    events,
    ml,
    multimodal,
    pipeline,
    relational,
    sampling,
    scd,
    similarity,
    sketches,
    text_analysis,
    windows,
)
from proceso_de_etl_spark.plans import tpch, tpch_ext, tpch_params
from proceso_de_etl_spark.sources import bucketing
from proceso_de_etl_spark.sources import io as sources_io
from proceso_de_etl_spark.streaming import cdc as streaming_cdc
from proceso_de_etl_spark.streaming import jobs as streaming_jobs

# Registration order IS gate order: the driver's correctness gate
# consumes queries() in this order and may truncate (round 1 stopped
# at 50), so the modules whose queries lacked a driver-side signal in
# round 1 (§2.3 training-data ops, streaming, SCD2, relational tail)
# come right after etl; the round-1-green analytic suites close the
# list.
_MODULES = (
    etl,
    dedup,
    similarity,
    text_analysis,
    multimodal,
    sampling,
    pipeline,
    ml,
    scd,
    streaming_jobs,
    streaming_cdc,
    sketches,
    bucketing,
    sources_io,
    relational,
    windows,
    events,
    tpch,
    tpch_ext,
    tpch_params,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's full star-schema ETL (SURVEY.md §2.1
    E11) on /root/testdata/sf0.001; driver checks rows>0."""
    return etl.etl_star_flagship(spark, "/root/testdata/sf0.001")


# Registration order IS gate order and the driver's correctness gate
# truncates at 50 rows per round, so _PRIORITY rotates each round to
# whatever keys most need a FRESH driver row. Round-5 rotation
# (VERDICT r4 items 1 and 3):
#   1. queries ADDED or CHANGED this round (the two operators
#      registered this round, the three de-single-partitioned top-k
#      queries, the zscore clamp, new r5 operators);
#   2. the 32 keys whose latest driver row predates the last commit
#      touching their code path (r1 rows: q-suite tail, windows,
#      rollup/cube/sets, matrices, §2 events, bonus events keys);
#   3. the tail past the 50-cap: keys with fresh r4 rows and code
#      untouched since — they keep their r4 driver signal and the
#      full pytest suite re-verifies them locally every round.
_PRIORITY = (
    # --- round-5 additions / changes (need a first or fresh row) ---
    "sort_global_rank",
    "agg_mode_per_group",
    "sample_weighted_aes",
    "text_vocab_topk",
    "text_bigram_pairs",
    "events_anomaly_zscore",
    "ann_ivfpq_topk",
    "stream_topk",
    "window_function_matrix",
    "etl_reject_routing",
    "etl_snapshot_diff",
    "sketch_count_min_tokens",
    "embedding_int8_quantize",
    "text_perplexity_buckets",
    "text_quality_terciles",
    "stream_late_data_accounting",
    "dedup_duplicate_spans",
    "recursive_cte_closure",
    "events_variant_extract",
    "agg_argmax_no_window",
    "q9_product_profit_v2",
    "q10_returned_items_v2",
    "q18_large_orders_v2",
    "multimodal_audio_energy",
    "multimodal_image_resize",
    "source_binary_files",
    "text_bpe_train",
    # --- stale round-1 driver rows: analytic q-suite tail ---
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q14_promo_effect",
    "q16_parts_supplier_cnt",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_disjunctive_filter",
    "q21_waiting_supplier",
    "q22_global_sales",
    # --- stale: windows / grouped aggs / matrices ---
    "window_topk_per_group",
    "window_running_sum",
    "window_lag_delta",
    "window_rank_ntile",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "scalar_function_matrix",
    "array_function_matrix",
    "null_semantics_matrix",
    # --- stale: §2 events + bonus events keys (r1 rows) ---
    "events_sessionize",
    "events_tumbling_window",
    "events_funnel",
    "events_asof_join",
    "events_gap_fill",
    "events_json_extract",
    "events_rolling_window",
    "events_value_band_join",
    "events_retention_cohorts",
    # --- stale r3 rows for completeness (oldest remaining) ---
    "etl_extract_conform",
    "etl_scd2_merge",
    "etl_load_audit",
    "etl_cdc_apply",
    "etl_zorder_write",
    "q12_priority_classes",
    "q13_customer_distribution",
    "q15_top_supplier",
    "agg_pivot",
    "agg_unpivot",
    "set_ops_customers",
    "agg_distinct_exact",
    "agg_percentiles",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        merged.update(m.QUERIES)
    out = {k: merged[k] for k in _PRIORITY if k in merged}
    out.update(merged)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
