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
# whatever keys most need a FRESH driver row. Round-4 rotation:
#   1. queries ADDED this round (no driver row yet) — kept at the top;
#   2. the 49 keys whose latest driver row dates from round-1 code
#      (rounds 2-3 gated the other half of the contract; VERDICT r3
#      item 1) — ETL core, the q-suite, windows, rollup/cube/sets,
#      function matrices, §2 events;
#   3. the tail past the 50-cap: bonus (non-§2) events keys and
#      r3-green rows — they keep their existing driver signal and the
#      full pytest suite re-verifies them locally every round.
_PRIORITY = (
    # --- round-4 additions (no driver row yet) ---
    "stream_cdc_apply",
    "sketch_theta_setops",
    "sketch_kll_quantiles",
    "sketch_hll_rollup",
    "q1_pricing_summary_v2",
    "q3_shipping_priority_v2",
    "q5_local_supplier_v2",
    "q6_forecast_revenue_v2",
    "q14_promo_effect_v2",
    "dedup_incremental",
    "dedup_incremental_minhash",
    "bucketed_colocated_join",
    "sample_split_train_eval",
    "q9_product_profit",
    "q11_important_parts",
    "etl_dpp_join",
    "etl_compact_small_files",
    "sample_weighted_aes",
    "text_unigram_lm_score",
    "agg_stats_matrix",
    "text_bigram_pairs",
    "dedup_containment",
    "etl_time_travel_read",
    "ann_pq_topk",
    "stream_approx_distinct",
    "text_bpe_train",
    "join_type_matrix",
    "events_hopping_window",
    "sample_mixture_rebalance",
    "agg_histogram",
    # --- code/config changed this round (r3 rows now stale) ---
    "dedup_decontaminate",  # DF-cap changed query AND oracle
    "q20_excess_shippers",  # bloom-filter pruning config
    # --- stale round-1 driver rows: ETL core ---
    "etl_clean_id",
    "etl_dedup_keep_first",
    "etl_dim_extract",
    "etl_fk_map",
    "etl_placeholders",
    "etl_conflict_resolve",
    "etl_semi_filter",
    "etl_dropna_load",
    "etl_incremental_antijoin",
    "etl_star_flagship",
    "etl_partition_prune",
    "etl_aggregate_upsert",
    "etl_profile_table",
    "etl_atomic_write",
    # --- stale: analytic q-suite (r2 edited tpch*.py) ---
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
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
    # --- stale: windows / grouped aggs / matrices / §2 events ---
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
    "events_sessionize",
    "events_tumbling_window",
    "events_funnel",
    "events_asof_join",
    "events_gap_fill",
    # --- tail (past the 50-cap this round): bonus events keys (r1
    # rows, code untouched since r1) and the r3-green extract row ---
    "events_json_extract",
    "events_rolling_window",
    "events_value_band_join",
    "events_retention_cohorts",
    "etl_extract_conform",
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
