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
    insights,
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
    insights,
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
# whatever keys most need a FRESH driver row. The driver's last gate
# run produced the r4 rows, so EVERYTHING added in build rounds 5-7
# has never had a driver row; rotation order:
#   1. round-7 additions, 2. round-6 additions, 3. round-5 additions
#      (all never-gated — more than one 50-row gate will take to
#      clear; later rounds keep rotating),
#   4. keys whose newest driver row is r1, then r3,
#   5. the tail: r4-refreshed keys, re-verified locally by pytest.
_PRIORITY = (
    # --- round-8 additions (42 keys, newest first-in — none has ever
    #     had a driver row; under the 50-row gate cap they leave ~8
    #     slots for the round-7 keys below, and later rounds keep
    #     rotating) ---
    "market_basket_rules",
    "events_markov_transitions",
    "customer_rfm_segments",
    "pareto_abc_classes",
    "sales_growth_report",
    "ab_welch_ttest",
    "sample_importance_dsir",
    "etl_merge_clause_matrix",
    "stream_markov_transitions",
    "events_top_paths",
    "events_seasonal_baseline",
    "etl_benford_audit",
    "text_bigram_lm_score",
    "multimodal_phash_dedup",
    "source_corrupt_records",
    "graph_kcore",
    "events_conversion_lag",
    "etl_scd2_point_in_time",
    "etl_scd2_validity_audit",
    "agg_robust_outliers",
    "agg_group_ols",
    "text_novelty_decay",
    "text_chunk_udtf",
    "etl_lake_manifest",
    "sample_softdedup_weights",
    "events_sequence_match",
    "stream_novelty_rate",
    "multimodal_scene_cuts",
    "source_format_roundtrip",
    "item_similarity_cf",
    "text_bpe_roundtrip",
    "pipeline_analytics_mart",
    "ab_aa_calibration",
    "stream_pit_enrichment",
    "events_dau_wau_stickiness",
    "etl_freshness_report",
    "customer_tier_migration",
    "agg_weighted_quantiles",
    "revenue_gini_index",
    "text_quality_psi",
    "etl_calendar_gaps",
    "stream_freshness_monitor",
    "etl_key_discovery",
    "sample_temperature_mix",
    "etl_bitemporal_matrix",
    # --- round-7 additions (need a first driver row) ---
    "events_rolling_distinct",
    "events_range_frame_window",
    "fuzzy_distance_matrix",
    "agg_equidepth_histogram",
    "etl_expectations_report",
    "etl_backfill_plan",
    "text_hashed_tf",
    "ml_logreg_quality",
    "graph_triangle_count",
    "sample_group_aware_split",
    "dedup_leakproof_split",
    "stream_quota_per_source",
    "ann_ivf_incremental",
    "etl_erasure_propagation",
    "text_corpus_datasheet",
    "pipeline_training_data",
    "decimal_semantics_matrix",
    "etl_scd_type_matrix",
    "null_ordering_matrix",
    "etl_ri_audit",
    "text_lang_confusion",
    "q4_order_priority_v2",
    "q17_small_qty_revenue_v2",
    "lateral_join_topn",
    "etl_observed_load",
    "string_function_matrix",
    "dedup_threshold_curve",
    "events_funnel_conversion",
    "text_quality_dedup_interaction",
    "stream_funnel",
    "multimodal_blob_dedup",
    "json_function_matrix",
    "etl_multisource_harmonize",
    "dedup_span_excise",
    "asof_direction_matrix",
    "timeseries_feature_frame",
    "etl_entity_resolution",
    "etl_surrogate_hwm",
    "sample_mixture_epochs",
    "etl_masked_export",
    "source_federated_formats",
    # --- round-6 additions (need a first driver row) ---
    "interval_islands",
    "text_gopher_quality",
    "dedup_source_overlap",
    "dedup_semantic_semdedup",
    "text_bpe_encode",
    "etl_dynamic_partition_overwrite",
    "stream_left_outer_join",
    "text_chunk_documents",
    "sample_pack_sequences",
    "events_time_weighted_avg",
    "ann_sparse_tfidf_topk",
    "ml_pagerank_bipartite",
    "etl_write_audit_publish",
    "skew_key_diagnostics",
    "etl_aggregate_retract",
    "agg_filter_clause_matrix",
    "stream_dedup_within_watermark",
    "lateral_explode_matrix",
    "map_function_matrix",
    "datetime_function_matrix",
    "subquery_semantics_matrix",
    "text_chunk_dedup_stats",
    "q12_priority_classes_v2",
    "q19_disjunctive_filter_v2",
    # --- round-5 additions: the driver gate has not run since rounds
    #     5-7 landed (last driver row set is r4), so these have never
    #     had a driver row either — they outrank keys that at least
    #     carry an old row ---
    "sort_global_rank",
    "agg_mode_per_group",
    "ann_ivfpq_topk",
    "stream_topk",
    "window_function_matrix",
    "etl_reject_routing",
    "etl_snapshot_diff",
    "embedding_int8_quantize",
    "text_perplexity_buckets",
    "text_quality_terciles",
    "dedup_duplicate_spans",
    "recursive_cte_closure",
    "events_variant_extract",
    "agg_argmax_no_window",
    "source_binary_files",
    "stream_late_data_accounting",
    "multimodal_audio_energy",
    "multimodal_image_resize",
    # --- keys still carrying r1 driver rows ---
    "events_tumbling_window",
    "events_funnel",
    "events_asof_join",
    "events_gap_fill",
    "events_json_extract",
    "events_rolling_window",
    "events_value_band_join",
    "events_retention_cohorts",
    # --- cut off below the r5 cap: oldest remaining (r3 rows) ---
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
    # --- tail: r4-refreshed keys whose code is untouched since; they
    #     keep their driver signal and pytest re-verifies locally ---
    "sample_weighted_aes",
    "text_vocab_topk",
    "text_bigram_pairs",
    "events_anomaly_zscore",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q7_volume_shipping",
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
