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
# whatever keys most need a FRESH driver row. The r13 gate passed
# 50/50 (zero wrong answers in thirteen rounds). r14 rotation (the
# r13 verdict's item 3): the six community/build keys the r13 Louvain
# stay-score fold and shared builds actually touched lead — they were
# in NEITHER the r12 nor r13 sample — then the keys whose plans this
# round audits or changes (the T44b/T44d ladders, ST28 ingest), then
# the remaining 27 r7-stale keys (closing out the r7 freshness
# queue), then the oldest r8-stale rows alphabetically to the 50-row
# cap. Remaining r8 keys queue for r15.
_PRIORITY = (
    # --- 1. r13-touched community/build keys (r13 verdict item 3:
    #     the round's biggest semantic-touching change — the Louvain
    #     stay-score fold + shared LPA/basket/adjacency builds — was
    #     in neither r12's nor r13's driver sample) ---
    "graph_louvain_move",
    "graph_louvain_ladder",
    "graph_modularity",
    "graph_label_propagation",
    "basket_pair_counts",
    "graph_oriented_adjacency",
    # --- 2. plan-audited/changed this round (r13 verdict items 4-6:
    #     LPA checkpoint cadence rides the four keys above; the T44b
    #     pagerank ladder + its PPR twin carry the HITS-style plan
    #     audit; ST28 carries the over-floor investigation) ---
    "graph_pagerank_ladder",
    "graph_ppr_ladder",
    "stream_data_vault_ingest",
    # --- 3. freshness re-checks: the 27 remaining r7-stale keys
    #     (closing the r7 queue begun in r13) ---
    "json_function_matrix",
    "lateral_join_topn",
    "multimodal_audio_energy",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_image_resize",
    "multimodal_phash_dedup",
    "multimodal_scene_cuts",
    "null_ordering_matrix",
    "q10_returned_items_v2",
    "q12_priority_classes_v2",
    "q17_small_qty_revenue_v2",
    "q18_large_orders_v2",
    "q19_disjunctive_filter_v2",
    "q4_order_priority_v2",
    "q9_product_profit_v2",
    "recursive_cte_closure",
    "semdedup_pairs",
    "sketch_cms_portable",
    "sketch_hll_portable",
    "sort_global_rank",
    "stream_cusum_monitor",
    "stream_distinct_exact",
    "stream_late_data_exact",
    "string_function_matrix",
    "timeseries_feature_frame",
    "window_function_matrix",
    # --- 4. oldest r8-stale rows, alphabetical; 14 of 43 fit under
    #     the cap (6 + 3 + 27 + 14) ---
    "ab_bootstrap_se",
    "ab_ks_test",
    "ab_mann_whitney",
    "ab_test_battery",
    "agg_approx_bound",
    "agg_cube",
    "agg_rollup",
    "ann_ivfpq_pinned_topk",
    "ann_pq_pinned_topk",
    "ann_rank_fusion",
    "ann_recall_eval",
    "etl_fk_discovery",
    "events_asof_join",
    "events_attribution_models",
    # ---- 50-row gate cap lands here (6 + 3 + 27 + 14) ----
    # --- r8 overflow -> head of the r15 queue ---
    "events_chi2_independence",
    "events_cohort_ltv",
    "events_exp_smoothing",
    "events_funnel",
    "events_gap_fill",
    "events_json_extract",
    "events_retention_cohorts",
    "events_rolling_window",
    "events_sessionize",
    "events_timeseries_backtest",
    "events_tumbling_window",
    "events_value_band_join",
    "graph_assortativity",
    "graph_copurchase_edges",
    "graph_copurchase_supported",
    "graph_link_prediction",
    "graph_purchase_edges",
    "ml_kmeans_ladder",
    "ml_logreg_pinned_score",
    "sketch_sample_quantiles",
    "stream_cohort_ltv",
    "stream_exp_smoothing",
    "stream_holt_trend",
    "text_zipf_profile",
    "window_lag_delta",
    "window_rank_ntile",
    "window_running_sum",
    "window_topk_per_group",
    # --- never-gated, no oracle by design (cross-engine
    #     nondeterminism or iterative float algorithms): rows-only
    #     driver signal only, so they sit below every pass-capable
    #     slot (the r6 verdict's fill choice, still right) ---
    "dedup_semantic_semdedup",
    "ann_ivfpq_topk",
    "ann_ivf_incremental",
    "text_bpe_encode",
    "ml_pagerank_bipartite",
    "ml_logreg_quality",
    "stream_late_data_accounting",
    "sketch_count_min_tokens",
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
