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
# whatever keys most need a FRESH driver row. The r12 gate passed
# 50/50 (zero wrong answers in twelve rounds; after it no green
# ledger row is older than r6). r13 rotation: the final 22 r6-stale
# keys lead — gating them COMPLETES the freshness program begun in
# r7 (every oracle-paired key re-gated within the last 6 rounds) —
# then the keys that are NEW or whose PLAN changes this round
# (E16b `etl_profile_table_approx` is NEW post-r12; the triangle
# family A59/A77/A109/A116 shares a persisted oriented adjacency —
# the r12 verdict's amortization item; A64b HITS and ST28 ingest
# carry the r13 profile-driven rewrites; A69/A82 ride the
# decomposed basket pair frame), then the oldest r7-fresh rows
# alphabetically to the 50-row cap. Remaining r7 keys queue for r14.
_PRIORITY = (
    # --- 1. the last 22 r6-stale keys (freshness close-out) ---
    "pipeline_training_data",
    "sample_group_aware_split",
    "sample_mixture_epochs",
    "sample_pack_sequences",
    "skew_key_diagnostics",
    "source_binary_files",
    "source_federated_formats",
    "stream_dedup_within_watermark",
    "stream_funnel",
    "stream_left_outer_join",
    "stream_quota_per_source",
    "stream_topk",
    "subquery_semantics_matrix",
    "text_chunk_dedup_stats",
    "text_chunk_documents",
    "text_corpus_datasheet",
    "text_gopher_quality",
    "text_hashed_tf",
    "text_lang_confusion",
    "text_perplexity_buckets",
    "text_quality_dedup_interaction",
    "text_quality_terciles",
    # --- 2. NEW in r13 + plan-changed in r13 (E16b approx profile;
    #     triangle family on the shared oriented adjacency; HITS /
    #     vault-ingest / basket-family r13 rewrites) ---
    "etl_profile_table_approx",
    "graph_triangle_count",
    "graph_kcore",
    "graph_ktruss",
    "graph_clustering_coeff",
    "graph_hits_ladder",
    "stream_data_vault_ingest",
    "market_basket_rules",
    "item_similarity_cf",
    # --- 3. freshness re-checks: oldest full-pass rows (r7),
    #     alphabetical; 19 of 48 fit under the cap (22 + 9 + 19) ---
    "agg_argmax_no_window",
    "agg_mode_per_group",
    "ann_ivf_pinned_topk",
    "ann_lsh_bucketed",
    "asof_direction_matrix",
    "decimal_semantics_matrix",
    "dedup_embedding_lsh_pairs",
    "dedup_incremental_minhash",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "etl_atomic_write",
    "events_anomaly_zscore",
    "events_cusum_changepoint",
    "events_funnel_conversion",
    "events_time_weighted_avg",
    "events_variant_extract",
    "graph_coarsen",
    "graph_connected_components",
    "graph_label_propagation",
    # ---- 50-row gate cap lands here (22 + 9 + 19) ----
    # --- r7 overflow -> head of the r14 queue ---
    "graph_louvain_move",
    "graph_modularity",
    "json_function_matrix",
    "lateral_join_topn",
    "multimodal_audio_energy",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_image_resize",
    "multimodal_phash_dedup",
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
