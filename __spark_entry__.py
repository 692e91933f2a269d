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
# whatever keys most need a FRESH driver row. The r11 gate passed
# 50/50 (zero wrong answers in eleven rounds; after it no green
# ledger row is older than r5). r12 rotation: the 9 r5-overflow keys
# lead (the last pre-r6 rows — gating them completes the freshness
# program begun in r7: every oracle-paired key re-gated within the
# last 6 rounds), then the 13 keys whose PLAN changed or that are NEW
# this round (ST28's merge is now min-aware full_outer — the r11
# advisor's delivery-order fix; E54 counts distinct on the business
# key through the hub — the r11 advisor's collision fix; E53's path
# dedup moved before the snapshot expansion — the r11 third-decade
# fix; E56 vault deletes, A110 BFS, A111 ACF, A112 KM survival are
# NEW; A113 MK/Theil-Sen, A114 seasonal decomposition, A115
# Holt-Winters, ST29 streaming Holt-Winters, A116 k-truss and the
# kcore peel change joined mid-round), then 28 of the 50 r6-stale
# rows alphabetically. The 22 r6 keys past the cap lead the r13
# queue.
_PRIORITY = (
    # --- 1. the 9 r5-overflow keys (freshness close-out) ---
    "stream_freshness_monitor",
    "stream_markov_transitions",
    "stream_novelty_rate",
    "stream_pit_enrichment",
    "text_bigram_lm_score",
    "text_bpe_roundtrip",
    "text_chunk_udtf",
    "text_novelty_decay",
    "text_quality_psi",
    # --- 2. plan-changed in r12 + NEW in r12 (E56 deletes, A110 BFS,
    #     A111 ACF, A112 KM, A113 MK/Theil-Sen; graph_kcore's peel
    #     now accumulates removed nodes instead of checkpointing
    #     edges) — new/changed keys outrank r6 re-checks ---
    "stream_data_vault_ingest",
    "stream_holt_winters",
    "etl_data_vault_mart",
    "etl_data_vault_bridge",
    "etl_data_vault_deletes",
    "graph_bfs_distance",
    "graph_kcore",
    "graph_ktruss",
    "events_autocorrelation",
    "events_survival_km",
    "events_trend_mk_theilsen",
    "events_seasonal_decompose",
    "events_holt_winters",
    # --- 3. freshness re-checks: oldest full-pass rows (r6),
    #     alphabetical; 28 of 50 fit under the cap (9 + 13 + 28) ---
    "agg_filter_clause_matrix",
    "ann_sparse_tfidf_topk",
    "datetime_function_matrix",
    "dedup_duplicate_spans",
    "dedup_leakproof_split",
    "dedup_source_overlap",
    "dedup_span_excise",
    "dedup_threshold_curve",
    "embedding_int8_quantize",
    "etl_aggregate_retract",
    "etl_backfill_plan",
    "etl_dynamic_partition_overwrite",
    "etl_entity_resolution",
    "etl_erasure_propagation",
    "etl_masked_export",
    "etl_multisource_harmonize",
    "etl_observed_load",
    "etl_reject_routing",
    "etl_ri_audit",
    "etl_scd_type_matrix",
    "etl_snapshot_diff",
    "etl_surrogate_hwm",
    "etl_write_audit_publish",
    "graph_triangle_count",
    "interval_islands",
    "lateral_explode_matrix",
    "map_function_matrix",
    "multimodal_blob_dedup",
    # ---- 50-row gate cap lands here (9 + 13 + 28) ----
    # --- r6 overflow -> head of the r13 queue ---
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
