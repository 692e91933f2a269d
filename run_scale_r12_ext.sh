#!/bin/bash
# SCALE_r12 extension batches 23-31: re-curve at 4 tiers the r11-curved
# keys not yet measured on the r12 codebase, one JVM per family.
set -e
cd /root/repo
export SPARK_GRAFT_SF10=1
run() { echo "=== batch: $* ==="; python scale_curve.py 12 "$@" 2>&1 | grep -E "^rep2|artifact"; }

run ab_aa_calibration ab_welch_ttest agg_group_ols agg_histogram agg_robust_outliers agg_stats_matrix agg_weighted_quantiles
run text_fingerprint text_lang_id text_token_count text_zipf_profile text_repetition_ratio text_sentiment
run text_tfidf_topterms text_pii_redaction text_chunk_documents text_novelty_decay text_perplexity_buckets text_quality_psi
run dedup_containment dedup_decontaminate dedup_incremental ann_sparse_tfidf_topk sketch_count_min_tokens
run events_asof_join events_conversion_lag events_dau_wau_stickiness events_funnel events_hopping_window
run events_markov_transitions events_range_frame_window events_seasonal_baseline events_sequence_match
run etl_aggregate_upsert etl_benford_audit etl_bitemporal_matrix etl_calendar_gaps etl_conflict_resolve etl_profile_table etl_scd2_point_in_time
run etl_data_vault_build etl_data_vault_effectivity etl_data_vault_same_as_link graph_louvain_ladder
run customer_rfm_segments customer_tier_migration revenue_gini_index sales_growth_report pipeline_analytics_mart item_similarity_cf
run q2_min_cost_supplier q11_important_parts q20_excess_shippers join_type_matrix fuzzy_distance_matrix bucketed_colocated_join
run sample_importance_dsir sample_softdedup_weights sample_stratified sample_temperature_mix source_corrupt_records source_format_roundtrip
echo "EXT BATCHES DONE"
