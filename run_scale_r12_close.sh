#!/bin/bash
# SCALE_r12 close-out batches 12-22: the remaining bench-suite keys
# without an r12 curve, one JVM per family (round-10 lesson: broadcast
# blocks accumulate until GC; a fresh JVM per family keeps every
# measurement comparable). Each invocation merges into SCALE_r12.json.
set -e
cd /root/repo
export SPARK_GRAFT_SF10=1
run() { echo "=== batch: $* ==="; python scale_curve.py 12 "$@" 2>&1 | grep -E "^rep|artifact|generated" ; }

run ab_bootstrap_se ab_ks_test ab_mann_whitney ab_test_battery
run ann_cosine_topk ann_recall_eval ann_lsh_bucketed
run ann_ivf_pinned_topk ann_pq_pinned_topk ann_ivf_incremental_pinned
run events_chi2_independence events_rolling_distinct events_exp_smoothing events_holt_trend events_trend_mk_theilsen
run events_attribution_models events_cohort_ltv events_timeseries_backtest events_top_paths
run graph_copurchase_edges graph_triangle_count graph_kcore
run graph_louvain_ladder ml_kmeans_ladder
run market_basket_rules pareto_abc_classes
run etl_data_vault_pit etl_data_vault_mart etl_data_vault_mart_refresh
run etl_data_vault_bridge
run stream_data_vault_ingest
echo "ALL BATCHES DONE"
