#!/bin/bash
# SCALE_r13 batches: re-curve at 4 tiers the keys whose PLANS changed
# this round (triangle family on the shared oriented adjacency, HITS
# single-execution rounds, basket family on the shared pair frame)
# plus the r13-new build/summary keys. One JVM per family (r10
# lesson); cell ordering is build-first so downstream keys read warm.
set -e
cd /root/repo
export SPARK_GRAFT_SF10=1
run() { echo "=== batch: $* ==="; python scale_curve.py 13 "$@" 2>&1 | grep -E "^rep|artifact|generated"; }

run graph_copurchase_edges graph_oriented_adjacency graph_triangle_count graph_clustering_coeff graph_kcore
run graph_copurchase_supported graph_ktruss
run graph_purchase_edges graph_pagerank_ladder graph_hits_ladder
run basket_pair_counts market_basket_rules item_similarity_cf
run etl_profile_table etl_profile_table_approx
run stream_data_vault_ingest
echo "R13 BATCHES DONE"
