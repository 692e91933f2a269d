#!/bin/bash
# SCALE_r14 batches (r13 verdict item 1): the 4-tier re-curves for the
# families whose PLANS changed in r13 (triangle family on the shared
# oriented adjacency, HITS single-execution rounds, basket family on
# the shared pair frame), the r13-new build/summary keys, E16/E16b,
# ST28 — plus the community family (the r13 Louvain stay-score fold +
# the r14 LPA checkpoint-cadence change) and the sf10 vault A/B leg.
# One JVM per family (r10 lesson); cell ordering is build-first so
# downstream keys read warm. Seed SCALE_r14.json from SCALE_r13.json
# first so the r13 sf1.0 vault A/B leg carries forward.
set -e
cd /root/repo
[ -f SCALE_r14.json ] || cp SCALE_r13.json SCALE_r14.json
export SPARK_GRAFT_SF10=1
run() { echo "=== batch: $* ==="; python scale_curve.py 14 "$@" 2>&1 | grep -E "^rep|artifact|generated"; }

run graph_copurchase_edges graph_oriented_adjacency graph_triangle_count graph_clustering_coeff graph_kcore
run graph_copurchase_supported graph_ktruss
run graph_purchase_edges graph_pagerank_ladder graph_hits_ladder
run basket_pair_counts market_basket_rules item_similarity_cf
run graph_label_propagation graph_modularity graph_louvain_move graph_louvain_ladder
run etl_profile_table etl_profile_table_approx
run stream_data_vault_ingest
echo "=== vault A/B sf10 leg ==="
python profile_vault_ab.py 14 10 2>&1 | grep -E "tier|artifact" || true
echo "R14 BATCHES DONE"
