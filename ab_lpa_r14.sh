#!/bin/bash
# Interleaved fresh-JVM A/B for the r14 LPA checkpoint-cadence change
# (two rounds composed per checkpointed job). Legs alternate so box
# epoch drift cancels pairwise (the r13 discipline): A = r13 close
# (worktree /tmp/wt_r13), B = HEAD. One rep per leg per round; keys:
# graph_label_propagation (pays supported-edge build + LPA loop),
# graph_modularity (rides the lpa_labels memo warm).
set -e
ROUNDS=${1:-4}
for i in $(seq 1 "$ROUNDS"); do
  echo "=== round $i leg A (r13) ==="
  (cd /tmp/wt_r13 && python time_keys.py 1 graph_label_propagation graph_modularity 2>/dev/null)
  echo "=== round $i leg B (HEAD) ==="
  (cd /root/repo && python time_keys.py 1 graph_label_propagation graph_modularity 2>/dev/null)
done
echo "AB DONE"
