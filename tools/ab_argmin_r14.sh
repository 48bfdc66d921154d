#!/bin/bash
# Interleaved A/B of the argmin rewrite: old = worktree @ f9931a8, new = HEAD.
# Waits for loadavg < 2.0 before each session (the bench.py guard).
set -u
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32
QUERIES="dedup_semantic similarity_ivf_pq similarity_ivf_kmeans similarity_ivf_incremental"
wait_quiet() {
  for i in $(seq 1 60); do
    la=$(cut -d' ' -f1 /proc/loadavg)
    ok=$(python3 -c "print(1 if float('$la') < 2.0 else 0)")
    [ "$ok" = "1" ] && return 0
    echo "[ab] loadavg $la >= 2.0 - sleeping 30s ($i)" >&2
    sleep 30
  done
  echo "[ab] giving up waiting for quiet box" >&2
  return 1
}
for round in 1 2; do
  wait_quiet
  echo "=== OLD round $round (loadavg $(cut -d' ' -f1 /proc/loadavg)) ==="
  (cd /tmp/wt_preargmin && python tools/opt_measure.py ab_old_r$round $QUERIES 2>/dev/null)
  wait_quiet
  echo "=== NEW round $round (loadavg $(cut -d' ' -f1 /proc/loadavg)) ==="
  (cd /root/repo && python tools/opt_measure.py ab_new_r$round $QUERIES 2>/dev/null)
done
