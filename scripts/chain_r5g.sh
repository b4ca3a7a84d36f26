#!/usr/bin/env bash
# Inverse-baseline campaign retry (after r5f): skip_bad_trajs + imax 10 so
# tasks this feed-forward policy cannot keep valid drop out with a log line
# instead of aborting the row.
set -u
cd /root/repo
wait_pid_file() {
    [ -f "$1" ] || return 0
    local p; p=$(cat "$1")
    while kill -0 "$p" 2>/dev/null; do sleep 60; done
}
wait_pid_file /tmp/chain_f.pid
echo "=== r5g start $(date) ==="
VMPC_RESULT_DIR=/root/data/bench/ag_inverse2 timeout 3000 \
    python -m visual_foresight_tpu.sim.run \
    benchmarks/ag_bench20_inverse/hparams.py --benchmark \
    > /tmp/ag_inverse2.log 2>&1
echo "inverse campaign rc=$?"
mkdir -p benchmarks/ag_bench20_inverse/runs/r5_v1
cp benchmarks/ag_bench20_inverse/verbose/results_0to19.txt \
   benchmarks/ag_bench20_inverse/verbose/results_all.txt \
   benchmarks/ag_bench20_inverse/verbose/scores_0to19.pkl \
   benchmarks/ag_bench20_inverse/runs/r5_v1/ 2>/dev/null
rm -rf benchmarks/ag_bench20_inverse/verbose/verbose
grep -m1 'mean imp' benchmarks/ag_bench20_inverse/runs/r5_v1/results_all.txt
echo "=== r5g complete $(date) ==="
