#!/usr/bin/env bash
# End-of-round opportunistic slot: replan-cadence variant (VMPC_REPLAN=5)
# of the hard transport campaign on the v2 model — runs only if the round
# clock allows (after the registration rebuild releases the TPU).
set -u
cd /root/repo
wait_pid_file() {
    [ -f "$1" ] || return 0
    local p; p=$(cat "$1")
    while kill -0 "$p" 2>/dev/null; do sleep 60; done
}
wait_pid_file /tmp/chain_d.pid
echo "=== r5f start $(date) ==="
VMPC_MODEL_DIR=/root/data/models/ag_r5f_v2 VMPC_STD_LIFT=0.15 VMPC_REPLAN=5 \
    VMPC_RESULT_DIR=/root/data/bench/ag_r5f_v2_hard_rp5 timeout 3600 \
    python -m visual_foresight_tpu.sim.run \
    benchmarks/ag_bench20_hard/hparams.py --benchmark \
    > /tmp/ag_r5f_v2_hard_rp5.log 2>&1
echo "rp5 campaign rc=$?"
mkdir -p benchmarks/ag_bench20_hard/runs/r5_v2_rp5
cp benchmarks/ag_bench20_hard/verbose/results_0to19.txt \
   benchmarks/ag_bench20_hard/verbose/results_all.txt \
   benchmarks/ag_bench20_hard/verbose/scores_0to19.pkl \
   benchmarks/ag_bench20_hard/runs/r5_v2_rp5/ 2>/dev/null
rm -rf benchmarks/ag_bench20_hard/verbose/verbose
git checkout -- benchmarks/ag_bench20_hard/verbose 2>/dev/null || true
grep -m1 'mean imp' benchmarks/ag_bench20_hard/runs/r5_v2_rp5/results_all.txt
echo "=== r5f complete $(date) ==="
