#!/usr/bin/env bash
# End-of-round opportunistic slot, highest-value first (each ~13 min at
# 768 samples; run as many as the clock allows):
#   1. classifier cost + v2 model on the EASY set (best-row candidate:
#      classifier beat pixel on v1, v2 beat v1 on pixel)
#   2. replan-cadence variant (VMPC_REPLAN=5) of the v2 pixel hard campaign
#   3. classifier cost + V1 model on the HARD set (v1 is the more
#      conservative predictor; hedge if v2-classifier-hard disappoints)
set -u
cd /root/repo
wait_pid_file() {
    [ -f "$1" ] || return 0
    local p; p=$(cat "$1")
    while kill -0 "$p" 2>/dev/null; do sleep 60; done
}
wait_pid_file /tmp/chain_d.pid
echo "=== r5f start $(date) ==="

harvest() {
    local set=$1 tag=$2
    mkdir -p "benchmarks/$set/runs/$tag"
    cp "benchmarks/$set/verbose/results_0to19.txt" \
       "benchmarks/$set/verbose/results_all.txt" \
       "benchmarks/$set/verbose/scores_0to19.pkl" \
       "benchmarks/$set/runs/$tag/" 2>/dev/null
    rm -rf "benchmarks/$set/verbose/verbose"
    echo "--- $set/$tag: $(grep -m1 'mean imp' \
        benchmarks/$set/runs/$tag/results_all.txt 2>/dev/null)"
}

VMPC_MODEL_DIR=/root/data/models/ag_r5f_v2 VMPC_STD_LIFT=0.15 \
    VMPC_RESULT_DIR=/root/data/bench/ag_clf_v2_easy timeout 3600 \
    python -m visual_foresight_tpu.sim.run \
    benchmarks/ag_bench20_classifier/hparams.py --benchmark \
    > /tmp/ag_clf_v2_easy.log 2>&1
echo "clf-v2-easy rc=$?"
harvest ag_bench20_classifier r5_v2_easy

VMPC_MODEL_DIR=/root/data/models/ag_r5f_v2 VMPC_STD_LIFT=0.15 VMPC_REPLAN=5 \
    VMPC_RESULT_DIR=/root/data/bench/ag_r5f_v2_hard_rp5 timeout 3600 \
    python -m visual_foresight_tpu.sim.run \
    benchmarks/ag_bench20_hard/hparams.py --benchmark \
    > /tmp/ag_r5f_v2_hard_rp5.log 2>&1
echo "rp5 campaign rc=$?"
harvest ag_bench20_hard r5_v2_rp5
git checkout -- benchmarks/ag_bench20_hard/verbose 2>/dev/null || true

VMPC_MODEL_DIR=/root/data/models/ag_r5f_v1 VMPC_STD_LIFT=0.15 \
    VMPC_TASK_SET=ag_bench20_hard \
    VMPC_RESULT_DIR=/root/data/bench/ag_clf_v1_hard timeout 3600 \
    python -m visual_foresight_tpu.sim.run \
    benchmarks/ag_bench20_classifier/hparams.py --benchmark \
    > /tmp/ag_clf_v1_hard.log 2>&1
echo "clf-v1-hard rc=$?"
harvest ag_bench20_classifier r5_v1_hard
echo "=== r5f complete $(date) ==="
