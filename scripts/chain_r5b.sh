#!/usr/bin/env bash
# Round-5 TPU work queue (after the v1 chain frees the single-client TPU):
#   1. inverse-model training on the mixed transport corpus + its ag_bench20
#      campaign row (first-ever inverse baseline row)
#   2. lane-alignment A/B: xz_bench20 at 768 vs 800 samples, SAME vendored
#      checkpoint (docs/PERFORMANCE.md sample-sweep follow-up)
#   3. goal-conditioned classifier campaign on ag_bench20 (classifier
#      checkpoint produced by the CPU trainer; waits for it)
# Campaign aggregates are archived under benchmarks/<set>/runs/<tag>; the
# vendored verbose/ of PRE-EXISTING benchmark dirs is restored afterwards
# (new dirs keep their first row in verbose/).
#
# Usage: chain_r5b.sh [wait_pid]
set -u
cd /root/repo

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
echo "=== r5b start $(date) ==="

harvest() {  # harvest <set> <tag>
    local set=$1 tag=$2
    mkdir -p "benchmarks/$set/runs/$tag"
    cp "benchmarks/$set/verbose/results_0to19.txt" \
       "benchmarks/$set/verbose/results_all.txt" \
       "benchmarks/$set/verbose/scores_0to19.pkl" \
       "benchmarks/$set/runs/$tag/" 2>/dev/null
    rm -rf "benchmarks/$set/verbose/verbose"
    if git ls-files --error-unmatch "benchmarks/$set/verbose/results_all.txt" \
            >/dev/null 2>&1; then
        git checkout -- "benchmarks/$set/verbose"
    fi
    echo "--- $set/$tag: $(grep -m1 'mean imp' \
        benchmarks/$set/runs/$tag/results_all.txt 2>/dev/null)"
}

# ---- 1. inverse baseline ---------------------------------------------------
if [ ! -e /root/data/models/ag_r5_inverse/step_3000 ]; then
    timeout 1800 python -m visual_foresight_tpu.training.train_inverse \
        --data_dir /root/data/collect/ag_r5f_v1_all --adim 4 \
        --model_dir /root/data/models/ag_r5_inverse --steps 3000 \
        > /root/data/models/ag_r5_inverse_train.log 2>&1
    echo "inverse training rc=$?"
fi
VMPC_RESULT_DIR=/root/data/bench/ag_inverse timeout 2400 \
    python -m visual_foresight_tpu.sim.run \
    benchmarks/ag_bench20_inverse/hparams.py --benchmark \
    > /tmp/ag_inverse.log 2>&1
echo "inverse campaign rc=$?"
harvest ag_bench20_inverse r5_v1

# ---- 2. lane-alignment A/B on the vendored lifting set ---------------------
XZMODEL=$PWD/benchmarks/models/xz_flagship
for ns in 768 800; do
    VMPC_MODEL_DIR=$XZMODEL VMPC_NUM_SAMPLES=$ns \
        VMPC_RESULT_DIR=/root/data/bench/xz_s$ns timeout 3600 \
        python -m visual_foresight_tpu.sim.run \
        benchmarks/xz_bench20/hparams.py --benchmark \
        > /tmp/xz_s$ns.log 2>&1
    echo "xz s$ns campaign rc=$?"
    harvest xz_bench20 r5_s$ns
done

# ---- 3. classifier-cost campaign on the transport set ----------------------
for _ in $(seq 150); do
    [ -e /root/data/models/ag_r5_classifier/step_3000 ] && break
    sleep 60
done
VMPC_MODEL_DIR=/root/data/models/ag_r5f_v1 VMPC_STD_LIFT=0.15 \
    VMPC_RESULT_DIR=/root/data/bench/ag_clf timeout 3600 \
    python -m visual_foresight_tpu.sim.run \
    benchmarks/ag_bench20_classifier/hparams.py --benchmark \
    > /tmp/ag_clf.log 2>&1
echo "classifier campaign rc=$?"
harvest ag_bench20_classifier r5_v1
echo "=== r5b complete $(date) ==="
