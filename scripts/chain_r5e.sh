#!/usr/bin/env bash
# Round-5 inverse-model rerun + bench validation (after the v2 chain):
# the first inverse attempt lost its training to a timeout before the
# trainer had periodic checkpoints; rerun with --ckpt_every so a timeout
# still leaves a servable model, then give the baseline its campaign row,
# then run bench.py once to measure the chunked 800-sample operating point
# on the real chip.
set -u
cd /root/repo

wait_pid_file() {
    [ -f "$1" ] || return 0
    local p; p=$(cat "$1")
    while kill -0 "$p" 2>/dev/null; do sleep 60; done
}
wait_pid_file /tmp/chain_c.pid
echo "=== r5e start $(date) ==="

timeout 2400 python -m visual_foresight_tpu.training.train_inverse \
    --data_dir /root/data/collect/ag_r5f_v1_all --adim 4 \
    --model_dir /root/data/models/ag_r5_inverse --steps 2000 \
    --ckpt_every 500 \
    > /root/data/models/ag_r5_inverse_train.log 2>&1
echo "inverse training rc=$?"
ls /root/data/models/ag_r5_inverse/ 2>/dev/null | tail -3

VMPC_RESULT_DIR=/root/data/bench/ag_inverse timeout 2400 \
    python -m visual_foresight_tpu.sim.run \
    benchmarks/ag_bench20_inverse/hparams.py --benchmark \
    > /tmp/ag_inverse.log 2>&1
echo "inverse campaign rc=$?"
mkdir -p benchmarks/ag_bench20_inverse/runs/r5_v1
cp benchmarks/ag_bench20_inverse/verbose/results_0to19.txt \
   benchmarks/ag_bench20_inverse/verbose/results_all.txt \
   benchmarks/ag_bench20_inverse/verbose/scores_0to19.pkl \
   benchmarks/ag_bench20_inverse/runs/r5_v1/ 2>/dev/null
rm -rf benchmarks/ag_bench20_inverse/verbose/verbose
grep -m1 'mean imp' benchmarks/ag_bench20_inverse/runs/r5_v1/results_all.txt

# classifier cost on the v2 model, HARD set: the classifier row beat the
# pixel row on the easy set (+0.018/+0.043 vs +0.013/+0.019); this is the
# most promising remaining shot at the hard-set bar.
echo "=== v2-classifier hard campaign $(date) ==="
VMPC_MODEL_DIR=/root/data/models/ag_r5f_v2 VMPC_STD_LIFT=0.15 \
    VMPC_TASK_SET=ag_bench20_hard \
    VMPC_RESULT_DIR=/root/data/bench/ag_clf_v2_hard timeout 3600 \
    python -m visual_foresight_tpu.sim.run \
    benchmarks/ag_bench20_classifier/hparams.py --benchmark \
    > /tmp/ag_clf_v2_hard.log 2>&1
echo "v2-classifier hard rc=$?"
mkdir -p benchmarks/ag_bench20_classifier/runs/r5_v2_hard
cp benchmarks/ag_bench20_classifier/verbose/results_0to19.txt \
   benchmarks/ag_bench20_classifier/verbose/results_all.txt \
   benchmarks/ag_bench20_classifier/verbose/scores_0to19.pkl \
   benchmarks/ag_bench20_classifier/runs/r5_v2_hard/ 2>/dev/null
grep -m1 'mean imp' benchmarks/ag_bench20_classifier/runs/r5_v2_hard/results_all.txt

echo "=== bench (chunked 800) $(date) ==="
timeout 1800 python bench.py > /tmp/bench_r5_chunked.json 2>/tmp/bench_r5_chunked.log
echo "bench rc=$?"
tail -1 /tmp/bench_r5_chunked.json
echo "=== r5e complete $(date) ==="
