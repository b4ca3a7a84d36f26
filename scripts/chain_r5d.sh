#!/usr/bin/env bash
# Round-5 two-camera registration rebuild (docs/EVAL.md benchmark #4, on a
# VENDORED task set this time):
#   collection (r5_twocam, started separately) ->
#   raw 2-cam task run + displacement-ranked 20-task selection ->
#   per-view predictor training + GDN flow training (TPU) ->
#   registration campaign on the vendored set -> harvest.
#
# Usage: chain_r5d.sh  (waits on /tmp/xz2c.pid collector and /tmp/chain_c.pid
#        TPU queue; both optional if already gone)
set -u
cd /root/repo

wait_pid_file() {
    [ -f "$1" ] || return 0
    local p
    p=$(cat "$1")
    while kill -0 "$p" 2>/dev/null; do sleep 60; done
}

log() { echo "=== $1 $(date) ==="; }

wait_pid_file /tmp/xz2c.pid
log "2-cam corpus collection done"

REC=/root/data/collect/xz2c_r5/records
if [ ! -d "$REC/all/train" ]; then
    python scripts/merge_record_splits.py "$REC" || exit 1
fi

# raw task run (CPU MuJoCo; 60 trajs) + 20-task selection
RAW=/root/data/collect/xz2c_r5_raw
if [ ! -d "$RAW/train/traj_group0" ]; then
    VMPC_DATA_DIR=$RAW bash scripts/collect_campaign.sh \
        data_collection/sim/cartgripper_xz_grasp/r5_twocam_tasks/hparams.py \
        59 /root/data/collect/xz2c_r5_raw.log
fi
if [ ! -d benchmarks/tasks/xz2c_bench20/traj_group0 ]; then
    python -m visual_foresight_tpu.sim.util.select_benchmark_tasks \
        "$RAW/train" benchmarks/tasks/xz2c_bench20 \
        --ntasks 20 --min_displacement 0.02 || exit 1
fi
log "task set ready"

wait_pid_file /tmp/chain_c.pid
wait_pid_file /tmp/chain_e.pid
log "TPU free; training per-view predictors"

train_view() {  # train_view <camera>
    local cam=$1 dir=/root/data/models/xz2c_cam$1
    [ -e "$dir/view0/step_3000" ] && return 0
    timeout 3600 python -m visual_foresight_tpu.training.train_predictor \
        --data_dir "$REC/all" --model_dir "$dir" --camera "$cam" \
        --steps 3000 --batch_size 32 --bf16 --std_factor 4 \
        --enc_features 128 256 256 --lstm_kernel 3 --ss_k 300 \
        --ckpt_every 1000 --seed 0 \
        > /root/data/models/xz2c_cam${cam}_train.log 2>&1
    echo "view$cam training rc=$?"
}
train_view 0
train_view 1

# assemble the 2-view serving checkpoint: view0 <- cam0 run, view1 <- cam1
REG=/root/data/models/xz2c_reg
mkdir -p "$REG"
rm -rf "$REG/view0" "$REG/view1"
cp -r /root/data/models/xz2c_cam0/view0 "$REG/view0"
cp -r /root/data/models/xz2c_cam1/view0 "$REG/view1"
cp /root/data/models/xz2c_cam0/model_config.json "$REG/"
log "2-view checkpoint assembled"

if [ ! -e /root/data/models/xz2c_gdn/step_3000 ]; then
    timeout 2400 python -m visual_foresight_tpu.training.train_gdn \
        --data_dir "$REC/all" --model_dir /root/data/models/xz2c_gdn \
        --steps 3000 > /root/data/models/xz2c_gdn_train.log 2>&1
    echo "gdn training rc=$?"
fi

log "registration campaign start"
VMPC_RESULT_DIR=/root/data/bench/xz2c_reg timeout 4800 \
    python -m visual_foresight_tpu.sim.run \
    benchmarks/xz2c_bench20_registration/hparams.py --benchmark \
    > /tmp/xz2c_reg.log 2>&1
echo "registration campaign rc=$?"

mkdir -p benchmarks/xz2c_bench20_registration/runs/r5
cp benchmarks/xz2c_bench20_registration/verbose/results_0to19.txt \
   benchmarks/xz2c_bench20_registration/verbose/results_all.txt \
   benchmarks/xz2c_bench20_registration/verbose/scores_0to19.pkl \
   benchmarks/xz2c_bench20_registration/runs/r5/ 2>/dev/null
rm -rf benchmarks/xz2c_bench20_registration/verbose/verbose
grep -m1 'mean imp' benchmarks/xz2c_bench20_registration/runs/r5/results_all.txt
log "r5d complete"
