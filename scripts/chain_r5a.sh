#!/usr/bin/env bash
# Round-5a grasp-transport fix: execute the mixed-corpus retrain that round 4
# designed but never ran (docs/EVAL.md "Scripted-demonstrator corpus" ends by
# pointing at this experiment).
#
#   1. merge the scripted-demonstrator corpus (ag_r4s, 73% success — what
#      success looks like) with the plan-std-matched random corpus (ag_r4m,
#      collected at VMPC_STD_LIFT=0.15, the SAME std the campaigns plan
#      with — what CEM probes actually do)
#   2. train the stochastic transport predictor on the mixture
#   3. pixel-cost MPC campaigns on the vendored hard + easy sets
#
# Phases 2-3 serialize on the single-client TPU tunnel.
set -u
cd /root/repo

STEPS=${1:-10000}

log() { echo "=== $1 $(date) ==="; }

if [ ! -d /root/data/collect/ag_r4f_all/good ]; then
    python scripts/merge_record_splits.py \
        /root/data/collect/ag_r4s/records /root/data/collect/ag_r4m/records \
        --out-dir /root/data/collect/ag_r4f_all || exit 1
fi
log "merged"

if [ ! -e /root/data/models/ag_r4f/view0/step_${STEPS} ]; then
    timeout 3600 python -m visual_foresight_tpu.training.train_predictor \
        --data_dir /root/data/collect/ag_r4f_all \
        --model_dir /root/data/models/ag_r4f \
        --steps "$STEPS" --batch_size 32 --bf16 --std_factor 4 \
        --enc_features 128 256 256 --lstm_kernel 3 --ss_k 500 \
        --adim 4 --sdim 5 --stochastic --latent_dim 8 \
        --ckpt_every 2000 --seed 0 \
        > /root/data/models/ag_r4f_train.log 2>&1
    rc=$?
    log "mixed-corpus training rc=$rc"
    if [ $rc -ne 0 ]; then
        ls /root/data/models/ag_r4f/view0/step_* >/dev/null 2>&1 || exit 1
        log "training timed out; serving the newest intermediate checkpoint"
    fi
fi

log "ag_bench20_hard campaign start"
VMPC_MODEL_DIR=/root/data/models/ag_r4f VMPC_STD_LIFT=0.15 \
    VMPC_RESULT_DIR=/root/data/bench/ag_r4f_hard \
    timeout 4200 python -m visual_foresight_tpu.sim.run \
    benchmarks/ag_bench20_hard/hparams.py --benchmark \
    > /tmp/ag_mpc_hard_r5a.log 2>&1
log "ag_bench20_hard rc=$?"

log "ag_bench20 campaign start"
VMPC_MODEL_DIR=/root/data/models/ag_r4f VMPC_STD_LIFT=0.15 \
    VMPC_RESULT_DIR=/root/data/bench/ag_r4f_easy \
    timeout 4200 python -m visual_foresight_tpu.sim.run \
    benchmarks/ag_bench20/hparams.py --benchmark \
    > /tmp/ag_mpc_easy_r5a.log 2>&1
log "ag_bench20 rc=$?"
log "chain complete"
