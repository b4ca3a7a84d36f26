#!/usr/bin/env bash
# Round-5 mixed-corpus grasp-transport chain, parameterized so it can run
# once on the partial corpus (v1, fast feedback) and again on the full one
# (v2) without editing the script.  Phases: merge -> train -> hard + easy
# campaigns on the vendored 20-task sets.  See docs/EVAL.md
# "Scripted-demonstrator corpus" for the experiment design this executes.
#
# Usage: chain_r5.sh <tag> <scripted_records> <random_records> [steps] [boost]
#   e.g. chain_r5.sh ag_r5f_v1 /root/data/collect/ag_r5s/records \
#            /root/data/collect/ag_r5m/records 10000 0
set -u
cd /root/repo

TAG=${1:?tag}
SCRIPTED=${2:?scripted records dir}
RANDOM_REC=${3:?random records dir}
STEPS=${4:-10000}
BOOST=${5:-0}
TRAIN_TIMEOUT=${TRAIN_TIMEOUT:-3600}
CAMPAIGN_TIMEOUT=${CAMPAIGN_TIMEOUT:-4800}

log() { echo "=== $1 $(date) ==="; }

MERGED=/root/data/collect/${TAG}_all
if [ ! -d "$MERGED/train" ]; then
    python scripts/merge_record_splits.py \
        "$SCRIPTED" "$RANDOM_REC" \
        --boost-good "$BOOST" --out-dir "$MERGED" || exit 1
fi
log "merged -> $MERGED"

MODEL=/root/data/models/${TAG}
if [ ! -e "$MODEL/view0/step_${STEPS}" ]; then
    timeout "$TRAIN_TIMEOUT" python -m visual_foresight_tpu.training.train_predictor \
        --data_dir "$MERGED" \
        --model_dir "$MODEL" \
        --steps "$STEPS" --batch_size 32 --bf16 --std_factor 4 \
        --enc_features 128 256 256 --lstm_kernel 3 --ss_k 500 \
        --adim 4 --sdim 5 --stochastic --latent_dim 8 \
        --ckpt_every 2000 --seed 0 \
        > /root/data/models/${TAG}_train.log 2>&1
    rc=$?
    log "training rc=$rc"
    if [ $rc -ne 0 ]; then
        ls "$MODEL"/view0/step_* >/dev/null 2>&1 || exit 1
        log "training timed out; serving the newest intermediate checkpoint"
    fi
fi

log "ag_bench20_hard campaign start"
VMPC_MODEL_DIR="$MODEL" VMPC_STD_LIFT=0.15 \
    VMPC_RESULT_DIR=/root/data/bench/${TAG}_hard \
    timeout "$CAMPAIGN_TIMEOUT" python -m visual_foresight_tpu.sim.run \
    benchmarks/ag_bench20_hard/hparams.py --benchmark \
    > /tmp/${TAG}_hard.log 2>&1
log "ag_bench20_hard rc=$?"

log "ag_bench20 campaign start"
VMPC_MODEL_DIR="$MODEL" VMPC_STD_LIFT=0.15 \
    VMPC_RESULT_DIR=/root/data/bench/${TAG}_easy \
    timeout "$CAMPAIGN_TIMEOUT" python -m visual_foresight_tpu.sim.run \
    benchmarks/ag_bench20/hparams.py --benchmark \
    > /tmp/${TAG}_easy.log 2>&1
log "ag_bench20 rc=$?"
log "chain complete"
