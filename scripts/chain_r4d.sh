#!/usr/bin/env bash
# Round-4d end-to-end rebuild after a /root/data wipe, sized for one
# ~3 h session on a single CPU core (collection-bound box):
#
#   1. flagship xz corpus  (~700 trajs)  -> train xz_flagship (bench restore)
#   2. scripted-demonstrator transport corpus (everything the clock allows;
#      73 % grasp-transport success vs 11 % random -- directed exploration
#      replaces the reference's 30-60k random-trajectory operating point,
#      reference experiments/robonet confs)
#   3. train the stochastic transport predictor on the scripted corpus
#   4. grasp-transport MPC campaigns on the vendored hard + easy sets
#
# Collection workers are started by scripts/collect_campaign.sh and stopped
# here BY PID (never by pattern).  Phases 3-4 serialize on the single-client
# TPU tunnel.
set -u
cd /root/repo

XZ_PID=${1:?xz campaign pid}
AG_PID=${2:?ag campaign pid}
XZ_TARGET=${3:-700}
AG_STOP_AT=${4:?epoch seconds to stop transport collection}

log() { echo "=== $1 $(date) ==="; }

# ---- phase 1: wait for the flagship corpus, train the bench checkpoint ----
while kill -0 "$XZ_PID" 2>/dev/null; do
    # NB: grep -c prints 0 AND exits 1 on zero matches, so `|| echo 0` would
    # emit a second line; default only when the log is missing entirely
    N=$(grep -c "taking sample" /root/data/collect/xz_r4_collect.log 2>/dev/null)
    N=${N:-0}
    [ "$N" -ge "$XZ_TARGET" ] && break
    sleep 30
done
if kill -0 "$XZ_PID" 2>/dev/null; then
    kill -- -"$XZ_PID" 2>/dev/null || kill "$XZ_PID"
    sleep 15
fi
log "xz collection stopped ($(grep -c 'taking sample' /root/data/collect/xz_r4_collect.log) trajs)"

python scripts/merge_record_splits.py /root/data/collect/xz_r4/records
timeout 1800 python -m visual_foresight_tpu.training.train_predictor \
    --data_dir /root/data/collect/xz_r4/records/all \
    --model_dir /root/data/models/xz_flagship \
    --steps 5000 --batch_size 32 --bf16 --std_factor 4 \
    --enc_features 128 256 256 --lstm_kernel 3 --ss_k 300 --ckpt_every 1000 \
    > /root/data/models/xz_flagship_train.log 2>&1
log "flagship training rc=$?"

# ---- phase 2: let the demonstrator keep collecting until the stop time ----
while kill -0 "$AG_PID" 2>/dev/null && [ "$(date +%s)" -lt "$AG_STOP_AT" ]; do
    sleep 30
done
if kill -0 "$AG_PID" 2>/dev/null; then
    kill -- -"$AG_PID" 2>/dev/null || kill "$AG_PID"
    sleep 15
fi
log "ag collection stopped ($(grep -c 'taking sample' /root/data/collect/ag_r4s_collect.log) trajs)"

# ---- phase 3: train the transport predictor (scripted corpus, no boost:
# the demonstrator's success density makes good-shard oversampling moot) ----
python scripts/merge_record_splits.py /root/data/collect/ag_r4s/records
timeout 2400 python -m visual_foresight_tpu.training.train_predictor \
    --data_dir /root/data/collect/ag_r4s/records/all \
    --model_dir /root/data/models/ag_r4d \
    --steps 8000 --batch_size 32 --bf16 --std_factor 4 \
    --enc_features 128 256 256 --lstm_kernel 3 --ss_k 500 \
    --adim 4 --sdim 5 --stochastic --latent_dim 8 \
    --ckpt_every 2000 --seed 0 \
    > /root/data/models/ag_r4d_train.log 2>&1
rc=$?
log "transport training rc=$rc"
# a timeout (rc=124) is survivable if an intermediate checkpoint landed:
# serve the newest step_* and still run the campaigns
if [ $rc -ne 0 ]; then
    ls /root/data/models/ag_r4d/view0/step_* >/dev/null 2>&1 || exit 1
    log "training timed out; serving the newest intermediate checkpoint"
fi

# ---- phase 4: MPC campaigns (hard set first -- the open capability gap) ----
log "ag_bench20_hard campaign start"
VMPC_MODEL_DIR=/root/data/models/ag_r4d VMPC_STD_LIFT=0.15 \
    VMPC_RESULT_DIR=/root/data/bench/ag_r4d_hard \
    timeout 3000 python -m visual_foresight_tpu.sim.run \
    benchmarks/ag_bench20_hard/hparams.py --benchmark \
    > /tmp/ag_mpc_hard_r4d.log 2>&1
log "ag_bench20_hard rc=$?"

log "ag_bench20 campaign start"
VMPC_MODEL_DIR=/root/data/models/ag_r4d VMPC_STD_LIFT=0.15 \
    VMPC_RESULT_DIR=/root/data/bench/ag_r4d_easy \
    timeout 3000 python -m visual_foresight_tpu.sim.run \
    benchmarks/ag_bench20/hparams.py --benchmark \
    > /tmp/ag_mpc_easy_r4d.log 2>&1
log "ag_bench20 rc=$?"
log "chain complete"
