#!/usr/bin/env bash
# Round-4c transport chain: let the SCRIPTED collection campaign run until
# a trajectory target or deadline, stop it by PID (never by pattern), merge
# the random (ag_r4) + scripted (ag_r4s) corpora, train ag_r4c, then run
# both grasp-transport MPC campaigns.  Sequential: the axon TPU tunnel is
# single-client.
set -u
cd /root/repo
LOG=/root/data/collect/chain_r4c.log
say() { echo "=== $1 $(date) ===" >> "$LOG"; }

PID=${1:?collection pid}
TARGET_TRAJS=${2:-7000}
DEADLINE_S=${3:-11400}   # max wait from launch (default 3h10m)

WAITED=0
while kill -0 "$PID" 2>/dev/null && [ $WAITED -lt "$DEADLINE_S" ]; do
    N=$(grep -c "taking sample" /root/data/collect/ag_r4s_collect.log 2>/dev/null || echo 0)
    [ "$N" -ge "$TARGET_TRAJS" ] && break
    sleep 60; WAITED=$((WAITED + 60))
done
N=$(grep -c "taking sample" /root/data/collect/ag_r4s_collect.log 2>/dev/null || echo 0)
say "collection wait done (waited ${WAITED}s, ${N} trajs)"

# stop collection cleanly by pid (TERM lets the saver flush current shard)
if kill -0 "$PID" 2>/dev/null; then
    kill "$PID"; sleep 20
    kill -9 "$PID" 2>/dev/null
fi
say "collection stopped"

# merge both corpora; each source's good/ train shards doubled
python scripts/merge_record_splits.py \
    /root/data/collect/ag_r4/records /root/data/collect/ag_r4s/records \
    --boost-good 1 --out-dir /root/data/collect/ag_r4c_corpus >> "$LOG" 2>&1
say "merge done"

# train the transport predictor (fresh, 15k steps)
timeout 5400 python -m visual_foresight_tpu.training.train_predictor \
    --data_dir /root/data/collect/ag_r4c_corpus \
    --model_dir /root/data/models/ag_r4c \
    --steps 15000 --batch_size 32 --bf16 --std_factor 4 \
    --enc_features 128 256 256 --lstm_kernel 3 --ss_k 500 \
    --adim 4 --sdim 5 --stochastic --latent_dim 8 \
    --ckpt_every 5000 --seed 0 \
    > /root/data/models/ag_r4c_train.log 2>&1
rc=$?
say "training done rc=$rc"
[ $rc -ne 0 ] && exit 1

say "ag_bench20 MPC campaign start"
VMPC_MODEL_DIR=/root/data/models/ag_r4c RESULT_DIR=/root/data/bench/ag_r4c_easy \
    timeout 5400 python -m visual_foresight_tpu.sim.run \
    benchmarks/ag_bench20/hparams.py --benchmark \
    > /tmp/ag_mpc_easy_r4c.log 2>&1
say "ag_bench20 done rc=$?"

say "ag_bench20_hard MPC campaign start"
VMPC_MODEL_DIR=/root/data/models/ag_r4c RESULT_DIR=/root/data/bench/ag_r4c_hard \
    timeout 5400 python -m visual_foresight_tpu.sim.run \
    benchmarks/ag_bench20_hard/hparams.py --benchmark \
    > /tmp/ag_mpc_hard_r4c.log 2>&1
say "ag_bench20_hard done rc=$?"
say "chain complete"
