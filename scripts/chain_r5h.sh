#!/usr/bin/env bash
# Chunked-execution quality A/B on the vendored lifting set: same vendored
# checkpoint and 768 samples as runs/r5_s768, rolled as 3 chunks of 256.
# Exact-parity is only guaranteed for deterministic models (the flagship is
# deterministic), so scores should match r5_s768 almost exactly — this run
# is the evidence for flipping campaigns to chunked execution.
set -u
cd /root/repo
wait_pid_file() {
    [ -f "$1" ] || return 0
    local p; p=$(cat "$1")
    while kill -0 "$p" 2>/dev/null; do sleep 60; done
}
wait_pid_file /tmp/chain_g.pid
echo "=== r5h start $(date) ==="
XZMODEL=$PWD/benchmarks/models/xz_flagship
VMPC_MODEL_DIR=$XZMODEL VMPC_SAMPLE_CHUNK=256 \
    VMPC_RESULT_DIR=/root/data/bench/xz_s768c timeout 3000 \
    python -m visual_foresight_tpu.sim.run \
    benchmarks/xz_bench20/hparams.py --benchmark \
    > /tmp/xz_s768c.log 2>&1
echo "xz chunked campaign rc=$?"
mkdir -p benchmarks/xz_bench20/runs/r5_s768_chunked
cp benchmarks/xz_bench20/verbose/results_0to19.txt \
   benchmarks/xz_bench20/verbose/results_all.txt \
   benchmarks/xz_bench20/verbose/scores_0to19.pkl \
   benchmarks/xz_bench20/runs/r5_s768_chunked/ 2>/dev/null
rm -rf benchmarks/xz_bench20/verbose/verbose
git checkout -- benchmarks/xz_bench20/verbose 2>/dev/null || true
grep -m1 'mean imp' benchmarks/xz_bench20/runs/r5_s768_chunked/results_all.txt
echo "=== r5h complete $(date) ==="
