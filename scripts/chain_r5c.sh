#!/usr/bin/env bash
# Round-5 v2 escalation: retrain the transport predictor on the FULL mixed
# corpus (~4k scripted + ~4k std-matched random, vs v1's partial flush) with
# a longer step budget, then re-campaign both vendored ag sets, plus one
# replan-cadence variant (VMPC_REPLAN=5) on the hard set — the densest
# cheap lever now that campaigns cost ~13 min (docs/EVAL.md round 5).
#
# Usage: chain_r5c.sh [collector_pid ...]   (waits for pids, then for the
#        r5b queue via /tmp/chain_b.pid, then runs)
set -u
cd /root/repo

for pid in "$@"; do
    while kill -0 "$pid" 2>/dev/null; do sleep 60; done
done
if [ -f /tmp/chain_b.pid ]; then
    B=$(cat /tmp/chain_b.pid)
    while kill -0 "$B" 2>/dev/null; do sleep 60; done
fi
echo "=== r5c start $(date) ==="

TRAIN_TIMEOUT=${TRAIN_TIMEOUT:-5400} CAMPAIGN_TIMEOUT=3600 \
    bash scripts/chain_r5.sh ag_r5f_v2 \
    /root/data/collect/ag_r5s/records /root/data/collect/ag_r5m/records \
    15000 0
echo "v2 base campaigns rc=$?"

harvest() {
    local set=$1 tag=$2
    mkdir -p "benchmarks/$set/runs/$tag"
    cp "benchmarks/$set/verbose/results_0to19.txt" \
       "benchmarks/$set/verbose/results_all.txt" \
       "benchmarks/$set/verbose/scores_0to19.pkl" \
       "benchmarks/$set/runs/$tag/" 2>/dev/null
    rm -rf "benchmarks/$set/verbose/verbose"
    git checkout -- "benchmarks/$set/verbose" 2>/dev/null || true
    echo "--- $set/$tag: $(grep -m1 'mean imp' \
        benchmarks/$set/runs/$tag/results_all.txt 2>/dev/null)"
}
harvest ag_bench20_hard r5_v2
harvest ag_bench20 r5_v2

echo "=== r5c complete $(date) ==="
