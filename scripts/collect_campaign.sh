#!/usr/bin/env bash
# Auto-restarting collection-campaign driver.
#
# Long unattended MuJoCo collection runs can die on a transient fault (EGL
# context loss, a scene the retry budget cannot rescue).  This wrapper
# restarts the worker from the last trajectory index it logged, so a
# multi-hour campaign survives worker death without re-collecting finished
# indices.  TFRecord shard names are index-ranged (traj_X_to_Y), so a
# restart deterministically overwrites at most one partially written shard.
#
# Usage: collect_campaign.sh <hparams.py> <end_index> <logfile>
#   VMPC_DATA_DIR / VMPC_START_INDEX are honoured from the environment.
set -u
CONF=$1
END=$2
LOG=$3
START=${VMPC_START_INDEX:-0}
RESTARTS=0
MAX_RESTARTS=50

while :; do
    VMPC_START_INDEX=$START VMPC_END_INDEX=$END \
        python -m visual_foresight_tpu.sim.run "$CONF" >> "$LOG" 2>&1
    rc=$?
    if [ $rc -eq 0 ]; then
        break
    fi
    # the simulator prints the absolute trajectory id as "(traj N)";
    # the bare "taking sample N" number is 0-based within one worker run
    # and must NOT be used once VMPC_START_INDEX is non-zero
    LAST=$(grep -o '(traj [0-9]*)' "$LOG" | tail -1 | tr -dc 0-9)
    [ -z "$LAST" ] && LAST=$START
    NEXT=$((LAST + 1))
    RESTARTS=$((RESTARTS + 1))
    if [ $RESTARTS -gt $MAX_RESTARTS ]; then
        echo "campaign: giving up after $MAX_RESTARTS restarts (rc=$rc)" >> "$LOG"
        exit 1
    fi
    if [ $NEXT -gt $END ]; then
        break
    fi
    echo "campaign: worker died rc=$rc; restarting at index $NEXT (restart $RESTARTS)" >> "$LOG"
    START=$NEXT
done
echo "campaign: complete (end_index=$END, restarts=$RESTARTS)" >> "$LOG"
