#!/bin/bash
# Round-5 chain: wait for the stage-A 2M run (pid file /tmp/r5_2m.pid) to
# release the chip, then run stage B — DFG 2D-2 at l=2, dt=0.00625,
# WARM-STARTED from the l1 limit-cycle checkpoint (VERDICT r4 #2).  The
# warm start replaces the impulsive transient (whose early steps breached
# the ~120 s execution kill at l2) with developed-shedding steps, so
# auto-chunk sizes against regular step cost.
#
# Preemption contract: kill $(cat /tmp/r5_2d2.pid) to take the chip
# (resume loses <= 1 chunk); touch /tmp/r5_2d2_pause to hold between
# attempts; rm it to continue.
set -u
cd "$(dirname "$0")/.."
LOG=results/r5_campaign_progress.log
log() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

if [ -f /tmp/r5_2m.pid ]; then
    while kill -0 "$(cat /tmp/r5_2m.pid)" 2>/dev/null; do sleep 60; done
fi
log "stage B: 2D-2 l=2 dt=0.00625 warm-started from l1 ckpt (auto chunk)"
WARM=results/r4_dfg2d2_hist.csv.ckpt.npz
for i in $(seq 1 40); do
    if [ -f /tmp/r5_2d2_stop ]; then log "2d2 stopped by flag"; break; fi
    while [ -f /tmp/r5_2d2_pause ]; do sleep 60; done
    timeout 7200 python demos/demo_cylinder.py --unsteady -l 2 --t-end 2.5 \
        --dt 0.00625 --chunk auto --block 32 --warm-from "$WARM" \
        --hist results/r5_dfg2d2_l2_hist.csv \
        > /tmp/r5_2d2_$i.log 2>&1 &
    echo $! > /tmp/r5_2d2.pid
    wait $!
    rc=$?
    log "2d2 l2 attempt $i exit=$rc rows=$(wc -l < results/r5_dfg2d2_l2_hist.csv 2>/dev/null || echo 0) $(grep -a 'St =\|c_Dmax\|c_Lmax' /tmp/r5_2d2_$i.log | tail -3 | tr '\n' ' ')"
    cp /tmp/r5_2d2_$i.log results/r5_dfg2d2_l2_tpu.log
    if [ $rc -eq 0 ]; then break; fi
    sleep 45
done
log "stage B done"
