#!/bin/bash
# Round-5 stage B (VERDICT r4 #2): DFG 2D-2 at l=2, dt=0.00625 — the
# in-band attempt (l1/dt=0.0125 recorded St=0.2667 vs ref 0.295-0.305;
# the builder analysis says one refinement level + halved dt is the
# resolution the published bands need).  1280 BDF2 steps, auto-sized
# chunks (demo_cylinder.py --chunk auto), checkpoint/resume across the
# service's worker kills.  Runs all round in the background; the 2M
# config-4 run preempts it by killing the pid (resume loses <= 1 chunk).
set -u
cd "$(dirname "$0")/.."
LOG=results/r5_campaign_progress.log
log() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

log "stage B: 2D-2 l=2 dt=0.00625 (auto chunk, resume)"
for i in $(seq 1 40); do
    if [ -f /tmp/r5_2d2_pause ]; then
        log "2d2 paused (rm /tmp/r5_2d2_pause to continue)"
        sleep 120
        continue
    fi
    timeout 7200 python demos/demo_cylinder.py --unsteady -l 2 --t-end 8 \
        --dt 0.00625 --chunk auto --hist results/r5_dfg2d2_l2_hist.csv \
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
