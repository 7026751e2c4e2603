#!/bin/bash
# Round-4 stage B (relaunch): DFG 2D-2 Strouhal at l=1, chunk 4.
# Chunk 16 crashed the worker ~7 min into attempt 1 (the known ~120 s
# service execution kill, results/r3_exec_watchdog_tpu.log): 16 BDF2 steps
# per device call, each refreshing the p-coarse dense inverse, exceeds the
# budget.  4 steps/call bounds the program; checkpoint/resume still loses
# at most one chunk per fault.
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_campaign_progress.log
log() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

log "stage B relaunch: 2D-2 l=1 chunk 4"
for i in 1 2 3 4 5 6 7 8; do
    timeout 7200 python demos/demo_cylinder.py --unsteady -l 1 --t-end 8 \
        --dt 0.0125 --chunk 4 --hist results/r4_dfg2d2_hist.csv \
        > /tmp/r4_2d2b_$i.log 2>&1
    rc=$?
    log "2d2 attempt $i exit=$rc rows=$(wc -l < results/r4_dfg2d2_hist.csv 2>/dev/null || echo 0) $(grep -a 'St =\|c_Dmax\|c_Lmax' /tmp/r4_2d2b_$i.log | tail -3 | tr '\n' ' ')"
    cp /tmp/r4_2d2b_$i.log results/r4_dfg2d2_l1_tpu.log
    if [ $rc -eq 0 ]; then break; fi
    sleep 60
done
log "stage B relaunch done"
