#!/bin/bash
# Round-4 campaign, heavy stages (run after r4_stage_dc.sh finishes):
#   stage A: config-4 2.05M-dof solve (split programs, b=8)   [VERDICT r3 #2]
#   stage B: cylinder DFG 2D-2 l=1 Strouhal (chunked, resume) [VERDICT r3 #4]
# Stage B runs with the round-4 p-coarse velocity-GMG fix (outer counts on
# the cylinder geometry dropped 622 -> 211 at l0), so the 640-step unsteady
# scan no longer burns 400-cap iterations per step.
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_campaign_progress.log
log() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

# wait for the D+C runner (pid file) to release the chip
if [ -f /tmp/r4_stage_dc.pid ]; then
    while kill -0 "$(cat /tmp/r4_stage_dc.pid)" 2>/dev/null; do sleep 60; done
fi

log "=== r4 stage A+B start ==="

log "stage A: config-4 2.05M-dof solve (b=8, split programs)"
for i in 1 2; do
    extra=""
    if [ "$i" = "2" ]; then extra="FENAPACK_GMG_PCOARSE=0"; fi
    env $extra timeout 10800 python demos/demo_step3d.py -l 3 --length 9 \
        --block 8 --dtype float32 --maxiter 60 > /tmp/r4_2m_b8_$i.log 2>&1
    rc=$?
    log "2M attempt $i exit=$rc $(grep -a 'converged\|wall\|dofs' /tmp/r4_2m_b8_$i.log | tr '\n' ' ' | tail -c 400)"
    cp /tmp/r4_2m_b8_$i.log results/r4_2m_b8_attempt$i.log
    if [ $rc -eq 0 ] && grep -aq 'converged: True' /tmp/r4_2m_b8_$i.log; then
        cp /tmp/r4_2m_b8_$i.log results/r4_2m_b8_tpu.log; break
    fi
    sleep 60
done

log "stage B: cylinder DFG 2D-2 l=1 Strouhal (chunk 16, resume across faults)"
for i in 1 2 3 4 5 6; do
    timeout 7200 python demos/demo_cylinder.py --unsteady -l 1 --t-end 8 \
        --dt 0.0125 --chunk 16 --hist results/r4_dfg2d2_hist.csv \
        > /tmp/r4_2d2_$i.log 2>&1
    rc=$?
    log "2d2 attempt $i exit=$rc rows=$(wc -l < results/r4_dfg2d2_hist.csv 2>/dev/null || echo 0) $(grep -a 'St =\|c_Dmax\|c_Lmax' /tmp/r4_2d2_$i.log | tail -3 | tr '\n' ' ')"
    cp /tmp/r4_2d2_$i.log results/r4_dfg2d2_l1_tpu.log
    if [ $rc -eq 0 ]; then break; fi
    sleep 60
done

log "=== r4 stage A+B done ==="
