#!/bin/bash
# Round-4 stage A retry (after stage B releases the chip): 2.05M config-4.
# Both plain attempts OOMed executing the first split program (residual:
# temp 5.88 GB + args 1.66 GB on top of resident block tiles, measured by
# scripts/mem_audit3d.py --compile-residual).  Retry evicts the largest
# block tiles to gather stencils (FENAPACK_BLOCK_MAXBYTES) — trading matvec
# speed for residency, which is the right trade for a converged: True
# record at HBM capacity.
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_campaign_progress.log
log() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

if [ -f /tmp/r4_stage_b.pid ]; then
    while kill -0 "$(cat /tmp/r4_stage_b.pid)" 2>/dev/null; do sleep 60; done
fi

log "stage A retry: 2M with block-tile eviction"
for i in 1 2; do
    if [ "$i" = "1" ]; then MB=3e8; MI=60; else MB=1e8; MI=40; fi
    FENAPACK_BLOCK_MAXBYTES=$MB timeout 7200 python demos/demo_step3d.py \
        -l 3 --length 9 --block 8 --dtype float32 --maxiter $MI \
        > /tmp/r4_2m_evict_$i.log 2>&1
    rc=$?
    log "2M evict attempt $i (MAXBYTES=$MB maxiter=$MI) exit=$rc $(grep -a 'converged\|wall\|dofs\|RESOURCE' /tmp/r4_2m_evict_$i.log | tr '\n' ' ' | tail -c 300)"
    cp /tmp/r4_2m_evict_$i.log results/r4_2m_evict_attempt$i.log
    if [ $rc -eq 0 ] && grep -aq 'converged: True' /tmp/r4_2m_evict_$i.log; then
        cp /tmp/r4_2m_evict_$i.log results/r4_2m_b8_tpu.log; break
    fi
    sleep 60
done

log "stage A2: TPU cylinder DFG 2D-1 records (mixed precision, tuned GMG)"
for lvl in 0 1; do
    timeout 3600 python demos/demo_cylinder.py -l $lvl --rtol 1e-6 \
        > results/r4_dfg2d1_l${lvl}_tpu.log 2>&1
    log "cylinder l$lvl tpu exit=$? $(grep -a 'iters/step' results/r4_dfg2d1_l${lvl}_tpu.log | tail -1)"
done
log "=== r4 stage A2 done ==="
