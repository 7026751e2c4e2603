#!/bin/bash
# Round-2 campaign, wave 3: retry everything the SMEM-padding fix and the
# GMG iterative-coarse fallback unblock (8ae20fc).  ONE job at a time.
#
#   nohup bash scripts/r2e_campaign.sh > /tmp/r2e_campaign.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
log() { echo "$(date +%H:%M:%S) $*"; }

log "stage 1: 761k full solve (demo_step3d -l 3 f32, default b=32)"
timeout 10800 python demos/demo_step3d.py -l 3 --dtype float32 \
    > /tmp/r2e_761k.log 2>&1
rc=$?
log "761k exit=$rc $(grep -a 'converged\|iters/step' /tmp/r2e_761k.log | tail -2 | tr '\n' ' ')"
if ! grep -qai "converged: True" /tmp/r2e_761k.log; then
    log "stage 1 retry: b=8 tiles"
    timeout 10800 python demos/demo_step3d.py -l 3 --dtype float32 \
        --block 8 > /tmp/r2e_761k_b8.log 2>&1
    log "761k b8 exit=$? $(grep -a 'converged\|iters/step' /tmp/r2e_761k_b8.log | tail -2 | tr '\n' ' ')"
    grep -qai "converged: True" /tmp/r2e_761k_b8.log && cp /tmp/r2e_761k_b8.log /tmp/r2e_761k.log
fi

if grep -qai "converged: True" /tmp/r2e_761k.log; then
    log "stage 2: 2.05M config-4 (length=9)"
    timeout 14400 python demos/demo_step3d.py -l 3 --length 9.0 \
        --dtype float32 --maxiter 120 > /tmp/r2e_2m.log 2>&1
    rc=$?
    log "2M exit=$rc $(grep -a 'converged\|iters/step' /tmp/r2e_2m.log | tail -2 | tr '\n' ' ')"
    if ! grep -qai "converged: True" /tmp/r2e_2m.log; then
        log "stage 2 retry: b=8 tiles"
        timeout 14400 python demos/demo_step3d.py -l 3 --length 9.0 \
            --dtype float32 --maxiter 120 --block 8 > /tmp/r2e_2m_b8.log 2>&1
        log "2M b8 exit=$? $(grep -a 'converged\|iters/step' /tmp/r2e_2m_b8.log | tail -2 | tr '\n' ' ')"
    fi
else
    log "stage 2 skipped (761k did not converge)"
fi

log "stage 3: SpMV layout table (gather/XLA-block/Pallas/df32 x scales)"
timeout 7200 python scripts/spmv_table.py \
    --cases 2d-l2,2d-l3,3d-l2,3d-l3 --blocks 8 16 32 \
    --md doc/spmv_table.md > /tmp/r2e_spmv.log 2>&1
log "spmv exit=$?"

log "stage 4: cylinder DFG 2D-1 l=2 (mixed precision)"
timeout 5400 python demos/demo_cylinder.py -l 2 --dtype mixed \
    --rtol 1e-7 > /tmp/r2e_cyl_l2.log 2>&1
log "cyl 2d1 exit=$? $(grep -a 'c_D\|c_L\|dP' /tmp/r2e_cyl_l2.log | tr '\n' ' ')"

log "stage 5: cylinder DFG 2D-2 unsteady l=1 (Strouhal)"
timeout 14400 python demos/demo_cylinder.py --unsteady -l 1 --t-end 8 \
    --dt 0.0125 --dtype mixed > /tmp/r2e_cyl2d2.log 2>&1
log "cyl 2d2 exit=$? $(grep -a 'St =\|c_Dmax\|c_Lmax' /tmp/r2e_cyl2d2.log | tr '\n' ' ')"

log "campaign done"
