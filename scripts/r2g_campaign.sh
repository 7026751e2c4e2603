#!/bin/bash
# Round-2 campaign, wave 4: cylinder DFG numbers (now with true-f64 mixed
# mode after the x64 gating fix), bench re-records with the multi-RHS df32
# kernel, and the 2M-dof memory attribution.  ONE TPU job at a time.
#
#   nohup bash scripts/r2g_campaign.sh > /tmp/r2g_campaign.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
log() { echo "$(date +%H:%M:%S) $*"; }

log "stage 1: cylinder DFG 2D-1 l=0 (sanity: sign + coarse values)"
timeout 3600 python demos/demo_cylinder.py -l 0 --dtype mixed \
    --rtol 1e-7 > /tmp/r2g_cyl_l0.log 2>&1
log "cyl l0 exit=$? $(grep -a 'c_D\|c_L\|dP' /tmp/r2g_cyl_l0.log | tr '\n' ' ')"

log "stage 2: bench defaults (multi-RHS df32)"
timeout 2400 python bench.py > /tmp/r2g_bench_default.json 2> /tmp/r2g_bench_default.err
log "exit=$? $(tail -c 300 /tmp/r2g_bench_default.json)"

log "stage 3: bench anderson6 + recycle16"
timeout 2400 env BENCH_RECYCLE=16 python bench.py \
    > /tmp/r2g_bench_a6r16.json 2> /tmp/r2g_bench_a6r16.err
log "exit=$? $(tail -c 300 /tmp/r2g_bench_a6r16.json)"

log "stage 4: bench anderson4 + recycle16"
timeout 2400 env BENCH_RECYCLE=16 BENCH_ANDERSON=4 python bench.py \
    > /tmp/r2g_bench_a4r16.json 2> /tmp/r2g_bench_a4r16.err
log "exit=$? $(tail -c 300 /tmp/r2g_bench_a4r16.json)"

log "stage 5: cylinder DFG 2D-1 l=2 (sharp values)"
timeout 5400 python demos/demo_cylinder.py -l 2 --dtype mixed \
    --rtol 1e-7 > /tmp/r2g_cyl_l2.log 2>&1
rc=$?
log "cyl l2 exit=$rc $(grep -a 'c_D\|c_L\|dP' /tmp/r2g_cyl_l2.log | tr '\n' ' ')"
if [ $rc -ne 0 ]; then
    log "stage 5 retry after 60s (transient worker faults reproduce rarely)"
    sleep 60
    timeout 5400 python demos/demo_cylinder.py -l 2 --dtype mixed \
        --rtol 1e-7 > /tmp/r2g_cyl_l2b.log 2>&1
    log "cyl l2 retry exit=$? $(grep -a 'c_D\|c_L\|dP' /tmp/r2g_cyl_l2b.log | tr '\n' ' ')"
fi

log "stage 6: cylinder DFG 2D-2 unsteady l=1 (Strouhal, t_end 8)"
timeout 14400 python demos/demo_cylinder.py --unsteady -l 1 --t-end 8 \
    --dt 0.0125 --dtype mixed > /tmp/r2g_cyl2d2.log 2>&1
log "cyl 2d2 exit=$? $(grep -a 'St =\|c_Dmax\|c_Lmax' /tmp/r2g_cyl2d2.log | tr '\n' ' ')"

log "stage 7: 2M-dof memory attribution (residual stage)"
timeout 7200 python scripts/mem_audit3d.py -l 3 --length 9 --block 8 \
    --residual > /tmp/r2g_mem2m.log 2>&1
log "mem2m exit=$? $(grep -a 'residual lift\|total live' /tmp/r2g_mem2m.log | tail -3 | tr '\n' ' ')"

log "campaign done"
