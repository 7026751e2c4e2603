#!/bin/bash
# Round-2 campaign, wave 6: finish the hardware evidence.
#   stage 1 (already running, waited on): 2M-dof config-4 solve
#             (hi_res_f32 + maxiter 80 + b=8 — the HBM trims)
#   stage 2: cylinder DFG 2D-1 l=2 steady (sharp drag/lift), retried —
#            worker faults reproduce sporadically on this shape
#   stage 3: cylinder DFG 2D-2 l=1 Strouhal with per-chunk
#            checkpoint/resume: each retry CONTINUES the trajectory
#   stage 4: bench re-record (multi-RHS gated off again)
#
#   nohup bash scripts/w6_campaign.sh > /tmp/w6_campaign.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
log() { echo "$(date +%H:%M:%S) $*"; }

if [ -f /tmp/w6_2m.pid ]; then
    log "stage 1: waiting on 2M solve (pid $(cat /tmp/w6_2m.pid))"
    while kill -0 "$(cat /tmp/w6_2m.pid)" 2>/dev/null; do sleep 60; done
    log "2M done: $(grep -a 'converged\|Error\|EXHAUSTED' /tmp/w6_2m_b8.log | tail -2 | tr '\n' ' ')"
fi
if ! grep -aq "converged: True" /tmp/w6_2m_b8.log; then
    log "stage 1 retry: maxiter 60 (smaller basis)"
    sleep 60
    timeout 14400 python demos/demo_step3d.py -l 3 --length 9 --block 8 \
        --maxiter 60 > /tmp/w6_2m_b8_r2.log 2>&1
    log "2M retry exit=$? $(grep -a 'converged\|wall' /tmp/w6_2m_b8_r2.log | tail -2 | tr '\n' ' ')"
fi

log "stage 2: cylinder DFG 2D-1 l=2 steady (maxiter 60)"
for i in 1 2 3; do
    timeout 5400 python demos/demo_cylinder.py -l 2 --dtype mixed \
        --rtol 1e-7 --maxiter 60 > /tmp/w6_cyl_l2_$i.log 2>&1
    rc=$?
    log "cyl l2 attempt $i exit=$rc $(grep -a 'c_D\|c_L\|dP' /tmp/w6_cyl_l2_$i.log | tr '\n' ' ')"
    [ $rc -eq 0 ] && break
    sleep 60
done

log "stage 3: cylinder DFG 2D-2 l=1 (t_end 8, resume across faults)"
rm -f /tmp/w6_2d2.csv /tmp/w6_2d2.csv.ckpt.npz
for i in 1 2 3 4 5 6 7 8; do
    timeout 10800 python demos/demo_cylinder.py --unsteady -l 1 --t-end 8 \
        --dt 0.0125 --chunk 40 --hist /tmp/w6_2d2.csv \
        > /tmp/w6_cyl2d2_$i.log 2>&1
    rc=$?
    log "2d2 attempt $i exit=$rc $(grep -a 'St =\|c_Dmax\|c_Lmax\|resumed' /tmp/w6_cyl2d2_$i.log | tail -4 | tr '\n' ' ')"
    [ $rc -eq 0 ] && break
    sleep 60
done

log "stage 4: bench re-record"
timeout 2400 python bench.py > /tmp/w6_bench.json 2> /tmp/w6_bench.err
log "bench exit=$? $(tail -c 300 /tmp/w6_bench.json)"

log "campaign done"
