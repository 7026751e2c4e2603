#!/bin/bash
# Round-3 hardware campaign (run AFTER the exec-watchdog finding: every
# stage keeps single-program execution well under the ~60-120 s service
# kill threshold — split_programs / small scan chunks).
#   stage 1: cylinder DFG 2D-1 l=2 steady, split programs  (sharp bands)
#   stage 2: cylinder DFG 2D-2 l=1 Strouhal, chunk 12 + resume loop
#   stage 3: 2D bench A/B: selective reorthogonalization (VERDICT #8)
#   stage 4: 3D per-stage breakdown at 761k, default + FENAPACK_MRHS=1
#   stage 5: config-4 2.05M-dof solve (split programs, b=8)
set -u
cd "$(dirname "$0")/.."
LOG=results/r3_campaign_progress.log
log() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

log "=== r3 campaign start ==="

log "stage 1: cylinder DFG 2D-1 l=2 steady (split programs, maxiter 60)"
for i in 1 2; do
    timeout 7200 python demos/demo_cylinder.py -l 2 --dtype mixed \
        --rtol 1e-7 --maxiter 60 --split-programs \
        > /tmp/r3_cyl_l2_$i.log 2>&1
    rc=$?
    log "cyl l2 attempt $i exit=$rc $(grep -a 'c_D\|c_L\|dP' /tmp/r3_cyl_l2_$i.log | tr '\n' ' ')"
    if [ $rc -eq 0 ]; then cp /tmp/r3_cyl_l2_$i.log results/r3_dfg2d1_l2_tpu.log; break; fi
    sleep 120
done

log "stage 2: cylinder DFG 2D-2 l=1 Strouhal (chunk 12, resume across faults)"
rm -f /tmp/r3_2d2.csv /tmp/r3_2d2.csv.ckpt.npz
for i in 1 2 3 4 5 6 7 8; do
    timeout 10800 python demos/demo_cylinder.py --unsteady -l 1 --t-end 8 \
        --dt 0.0125 --chunk 12 --hist /tmp/r3_2d2.csv \
        > /tmp/r3_2d2_$i.log 2>&1
    rc=$?
    log "2d2 attempt $i exit=$rc rows=$(wc -l < /tmp/r3_2d2.csv 2>/dev/null || echo 0) $(grep -a 'St\|Strouhal' /tmp/r3_2d2_$i.log | tr '\n' ' ')"
    if [ $rc -eq 0 ]; then
        cp /tmp/r3_2d2.csv results/r3_dfg2d2_hist.csv
        cp /tmp/r3_2d2_$i.log results/r3_dfg2d2_l1_tpu.log
        break
    fi
    sleep 120
done

log "stage 3: 2D bench selective-reorth A/B"
timeout 3600 python bench.py > /tmp/r3_bench_eta0.json 2>/tmp/r3_bench_eta0.err
log "bench eta=0 exit=$? $(tail -c 400 /tmp/r3_bench_eta0.json)"
BENCH_OVER="krylov.reorth_eta=0.707" timeout 3600 python bench.py \
    > /tmp/r3_bench_eta707.json 2>/tmp/r3_bench_eta707.err
log "bench eta=.707 exit=$? $(tail -c 400 /tmp/r3_bench_eta707.json)"
cp /tmp/r3_bench_eta0.json /tmp/r3_bench_eta707.json results/ 2>/dev/null

log "stage 4: 3D 761k per-stage breakdown (default, then MRHS)"
timeout 10800 python scripts/bench3d_breakdown.py -l 3 --dtype float32 \
    --block 8 --steps 2 > /tmp/r3_bd761k.json 2>/tmp/r3_bd761k.err
log "breakdown exit=$? $(tail -c 600 /tmp/r3_bd761k.json)"
FENAPACK_MRHS=1 timeout 7200 python scripts/bench3d_breakdown.py -l 3 \
    --dtype float32 --block 8 --steps 1 \
    > /tmp/r3_bd761k_mrhs.json 2>/tmp/r3_bd761k_mrhs.err
log "breakdown MRHS exit=$? $(tail -c 600 /tmp/r3_bd761k_mrhs.json)"
cp /tmp/r3_bd761k.json /tmp/r3_bd761k_mrhs.json results/ 2>/dev/null

log "stage 5: config-4 2.05M-dof solve (b=8, split programs)"
timeout 28800 python demos/demo_step3d.py -l 3 --length 9 --block 8 \
    --dtype float32 --maxiter 60 > /tmp/r3_2m_b8.log 2>&1
rc=$?
log "2M exit=$rc $(grep -a 'converged\|wall\|dofs' /tmp/r3_2m_b8.log | tr '\n' ' ')"
[ $rc -eq 0 ] && cp /tmp/r3_2m_b8.log results/r3_2m_b8_tpu.log

log "=== r3 campaign done ==="
