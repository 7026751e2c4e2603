#!/bin/bash
# Round-5 remaining chip stages, serialized after the 2D-2 l2 scan:
#   A) 2M config-4: probe ladder + solve with P2-square tiles kept
#      (MAXBYTES=1.3e9 clears the m=101 b=8 pattern that the default
#      budget evicted to gather-ELL -> ~60 s/outer-iter -> execution kill)
#   B) cylinder l2 steady hi-IR record (VERDICT r4 #3) + l3 attempt
#      (block layout: ~7x per-iter; the l3 crash was duration-class)
#   C) 3D V-cycle A/B at 761k (blocktrans, b=32)
#   D) high-Re Re=2000 on-chip record (BASELINE config 5)
#   E) bench re-record
set -u
cd "$(dirname "$0")/.."
LOG=results/r5_campaign_progress.log
log() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

# wait for the 2D-2 chain to release the chip (chain pid via env)
CHAIN_PID=${R5_CHAIN_PID:-0}
while [ "$CHAIN_PID" != "0" ] && kill -0 "$CHAIN_PID" 2>/dev/null; do
    sleep 60
done

log "stage A: 2M solve, P2 tiles kept (MAXBYTES=1.3e9, mi=16, probe ladder)"
timeout 9000 env FENAPACK_TRANSFER_BLOCK_SCALE=1.0 \
    FENAPACK_BLOCK_MAXBYTES=1.3e9 \
    python scripts/r5_2m_solve.py -l 3 --length 9 --block 8 \
    --dtype float32 --maxiter 16 --probe \
    --out results/r5_2m_solve.json > /tmp/r5_2m_a9.log 2>&1
rc=$?
cp /tmp/r5_2m_a9.log results/r5_2m_attempt9.log
log "2M attempt 9 exit=$rc $(grep -a 'probe\]\|verdict\|converged\|wall_s' /tmp/r5_2m_a9.log | tail -6 | tr '\n' ' | ' | tail -c 400)"

log "stage B1: cylinder l2 steady hi-IR record (block 32)"
timeout 4800 env FENAPACK_CFG=krylov.hi_krylov=True \
    FENAPACK_TRANSFER_BLOCK_SCALE=1.0 \
    python demos/demo_cylinder.py -l 2 --rtol 1e-6 --block 32 \
    --split-programs > results/r5_dfg2d1_l2_tpu_hi.log 2>&1
log "cyl l2 hi exit=$? $(grep -a 'iters/step\|c_D\|c_L\|dP' results/r5_dfg2d1_l2_tpu_hi.log | tr '\n' ' ' | tail -c 300)"

log "stage B2: cylinder l3 TPU attempt (block 32, hi-IR, capped programs)"
timeout 7200 env FENAPACK_CFG=krylov.hi_krylov=True,krylov.maxiter=60 \
    FENAPACK_TRANSFER_BLOCK_SCALE=1.0 \
    python demos/demo_cylinder.py -l 3 --rtol 1e-6 --block 32 \
    --split-programs > results/r5_dfg2d1_l3_tpu_hi.log 2>&1
log "cyl l3 hi exit=$? $(grep -a 'iters/step\|c_D\|c_L\|dP\|Error\|UNAVAIL' results/r5_dfg2d1_l3_tpu_hi.log | tr '\n' ' ' | tail -c 300)"

log "stage C: 761k V-cycle A/B (blocktrans at b=8, then b=32)"
for v in "blocktrans 8" "b32_blocktrans 32"; do
    set -- $v
    timeout 5400 env FENAPACK_TRANSFER_BLOCK_SCALE=1.0 \
        python scripts/bench3d_breakdown.py -l 3 --dtype float32 \
        --steps 2 --block "$2" > "results/r5_bd761k_$1.log" 2>&1
    log "vcycle A/B $1 exit=$? $(grep -ao '"pc_velocity_solve_ms": [0-9.]*\|"per_outer_iter_ms": [0-9.]*' results/r5_bd761k_$1.log | tail -2 | tr '\n' ' ')"
done

log "stage D: high-Re Re=2000 on-chip record (SUPG system, BRM2)"
timeout 3600 python demos/demo_navier_stokes_pcd.py -l 2 --nu 1e-3 \
    --pcd BRM2 --nls picard --ls iterative --supg --supg-system \
    --rtol 1e-4 --damping 0.7 --max-steps 6 \
    > results/r5_highre2000_tpu.log 2>&1
log "highre exit=$? $(grep -a 'iters per step\|converged' results/r5_highre2000_tpu.log | tr '\n' ' ' | tail -c 250)"

log "stage E: bench re-record"
timeout 3600 python bench.py > results/r5_bench_tpu.json 2> /tmp/r5_bench.log
log "bench exit=$? $(tail -c 300 results/r5_bench_tpu.json)"
log "=== r5_rest done ==="
