#!/bin/bash
# Post-campaign measurement wave: re-record the headline bench with the
# multi-RHS df32 kernel (7d9ee0e), and re-test the GCRO-DR recycle configs
# on chip — the TPU-side recycle stall was fixed by the Cholesky unroll
# (3350f4a) AFTER the sweep that set the anderson6 defaults, so recycle
# was never fairly measured on hardware (CPU: anderson4+rec16 = 249 iters
# vs oracle 287).
#
#   nohup bash scripts/r2f_measure.sh > /tmp/r2f_measure.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
log() { echo "$(date +%H:%M:%S) $*"; }

log "1: bench defaults (multi-RHS df32)"
timeout 2400 python bench.py > /tmp/r2f_bench_default.json 2> /tmp/r2f_bench_default.err
log "exit=$? $(tail -c 400 /tmp/r2f_bench_default.json)"

log "2: bench anderson6 + recycle16"
timeout 2400 env BENCH_RECYCLE=16 python bench.py \
    > /tmp/r2f_bench_a6r16.json 2> /tmp/r2f_bench_a6r16.err
log "exit=$? $(tail -c 400 /tmp/r2f_bench_a6r16.json)"

log "3: bench anderson4 + recycle16"
timeout 2400 env BENCH_RECYCLE=16 BENCH_ANDERSON=4 python bench.py \
    > /tmp/r2f_bench_a4r16.json 2> /tmp/r2f_bench_a4r16.err
log "exit=$? $(tail -c 400 /tmp/r2f_bench_a4r16.json)"

log "4: bench hik + recycle16 (f64 outer, post-unroll)"
timeout 2400 env BENCH_FULLFUSE=1 BENCH_HIK=1 BENCH_RECYCLE=16 BENCH_ANDERSON=0 \
    python bench.py > /tmp/r2f_bench_hikr16.json 2> /tmp/r2f_bench_hikr16.err
log "exit=$? $(tail -c 400 /tmp/r2f_bench_hikr16.json)"

log "done"
