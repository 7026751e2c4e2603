#!/bin/bash
# Round-4 campaign, quick stages first (reordered from r4_campaign.sh):
#   stage D: 2D bench A/B selective reorthogonalization  [VERDICT r3 #9]
#   stage C: 3D per-stage breakdown at 761k (+ MRHS)     [VERDICT r3 #6]
# Stages A (2M) and B (2D-2) launch separately once the cylinder solver
# tuning (VERDICT #3) is in, so the unsteady run doesn't burn hours at
# cap-saturated iteration counts.
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_campaign_progress.log
log() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

log "=== r4 stage D+C start ==="

log "stage D: 2D bench selective-reorth A/B (default eta=0 vs 0.707)"
timeout 3600 python bench.py > /tmp/r4_bench_eta0.json 2>/tmp/r4_bench_eta0.err
log "bench eta=0 exit=$? $(tail -c 300 /tmp/r4_bench_eta0.json)"
BENCH_OVER="krylov.reorth_eta=0.707" timeout 3600 python bench.py \
    > /tmp/r4_bench_eta707.json 2>/tmp/r4_bench_eta707.err
log "bench eta=.707 exit=$? $(tail -c 300 /tmp/r4_bench_eta707.json)"
cp /tmp/r4_bench_eta0.json /tmp/r4_bench_eta707.json results/ 2>/dev/null

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

log "=== r4 stage D+C done ==="
