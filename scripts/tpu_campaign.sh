#!/bin/bash
# Hardware campaign: the ordered TPU job queue for when the axon service is
# healthy.  ONE job at a time (the remote compile service serializes, and
# concurrent host jobs pollute wall-clock on the single CPU core).
#
#   bash scripts/tpu_campaign.sh [logdir]
#
# Order = value density under uncertain service uptime:
#   1. bench.py            — the driver's headline metric (re-record df32)
#   2. 3D fgmres ladder    — bisect the 761k worker crash (cheb->gmg1->gmg2)
#   3. 761k full solve     — config-4 shape at l=3
#   4. 2M config-4         — l=3 length=9 (the full-scale target)
# Stage 4 only fires if stage 3 converged (grep for its success line).
set -u
LOG=${1:-/tmp/campaign}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

note() { echo "$(date -u +%H:%M:%S) $*" | tee -a "$LOG/campaign.log"; }

note "stage 1: bench.py (defaults)"
timeout 5400 python bench.py > "$LOG/bench.json" 2> "$LOG/bench.err"
note "bench exit=$? $(tail -1 "$LOG/bench.json")"

note "stage 2: 761k fgmres crash ladder"
timeout 10800 python scripts/probe_3d_solve.py -l 3 --stages fgmres \
    > "$LOG/ladder.log" 2>&1
note "ladder exit=$? $(grep -E 'fgmres\[|UNAVAILABLE' "$LOG/ladder.log" | tail -4 | tr '\n' ' ')"

note "stage 3: 761k full solve (demo_step3d -l 3 f32)"
timeout 10800 python demos/demo_step3d.py -l 3 --dtype float32 \
    > "$LOG/step3d_761k.log" 2>&1
rc=$?
note "761k exit=$rc $(tail -2 "$LOG/step3d_761k.log" | tr '\n' ' ')"
if ! grep -qi "converged" "$LOG/step3d_761k.log"; then
    # HBM-fill fallback: b=8 tiles cut the operator set 1.6 -> 0.6 GB at
    # 761k (scripts/block_fill_audit.py) — retry in case the worker crash
    # is memory-pressure-shaped
    note "stage 3 retry: b=8 tiles"
    timeout 10800 python demos/demo_step3d.py -l 3 --dtype float32 \
        --block 8 > "$LOG/step3d_761k_b8.log" 2>&1
    note "761k b8 exit=$? $(tail -2 "$LOG/step3d_761k_b8.log" | tr '\n' ' ')"
    cp "$LOG/step3d_761k_b8.log" "$LOG/step3d_761k.log"
fi

if grep -qi "converged" "$LOG/step3d_761k.log"; then
    note "stage 4: 2M config-4 (length=9)"
    timeout 14400 python demos/demo_step3d.py -l 3 --length 9.0 \
        --dtype float32 --maxiter 120 > "$LOG/step3d_2m.log" 2>&1
    rc=$?
    note "2M exit=$rc $(tail -2 "$LOG/step3d_2m.log" | tr '\n' ' ')"
    if [ $rc -ne 0 ]; then
        # HBM-fill fallback: b=8 tiles (block-32 P2 fill is ~6.9 GB at 2M)
        note "stage 4 retry: b=8 tiles"
        timeout 14400 python demos/demo_step3d.py -l 3 --length 9.0 \
            --dtype float32 --maxiter 120 --block 8 \
            > "$LOG/step3d_2m_b8.log" 2>&1
        note "2M b8 exit=$? $(tail -2 "$LOG/step3d_2m_b8.log" | tr '\n' ' ')"
    fi
else
    note "stage 4 skipped (761k did not converge)"
fi
note "stage 5: config sweep (one process, level 2)"
timeout 10800 python scripts/sweep_bench.py > "$LOG/sweep.jsonl" 2> "$LOG/sweep.err"
note "sweep exit=$? $(wc -l < "$LOG/sweep.jsonl") points"

note "campaign done"
