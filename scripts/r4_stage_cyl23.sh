#!/bin/bash
# Round-4 tail: cylinder DFG 2D-1 at l=2, l=3 on TPU (mixed precision,
# split programs — single-program executions stay under the service kill).
# l=3 (1.3M dofs) is the cL-in-band attempt (VERDICT r3 #5): cL converges
#
#   -0.0038 (l0) -> 0.0081 (l1) -> 0.0101 (l2) -> band [0.0104, 0.0110]
# and TPU mixed matched CPU f64 to 4 digits at l0/l1 (round 3).
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_campaign_progress.log
log() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

if [ -f /tmp/r4_stage_a2.pid ]; then
    while kill -0 "$(cat /tmp/r4_stage_a2.pid)" 2>/dev/null; do sleep 60; done
fi

for lvl in 2 3; do
    log "cylinder l$lvl TPU steady (split programs)"
    timeout 7200 python demos/demo_cylinder.py -l $lvl --rtol 1e-6 \
        --split-programs > results/r4_dfg2d1_l${lvl}_tpu.log 2>&1
    log "cylinder l$lvl tpu exit=$? $(grep -a 'iters/step\|c_L\|c_D\|dP' results/r4_dfg2d1_l${lvl}_tpu.log | tr '\n' ' ' | tail -c 300)"
done
log "=== r4 cylinder l2/l3 done ==="
