#!/bin/bash
# Round-5 stage D (VERDICT r4 #5): cut the 761k velocity V-cycle.
# Roofline (results/r5_vcycle_roofline.json): measured 711 ms/apply is 15x
# off the b=8 tile-traffic bound; suspects are gather-form transfers
# (0.1% roofline) and the 29x b=8 fill.  A/B on chip, one variant per
# process, each ~15-25 min (setup + a 2-step solve + stage timing).
set -u
cd "$(dirname "$0")/.."
LOG=results/r5_campaign_progress.log
log() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

run() { # name envspec block
    name=$1; envspec=$2; blk=$3
    log "vcycle A/B: $name start (block=$blk $envspec)"
    timeout 5400 env $envspec python scripts/bench3d_breakdown.py -l 3 \
        --dtype float32 --steps 2 --block "$blk" \
        > "results/r5_bd761k_${name}.log" 2>&1
    rc=$?
    v=$(grep -ao '"pc_velocity_solve_ms": [0-9.]*' \
        "results/r5_bd761k_${name}.log" | tail -1)
    p=$(grep -ao '"per_outer_iter_ms": [0-9.]*' \
        "results/r5_bd761k_${name}.log" | tail -1)
    log "vcycle A/B: $name exit=$rc $p $v"
}

# A: block transfers (un-evict the materialized P2 transfer operators)
run blocktrans "FENAPACK_TRANSFER_BLOCK_SCALE=1.0" 8
# B: b=32 level operators (449 GB/s vs b=8's 92 at 3d-l3, spmv_table;
#    b=8 exists for 2M HBM capacity, which 761k doesn't need) + A
run b32_blocktrans "FENAPACK_TRANSFER_BLOCK_SCALE=1.0" 32
# C: B + single V-cycle per apply (counts may rise; net decides)
run b32_bt_cy1 "FENAPACK_TRANSFER_BLOCK_SCALE=1.0 FENAPACK_CFG=velocity.cycles=1" 32
log "vcycle A/B done"
