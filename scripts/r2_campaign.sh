#!/bin/bash
# Round-2 hardware campaign: turn the VERDICT round-1 measurement gaps
# into recorded numbers on the live chip.  Sequel to tpu_campaign.sh
# (whose 761k/2M FULL-SOLVE stages still hit the axon worker fault —
# reproduced 2026-08-19 05:46; the component probes below stay under the
# crash threshold).
#
#   nohup bash scripts/r2_campaign.sh > /tmp/r2_campaign.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
log() { echo "$(date +%H:%M:%S) $*"; }

log "stage 1: bench.py (new defaults: fused anderson6 + ds_basis) + breakdown"
timeout 2400 python bench.py > /tmp/r2c_bench.json 2> /tmp/r2c_bench.err
log "bench exit=$? $(tail -c 600 /tmp/r2c_bench.json)"

log "stage 2: SpMV layout table (gather/XLA-block/Pallas/df32 x scales)"
timeout 5400 python scripts/spmv_table.py \
    --cases 2d-l2,2d-l3,3d-l2,3d-l3 --blocks 8 16 32 \
    --md doc/spmv_table.md > /tmp/r2c_spmv.log 2>&1
log "spmv exit=$?"

log "stage 3a: 3D stage probe l1 (13k dofs) b=8 incl. full IR solve"
timeout 1800 python scripts/probe_3d_solve.py -l 1 --block 8 \
    --stages mv,pcd,vgmg,asm,ir > /tmp/r2c_probe_l1.log 2>&1
log "probe l1 exit=$?"

log "stage 3: 3D stage probe l2 (100k dofs) b=8 incl. full IR solve"
timeout 3600 python scripts/probe_3d_solve.py -l 2 --block 8 \
    --stages mv,pcd,vgmg,asm,ir > /tmp/r2c_probe_l2.log 2>&1
log "probe l2 exit=$?"

log "stage 4: 3D stage probe l3 (761k) b=8, component stages only"
timeout 5400 python scripts/probe_3d_solve.py -l 3 --block 8 \
    --stages mv,pcd,vgmg,asm > /tmp/r2c_probe_l3.log 2>&1
log "probe l3 exit=$?"

log "stage 5: cylinder DFG 2D-1 l=2 (mixed precision)"
timeout 3600 python demos/demo_cylinder.py -l 2 --dtype mixed \
    --rtol 1e-7 > /tmp/r2c_cyl_l2.log 2>&1
log "cyl 2d1 exit=$? $(grep -a 'c_D\|c_L\|dP' /tmp/r2c_cyl_l2.log | tr '\n' ' ')"

log "stage 6: cylinder DFG 2D-2 unsteady l=1 (Strouhal)"
timeout 10800 python demos/demo_cylinder.py --unsteady -l 1 --t-end 8 \
    --dt 0.0125 --dtype mixed > /tmp/r2c_cyl2d2.log 2>&1
log "cyl 2d2 exit=$? $(grep -a 'St =\|c_Dmax\|c_Lmax' /tmp/r2c_cyl2d2.log | tr '\n' ' ')"

log "campaign done"
