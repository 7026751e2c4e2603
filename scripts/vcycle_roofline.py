#!/usr/bin/env python
"""Roofline accounting of the 3D velocity V-cycle (VERDICT r4 #5).

The 761k-dof breakdown (results/r4_bd761k.json) measured the velocity
V-cycle at 711 ms of the 948 ms outer iteration (75%).  This script
computes the cycle's minimum HBM traffic from the actual per-level
BlockELL tile sizes + the configured sweep counts, and turns the measured
wall into an achieved-bandwidth figure — the number that decides whether
the optimization lever is traffic reduction (sweeps/fill) or kernel
quality.

    FENAPACK_PLATFORM=cpu python scripts/vcycle_roofline.py -l 3 --block 8
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_HBM_GBS = 819.0     # v5e peak HBM bandwidth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-l", "--level", type=int, default=3)
    ap.add_argument("--length", type=float, default=3.0)
    ap.add_argument("--block", type=int, default=8)
    ap.add_argument("--nu", type=float, default=0.05)
    ap.add_argument("--smooth-iters", type=int, default=3)
    ap.add_argument("--cycles", type=int, default=2)
    ap.add_argument("--measured-ms", type=float, default=711.265,
                    help="measured pc_velocity_solve_ms per outer iter "
                         "(results/r4_bd761k.json)")
    args = ap.parse_args()

    import jax
    from fenapack_tpu.jax_setup import setup as jax_setup
    jax_setup(x64=True)
    import jax.numpy as jnp
    from fenapack_tpu.fem import mesh3d, mesh as meshmod
    from fenapack_tpu.fem.assemble import NSAssembler
    from fenapack_tpu.solvers import gmg

    hier = gmg.build_hierarchy(
        mesh3d.backward_step_mesh3d(0, length=args.length), args.level)
    asm = NSAssembler(hier.fine, args.nu, dtype=jnp.float64, quad_degree=4,
                      block_size=args.block, block_dtype=jnp.float32)
    v_h = gmg.VelocityHierarchy(hier, args.nu, jnp.float32,
                                bc_markers=[meshmod.WALL, meshmod.INFLOW],
                                fine_asm=asm, block_size=args.block)
    d = 3
    si, cy = args.smooth_iters, args.cycles
    # jacobi smoother: smooth(si) does si matvecs.  Per V-cycle per level
    # (except coarse): pre-smooth si + residual 1 + post-smooth si.
    # cycles=2 adds one extra fine residual matvec between cycles.
    rows = []
    total_bytes = 0.0
    for l, a in enumerate(v_h.asms):
        pat = a.pat_p2
        if hasattr(pat, "value_shape"):
            nb, b, mb = pat.value_shape
            tile_mb = nb * b * mb * 4 / 1e6
            fill = pat.fill_ratio
        else:
            tile_mb = pat.nnz * 4 / 1e6        # ELL fallback
            fill = 1.0
        mv_per_apply = cy * (2 * si + 1) + (cy - 1) * (l == len(v_h.asms) - 1)
        if l == 0:
            # coarse level: dense solve / p-coarse instead of smoothing
            mv_per_apply = cy * 1
        # one stacked matvec streams the tile planes once per component
        bytes_gb = mv_per_apply * d * tile_mb / 1e3
        total_bytes += bytes_gb
        rows.append((l, a.n2, tile_mb, fill, mv_per_apply, bytes_gb))
        print(f"level {l}: n2={a.n2:8d}  tiles {tile_mb:8.1f} MB  "
              f"fill {fill:4.2f}  mv/apply {mv_per_apply:2d}  "
              f"traffic {bytes_gb:6.3f} GB")
    t_bound_ms = total_bytes / V5E_HBM_GBS * 1e3
    ach = total_bytes / (args.measured_ms / 1e3)
    print(f"\nV-cycle operator traffic per PC apply: {total_bytes:.3f} GB")
    print(f"bandwidth bound at {V5E_HBM_GBS:.0f} GB/s: {t_bound_ms:.1f} ms")
    print(f"measured: {args.measured_ms:.1f} ms -> achieved "
          f"{ach:.0f} GB/s ({100*ach/V5E_HBM_GBS:.0f}% of peak, "
          f"{args.measured_ms/t_bound_ms:.1f}x off the traffic bound)")
    out = {"metric": "vcycle_roofline", "levels": [
        {"level": l, "n2": int(n2), "tile_mb": round(tm, 1),
         "fill": round(f, 2), "mv_per_apply": mv,
         "traffic_gb": round(bg, 3)}
        for l, n2, tm, f, mv, bg in rows],
        "total_traffic_gb": round(total_bytes, 3),
        "bound_ms": round(t_bound_ms, 1),
        "measured_ms": args.measured_ms,
        "achieved_gbs": round(ach, 0),
        "x_off_bound": round(args.measured_ms / t_bound_ms, 2)}
    with open("results/r5_vcycle_roofline.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
