#!/usr/bin/env python
"""Device-memory audit of the config-4 3D setup (761k dofs OOM hunt).

Replicates demo_step3d.py's setup phase by phase, printing TPU memory_stats
and the top live device arrays after each, so the resident-set growth that
exhausts the 16 GB HBM is attributable to a specific structure.

    python scripts/mem_audit3d.py -l 3
"""
import argparse
import collections
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def report(tag):
    import jax
    dev = jax.devices()[0]
    try:
        ms = dev.memory_stats()
        used = ms.get("bytes_in_use", 0) / 1e9
        peak = ms.get("peak_bytes_in_use", 0) / 1e9
        lim = ms.get("bytes_limit", 0) / 1e9
        print(f"[{tag}] in_use {used:.2f} GB  peak {peak:.2f} GB  "
              f"limit {lim:.2f} GB", flush=True)
    except Exception as e:
        print(f"[{tag}] memory_stats unavailable: {e}", flush=True)
    # aggregate live arrays by (shape, dtype)
    agg = collections.Counter()
    try:
        for a in jax.live_arrays():
            if getattr(a, "is_deleted", lambda: False)():
                continue
            try:
                if a.devices() and list(a.devices())[0].platform == "cpu":
                    continue
            except Exception:
                pass
            agg[(str(a.shape), str(a.dtype))] += a.nbytes
        for (shape, dt), nb in agg.most_common(14):
            print(f"    {nb/1e6:10.1f} MB  {shape} {dt}", flush=True)
        print(f"    total live: {sum(agg.values())/1e9:.2f} GB", flush=True)
    except Exception as e:
        print(f"    live_arrays failed: {e}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-l", "--level", type=int, default=3)
    ap.add_argument("--length", type=float, default=3.0)
    ap.add_argument("--block", type=int, default=32)
    args = ap.parse_args()

    import jax
    from fenapack_tpu.jax_setup import setup as jax_setup
    jax_setup(x64=True)
    import jax.numpy as jnp
    from fenapack_tpu.fem import mesh3d, mesh as meshmod
    from fenapack_tpu.fem.assemble import NSAssembler
    from fenapack_tpu.solvers import gmg

    print("backend:", jax.default_backend(), flush=True)
    report("start")

    t0 = time.time()
    hier = gmg.build_hierarchy(
        mesh3d.backward_step_mesh3d(0, length=args.length), args.level)
    mesh = hier.fine
    print(f"hierarchy built {time.time()-t0:.1f}s cells={mesh.num_cells}",
          flush=True)
    report("hierarchy")

    t0 = time.time()
    asm = NSAssembler(mesh, 0.05, dtype=jnp.float64, quad_degree=4,
                      block_size=args.block or None,
                      block_dtype=jnp.float32)
    print(f"NSAssembler {time.time()-t0:.1f}s "
          f"dofs={3*asm.n2_real + asm.n1_real}", flush=True)
    report("assembler")

    t0 = time.time()
    ap_h = gmg.PressureHierarchy(hier, jnp.float32,
                                 pcd_markers=[meshmod.OUTFLOW],
                                 block_size=args.block or None,
                                 reorder=bool(args.block))
    print(f"PressureHierarchy {time.time()-t0:.1f}s", flush=True)
    report("pressure_hier")

    t0 = time.time()
    v_h = gmg.VelocityHierarchy(hier, 0.05, jnp.float32,
                                bc_markers=[meshmod.WALL, meshmod.INFLOW],
                                fine_asm=asm, block_size=args.block or None)
    print(f"VelocityHierarchy {time.time()-t0:.1f}s", flush=True)
    report("velocity_hier")


if __name__ == "__main__":
    main()
