"""Find mixed containers that hide big arrays from lift_jit.

Reproduces the `lift_jit: big device array inside a mixed container` warning
seen on the 2M-dof step3d run (results/r2e logs) with full attribute paths,
on CPU at a small level, by lowering the lift threshold.

Usage:  JAX_PLATFORMS=cpu python scripts/probe_lift_sites.py [-l 1] [--thresh 4096]
"""
import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def walk(roots, thresh):
    """Re-implement runtime.collect_sites' traversal with path tracking and
    report every big array reachable only through a MIXED container."""
    from fenapack_tpu import runtime as rt

    def is_big(v):
        return isinstance(v, jax.Array) and v.size * v.dtype.itemsize >= thresh

    def liftable(v):
        if not isinstance(v, (tuple, list, dict)):
            return False
        leaves = jax.tree_util.tree_leaves(v)
        return (bool(leaves) and all(isinstance(l, jax.Array) for l in leaves)
                and any(is_big(l) for l in leaves))

    hidden = []
    seen = set()
    stack = [(r, f"root[{type(r).__name__}]") for r in roots]
    while stack:
        o, path = stack.pop()
        if o is None or id(o) in seen:
            continue
        seen.add(id(o))
        if isinstance(o, jax.Array):
            if is_big(o):
                hidden.append((path, o.shape, str(o.dtype),
                               o.size * o.dtype.itemsize))
            continue
        if isinstance(o, (tuple, list)):
            stack.extend((v, f"{path}[{i}]") for i, v in enumerate(o))
            continue
        if isinstance(o, dict):
            stack.extend((v, f"{path}[{k!r}]") for k, v in o.items())
            continue
        if not hasattr(o, "__dict__"):
            continue
        for name, v in list(vars(o).items()):
            p = f"{path}.{name}"
            if is_big(v) or liftable(v):
                continue            # lifted fine at this site
            if isinstance(v, (tuple, list, dict)) or rt._should_recurse(v):
                stack.append((v, p))
    return hidden


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-l", type=int, default=1)
    ap.add_argument("--thresh", type=int, default=1 << 12)
    args = ap.parse_args()

    # replicate demos/demo_step3d.py setup (gmg velocity, b=8 blocks, f32)
    from fenapack_tpu.jax_setup import setup as jax_setup
    jax_setup(x64=True)
    import jax.numpy as jnp
    from fenapack_tpu.fem import mesh3d, mesh as meshmod
    from fenapack_tpu.fem.assemble import NSAssembler
    from fenapack_tpu.fem.dofmap import DirichletBC
    from fenapack_tpu.solvers.config import SolverConfig, overrides
    from fenapack_tpu.solvers.nonlinear import NonlinearSolver
    from fenapack_tpu.solvers import gmg

    hier = gmg.build_hierarchy(mesh3d.backward_step_mesh3d(0), args.l)
    mesh = hier.fine
    asm = NSAssembler(mesh, 0.05, dtype=jnp.float64, quad_degree=4,
                      block_size=8, block_dtype=jnp.float32)

    def inflow(x):
        v = np.zeros((x.shape[0], 3))
        v[:, 0] = 16.0 * x[:, 1] * (1 - x[:, 1]) * x[:, 2] * (1 - x[:, 2])
        return v

    bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL],
                                lambda x: np.zeros((x.shape[0], 3))),
           DirichletBC.velocity(asm.W, [meshmod.INFLOW], inflow)]
    over = {"pcd.variant": "BRM2", "dtype": "float32",
            "velocity.method": "gmg", "velocity.smooth_iters": 3,
            "velocity.cycles": 2, "pcd.ap.method": "gmg",
            "krylov.maxiter": 120, "krylov.rtol": 2e-6,
            "pcd.mp.method": "chebyshev"}
    ap_h = gmg.PressureHierarchy(hier, jnp.float32,
                                 pcd_markers=[meshmod.OUTFLOW],
                                 block_size=8, reorder=True)
    v_h = gmg.VelocityHierarchy(hier, 0.05, jnp.float32,
                                bc_markers=[meshmod.WALL, meshmod.INFLOW],
                                fine_asm=asm, block_size=8)
    cfg = overrides(SolverConfig(), over)
    nl = NonlinearSolver(asm, bcs, cfg, linearization="picard",
                         ap_hierarchy=ap_h, velocity_hierarchy=v_h)
    roots = nl.oseen._lift_roots

    hidden = walk(roots, args.thresh)
    if not hidden:
        print(f"no hidden arrays at threshold {args.thresh}")
    total = 0
    for path, shape, dt, nbytes in sorted(hidden, key=lambda h: -h[3]):
        total += nbytes
        print(f"{nbytes/1e6:10.2f} MB  {dt:>8}  {shape!s:>20}  {path}")
    print(f"TOTAL hidden: {total/1e6:.2f} MB across {len(hidden)} arrays")

    # Now reproduce the warning on the real solve path (the roots at
    # solve_fused time may differ from the construction-time roots) with
    # the threshold lowered so level-1 arrays trigger like 2M-dof ones do.
    import traceback
    import warnings
    from fenapack_tpu import runtime as rt
    rt.LIFT_THRESHOLD_BYTES = args.thresh
    with warnings.catch_warnings():
        warnings.filterwarnings("error", message=".*mixed container.*")
        try:
            nl.solve_fused(rtol=1e-2, verbose=False, max_steps=1,
                           rtol_lin=1e-4, split_programs=True)
            print("solve_fused(split_programs=True): no mixed-container warn")
        except UserWarning:
            traceback.print_exc()


if __name__ == "__main__":
    main()
