#!/usr/bin/env python
"""Lid-driven cavity: enclosed flow, Newton vs Picard, BRM1 vs BRM2.

BASELINE.json config 2 (2D lid-driven cavity, Re=500).  Exercises the
pure-Neumann PCD nullspace path for BRM2 (no outflow => no pressure
Dirichlet dofs; fenapack attaches a constant nullspace to the Ap KSP —
SURVEY.md section 2.1 item 4) and the BRM1 lid-BC variant.

    python demos/demo_cavity.py -l 2 --Re 500 --nls newton --pcd BRM2
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-l", "--level", type=int, default=1)
    ap.add_argument("--Re", type=float, default=500.0)
    ap.add_argument("--pcd", choices=["BRM1", "BRM2"], default="BRM2")
    ap.add_argument("--nls", choices=["picard", "newton"], default="picard")
    ap.add_argument("--rtol", type=float, default=1e-5)
    ap.add_argument("--damping", type=float, default=1.0)
    ap.add_argument("--continuation", action="store_true",
                    help="ramp Re in 2x steps (helps Newton at high Re)")
    ap.add_argument("--dtype", default=None)
    ap.add_argument("--vtk", default=None)
    args = ap.parse_args()

    import jax
    from fenapack_tpu.jax_setup import setup as jax_setup
    jax_setup(x64=args.dtype in (None, "float64", "mixed"))
    import jax.numpy as jnp

    from fenapack_tpu.fem import mesh as meshmod
    from fenapack_tpu.fem.assemble import NSAssembler
    from fenapack_tpu.fem.dofmap import DirichletBC
    from fenapack_tpu.solvers.config import SolverConfig, overrides
    from fenapack_tpu.solvers.nonlinear import NonlinearSolver
    from fenapack_tpu.utils.io import save_vtk

    dtype = args.dtype or ("float64" if jax.default_backend() == "cpu"
                           else "float32")
    adtype = jnp.float64 if dtype == "float64" else jnp.float32
    mesh = meshmod.cavity_mesh(args.level)

    def lid(x):
        v = np.zeros((x.shape[0], 2))
        v[:, 0] = 1.0
        return v

    def build(Re):
        asm = NSAssembler(mesh, 1.0 / Re, dtype=adtype)
        bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL],
                                    lambda x: np.zeros((x.shape[0], 2))),
               DirichletBC.velocity(asm.W, [meshmod.INFLOW], lid)]
        cfg = overrides(SolverConfig(), {"pcd.variant": args.pcd,
                                         "dtype": dtype})
        return asm, NonlinearSolver(asm, bcs, cfg, linearization=args.nls,
                                    enclosed=True)

    Res = [args.Re]
    if args.continuation:
        Res = []
        r = 100.0
        while r < args.Re:
            Res.append(r)
            r *= 2
        Res.append(args.Re)

    w = None
    for Re in Res:
        asm, solver = build(Re)
        print(f"\n=== cavity l={args.level} Re={Re:.0f} "
              f"{args.nls}+PCD-{args.pcd} "
              f"(dofs {2 * asm.n2_real + asm.n1_real}) ===")
        res = solver.solve(w0=w, rtol=args.rtol, damping=args.damping,
                           verbose=True)
        w = res.w
        print(f"converged: {res.converged}  steps: {len(res.linear_iters)}  "
              f"iters: {res.linear_iters}")
        print(f"wall: {res.wall_time:.2f} s")

    if args.vtk:
        save_vtk(args.vtk, asm, w)
        print(f"wrote {args.vtk}")


if __name__ == "__main__":
    main()
