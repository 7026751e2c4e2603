#!/usr/bin/env python
"""Steady 2D backward-facing step with PCD-preconditioned FGMRES.

TPU-native mirror of the reference demo
``demo/navier-stokes-pcd/demo_navier-stokes-pcd.py`` (fenapack; SURVEY.md
section 2.1 item 10): same problem (backward-facing step, Taylor-Hood P2/P1,
parabolic inflow, natural outflow), same knobs:

    python demos/demo_navier_stokes_pcd.py -l 1 --nu 0.02 --pcd BRM2 \
        --nls picard --ls direct

``--ls direct``    exact (dense LU) velocity/Ap subsolves — validation scale;
``--ls iterative`` geometric-multigrid subsolves (the TPU production path,
                   reference analogue: Richardson+AMG / Chebyshev inner KSPs).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-l", "--level", type=int, default=1,
                    help="refinement level (h = 1/4 / 2**l)")
    ap.add_argument("--nu", type=float, default=0.02,
                    help="kinematic viscosity (Re ~ 2/nu)")
    ap.add_argument("--pcd", choices=["BRM1", "BRM2"], default="BRM2")
    ap.add_argument("--nls", choices=["picard", "newton"], default="picard")
    ap.add_argument("--ls", choices=["direct", "iterative"], default="direct")
    ap.add_argument("--supg", action="store_true",
                    help="SUPG-stabilized velocity PC block (high Re)")
    ap.add_argument("--supg-system", action="store_true",
                    help="SUPG-stabilize the SYSTEM (residual + operator): "
                         "required beyond Re ~ 1000 (BASELINE config 5)")
    ap.add_argument("--rtol", type=float, default=1e-5,
                    help="nonlinear relative tolerance")
    ap.add_argument("--krylov-rtol", type=float, default=1e-8)
    ap.add_argument("--damping", type=float, default=1.0,
                    help="nonlinear update damping (high-Re continuation: "
                         "~0.7 at Re >= 2000)")
    ap.add_argument("--max-steps", type=int, default=None,
                    help="cap on nonlinear steps (default: solver's)")
    ap.add_argument("--dtype", default=None,
                    help="float32|float64|mixed (default: f64 on CPU, "
                         "mixed on TPU).  'mixed' is the TPU production "
                         "mode: f64 assembler/residual + f32 FGMRES with "
                         "true-residual IR restarts (solve_fused) — the "
                         "pure-f32 residual plateaus at ~2e-5 relative, "
                         "just above the default --rtol")
    ap.add_argument("--vtk", default=None, help="write solution VTK file")
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="capture a jax.profiler device trace of the solve "
                         "(view in TensorBoard/Perfetto)")
    args = ap.parse_args()

    import jax
    from fenapack_tpu.jax_setup import setup as jax_setup
    # mixed needs x64 too: its assembler/residual side is f64
    jax_setup(x64=args.dtype in (None, "float64", "mixed"))
    import jax.numpy as jnp

    from fenapack_tpu.fem import mesh as meshmod
    from fenapack_tpu.fem.assemble import NSAssembler
    from fenapack_tpu.fem.dofmap import DirichletBC
    from fenapack_tpu.solvers.config import SolverConfig, overrides
    from fenapack_tpu.solvers.nonlinear import NonlinearSolver
    from fenapack_tpu.solvers import gmg
    from fenapack_tpu.utils.timing import Timings, device_trace
    from fenapack_tpu.utils.io import save_vtk

    dtype = args.dtype or ("float64" if jax.default_backend() == "cpu"
                           else "mixed")
    timings = Timings()

    with timings("mesh+assembly"):
        ap_h = v_h = None
        if args.ls == "iterative":
            hier = gmg.build_hierarchy(meshmod.backward_step_mesh(0),
                                       args.level)
            mesh = hier.fine
        else:
            mesh = meshmod.backward_step_mesh(args.level)
        # mixed: f64 assembler (residual accuracy) + f32 solver operators
        adtype = jnp.float32 if dtype == "float32" else jnp.float64
        sdtype = "float64" if dtype == "float64" else "float32"
        asm = NSAssembler(mesh, args.nu, dtype=adtype)

        def inflow(x):
            v = np.zeros((x.shape[0], 2))
            v[:, 0] = 4 * x[:, 1] * (1 - x[:, 1])
            return v

        bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL],
                                    lambda x: np.zeros((x.shape[0], 2))),
               DirichletBC.velocity(asm.W, [meshmod.INFLOW], inflow)]

        over = {"pcd.variant": args.pcd, "dtype": sdtype,
                "krylov.rtol": args.krylov_rtol, "jpc_supg": args.supg,
                "system_supg": args.supg_system}
        if args.ls == "iterative":
            over.update({"velocity.method": "gmg", "velocity.smooth_iters": 3,
                         "velocity.cycles": 2, "pcd.ap.method": "gmg"})
            marker = (meshmod.INFLOW if args.pcd == "BRM1"
                      else meshmod.OUTFLOW)
            hdtype = jnp.dtype(sdtype)
            ap_h = gmg.PressureHierarchy(hier, hdtype, pcd_markers=[marker])
            v_h = gmg.VelocityHierarchy(
                hier, args.nu, hdtype,
                bc_markers=[meshmod.WALL, meshmod.INFLOW], fine_asm=asm)
        cfg = overrides(SolverConfig(), over)
        from fenapack_tpu.solvers.config import env_overrides
        cfg = env_overrides(cfg)   # FENAPACK_CFG=key=val,... applied last
        solver = NonlinearSolver(asm, bcs, cfg, linearization=args.nls,
                                 ap_hierarchy=ap_h, velocity_hierarchy=v_h)

    print(f"backward-facing step  l={args.level}  nu={args.nu}  "
          f"Re~{2 / args.nu:.0f}")
    print(f"dofs: velocity {2 * asm.n2_real}, pressure {asm.n1_real}, "
          f"total {2 * asm.n2_real + asm.n1_real}")
    print(f"solver: {args.nls} + PCD-{args.pcd} FGMRES ({args.ls} subsolves, "
          f"dtype {dtype})")

    ms = {} if args.max_steps is None else {"max_steps": args.max_steps}
    with timings("nonlinear solve"), device_trace(args.trace):
        if dtype == "mixed":
            res = solver.solve_fused(rtol=args.rtol,
                                     rtol_lin=args.krylov_rtol,
                                     damping=args.damping, verbose=True,
                                     **ms)
        else:
            res = solver.solve(rtol=args.rtol, damping=args.damping,
                               verbose=True, **ms)

    print(f"\nconverged: {res.converged}  "
          f"nonlinear steps: {len(res.linear_iters)}")
    print(f"FGMRES iters per step: {res.linear_iters} "
          f"(total {res.total_linear_iters})")
    print(f"wall time: {res.wall_time:.2f} s\n")
    print(timings.report())

    if args.vtk:
        save_vtk(args.vtk, asm, res.w)
        print(f"wrote {args.vtk}")


if __name__ == "__main__":
    main()
