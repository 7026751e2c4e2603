#!/usr/bin/env python
"""3D backward-facing step (BASELINE.json config 4).

Large-scale path: factorization-free subsolves — Chebyshev/Jacobi velocity
sweeps and Chebyshev Ap/Mp — everything batched on one chip.

    python demos/demo_step3d.py -l 1 --nu 0.05            # small
    python demos/demo_step3d.py -l 3 --dtype float32      # ~2M DoF scale
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_parser():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-l", "--level", type=int, default=1)
    ap.add_argument("--length", type=float, default=3.0,
                    help="channel length (9.0 at l=3 gives the ~2M-DoF "
                         "config-4 scale)")
    ap.add_argument("--nu", type=float, default=0.05)
    ap.add_argument("--supg", action="store_true",
                    help="SUPG-stabilized system (BASELINE config 5 at 3D "
                         "scale): use with a small --nu, e.g. 2e-3")
    ap.add_argument("--pcd", choices=["BRM1", "BRM2"], default="BRM2")
    ap.add_argument("--nls", choices=["picard", "newton"], default="picard")
    ap.add_argument("--rtol", type=float, default=1e-5)
    ap.add_argument("--velocity", choices=["lu", "jacobi", "chebyshev",
                                           "gmg"],
                    default="gmg")
    ap.add_argument("--velocity-iters", type=int, default=30)
    ap.add_argument("--gmg-levels", type=int, default=None,
                    help="mesh-hierarchy depth for --velocity gmg "
                         "(default: level, so the coarse grid is l=0)")
    ap.add_argument("--dtype", default=None)
    ap.add_argument("--block", type=int, default=32,
                    help="block-sparse tile size (0 = ELL layout)")
    ap.add_argument("--maxiter", type=int, default=300,
                    help="Krylov dimension (V+Z basis = 2*maxiter*n floats; "
                         "shrink at large n — IR restarts compensate)")
    ap.add_argument("--hi-res-f32", type=int, default=None,
                    help="f32 convection integrals inside the true-residual "
                         "program (default: on at level >= 3 — the "
                         "emulated-f64 einsum temporaries OOM the 16 GB "
                         "chip at 2M dofs; rtol 1e-5 targets unaffected)")
    return ap


def build(args):
    """Construct the config-4 solver; shared with scripts/bench3d_breakdown."""
    import jax
    from fenapack_tpu.jax_setup import setup as jax_setup
    # x64 always: assembly/residual run in f64 (compact ELL layout) so the
    # IR true residuals are trustworthy; --dtype only sets compute precision
    jax_setup(x64=True)
    import jax.numpy as jnp

    from fenapack_tpu.fem import mesh3d, mesh as meshmod
    from fenapack_tpu.fem.assemble import NSAssembler
    from fenapack_tpu.fem.dofmap import DirichletBC
    from fenapack_tpu.solvers.config import (SolverConfig, env_overrides,
                                             overrides)
    from fenapack_tpu.solvers.nonlinear import NonlinearSolver

    dtype = args.dtype or ("float64" if jax.default_backend() == "cpu"
                           else "float32")

    t0 = time.perf_counter()
    hier = None
    if args.velocity == "gmg":
        # same geometry: refine^k(step3d(l-k)) == step3d(l) (h halves per
        # red refinement); GMG transfers need the natural dof ordering
        from fenapack_tpu.solvers import gmg
        depth = args.gmg_levels if args.gmg_levels is not None \
            else args.level
        hier = gmg.build_hierarchy(
            mesh3d.backward_step_mesh3d(args.level - depth,
                                        length=args.length), depth)
        mesh = hier.fine
    else:
        mesh = mesh3d.backward_step_mesh3d(args.level, length=args.length)
    # GMG + block layout compose: the hierarchies relabel per level (RCM)
    # and the transfers carry the ranks — block locality at 3D scale
    # (natural ordering explodes the block fill ~100x at 2M dofs)
    asm = NSAssembler(mesh, args.nu, dtype=jnp.float64, quad_degree=4,
                      block_size=args.block or None,
                      block_dtype=jnp.float32 if dtype == "float32" else None,
                      # steady config-4 never reads the hi P2 mass (445 MB
                      # f64 at 2M); unsteady callers assemble it on demand
                      m2_hi=False)

    def inflow(x):
        v = np.zeros((x.shape[0], 3))
        v[:, 0] = 16.0 * x[:, 1] * (1 - x[:, 1]) * x[:, 2] * (1 - x[:, 2])
        return v

    bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL],
                                lambda x: np.zeros((x.shape[0], 3))),
           DirichletBC.velocity(asm.W, [meshmod.INFLOW], inflow)]
    hi_res_f32 = (args.level >= 3 if args.hi_res_f32 is None
                  else bool(args.hi_res_f32))
    over = {"system_supg": args.supg,
            "krylov.hi_res_f32": hi_res_f32,
            # near-HBM-capacity levels: assembly and the FGMRES solve as
            # separate device programs (element-tensor temps never share a
            # program with the Krylov loop — the 2.05M config-4 fix)
            "krylov.split_assembly": args.level >= 3,
            "pcd.variant": args.pcd, "dtype": dtype,
            "velocity.method": args.velocity,
            "velocity.iters": args.velocity_iters,
            "krylov.maxiter": args.maxiter,
            # f32 FGMRES stalls near sqrt(eps); keep the linear target there
            "krylov.rtol": 2e-6 if dtype == "float32" else 1e-8,
            "pcd.ap.method": "chebyshev", "pcd.ap.iters": 25,
            "pcd.mp.method": "chebyshev"}
    if args.velocity == "lu":
        over.update({"velocity.method": "lu", "krylov.maxiter": 100,
                     "pcd.ap.method": "lu"})
    ap_h = v_h = None
    if args.velocity == "gmg":
        from fenapack_tpu.solvers import gmg
        over.update({"velocity.method": "gmg", "velocity.smooth_iters": 3,
                     "velocity.cycles": 2, "pcd.ap.method": "gmg",
                     "krylov.maxiter": min(args.maxiter, 120)})
        marker = meshmod.INFLOW if args.pcd == "BRM1" else meshmod.OUTFLOW
        bdt = jnp.float32 if dtype == "float32" else jnp.float64
        ap_h = gmg.PressureHierarchy(hier, bdt, pcd_markers=[marker],
                                     block_size=args.block or None,
                                     reorder=bool(args.block))
        v_h = gmg.VelocityHierarchy(
            hier, args.nu, bdt,
            bc_markers=[meshmod.WALL, meshmod.INFLOW],
            fine_asm=asm, block_size=args.block or None)
    cfg = overrides(SolverConfig(), over)
    if over["pcd.ap.method"] == "chebyshev":
        cfg = overrides(cfg, {"pcd.ap.bounds": None})
    cfg = env_overrides(cfg)
    solver = NonlinearSolver(asm, bcs, cfg, linearization=args.nls,
                             ap_hierarchy=ap_h, velocity_hierarchy=v_h)
    ndof = 3 * asm.n2_real + asm.n1_real
    print(f"3D step l={args.level}  nu={args.nu}  cells {mesh.num_cells}  "
          f"dofs {ndof}  setup {time.perf_counter() - t0:.1f}s")
    return solver


def main():
    args = make_parser().parse_args()
    solver = build(args)
    asm = solver.asm

    # fused driver: one device call per step, true-residual IR restarts
    res = solver.solve_fused(rtol=args.rtol, verbose=True, max_steps=20,
                             rtol_lin=max(args.rtol * 1e-2, 1e-8),
                             split_programs=(args.level >= 3))
    print(f"converged: {res.converged}  iters/step: {res.linear_iters}")
    ndof_s = 3 * asm.n2_real + asm.n1_real
    per_step = res.wall_time / max(len(res.linear_iters), 1)
    print(f"wall: {res.wall_time:.2f} s  ({per_step:.2f} s/step, "
          f"{ndof_s / per_step / 1e6:.2f} Mdof/s nonlinear-step throughput)")


if __name__ == "__main__":
    main()
