#!/usr/bin/env python
"""Multi-chip (SPMD) Oseen solve demo — both parallel paths.

Runs the same PCD-preconditioned Oseen solve two ways over an n-device
``jax.sharding.Mesh`` (virtual CPU devices by default, real chips on a pod):

  * GSPMD (`parallel/sharding.py`): annotate shardings, XLA places the
    collectives — the default production path;
  * explicit shard_map (`parallel/spmd_pcd.py`): ring-halo operators +
    psum'd SPMD FGMRES + sharded pressure GMG — the hand-scheduled path
    (PETSc MPIAIJ/VecScatter analogue).

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
        python demos/demo_spmd.py -l 1 -n 8
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-l", "--level", type=int, default=1)
    ap.add_argument("-n", "--devices", type=int, default=8)
    ap.add_argument("--nu", type=float, default=0.02)
    ap.add_argument("--path", choices=["gspmd", "ring", "both"],
                    default="both")
    ap.add_argument("--supg", action="store_true",
                    help="SUPG-stabilized system + GMG subsolves (BASELINE "
                         "config 5: use with --nu 1e-3 for Re=2000)")
    ap.add_argument("--nls", choices=["picard", "newton"], default="picard",
                    help="linearization for the ring-path nonlinear solve")
    ap.add_argument("--fused", action="store_true",
                    help="ring path: ONE device program per nonlinear step "
                         "(device-side operand re-binding, incl. the "
                         "velocity-GMG levels)")
    args = ap.parse_args()
    if args.supg and args.nls == "newton":
        ap.error("--supg stabilizes with the LAGGED (Picard) operator; the "
                 "Newton reaction is not the Jacobian of the stabilized "
                 "residual, so Newton loses superlinearity — use "
                 "--nls picard for high-Re runs (as the reference does)")

    if "xla_force_host_platform_device_count" not in os.environ.get(
            "XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   f" --xla_force_host_platform_device_count="
                                   f"{args.devices}")
        os.environ.setdefault("FENAPACK_PLATFORM", "cpu")

    import jax
    from fenapack_tpu.jax_setup import setup as jax_setup
    jax_setup(x64=True)
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from fenapack_tpu.fem import mesh as meshmod
    from fenapack_tpu.fem.assemble import NSAssembler
    from fenapack_tpu.fem.dofmap import DirichletBC
    from fenapack_tpu.solvers.config import SolverConfig, overrides
    from fenapack_tpu.solvers.nonlinear import NonlinearSolver
    from fenapack_tpu.solvers import gmg

    n_dev = args.devices
    dtype = "float64" if jax.default_backend() == "cpu" else "float32"

    def inflow(x):
        v = np.zeros((x.shape[0], 2))
        v[:, 0] = 4 * x[:, 1] * (1 - x[:, 1])
        return v

    if args.path in ("gspmd", "both"):
        from fenapack_tpu.parallel.sharding import ShardedOseen, \
            make_device_mesh
        jdt = jnp.float64 if dtype == "float64" else jnp.float32
        over = {"pcd.variant": "BRM2", "dtype": dtype,
                "krylov.rtol": 1e-6, "krylov.maxiter": 80}
        ap_h = v_h = None
        if args.supg:
            # BASELINE config 5: SUPG-stabilized high-Re system, GMG
            # subsolves, mesh-sharded solve
            hier = gmg.build_hierarchy(meshmod.backward_step_mesh(0),
                                       args.level)
            mesh = hier.fine
            over.update({"system_supg": True, "krylov.maxiter": 400,
                         "velocity.method": "gmg",
                         "velocity.smooth_iters": 3, "velocity.cycles": 2,
                         "pcd.ap.method": "gmg"})
        else:
            mesh = meshmod.backward_step_mesh(args.level)
        asm = NSAssembler(mesh, args.nu, row_align=n_dev, dtype=jdt)
        bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL],
                                    lambda x: np.zeros((x.shape[0], 2))),
               DirichletBC.velocity(asm.W, [meshmod.INFLOW], inflow)]
        if args.supg:
            ap_h = gmg.PressureHierarchy(hier, jdt,
                                         pcd_markers=[meshmod.OUTFLOW])
            v_h = gmg.VelocityHierarchy(hier, args.nu, jdt,
                                        bc_markers=[meshmod.WALL,
                                                    meshmod.INFLOW],
                                        fine_asm=asm)
        cfg = overrides(SolverConfig(), over)
        nl = NonlinearSolver(asm, bcs, cfg, ap_hierarchy=ap_h,
                             velocity_hierarchy=v_h)
        sh = ShardedOseen(nl, make_device_mesh(n_dev))
        t0 = time.perf_counter()
        w1, iters, rn = sh.step(nl.initial_state())
        print(f"[gspmd] {n_dev} devices: one sharded nonlinear step, "
              f"{int(iters)} FGMRES iters, "
              f"{time.perf_counter() - t0:.1f} s (incl. compile)")

    if args.path in ("ring", "both"):
        from fenapack_tpu.parallel.spmd_gmg import SPMDPressureGMG, \
            SPMDVelocityGMG
        from fenapack_tpu.parallel.spmd_pcd import SPMDNonlinearSolver
        hier = gmg.build_hierarchy(meshmod.backward_step_mesh(0), args.level)
        asm = NSAssembler(hier.fine, args.nu, dtype=jnp.float64,
                          reorder=True)
        bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL],
                                    lambda x: np.zeros((x.shape[0], 2))),
               DirichletBC.velocity(asm.W, [meshmod.INFLOW], inflow)]
        maxiter = 400 if args.supg else 120
        cfg = overrides(SolverConfig(), {
            "pcd.variant": "BRM2", "dtype": "float64",
            "krylov.rtol": 1e-6, "krylov.maxiter": maxiter,
            "system_supg": args.supg})
        nl = NonlinearSolver(asm, bcs, cfg, linearization=args.nls)
        dmesh = Mesh(np.array(jax.devices()[:n_dev]), ("dd",))
        ph = gmg.PressureHierarchy(hier, jnp.float64,
                                   pcd_markers=[meshmod.OUTFLOW])
        ap_gmg = SPMDPressureGMG(ph, dmesh, dtype=jnp.float64,
                                 smooth_iters=2, cycles=2)
        vgmg = None
        if args.supg:
            vh_n = gmg.VelocityHierarchy(
                hier, args.nu, jnp.float64,
                bc_markers=[meshmod.WALL, meshmod.INFLOW])
            vgmg = SPMDVelocityGMG(vh_n, dmesh, dtype=jnp.float64,
                                   smooth_iters=4, cycles=2, supg=True)
        snl = SPMDNonlinearSolver(nl, dmesh, ap_gmg=ap_gmg,
                                  velocity_gmg=vgmg,
                                  cheb_velocity_iters=12,
                                  maxiter=maxiter, rtol_lin=1e-6)
        t0 = time.perf_counter()
        w0 = None
        if args.nls == "newton":
            # Picard warm start into Newton's quadratic basin (minres
            # velocity subsolve: the Newton-level vgmg belongs to snl)
            nl_pic = NonlinearSolver(asm, bcs, cfg)
            pic = SPMDNonlinearSolver(nl_pic, dmesh, ap_gmg=ap_gmg,
                                      cheb_velocity_iters=12,
                                      maxiter=maxiter, rtol_lin=1e-6)
            w0 = pic.solve(max_steps=2, rtol=0.0).w
        if args.fused:
            out = snl.solve_fused(w0=w0, rtol=1e-5, max_steps=15,
                                  damping=0.7 if args.supg else 1.0)
        else:
            out = snl.solve(w0=w0, rtol=1e-5, max_steps=15,
                            damping=0.7 if args.supg else 1.0)
        sp = snl.sp
        print(f"[ring]  {n_dev} devices: full {args.nls} solve over the "
              f"ring-halo SPMD path: converged={out.converged} in "
              f"{len(out.linear_iters)} steps, FGMRES iters/step "
              f"{out.linear_iters}, |F| {out.nonlinear_res[-1]:.2e}, "
              f"{time.perf_counter() - t0:.1f} s (incl. compile); "
              f"halos: a1={sp._rings['a1'].ring.halo} "
              f"kp={sp._rings['kp'].ring.halo}")


if __name__ == "__main__":
    main()
