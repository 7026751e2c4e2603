#!/usr/bin/env python
"""Bisect the cylinder-at-82k TPU worker crash (VERDICT round-2 item 3).

The steady DFG 2D-1 solve at level 1 (82,606 dofs) crashes the TPU worker
("UNAVAILABLE: worker process crashed") while the 9x larger 761k-dof 3D
step solve completes — so something about THIS program kills the worker.
Run one stage per process (a crash takes the worker down; stages must be
independently retryable):

    python scripts/bisect_cylinder.py residual     # hi-precision residual only
    python scripts/bisect_cylinder.py matvec       # df32 system matvec
    python scripts/bisect_cylinder.py cheb         # solve, chebyshev velocity
    python scripts/bisect_cylinder.py minres       # solve, minres velocity
    python scripts/bisect_cylinder.py gmg          # solve, velocity GMG (demo config)
    python scripts/bisect_cylinder.py gmg-dense    # ... with dense coarse (cap raised)
    python scripts/bisect_cylinder.py step         # gmg stage on step2d mesh at ~equal dofs

Each stage prints `STAGE <name> OK ...` on success; a worker crash
surfaces as the UNAVAILABLE JaxRuntimeError.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(args, problem="cylinder", velocity="gmg"):
    import jax.numpy as jnp
    from fenapack_tpu.fem import mesh as meshmod
    from fenapack_tpu.fem.assemble import NSAssembler
    from fenapack_tpu.fem.dofmap import DirichletBC
    from fenapack_tpu.solvers.config import SolverConfig, overrides
    from fenapack_tpu.solvers.nonlinear import NonlinearSolver
    from fenapack_tpu.solvers import gmg

    if problem == "cylinder":
        nu = 0.001
        hier = gmg.build_hierarchy(meshmod.cylinder_channel_mesh(0),
                                   args.level, snap=meshmod.snap_to_circle)
        noslip = [meshmod.WALL, meshmod.CYLINDER]

        def inflow(x):
            v = np.zeros((x.shape[0], 2))
            v[:, 0] = 4.0 * 0.3 * x[:, 1] * (0.41 - x[:, 1]) / 0.41 ** 2
            return v
    else:                                   # backward step at ~equal dofs
        nu = 0.02
        hier = gmg.build_hierarchy(meshmod.backward_step_mesh(0),
                                   args.level + 2)
        noslip = [meshmod.WALL]

        def inflow(x):
            v = np.zeros((x.shape[0], 2))
            v[:, 0] = 4 * x[:, 1] * (1 - x[:, 1])
            return v

    asm = NSAssembler(hier.fine, nu, dtype=jnp.float64,
                      block_dtype=jnp.float32)
    bcs = [DirichletBC.velocity(asm.W, noslip,
                                lambda x: np.zeros((x.shape[0], 2))),
           DirichletBC.velocity(asm.W, [meshmod.INFLOW], inflow)]
    over = {"pcd.variant": "BRM2", "dtype": "float32",
            "krylov.rtol": 2e-6, "krylov.maxiter": args.maxiter}
    ap_h = v_h = None
    if velocity == "gmg":
        over.update({"velocity.method": "gmg", "velocity.smooth_iters": 3,
                     "velocity.cycles": 2, "pcd.ap.method": "gmg",
                     "velocity.smoother": "minres"})
        ap_h = gmg.PressureHierarchy(hier, jnp.float32,
                                     pcd_markers=[meshmod.OUTFLOW],
                                     fine_asm=asm)
        v_h = gmg.VelocityHierarchy(hier, nu, jnp.float32,
                                    bc_markers=noslip + [meshmod.INFLOW],
                                    fine_asm=asm)
    else:
        over.update({"velocity.method": velocity,
                     "velocity.iters": 30,
                     "pcd.ap.method": "chebyshev", "pcd.ap.iters": 25,
                     "pcd.ap.bounds": None,
                     "pcd.mp.method": "chebyshev"})
    cfg = overrides(SolverConfig(), over)
    nl = NonlinearSolver(asm, bcs, cfg, linearization="newton",
                         ap_hierarchy=ap_h, velocity_hierarchy=v_h)
    ndof = 2 * asm.n2_real + asm.n1_real
    print(f"built {problem} l={args.level} velocity={velocity} "
          f"dofs={ndof}", flush=True)
    return nl


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", choices=["residual", "matvec", "matvec-hi",
                                      "fgmres", "ir", "ir1", "cheb",
                                      "minres", "gmg", "gmg-dense", "step"])
    ap.add_argument("-l", "--level", type=int, default=1)
    ap.add_argument("--maxiter", type=int, default=100)
    args = ap.parse_args()

    if args.stage == "gmg-dense":
        os.environ["FENAPACK_GMG_DENSE_MAX"] = "32768"

    from fenapack_tpu.jax_setup import setup as jax_setup
    jax_setup(x64=True)
    import jax
    import jax.numpy as jnp
    print("backend:", jax.default_backend(), flush=True)

    velocity = {"residual": "chebyshev", "matvec": "chebyshev",
                "matvec-hi": "chebyshev", "fgmres": "chebyshev",
                "ir": "chebyshev", "ir1": "chebyshev",
                "cheb": "chebyshev", "minres": "minres",
                "gmg": "gmg", "gmg-dense": "gmg", "step": "gmg"}[args.stage]
    problem = "step" if args.stage == "step" else "cylinder"
    nl = build(args, problem=problem, velocity=velocity)
    w = nl.initial_state()
    t0 = time.time()

    if args.stage == "residual":
        res_fn = nl.make_residual_hi()
        F, rn = res_fn(w)
        rn = float(rn)
        print(f"STAGE residual OK |F|={rn:.3e} {time.time()-t0:.1f}s",
              flush=True)
        return
    if args.stage == "matvec":
        F = np.asarray(nl._residual(w))
        mv = nl.oseen._matvec_factory(
            *nl.oseen._operator_values(w[:nl.n_u]))
        y = mv(jnp.asarray(-F, dtype=nl.oseen.dtype))
        yn = float(jnp.linalg.norm(y))
        print(f"STAGE matvec OK |Ax|={yn:.3e} {time.time()-t0:.1f}s",
              flush=True)
        return
    if args.stage == "matvec-hi":
        # the emulated-f64 system matvec the IR true-residual update uses
        F = np.asarray(nl._residual(w))
        wind_hi = w[:nl.n_u].astype(jnp.float64)
        A1h, Rh = nl.oseen._operator_values_raw(wind_hi, hi=True)
        mv_hi = nl.oseen._matvec_factory(A1h, Rh, hi=True)
        y = mv_hi(jnp.asarray(-F, dtype=jnp.float64))
        yn = float(jnp.linalg.norm(y))
        print(f"STAGE matvec-hi OK |Ax|={yn:.3e} {time.time()-t0:.1f}s",
              flush=True)
        return
    if args.stage == "fgmres":
        # ONE plain f32 FGMRES (no IR wrapper, no hi ops in the program)
        F = np.asarray(nl._residual(w))
        b32 = jnp.asarray(-F, dtype=nl.oseen.dtype)
        res = nl.oseen.solve(w[:nl.n_u], b32)
        print(f"STAGE fgmres OK iters={int(res.iters)} "
              f"relres={float(res.resnorms[-1]/res.bnorm):.2e} "
              f"{time.time()-t0:.1f}s", flush=True)
        return

    if args.stage in ("ir", "ir1"):
        # the IR while_loop program WITHOUT the fused residual (host b)
        F = np.asarray(nl._residual(w))
        rounds = 1 if args.stage == "ir1" else 8
        ir = nl.oseen.make_ir_solve(2e-6, max_rounds=rounds)
        out = ir(w[:nl.n_u], jnp.asarray(-F, dtype=jnp.float64))
        rn = float(out[2])
        print(f"STAGE {args.stage} OK rn={rn:.3e} iters={int(out[1])} "
              f"{time.time()-t0:.1f}s", flush=True)
        return

    # full fused IR step (the program the demo crashes in)
    step = nl.make_step_ir(rtol_lin=2e-6)
    kr = nl.oseen.config.krylov.recycle
    out = step(w, nl.initial_recycle()) if kr else step(w)
    rn = float(out[1])
    iters = int(out[2])
    print(f"STAGE {args.stage} OK |F|={rn:.3e} iters={iters} "
          f"{time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
