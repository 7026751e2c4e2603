#!/usr/bin/env python
"""Unsteady channel flow: theta-scheme with per-step PCD Oseen solves.

BASELINE.json config 3 / SURVEY.md section 3.5: implicit Euler (or
Crank-Nicolson) with the Mp/dt term folded into Fp; constant operators are
assembled once and the compiled step is re-executed every dt.  Supports
checkpoint/resume (fenapack_tpu.utils.io).

    python demos/demo_unsteady_channel.py --dt 0.1 --t-end 2.0 --theta 1.0
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-l", "--level", type=int, default=1)
    ap.add_argument("--nu", type=float, default=0.02)
    ap.add_argument("--dt", type=float, default=0.1)
    ap.add_argument("--t-end", type=float, default=2.0)
    ap.add_argument("--theta", type=float, default=1.0,
                    help="1 = implicit Euler, 0.5 = Crank-Nicolson")
    ap.add_argument("--scheme", choices=["theta", "bdf2"], default="theta",
                    help="bdf2 = A-stable 2nd-order BDF (implicit-Euler "
                         "startup step)")
    ap.add_argument("--pcd", choices=["BRM1", "BRM2"], default="BRM2")
    ap.add_argument("--picard-iters", type=int, default=2)
    ap.add_argument("--fused", action="store_true",
                    help="one-device-call-per-step path (semi-implicit; "
                         "ignores --picard-iters)")
    ap.add_argument("--scan", action="store_true",
                    help="whole-horizon lax.scan path: ONE device call for "
                         "the full time loop (semi-implicit; no per-step "
                         "callbacks — a single final-state VTK/checkpoint "
                         "is written at the end)")
    ap.add_argument("--dtype", default=None)
    ap.add_argument("--checkpoint", default=None,
                    help="npz path: resume if it exists, save at end")
    ap.add_argument("--vtk-every", type=int, default=0,
                    help="write solution VTK every N steps")
    args = ap.parse_args()

    import jax
    from fenapack_tpu.jax_setup import setup as jax_setup
    jax_setup(x64=args.dtype in (None, "float64", "mixed"))
    import jax.numpy as jnp

    from fenapack_tpu.fem import mesh as meshmod
    from fenapack_tpu.fem.assemble import NSAssembler
    from fenapack_tpu.fem.dofmap import DirichletBC
    from fenapack_tpu.solvers.config import SolverConfig, overrides
    from fenapack_tpu.solvers.unsteady import UnsteadySolver
    from fenapack_tpu.utils.io import (save_checkpoint, load_checkpoint,
                                       save_vtk)

    dtype = args.dtype or ("float64" if jax.default_backend() == "cpu"
                           else "float32")
    adtype = jnp.float64 if dtype == "float64" else jnp.float32
    mesh = meshmod.channel_mesh(args.level, length=4.0)
    asm = NSAssembler(mesh, args.nu, dtype=adtype)

    def inflow(x):
        v = np.zeros((x.shape[0], 2))
        v[:, 0] = 4 * x[:, 1] * (1 - x[:, 1])
        return v

    bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL],
                                lambda x: np.zeros((x.shape[0], 2))),
           DirichletBC.velocity(asm.W, [meshmod.INFLOW], inflow)]
    cfg = overrides(SolverConfig(), {"pcd.variant": args.pcd, "dtype": dtype})
    solver = UnsteadySolver(asm, bcs, cfg, dt=args.dt,
                            theta=args.theta, scheme=args.scheme)

    w0, t0 = None, 0.0
    if args.checkpoint and os.path.exists(args.checkpoint):
        wnp, t0, _ = load_checkpoint(args.checkpoint)
        w0 = jnp.asarray(wnp)
        print(f"resumed from {args.checkpoint} at t={t0}")

    print(f"unsteady channel l={args.level} nu={args.nu} dt={args.dt} "
          f"scheme={args.scheme} theta={args.theta}  dofs {2 * asm.n2_real + asm.n1_real}")

    def cb(k, t, w):
        if args.vtk_every and (k + 1) % args.vtk_every == 0:
            save_vtk(f"channel_{k + 1:04d}.vtk", asm, w)

    if int(round((args.t_end - t0) / args.dt)) <= 0:
        print(f"nothing to do: checkpoint already at t={t0} >= "
              f"t_end={args.t_end}")
        return

    if args.scan:
        res = solver.solve_scan(args.t_end - t0, w0=w0)
    elif args.fused:
        res = solver.solve_fused(args.t_end - t0, w0=w0, callback=cb)
    else:
        res = solver.solve(args.t_end - t0, w0=w0,
                           picard_iters=args.picard_iters, callback=cb)
    for t, it, rn in zip(res.times, res.linear_iters, res.step_res):
        print(f"  t={t0 + t:6.3f}  fgmres iters {it:3d}  |F| {rn:.3e}")
    print(f"wall: {res.wall_time:.2f} s  "
          f"({res.wall_time / max(len(res.times), 1):.3f} s/step)")

    if args.scan and args.vtk_every:
        save_vtk(f"channel_{len(res.times):04d}.vtk", asm, res.w)

    if args.checkpoint:
        save_checkpoint(args.checkpoint, res.w, t0 + res.times[-1],
                        {"nu": args.nu, "dt": args.dt})
        print(f"checkpointed to {args.checkpoint}")


if __name__ == "__main__":
    main()
