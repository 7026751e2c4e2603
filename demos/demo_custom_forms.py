#!/usr/bin/env python
"""Backward-facing step written the way a FENaPack user writes it.

This demo reproduces the code shape of the reference's
``demo/navier-stokes-pcd/demo_navier-stokes-pcd.py`` using the
user-supplied-forms API (``fem.forms`` mini-UFL + ``solvers.custom``):
variational forms for J/F and the PCD operators mp/ap/kp are written
explicitly, handed to ``PCDAssembler(J, F, bcs, mp=..., ap=..., kp=...,
bcs_pcd=...)``, and solved with ``PCDKrylovSolver`` + ``PCDNewtonSolver`` —
the same three-object workflow as upstream fenapack.

The factored demos (demo_navier_stokes_pcd.py etc.) use the built-in
NSAssembler fast path instead; both reach identical operators
(tests/test_forms.py golden-checks them entrywise).

    FENAPACK_PLATFORM=cpu python demos/demo_custom_forms.py -l 1 --pcd BRM2
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap_ = argparse.ArgumentParser(description=__doc__)
    ap_.add_argument("-l", "--level", type=int, default=1)
    ap_.add_argument("--nu", type=float, default=0.02)
    ap_.add_argument("--pcd", choices=["BRM1", "BRM2"], default="BRM2")
    ap_.add_argument("--rtol", type=float, default=1e-5)
    args = ap_.parse_args()

    from fenapack_tpu.jax_setup import setup as jax_setup
    jax_setup(x64=True)

    from fenapack_tpu.fem import mesh as meshmod
    from fenapack_tpu.fem.dofmap import DirichletBC, TaylorHood
    from fenapack_tpu.fem import forms as F
    from fenapack_tpu.solvers.config import SolverConfig, overrides
    from fenapack_tpu.solvers.custom import (PCDAssembler, PCDKrylovSolver,
                                             PCDNewtonSolver)

    nu = args.nu
    mesh = meshmod.backward_step_mesh(args.level)
    W = TaylorHood(mesh)

    # ----- variational forms, written as in the reference demo ----- #
    (u, p) = F.TrialFunctions(W)
    (v, q) = F.TestFunctions(W)
    w = F.Coefficient(W, "w")          # current nonlinear iterate
    u_, p_ = F.split(w)
    n = F.FacetNormal(mesh)

    # nonlinear residual F(w) and Picard (Oseen) Jacobian J
    L = (nu * F.inner(F.grad(u_), F.grad(v)) * F.dx
         + F.inner(F.dot(F.grad(u_), u_), v) * F.dx
         - p_ * F.div(v) * F.dx
         - q * F.div(u_) * F.dx)
    J = (nu * F.inner(F.grad(u), F.grad(v)) * F.dx
         + F.inner(F.dot(F.grad(u), u_), v) * F.dx
         - p * F.div(v) * F.dx
         - q * F.div(u) * F.dx)

    # PCD operators (1/nu scaling folded into mp, kp as in the reference)
    mp = (1.0 / nu) * p * q * F.dx
    ap = F.inner(F.grad(p), F.grad(q)) * F.dx
    kp = (1.0 / nu) * F.dot(F.grad(p), u_) * q * F.dx
    if args.pcd == "BRM2":
        # BRM2 inflow surface correction (Olshanskii-Vassilevski)
        kp = kp - (1.0 / nu) * F.dot(u_, n) * p * q * F.ds(meshmod.INFLOW)

    def inflow(x):
        val = np.zeros((x.shape[0], 2))
        val[:, 0] = 4 * x[:, 1] * (1 - x[:, 1])
        return val

    bcs = [DirichletBC.velocity(W, [meshmod.WALL],
                                lambda x: np.zeros((x.shape[0], 2))),
           DirichletBC.velocity(W, [meshmod.INFLOW], inflow)]
    marker = meshmod.INFLOW if args.pcd == "BRM1" else meshmod.OUTFLOW
    bcs_pcd = [DirichletBC.pressure(W, [marker])]

    assembler = PCDAssembler(J, L, bcs, mp=mp, ap=ap, kp=kp,
                             bcs_pcd=bcs_pcd, w=w)
    cfg = overrides(SolverConfig(), {"pcd.variant": args.pcd,
                                     "krylov.rtol": 1e-8})
    linear_solver = PCDKrylovSolver(assembler, cfg)
    solver = PCDNewtonSolver(linear_solver)

    print(f"backward-facing step (custom forms)  l={args.level}  nu={nu}")
    print(f"dofs: velocity {2 * W.n2}, pressure {W.n1}, "
          f"total {2 * W.n2 + W.n1}")
    print(f"solver: Picard-linearized J + PCD-{args.pcd} FGMRES")

    t0 = time.time()
    x, res, iters, converged = solver.solve(rtol=args.rtol, max_steps=25,
                                            verbose=True)
    wall = time.time() - t0

    print(f"\nconverged: {converged}  nonlinear steps: {len(iters)}")
    print(f"FGMRES iters per step: {iters} (total {sum(iters)})")
    print(f"wall time: {wall:.2f} s")


if __name__ == "__main__":
    main()
