"""End-to-end test of the user-supplied-form path (solvers.custom):

the fenapack demo problem written as custom forms (the way a reference user
writes UFL) must converge with iteration counts matching the scipy-LU golden
oracle — proving the PCDAssembler-equivalent API reaches full solver parity,
not just operator parity.
"""
import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from fenapack_tpu.fem import mesh as meshmod
from fenapack_tpu.fem.dofmap import DirichletBC, TaylorHood
from fenapack_tpu.fem import forms as F
from fenapack_tpu.solvers.config import SolverConfig, overrides
from fenapack_tpu.solvers.custom import (PCDAssembler, PCDKrylovSolver,
                                         PCDNewtonSolver)

NU = 0.02


def build_problem(variant="BRM2", use_fp=False, gp_scale=None):
    mesh = meshmod.backward_step_mesh(0)
    W = TaylorHood(mesh)
    (u, p) = F.TrialFunctions(W)
    (v, q) = F.TestFunctions(W)
    w = F.Coefficient(W, "w")
    u_, p_ = F.split(w)
    n = F.FacetNormal(mesh)

    # Picard (Oseen) Jacobian and steady NS residual, as in the demo
    J = (NU * F.inner(F.grad(u), F.grad(v)) * F.dx
         + F.inner(F.dot(F.grad(u), u_), v) * F.dx
         - p * F.div(v) * F.dx
         - q * F.div(u) * F.dx)
    L = (NU * F.inner(F.grad(u_), F.grad(v)) * F.dx
         + F.inner(F.dot(F.grad(u_), u_), v) * F.dx
         - p_ * F.div(v) * F.dx
         - q * F.div(u_) * F.dx)

    mp = (1.0 / NU) * p * q * F.dx
    ap = F.inner(F.grad(p), F.grad(q)) * F.dx
    kp = (1.0 / NU) * F.dot(F.grad(p), u_) * q * F.dx
    fp = None
    if variant == "BRM2":
        kp = kp - (1.0 / NU) * F.dot(u_, n) * p * q * F.ds(meshmod.INFLOW)
    if use_fp:
        # full pressure convection-diffusion form (1/nu-scaled so that
        # Fp = Ap + kp-scaling matches the factored I + Kp Ap^{-1} apply)
        fp = ap + kp
        kp = None

    def inflow(x):
        val = np.zeros((x.shape[0], 2))
        val[:, 0] = 4 * x[:, 1] * (1 - x[:, 1])
        return val

    bcs = [DirichletBC.velocity(W, [meshmod.WALL],
                                lambda x: np.zeros((x.shape[0], 2))),
           DirichletBC.velocity(W, [meshmod.INFLOW], inflow)]
    marker = meshmod.INFLOW if variant == "BRM1" else meshmod.OUTFLOW
    bcs_pcd = [DirichletBC.pressure(W, [marker])]

    gp = None
    if gp_scale is not None:
        # B^T-from-form: the pressure-gradient form matching J's up-block
        # (scale 1.0 must reproduce the submatrix path exactly)
        gp = gp_scale * (-1.0) * p * F.div(v) * F.dx
    asm = PCDAssembler(J, L, bcs, mp=mp, ap=ap, kp=kp, fp=fp, gp=gp,
                       bcs_pcd=bcs_pcd, w=w)
    cfg = overrides(SolverConfig(), {"pcd.variant": variant,
                                     "krylov.rtol": 1e-8})
    return PCDKrylovSolver(asm, cfg)


@pytest.fixture(scope="module")
def golden():
    path = os.path.join(os.path.dirname(__file__), "golden_counts.json")
    with open(path) as f:
        return json.load(f)


@pytest.mark.parametrize("variant", ["BRM1", "BRM2"])
def test_custom_forms_match_golden_counts(variant, golden):
    solver = build_problem(variant)
    newton = PCDNewtonSolver(solver)
    x, res, iters, converged = newton.solve(rtol=1e-5, max_steps=15)
    assert converged
    key = f"step2d/l0/{variant}/picard"
    ref = golden[key]
    # same nonlinear trajectory, iteration totals within the 10% band
    assert len(iters) == ref["nonlinear_steps"] - 1 or \
        len(iters) == ref["nonlinear_steps"]
    assert sum(iters) <= 1.1 * ref["total"]


def test_gp_form_is_wired(golden):
    """gp (B^T-from-form): supplying the exact pressure-gradient form must
    reproduce the submatrix path's golden counts, and a wrong-scale gp must
    visibly change the preconditioner — proving gp actually feeds the
    fieldsplit rather than being dead API (reference
    fenapack/assembling.py gp semantics)."""
    ref = golden["step2d/l0/BRM2/picard"]

    solver = build_problem("BRM2", gp_scale=1.0)
    assert solver._gp_op is not None
    newton = PCDNewtonSolver(solver)
    _, _, iters, converged = newton.solve(rtol=1e-5, max_steps=15)
    assert converged
    assert sum(iters) <= 1.1 * ref["total"]

    # a deliberately wrong B^T (sign-flipped) must degrade the PC: if these
    # counts matched, gp would not actually be in the apply path
    bad = build_problem("BRM2", gp_scale=-1.0)
    newton_bad = PCDNewtonSolver(bad)
    _, _, iters_bad, _ = newton_bad.solve(rtol=1e-5, max_steps=4)
    assert sum(iters_bad[:3]) > 1.3 * sum(iters[:3])


def test_custom_fp_form_converges(golden):
    """The non-factored Fp path (-Mp^{-1} Fp Ap^{-1}, BRM1/KLW order)
    converges with near-reference iteration counts."""
    solver = build_problem("BRM1", use_fp=True)
    newton = PCDNewtonSolver(solver)
    x, res, iters, converged = newton.solve(rtol=1e-5, max_steps=15)
    assert converged
    ref = golden["step2d/l0/BRM1/picard"]
    # Fp applies differ from the factored identity-folded form only at pcd
    # BC rows (Ap^{-1}Ap != I there); allow a wider band than 10%
    assert sum(iters) <= 1.5 * ref["total"]
