"""Kovasznay flow: exact steady Navier-Stokes solution (no body force).

Kovasznay (1948): with nu = 1/Re and lam = Re/2 - sqrt(Re^2/4 + 4 pi^2),

    u = 1 - exp(lam x) cos(2 pi y)
    v = (lam / 2 pi) exp(lam x) sin(2 pi y)
    p = (1 - exp(2 lam x)) / 2 + const

solves the incompressible NS equations exactly on any domain — the classic
wake-behind-a-grid benchmark every NS code validates against.  Unlike the
MMS tests (tests/test_mms.py) no manufactured body force enters: this
checks the assembled convection, diffusion, AND pressure coupling against
real physics.  All-Dirichlet velocity BCs => the enclosed/nullspace PCD
path (pressure defined up to a constant).
"""
import numpy as np
import jax.numpy as jnp

from fenapack_tpu.fem import mesh as meshmod
from fenapack_tpu.fem.assemble import NSAssembler
from fenapack_tpu.fem.dofmap import DirichletBC
from fenapack_tpu.solvers.config import SolverConfig, overrides
from fenapack_tpu.solvers.nonlinear import NonlinearSolver

RE = 40.0
LAM = RE / 2 - np.sqrt(RE ** 2 / 4 + 4 * np.pi ** 2)


def exact_u(x):
    v = np.zeros((x.shape[0], 2))
    v[:, 0] = 1 - np.exp(LAM * x[:, 0]) * np.cos(2 * np.pi * x[:, 1])
    v[:, 1] = (LAM / (2 * np.pi)) * np.exp(LAM * x[:, 0]) \
        * np.sin(2 * np.pi * x[:, 1])
    return v


def exact_p(x):
    return 0.5 * (1 - np.exp(2 * LAM * x[:, 0]))


def solve_level(level):
    n = 8 * 2 ** level
    mesh = meshmod.rectangle_mesh(-0.5, -0.5, 1.0, 1.5, int(1.5 * n),
                                  2 * n)
    mesh.mark_boundary({
        meshmod.WALL: lambda x: np.ones(x.shape[0], dtype=bool)})
    asm = NSAssembler(mesh, 1.0 / RE)
    bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL], exact_u)]
    cfg = overrides(SolverConfig(), {"pcd.variant": "BRM2",
                                     "krylov.maxiter": 200})
    nl = NonlinearSolver(asm, bcs, cfg, linearization="newton",
                         enclosed=True)
    res = nl.solve(rtol=1e-9, max_steps=20)
    assert res.converged, res.nonlinear_res
    w = np.asarray(res.w)
    n2, n2r, n1r = asm.n2, asm.n2_real, asm.n1_real
    uex = exact_u(asm.W.V.dof_coords()[:n2r])
    eu = np.stack([w[:n2][:n2r] - uex[:, 0],
                   w[n2:2 * n2][:n2r] - uex[:, 1]])
    pex = exact_p(asm.W.Q.dof_coords()[:n1r])
    p = w[2 * n2:][:n1r]
    ep = (p - p.mean()) - (pex - pex.mean())
    h = 1.0 / n
    # rms errors (discrete L2 surrogates)
    return (np.sqrt((eu ** 2).mean()), np.sqrt((ep ** 2).mean()), h,
            res)


def test_kovasznay_spatial_convergence():
    """P2/P1 rates on the real (unforced) equations: velocity ~h^3,
    pressure ~h^2 — and the enclosed-path PCD solves stay cheap."""
    eu0, ep0, h0, r0 = solve_level(0)
    eu1, ep1, h1, r1 = solve_level(1)
    rate_u = np.log(eu0 / eu1) / np.log(h0 / h1)
    rate_p = np.log(ep0 / ep1) / np.log(h0 / h1)
    assert rate_u > 2.5, (eu0, eu1, rate_u)
    assert rate_p > 1.5, (ep0, ep1, rate_p)
    # Newton contraction: superlinear tail on the real equations
    tail = np.array(r1.nonlinear_res[-3:])
    assert tail[-1] < 1e-3 * tail[0], r1.nonlinear_res
    assert max(r1.linear_iters) < 200, r1.linear_iters
