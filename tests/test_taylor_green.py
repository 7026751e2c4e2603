"""Taylor-Green vortex: exact UNSTEADY Navier-Stokes validation.

The decaying vortex

    u = ( sin(pi x) cos(pi y),  -cos(pi x) sin(pi y) ) e^{-2 pi^2 nu t}
    p = (1/4) (cos(2 pi x) + cos(2 pi y)) e^{-4 pi^2 nu t}

solves the unforced incompressible Navier-Stokes equations exactly (the
convection term is a pure gradient, balanced by p).  On [0,1]^2 the normal
velocity vanishes on the whole boundary, but the tangential trace is nonzero
and DECAYS IN TIME — so this exercises the time-dependent Dirichlet path
(``UnsteadySolver(bc_fn=...)``), the analogue of the reference's DOLFIN
Expressions with a ``t`` attribute re-interpolated each step
(fenapack demos update BC/coefficient time parameters between steps).

Complements test_kovasznay.py (exact STEADY solution) and test_mms.py
(manufactured forcing): here both the time discretization error and the
moving-boundary Dirichlet lift are validated against truth.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fenapack_tpu.fem import mesh as meshmod
from fenapack_tpu.fem.assemble import NSAssembler
from fenapack_tpu.fem.dofmap import DirichletBC
from fenapack_tpu.solvers.config import SolverConfig, overrides
from fenapack_tpu.solvers.unsteady import UnsteadySolver

NU = 0.05
LAM = 2 * np.pi ** 2 * NU


def u_exact(x, t):
    v = np.empty((x.shape[0], 2))
    v[:, 0] = np.sin(np.pi * x[:, 0]) * np.cos(np.pi * x[:, 1])
    v[:, 1] = -np.cos(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1])
    return v * np.exp(-LAM * t)


def tg_mesh(n=16):
    mesh = meshmod.rectangle_mesh(0.0, 0.0, 1.0, 1.0, n, n)
    mesh.mark_boundary({
        meshmod.WALL: lambda x: np.ones(x.shape[0], dtype=bool)})
    return mesh


def build(dt, scheme="theta", n=16):
    asm = NSAssembler(tg_mesh(n), NU)
    W = asm.W

    def bc_fn(t):
        return [DirichletBC.velocity(W, [meshmod.WALL],
                                     lambda x: u_exact(x, t))]

    cfg = overrides(SolverConfig(), {"pcd.variant": "BRM2",
                                     "krylov.rtol": 1e-9})
    solver = UnsteadySolver(asm, bc_fn(0.0), cfg, dt=dt, scheme=scheme,
                            enclosed=True, bc_fn=bc_fn)
    return solver


def run(dt, t_end=0.4, scheme="theta", n=16, exact_history=False):
    solver = build(dt, scheme=scheme, n=n)
    asm = solver.asm
    coords = asm.W.V.dof_coords()
    w0 = np.zeros(solver.n)
    ue0 = u_exact(coords, 0.0)
    for a in range(2):
        w0[a * asm.n2: a * asm.n2 + asm.n2_real] = ue0[:asm.n2_real, a]
    u_prev0 = None
    if exact_history:                       # BDF2: exact velocity at t=-dt
        uem = u_exact(coords, -dt)
        u_prev0 = np.zeros(solver.n_u)
        for a in range(2):
            u_prev0[a * asm.n2: a * asm.n2 + asm.n2_real] = \
                uem[:asm.n2_real, a]
    res = solver.solve(t_end, w0=jnp.asarray(w0), picard_iters=3,
                       u_prev0=u_prev0)
    w = np.asarray(res.w)
    ue = u_exact(coords, t_end)[:asm.n2_real]
    err = np.concatenate([
        w[a * asm.n2: a * asm.n2 + asm.n2_real] - ue[:, a]
        for a in range(2)])
    rel = np.linalg.norm(err) / np.linalg.norm(ue)
    return rel, res


def test_taylor_green_accuracy_and_dt_order():
    """Implicit Euler tracks the exact decaying vortex; halving dt roughly
    halves the error (first-order in time, spatial floor far below)."""
    e1, res1 = run(dt=0.1)
    e2, _ = run(dt=0.05)
    # ~2.4% amplitude error predicted at dt=0.1 (0.5*lam^2*dt*t_end)
    assert e1 < 0.06, e1
    assert e2 < 0.6 * e1, (e1, e2)
    ratio = e1 / e2
    assert 1.6 < ratio < 2.6, (e1, e2, ratio)
    # the per-step PCD solves stay cheap on the enclosed domain
    assert max(res1.linear_iters) < 70, res1.linear_iters


def test_taylor_green_bdf2_beats_euler():
    """BDF2 (warm-started with exact t=-dt history via ``u_prev0``) lands
    far closer to the exact solution than implicit Euler at the same dt.
    Without the history the implicit-Euler STARTUP step (effective step
    2dt/3) alone costs ~lam*dt/3 ~ 3% — worse than Euler's full-trajectory
    error, which is why ``u_prev0`` exists."""
    e_euler, _ = run(dt=0.1)
    e_bdf2, _ = run(dt=0.1, scheme="bdf2", exact_history=True)
    assert e_bdf2 < 0.2 * e_euler, (e_euler, e_bdf2)


def test_fused_paths_refuse_bc_fn():
    solver = build(dt=0.1)
    with pytest.raises(ValueError, match="bc_fn"):
        solver.solve_fused(0.2)
    with pytest.raises(ValueError, match="bc_fn"):
        solver.solve_scan(0.2)
