"""Solver parity tests: jit FGMRES + fieldsplit + PCD vs the scipy oracle.

SURVEY.md section 4 rebuild plan items 2-3: iteration counts within the 10%
band of BASELINE.json, plus the defining PCD mesh-independence property.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fenapack_tpu.fem import mesh as meshmod
from fenapack_tpu.fem.assemble import NSAssembler
from fenapack_tpu.fem.dofmap import DirichletBC
from fenapack_tpu.solvers.config import SolverConfig, overrides
from fenapack_tpu.solvers.nonlinear import NonlinearSolver
from fenapack_tpu.solvers.krylov import fgmres

from tests.reference_fem.driver import build_step_problem, solve_oracle


def step_inflow(x):
    v = np.zeros((x.shape[0], 2))
    v[:, 0] = 4 * x[:, 1] * (1 - x[:, 1])
    return v


def make_step_solver(level, variant, linearization="picard", **cfg_over):
    mesh = meshmod.backward_step_mesh(level)
    asm = NSAssembler(mesh, 0.02)
    bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL],
                                lambda x: np.zeros((x.shape[0], 2))),
           DirichletBC.velocity(asm.W, [meshmod.INFLOW], step_inflow)]
    cfg = overrides(SolverConfig(), {"pcd.variant": variant, **cfg_over})
    return NonlinearSolver(asm, bcs, cfg, linearization=linearization)


def test_fgmres_unit():
    """FGMRES solves a small nonsymmetric system to rtol with Jacobi PC."""
    rng = np.random.default_rng(3)
    n = 80
    A = np.eye(n) * 4 + 0.5 * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    Aj = jnp.asarray(A)
    dinv = jnp.asarray(1.0 / np.diag(A))
    res = fgmres(lambda x: Aj @ x, lambda r: dinv * r, jnp.asarray(b),
                 maxiter=n, rtol=1e-10)
    x = np.asarray(res.x)
    assert res.converged
    relres = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
    assert relres < 1e-9
    # residual history monotone within roundoff
    hist = np.asarray(res.resnorms)[:int(res.iters) + 1]
    assert hist[-1] <= 1e-10 * np.linalg.norm(b) * 1.01


def test_fgmres_selective_reorth():
    """Selective reorthogonalization (krylov reorth_eta > 0) reaches the
    same tolerance with the same-quality residual estimate as full CGS2 —
    on an ill-conditioned system where skipped second passes would show up
    as a dishonest estimate (true residual >> estimate)."""
    rng = np.random.default_rng(7)
    n = 120
    # conditioning ~1e6: selective reorth must still keep the basis honest
    U, _ = np.linalg.qr(rng.standard_normal((n, n)))
    V, _ = np.linalg.qr(rng.standard_normal((n, n)))
    s = np.logspace(0, -6, n)
    A = U @ np.diag(s) @ V.T
    b = rng.standard_normal(n)
    Aj = jnp.asarray(A)
    for eta in (0.707, 1.0):
        res = fgmres(lambda x: Aj @ x, lambda r: r, jnp.asarray(b),
                     maxiter=n, rtol=1e-9, reorth_eta=eta)
        x = np.asarray(res.x)
        relres = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
        est = float(res.resnorms[-1]) / np.linalg.norm(b)
        assert res.converged
        assert relres < 50 * max(est, 1e-9), (eta, relres, est)

    from fenapack_tpu.solvers.krylov import fgmres_ds
    res_ds = fgmres_ds(lambda x: Aj @ x, lambda r: r, jnp.asarray(b),
                       maxiter=n, rtol=1e-9, reorth_eta=0.707)
    x = np.asarray(res_ds.x)
    relres = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
    assert res_ds.converged and relres < 1e-7, relres


@pytest.mark.parametrize("variant", ["BRM1", "BRM2"])
def test_picard_matches_oracle_counts(variant):
    mesh, W, bcs_o = build_step_problem(level=0)
    oracle = solve_oracle(mesh, W, bcs_o, nu=0.02, variant=variant,
                          linearization="picard", max_nl=5, rtol_nl=1e-3)
    solver = make_step_solver(0, variant)
    res = solver.solve(rtol=1e-3, max_steps=5)
    assert len(res.linear_iters) >= len(oracle.linear_iters) - 1
    for a, b in zip(res.linear_iters, oracle.linear_iters):
        assert abs(a - b) <= max(1, 0.1 * b), (res.linear_iters,
                                               oracle.linear_iters)


def test_newton_quadratic():
    solver = make_step_solver(0, "BRM2", linearization="newton")
    res = solver.solve(rtol=1e-10, max_steps=10)
    assert res.converged
    r = res.nonlinear_res
    # quadratic tail: residual ratio accelerates
    assert r[-1] < 1e-9 * r[0]
    assert len(r) <= 8


def test_fused_newton_quadratic():
    """The fused-step path (make_step_ir via solve_fused) preserves Newton
    quadratic decay — guards the demo_cylinder 'mixed' TPU mode, which runs
    Newton exclusively through the fused IR steps."""
    solver = make_step_solver(0, "BRM2", linearization="newton")
    res = solver.solve_fused(rtol=1e-10, max_steps=10)
    assert res.converged
    r = res.nonlinear_res
    assert r[-1] < 1e-9 * r[0]
    assert len(r) <= 8


def test_mesh_independence():
    """Defining PCD property: outer counts ~flat under refinement."""
    counts = []
    for level in [0, 1]:
        solver = make_step_solver(level, "BRM2")
        res = solver.solve(rtol=1e-2, max_steps=3)
        counts.append(res.linear_iters[-1])
    assert abs(counts[1] - counts[0]) <= 6, counts


def test_chebyshev_mp_subsolve_keeps_counts():
    """Replacing the exact Mp solve by Jacobi-Chebyshev must stay in band."""
    exact = make_step_solver(0, "BRM2", **{"pcd.mp.method": "lu"})
    cheb = make_step_solver(0, "BRM2", **{"pcd.mp.method": "chebyshev"})
    r_exact = exact.solve(rtol=1e-2, max_steps=3)
    r_cheb = cheb.solve(rtol=1e-2, max_steps=3)
    for a, b in zip(r_cheb.linear_iters, r_exact.linear_iters):
        assert abs(a - b) <= max(1, 0.15 * b)


def test_cavity_enclosed_damped():
    """Enclosed flow: pure-Neumann PCD nullspace path + damped Picard."""
    mesh = meshmod.cavity_mesh(0)
    asm = NSAssembler(mesh, 1.0 / 50.0)

    def lid(x):
        v = np.zeros((x.shape[0], 2))
        v[:, 0] = 1.0
        return v

    bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL],
                                lambda x: np.zeros((x.shape[0], 2))),
           DirichletBC.velocity(asm.W, [meshmod.INFLOW], lid)]
    cfg = overrides(SolverConfig(), {"pcd.variant": "BRM2"})
    solver = NonlinearSolver(asm, bcs, cfg, enclosed=True)
    res = solver.solve(rtol=1e-4, max_steps=25, damping=0.8)
    assert res.converged, res.nonlinear_res
    assert max(res.linear_iters) < 100


def test_solve_batch_multiple_rhs():
    """Batch-of-problems vmap axis (SURVEY 2.3): one vmapped FGMRES
    program solves several RHS against one linearized operator."""
    import numpy as np
    import jax.numpy as jnp
    from fenapack_tpu.fem import mesh as meshmod
    from fenapack_tpu.fem.assemble import NSAssembler
    from fenapack_tpu.fem.dofmap import DirichletBC
    from fenapack_tpu.solvers.config import SolverConfig, overrides
    from fenapack_tpu.solvers.nonlinear import NonlinearSolver

    mesh = meshmod.backward_step_mesh(0)
    asm = NSAssembler(mesh, 0.02, dtype=jnp.float64)

    def inflow(x):
        v = np.zeros((x.shape[0], 2))
        v[:, 0] = 4 * x[:, 1] * (1 - x[:, 1])
        return v

    bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL],
                                lambda x: np.zeros((x.shape[0], 2))),
           DirichletBC.velocity(asm.W, [meshmod.INFLOW], inflow)]
    cfg = overrides(SolverConfig(), {"pcd.variant": "BRM2",
                                     "dtype": "float64",
                                     "krylov.rtol": 1e-8})
    nl = NonlinearSolver(asm, bcs, cfg)
    oseen = nl.oseen
    w = nl.initial_state()
    wind = w[:nl.n_u]

    rng = np.random.default_rng(0)
    B = jnp.asarray(rng.standard_normal((4, nl.n)))
    X, iters, conv = oseen.solve_batch(wind, B)
    assert bool(np.all(np.asarray(conv)))

    mv = oseen._matvec_factory(*oseen._operator_values(wind))
    for i in range(4):
        rel = float(jnp.linalg.norm(B[i] - mv(X[i]))
                    / jnp.linalg.norm(B[i]))
        assert rel < 1e-7, (i, rel)


def test_re_mild_growth():
    """PCD property (BASELINE literature anchors): iteration counts grow
    only MILDLY with Reynolds number — well below linear in Re."""
    counts = []
    for nu in (0.1, 0.02, 0.01):            # Re ~ 20, 100, 200
        mesh = meshmod.backward_step_mesh(0)
        asm = NSAssembler(mesh, nu)
        bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL],
                                    lambda x: np.zeros((x.shape[0], 2))),
               DirichletBC.velocity(asm.W, [meshmod.INFLOW], step_inflow)]
        cfg = overrides(SolverConfig(), {"pcd.variant": "BRM2"})
        nl = NonlinearSolver(asm, bcs, cfg)
        res = nl.solve(rtol=1e-2, max_steps=4, damping=0.8)
        counts.append(max(res.linear_iters))
    # Re grows 10x across the sweep; counts must grow far slower
    assert counts[-1] < 3.0 * counts[0], counts
    assert counts[-1] < 100, counts


def test_fgmres_converged_flag_honest():
    """converged reports the tolerance being MET — a maxiter (or breakdown)
    stop must not masquerade as convergence."""
    rng = np.random.default_rng(5)
    n = 120
    A = np.diag(np.linspace(0.01, 1.0, n)) + 0.01 * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    Aj = jnp.asarray(A)
    res = fgmres(lambda x: Aj @ x, lambda r: r, jnp.asarray(b),
                 maxiter=3, rtol=1e-12)
    assert not bool(res.converged)
    full = fgmres(lambda x: Aj @ x, lambda r: r, jnp.asarray(b),
                  maxiter=n, rtol=1e-10)
    assert bool(full.converged)


def test_chebyshev_is_minmax_optimal():
    """The fixed-iteration Chebyshev subsolve must achieve the optimal
    min-max residual bound 1/T_k(sigma) on a diagonal SPD operator —
    catches recurrence-coefficient regressions (the first-step beta is
    (1/2)(c*alpha)^2, NOT (c*alpha/2)^2)."""
    from fenapack_tpu.ops.subsolve import chebyshev_solver

    lmin, lmax = 0.15, 2.5
    lam = np.linspace(lmin, lmax, 4001)
    lamj = jnp.asarray(lam)
    dinv = jnp.ones_like(lamj)
    sigma = (lmax + lmin) / (lmax - lmin)
    for k in (3, 6):
        solve = chebyshev_solver(lambda v: lamj * v, dinv, lmin, lmax, k)
        x = np.asarray(solve(jnp.ones_like(lamj)))
        resmax = np.max(np.abs(1.0 - lam * x))
        bound = 1.0 / np.cosh(k * np.arccosh(sigma))
        assert resmax <= bound * 1.02, (k, resmax, bound)
