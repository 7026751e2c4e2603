"""SUPG-stabilized SYSTEM at high Reynolds number (BASELINE config 5).

At Re >= 2000 the plain Galerkin system on these meshes is oscillatory
(cell Peclet >> 1): outer FGMRES hits any iteration budget regardless of
subsolve quality — measured with EXACT (dense-LU) velocity subsolves.
``system_supg`` adds the streamline-diffusion term to the residual AND the
Picard operator (consistent lagged linearization), restoring solvability;
iteration counts then show the literature-expected mild Re growth.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from fenapack_tpu.fem import mesh as meshmod
from fenapack_tpu.fem.assemble import NSAssembler
from fenapack_tpu.fem.dofmap import DirichletBC
from fenapack_tpu.solvers.config import SolverConfig, overrides
from fenapack_tpu.solvers.nonlinear import NonlinearSolver
from fenapack_tpu.solvers import gmg


def step_inflow(x):
    v = np.zeros((x.shape[0], 2))
    v[:, 0] = 4 * x[:, 1] * (1 - x[:, 1])
    return v


def build(nu, level=1, system_supg=True, smoother="jacobi", maxiter=400):
    hier = gmg.build_hierarchy(meshmod.backward_step_mesh(0), level)
    mesh = hier.fine
    asm = NSAssembler(mesh, nu, dtype=jnp.float64)
    bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL],
                                lambda x: np.zeros((x.shape[0], 2))),
           DirichletBC.velocity(asm.W, [meshmod.INFLOW], step_inflow)]
    over = {"pcd.variant": "BRM2", "krylov.maxiter": maxiter,
            "krylov.rtol": 1e-6, "dtype": "float64",
            "system_supg": system_supg,
            "velocity.method": "gmg", "velocity.smooth_iters": 3,
            "velocity.cycles": 2, "velocity.smoother": smoother,
            "pcd.ap.method": "gmg"}
    ap_h = gmg.PressureHierarchy(hier, jnp.float64,
                                 pcd_markers=[meshmod.OUTFLOW])
    v_h = gmg.VelocityHierarchy(hier, nu, jnp.float64,
                                bc_markers=[meshmod.WALL, meshmod.INFLOW],
                                fine_asm=asm)
    cfg = overrides(SolverConfig(), over)
    return NonlinearSolver(asm, bcs, cfg, ap_hierarchy=ap_h,
                           velocity_hierarchy=v_h)


def test_unstabilized_system_stalls_at_re2000():
    """Control: the Galerkin system at Re=2000 exhausts the budget once the
    wind is nonzero — the failure system_supg exists to fix."""
    nl = build(1e-3, system_supg=False, maxiter=150)
    res = nl.solve(rtol=1e-4, max_steps=2, damping=0.7)
    assert res.linear_iters[1] >= 150


def test_supg_system_solves_at_re2000():
    nl = build(1e-3, system_supg=True)
    res = nl.solve(rtol=1e-4, max_steps=4, damping=0.7)
    # no budget exhaustion, monotone nonlinear decrease
    assert all(i < 400 for i in res.linear_iters), res.linear_iters
    assert res.nonlinear_res[3] < 0.2 * res.nonlinear_res[0]


def test_supg_system_solves_at_re4000_minres():
    """Re=4000 with the minres (nonsymmetric) GMG smoother."""
    nl = build(5e-4, system_supg=True, smoother="minres")
    res = nl.solve(rtol=1e-4, max_steps=3, damping=0.7)
    assert all(i < 400 for i in res.linear_iters), res.linear_iters
    assert res.nonlinear_res[-1] < res.nonlinear_res[0]


def test_supg_oseen_solves_at_re5000_minres():
    """Top of the BASELINE config-5 Reynolds range: the SUPG-stabilized
    OSEEN solve (config wording — one linearized system, the regime the
    preconditioner must survive) at a wind built up by two damped Picard
    steps at Re=5000.  Convergence is steady-geometric, not stalled:
    measured 435 iterations to 1e-6 on this mesh (vs ~200 at Re=2000 —
    the literature's strong-but-bounded Re growth for PCD)."""
    nl = build(4e-4, system_supg=True, smoother="minres", maxiter=500)
    res = nl.solve(rtol=1e-4, max_steps=2, damping=0.7)
    F = nl._residual(res.w)
    out = nl.oseen.solve(res.w[:nl.n_u], -F)
    assert bool(out.converged), (int(out.iters),
                                 float(out.resnorms[-1]))
    assert int(out.iters) < 500, int(out.iters)


def test_minres_smoother_matches_jacobi_at_low_re():
    """At Re=100 both smoothers give comparable outer counts (minres must
    not degrade the easy regime)."""
    a = build(0.02, system_supg=False, smoother="jacobi")
    b = build(0.02, system_supg=False, smoother="minres")
    ra = a.solve(rtol=1e-4, max_steps=3)
    rb = b.solve(rtol=1e-4, max_steps=3)
    assert sum(rb.linear_iters) <= int(1.3 * sum(ra.linear_iters))


def test_unsteady_residual_includes_supg():
    """The theta-scheme residual must evaluate the SAME (SUPG-stabilized)
    momentum residual as the steady driver when system_supg is on: at
    u_old == u and 1/dt -> 0 the unsteady residual reduces exactly to the
    steady one.  (Regression: the unsteady closure used to drop the SUPG
    term while the Jacobian kept it.)"""
    import numpy as np
    import jax.numpy as jnp
    from fenapack_tpu.fem import mesh as meshmod
    from fenapack_tpu.fem.assemble import NSAssembler
    from fenapack_tpu.fem.dofmap import DirichletBC
    from fenapack_tpu.solvers.config import SolverConfig, overrides
    from fenapack_tpu.solvers.nonlinear import NonlinearSolver
    from fenapack_tpu.solvers.unsteady import UnsteadySolver

    mesh = meshmod.channel_mesh(0, length=2.0)
    asm = NSAssembler(mesh, 5e-4)            # high cell-Peclet: SUPG matters

    def inflow(x):
        v = np.zeros((x.shape[0], 2))
        v[:, 0] = 4 * x[:, 1] * (1 - x[:, 1])
        return v

    bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL],
                                lambda x: np.zeros((x.shape[0], 2))),
           DirichletBC.velocity(asm.W, [meshmod.INFLOW], inflow)]
    cfg = overrides(SolverConfig(), {"system_supg": True})
    steady = NonlinearSolver(asm, bcs, cfg)
    unsteady = UnsteadySolver(asm, bcs, cfg, dt=1e12, theta=1.0)

    rng = np.random.default_rng(1)
    w = np.array(steady.initial_state())
    w[:steady.n_u] += 0.01 * rng.standard_normal(steady.n_u) * \
        np.asarray(steady.oseen.free_u)
    w = jnp.asarray(w)
    F_steady = np.asarray(steady._residual(w))
    F_unsteady = np.asarray(unsteady._residual(w, w[:steady.n_u]))
    assert np.allclose(F_steady, F_unsteady, atol=1e-9), \
        np.abs(F_steady - F_unsteady).max()
