"""Geometric multigrid tests: V-cycle contraction + solver-parity.

SURVEY.md section 7.2 M6: the AMG-style pressure hierarchy and velocity-block
multigrid that replace the reference's PETSc/hypre inner solves must keep
outer FGMRES counts in the band of the exact-LU path.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fenapack_tpu.fem import mesh as meshmod
from fenapack_tpu.fem.assemble import NSAssembler
from fenapack_tpu.fem.dofmap import DirichletBC
from fenapack_tpu.solvers.config import SolverConfig, SubsolveConfig, overrides
from fenapack_tpu.solvers.nonlinear import NonlinearSolver
from fenapack_tpu.solvers import gmg


def step_inflow(x):
    v = np.zeros((x.shape[0], 2))
    v[:, 0] = 4 * x[:, 1] * (1 - x[:, 1])
    return v


def build_gmg_solver(levels=1, variant="BRM2", velocity="gmg", ap="gmg",
                     linearization="picard"):
    hier = gmg.build_hierarchy(meshmod.backward_step_mesh(0), levels)
    mesh = hier.fine
    asm = NSAssembler(mesh, 0.02)
    bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL],
                                lambda x: np.zeros((x.shape[0], 2))),
           DirichletBC.velocity(asm.W, [meshmod.INFLOW], step_inflow)]
    cfg = overrides(SolverConfig(), {
        "pcd.variant": variant,
        "velocity.method": velocity,
        "velocity.smooth_iters": 3,
        "velocity.cycles": 2,
        "pcd.ap.method": ap,
        "pcd.ap.smooth_iters": 2,
        "pcd.ap.cycles": 1,
    })
    ap_h = None
    if ap == "gmg":
        marker = meshmod.INFLOW if variant == "BRM1" else meshmod.OUTFLOW
        ap_h = gmg.PressureHierarchy(hier, jnp.float64,
                                     pcd_markers=[marker])
    v_h = None
    if velocity == "gmg":
        v_h = gmg.VelocityHierarchy(hier, 0.02, jnp.float64,
                                    bc_markers=[meshmod.WALL, meshmod.INFLOW],
                                    fine_asm=asm)
    return NonlinearSolver(asm, bcs, cfg, linearization=linearization,
                           ap_hierarchy=ap_h, velocity_hierarchy=v_h)


def build_lu_solver(levels=1, variant="BRM2"):
    hier = gmg.build_hierarchy(meshmod.backward_step_mesh(0), levels)
    asm = NSAssembler(hier.fine, 0.02)
    bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL],
                                lambda x: np.zeros((x.shape[0], 2))),
           DirichletBC.velocity(asm.W, [meshmod.INFLOW], step_inflow)]
    cfg = overrides(SolverConfig(), {"pcd.variant": variant})
    return NonlinearSolver(asm, bcs, cfg)


def test_pressure_vcycle_contracts():
    """One V-cycle on the pressure Laplacian contracts the error strongly."""
    hier = gmg.build_hierarchy(meshmod.backward_step_mesh(0), 2)
    ph = gmg.PressureHierarchy(hier, jnp.float64,
                               pcd_markers=[meshmod.OUTFLOW])
    solve = gmg.make_gmg_solver(ph, SubsolveConfig(method="gmg",
                                                   smooth_iters=2, cycles=1),
                                jnp.float64)
    asm, Ap, mask = ph.levels[-1]
    free = 1.0 - mask
    mv = lambda x: free * Ap.mv(free * x) + mask * x
    rng = np.random.default_rng(0)
    xex = jnp.asarray(rng.standard_normal(Ap.shape[0]))
    b = mv(xex)
    x = solve(b)
    r1 = float(jnp.linalg.norm(b - mv(x)))
    b0 = float(jnp.linalg.norm(b))
    assert r1 < 0.15 * b0, (r1, b0)


def test_gmg_subsolves_keep_outer_counts():
    """GMG Ap + GMG velocity block stays within the iteration band of the
    exact-LU path (the BASELINE.json 10% contract, relaxed to +30% for the
    inexact velocity V-cycle, matching the reference's iterative option)."""
    lu = build_lu_solver()
    mg = build_gmg_solver()
    r_lu = lu.solve(rtol=1e-3, max_steps=4)
    r_mg = mg.solve(rtol=1e-3, max_steps=4)
    assert r_mg.nonlinear_res[-1] <= 1.05 * r_lu.nonlinear_res[-1] or \
        r_mg.nonlinear_res[-1] < 1e-3 * r_mg.nonlinear_res[0]
    for a, b in zip(r_mg.linear_iters, r_lu.linear_iters):
        assert a <= max(b + 3, 1.3 * b), (r_mg.linear_iters, r_lu.linear_iters)


def test_gmg_full_convergence():
    """End-to-end Picard with all-iterative subsolves converges to 1e-5."""
    mg = build_gmg_solver()
    res = mg.solve(rtol=1e-5, max_steps=20)
    assert res.converged, res.nonlinear_res
