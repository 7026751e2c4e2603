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
                     linearization="picard", **cfg_over):
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
        **cfg_over,
    })
    # hierarchy arrays live in the COMPUTE dtype (f32 when a mixed config
    # is requested, as in the 3D/cylinder production drivers)
    hdt = jnp.dtype(cfg_over.get("dtype", "float64"))
    ap_h = None
    if ap == "gmg":
        marker = meshmod.INFLOW if variant == "BRM1" else meshmod.OUTFLOW
        ap_h = gmg.PressureHierarchy(hier, hdt,
                                     pcd_markers=[marker])
    v_h = None
    if velocity == "gmg":
        v_h = gmg.VelocityHierarchy(hier, 0.02, hdt,
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


def test_transfer_maxfill_fallback_parity(monkeypatch):
    """Transfers whose block fill exceeds FENAPACK_BLOCK_MAXFILL fall back
    to the gather path with identical prolong/restrict values (761k-dof
    HBM fix: a P2 restriction reached m=232 neighbor blocks / 954 MB)."""
    hier = gmg.build_hierarchy(meshmod.backward_step_mesh(0), 1)
    coarse, fine = hier.meshes[0], hier.meshes[1]
    xc = np.random.default_rng(0).standard_normal(
        fine.num_vertices).astype(np.float64)

    t_block = gmg.P1Transfer(hier.parents[0], fine.num_vertices, jnp.float64,
                             block_size=32)
    monkeypatch.setenv("FENAPACK_BLOCK_MAXFILL", "0")
    t_gather = gmg.P1Transfer(hier.parents[0], fine.num_vertices,
                              jnp.float64, block_size=32)
    assert t_block._P is not None and t_gather._P is None
    pf_b = np.asarray(t_block.prolong(jnp.asarray(xc)))
    pf_g = np.asarray(t_gather.prolong(jnp.asarray(xc)))
    assert np.allclose(pf_b, pf_g, rtol=0, atol=1e-14)
    rf = np.random.default_rng(1).standard_normal(t_block.n_fine)
    rb = np.asarray(t_block.restrict(jnp.asarray(rf)))
    rg = np.asarray(t_gather.restrict(jnp.asarray(rf)))
    assert np.allclose(rb, rg, rtol=0, atol=1e-14)

    # P2 transfer: same check through the velocity-space operator
    t2_gather = gmg.P2Transfer(coarse, fine, jnp.float64, block_size=32)
    assert t2_gather._P is None
    monkeypatch.delenv("FENAPACK_BLOCK_MAXFILL")
    t2_block = gmg.P2Transfer(coarse, fine, jnp.float64, block_size=32)
    assert t2_block._P is not None
    x2 = np.random.default_rng(2).standard_normal(t2_block.n_coarse)
    assert np.allclose(np.asarray(t2_block.prolong(jnp.asarray(x2))),
                       np.asarray(t2_gather.prolong(jnp.asarray(x2))),
                       rtol=0, atol=1e-14)
    r2 = np.random.default_rng(3).standard_normal(t2_block.n_fine)
    assert np.allclose(np.asarray(t2_block.restrict(jnp.asarray(r2))),
                       np.asarray(t2_gather.restrict(jnp.asarray(r2))),
                       rtol=0, atol=1e-14)


def test_iterative_coarse_fallback_converges(monkeypatch):
    """With FENAPACK_GMG_DENSE_MAX forced to 1, both hierarchies take the
    iterative coarse-solve path (velocity: minres sweeps; pressure:
    Chebyshev with measured bounds) instead of a dense inverse — the guard
    for base meshes whose l=0 space is already large (DFG cylinder: 18.6k
    velocity dofs; the dense route OOMs scoped VMEM at AOT compile,
    2026-08-19).  The end-to-end Picard solve must still converge, with
    outer counts in a generous band of the dense-coarse path."""
    dense = build_gmg_solver()
    r_dense = dense.solve(rtol=1e-5, max_steps=20)
    monkeypatch.setenv("FENAPACK_GMG_DENSE_MAX", "1")
    it = build_gmg_solver()
    r_it = it.solve(rtol=1e-5, max_steps=20)
    assert r_it.converged, r_it.nonlinear_res
    assert sum(r_it.linear_iters) <= 1.6 * sum(r_dense.linear_iters), (
        r_it.linear_iters, r_dense.linear_iters)
