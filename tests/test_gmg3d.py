"""3D geometric multigrid: tet refinement + P2/P1 transfers + velocity GMG.

Closes the round-1 backlog item "3D GMG hierarchy (tet refinement)"
(SURVEY.md section 7.4): the 3D-at-scale bottleneck was the weak Jacobi
velocity PC (840 outer iters/step at 761k dofs, config 4).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fenapack_tpu.fem import mesh3d, mesh as meshmod
from fenapack_tpu.fem.assemble import NSAssembler
from fenapack_tpu.fem.dofmap import DirichletBC
from fenapack_tpu.solvers import gmg
from fenapack_tpu.solvers.config import SolverConfig, overrides
from fenapack_tpu.solvers.nonlinear import NonlinearSolver


def test_refine_uniform3d_geometry():
    coarse = mesh3d.box_mesh(0, 0, 0, 1, 1, 1, 1, 1, 1)
    fine, parents = mesh3d.refine_uniform3d(coarse)
    assert fine.num_cells == 8 * coarse.num_cells
    # volume preserved
    p = fine.vertices[fine.cells]
    det = np.linalg.det(np.stack(
        [p[:, 1] - p[:, 0], p[:, 2] - p[:, 0], p[:, 3] - p[:, 0]], axis=1))
    assert (det > 0).all()
    assert abs(np.abs(det).sum() / 6 - 1.0) < 1e-12
    assert abs(fine.face_areas().sum() - 6.0) < 1e-12
    # parents contract: midpoint coordinates
    nv = coarse.num_vertices
    mids = 0.5 * (coarse.vertices[parents[nv:, 0]]
                  + coarse.vertices[parents[nv:, 1]])
    assert np.allclose(fine.vertices[nv:], mids)
    # P2 identity: coarse P2 dim == fine vertex count
    assert coarse.num_vertices + coarse.num_edges == fine.num_vertices


def test_refine3d_marker_propagation():
    coarse = mesh3d.channel_mesh3d(0, length=1.0)
    fine, _ = mesh3d.refine_uniform3d(coarse)
    tol = 1e-9
    mids = fine.facet_midpoints()
    inflow = np.where(fine.facet_markers == meshmod.INFLOW)[0]
    outflow = np.where(fine.facet_markers == meshmod.OUTFLOW)[0]
    assert inflow.size > 0 and outflow.size > 0
    assert (mids[inflow, 0] < tol).all()
    assert (mids[outflow, 0] > 1.0 - tol).all()
    # every fine boundary face is marked (coarse had all faces marked)
    assert (fine.facet_markers > 0).all()
    # areas of marked regions preserved
    for m in (meshmod.INFLOW, meshmod.OUTFLOW):
        a_c = coarse.face_areas()[coarse.facet_markers == m].sum()
        a_f = fine.face_areas()[fine.facet_markers == m].sum()
        assert abs(a_c - a_f) < 1e-12


def test_p2_transfer3d_reproduces_quadratics():
    """P2 prolongation must be exact for quadratic fields."""
    coarse = mesh3d.box_mesh(0, 0, 0, 1, 1, 1, 1, 1, 1)
    fine, _ = mesh3d.refine_uniform3d(coarse)
    t = gmg.P2Transfer(coarse, fine, jnp.float64)

    def f(x):
        return (1.0 + 2 * x[:, 0] - x[:, 1] + 0.5 * x[:, 2]
                + x[:, 0] * x[:, 1] - x[:, 2] ** 2 + 0.25 * x[:, 0] ** 2)

    from fenapack_tpu.fem.dofmap import P2Space3D
    xc = f(P2Space3D(coarse).dof_coords())
    xf = f(P2Space3D(fine).dof_coords())
    got = np.asarray(t.prolong(jnp.asarray(xc)))
    assert np.allclose(got, xf, atol=1e-12)


def duct_inflow(x):
    v = np.zeros((x.shape[0], 3))
    v[:, 0] = 16.0 * x[:, 1] * (1 - x[:, 1]) * x[:, 2] * (1 - x[:, 2])
    return v


def test_velocity_gmg3d_near_exact_quality():
    """GMG velocity + GMG Ap subsolves on the refined duct: outer counts
    within 15% of the exact-LU baseline (measured: LU 35-36/step, GMG(3,2)
    37-38/step).  This is the factorization-free path that replaces the
    Jacobi velocity PC whose counts blow up with N (config-4 bottleneck:
    840 iters/step at 761k dofs)."""
    hier = gmg.build_hierarchy(mesh3d.channel_mesh3d(0, length=1.0), 1)
    mesh = hier.fine
    nu = 0.1
    asm = NSAssembler(mesh, nu, quad_degree=4, reorder=False)
    bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL],
                                lambda x: np.zeros((x.shape[0], 3))),
           DirichletBC.velocity(asm.W, [meshmod.INFLOW], duct_inflow)]

    ap_h = gmg.PressureHierarchy(hier, jnp.float64,
                                 pcd_markers=[meshmod.OUTFLOW])
    v_h = gmg.VelocityHierarchy(hier, nu, jnp.float64,
                                bc_markers=[meshmod.WALL, meshmod.INFLOW],
                                fine_asm=asm)

    over_lu = {"pcd.variant": "BRM2", "velocity.method": "lu",
               "krylov.maxiter": 300}
    nl_lu = NonlinearSolver(asm, bcs, overrides(SolverConfig(), over_lu))
    res_lu = nl_lu.solve(rtol=1e-5, max_steps=12)
    assert res_lu.converged

    over_gmg = {"pcd.variant": "BRM2", "velocity.method": "gmg",
                "velocity.smooth_iters": 3, "velocity.cycles": 2,
                "pcd.ap.method": "gmg", "krylov.maxiter": 300}
    nl = NonlinearSolver(asm, bcs, overrides(SolverConfig(), over_gmg),
                         ap_hierarchy=ap_h, velocity_hierarchy=v_h)
    res = nl.solve(rtol=1e-5, max_steps=12)
    assert res.converged, res.nonlinear_res
    assert sum(res.linear_iters) <= 1.15 * sum(res_lu.linear_iters), (
        res.linear_iters, res_lu.linear_iters)

    # physics: mass conservation + bounded velocity
    w = res.w
    comps = asm.split_u(w[:nl.n_u])
    div = sum(asm.const.D[a].mv(comps[a]) for a in range(3))
    assert float(jnp.max(jnp.abs(div))) < 1e-9
    assert float(jnp.max(jnp.abs(w[:nl.n_u]))) < 1.05
