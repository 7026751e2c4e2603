"""Oracle nonlinear drivers: Picard/Newton on the demo problems, exact PCD.

Produces the golden iteration counts (per-nonlinear-step FGMRES iters) that
the JAX/TPU path must match within the 10% band of BASELINE.json.  The loop
mirrors ``fenapack/nonlinear_solvers.py::PCDNewtonSolver`` semantics: relative
residual control on the nonlinear residual, one PCD-preconditioned FGMRES
solve per step, Kp reassembled with the fresh wind every step.
"""
from __future__ import annotations

import dataclasses
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from fenapack_tpu.fem import mesh as meshmod
from fenapack_tpu.fem.dofmap import TaylorHood, DirichletBC, merge_bcs

from .oracle import (OracleOperators, OraclePCD, OracleFieldsplit,
                     apply_bc_rows, mask_system, fgmres)


@dataclasses.dataclass
class OracleResult:
    w: np.ndarray
    linear_iters: list
    nonlinear_res: list
    ops: object
    W: object


def step_inflow_profile(x):
    """Parabolic inflow u=(4 y (1-y), 0) on the inlet segment y in [0,1]."""
    vals = np.zeros((x.shape[0], 2))
    vals[:, 0] = 4.0 * x[:, 1] * (1.0 - x[:, 1])
    return vals


def build_step_problem(level=0, nu=0.02):
    mesh = meshmod.backward_step_mesh(level)
    W = TaylorHood(mesh)
    bcs = [
        DirichletBC.velocity(W, [meshmod.WALL], lambda x: np.zeros((x.shape[0], 2))),
        DirichletBC.velocity(W, [meshmod.INFLOW], step_inflow_profile),
    ]
    return mesh, W, bcs


def build_cavity_problem(level=0, nu=0.002):
    mesh = meshmod.cavity_mesh(level)
    W = TaylorHood(mesh)

    def lid(x):
        vals = np.zeros((x.shape[0], 2))
        vals[:, 0] = 1.0
        return vals

    bcs = [
        DirichletBC.velocity(W, [meshmod.WALL], lambda x: np.zeros((x.shape[0], 2))),
        DirichletBC.velocity(W, [meshmod.INFLOW], lid),
    ]
    return mesh, W, bcs


def build_cylinder_problem(level=0):
    """Schafer-Turek cylinder channel (DFG 2D-1, Re=20, nu=1e-3) — the
    geometry of ``demos/demo_cylinder.py``: refine-with-snap so the mesh
    matches ``gmg.build_hierarchy(cylinder_channel_mesh(0), level,
    snap=snap_to_circle)`` exactly."""
    mesh = meshmod.cylinder_channel_mesh(0)
    for _ in range(level):
        mesh, _ = meshmod.refine_uniform(mesh)
        meshmod.snap_to_circle(mesh)
    W = TaylorHood(mesh)
    u_m = 0.3            # peak of the parabola; Ubar = 0.2, Re = 20

    def inflow(x):
        vals = np.zeros((x.shape[0], 2))
        vals[:, 0] = 4.0 * u_m * x[:, 1] * (0.41 - x[:, 1]) / 0.41 ** 2
        return vals

    bcs = [
        DirichletBC.velocity(W, [meshmod.WALL, meshmod.CYLINDER],
                             lambda x: np.zeros((x.shape[0], 2))),
        DirichletBC.velocity(W, [meshmod.INFLOW], inflow),
    ]
    return mesh, W, bcs


def marked_facet_edges(mesh, marker):
    sel = mesh.facet_markers == marker
    return mesh.boundary_facets[sel]


def solve_oracle(mesh, W, bcs, nu=0.02, variant="BRM2", linearization="picard",
                 enclosed=False, rtol_nl=1e-5, rtol_lin=1e-8, max_nl=30,
                 max_lin=200):
    """Full nonlinear solve with exact-LU PCD fieldsplit FGMRES."""
    ops = OracleOperators(mesh, nu)
    nu_dofs = ops.nu_dofs
    ndof = nu_dofs + ops.n1

    bc_mask_u, bc_vals_u = merge_bcs(bcs, nu_dofs)
    bc_mask = np.concatenate([bc_mask_u, np.zeros(ops.n1)])
    free_u = 1.0 - bc_mask_u

    # PCD boundary dofs: BRM1 -> inflow pressure dofs; BRM2 -> outflow
    if enclosed:
        pcd_marker = meshmod.INFLOW if variant == "BRM1" else None
        pcd_dofs = (W.Q.facet_dofs([meshmod.INFLOW]) if variant == "BRM1"
                    else np.array([], dtype=np.int64))
    else:
        marker = meshmod.INFLOW if variant == "BRM1" else meshmod.OUTFLOW
        pcd_dofs = W.Q.facet_dofs([marker])
    inflow_facets = marked_facet_edges(mesh, meshmod.INFLOW)

    w = np.zeros(ndof)
    w[:nu_dofs] = bc_mask_u * bc_vals_u

    pcd = OraclePCD(ops, variant, pcd_dofs, w[:nu_dofs],
                    inflow_facets=inflow_facets,
                    nullspace=enclosed and variant == "BRM2")

    lin_iters, nl_res = [], []
    r0 = None
    for it in range(max_nl):
        F = ops.residual(w)
        F[:nu_dofs] *= free_u           # increments pinned at Dirichlet dofs
        if enclosed:
            F[nu_dofs:] -= F[nu_dofs:].mean()
        rnorm = np.linalg.norm(F)
        nl_res.append(rnorm)
        if r0 is None:
            r0 = rnorm
        if rnorm <= rtol_nl * r0 or rnorm < 1e-12:
            break

        wind = w[:nu_dofs]
        J = (ops.picard_matrix(wind) if linearization == "picard"
             else ops.newton_matrix(wind))
        Jm = mask_system(J, bc_mask)
        A_uu = Jm[:nu_dofs, :nu_dofs].tocsc()
        pcd.update(wind)
        fs = OracleFieldsplit(ops, A_uu, pcd, bc_mask_u)

        def matvec(x):
            return Jm @ x

        dx, iters, hist = fgmres(matvec, -F, fs.apply,
                                 rtol=rtol_lin, maxiter=max_lin)
        lin_iters.append(iters)
        w = w + dx
        if enclosed:
            w[nu_dofs:] -= w[nu_dofs:].mean()

    return OracleResult(w=w, linear_iters=lin_iters, nonlinear_res=nl_res,
                        ops=ops, W=W)
