"""Post-processing functionals: boundary forces and point values.

The reference workloads report drag/lift coefficients and pressure
differences for the Schafer-Turek "flow around a cylinder" benchmark
(upstream fenapack's unsteady demo geometry; DOLFIN evaluates these by
assembling surface-integral forms).  The TPU rebuild uses the
*discrete-consistent reaction* formulation instead: at a converged state
the raw (un-masked) Galerkin momentum residual vanishes on interior rows,
and its value on a Dirichlet-boundary row j equals the surface momentum
flux tested with the nodal basis function phi_j — so the force the fluid
exerts on a marked boundary is the plain sum of residual rows over that
boundary's velocity dofs.  This is the superconvergent variational force
evaluation (Babuska/Miller trick; standard in the FEniCS benchmark
literature) and needs no new surface quadrature.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp


def boundary_reaction(asm, u: jnp.ndarray, p: jnp.ndarray,
                      markers: Sequence[int], supg: bool = False,
                      du_dt: jnp.ndarray = None) -> np.ndarray:
    """Force (Fx, ..., Fd) exerted BY the fluid ON the ``markers`` boundary.

    ``u`` is the stacked velocity vector ((d*n2,), assembler layout), ``p``
    the pressure vector.  Evaluates the raw steady residual (zero body
    force, natural outflow) and sums its rows over the boundary's velocity
    dofs; by the variational identity the row sum equals
    ``int_S sigma(u, p) . n_fluid ds`` tested against the boundary-nodal
    test field — the traction the boundary exerts ON the fluid (n_fluid =
    outward normal of the fluid domain).  The returned force is its
    NEGATIVE: the force the fluid exerts on the obstacle/wall, drag
    positive downstream (validated analytically on Poiseuille wall
    friction, tests/test_cylinder.py).

    For UNSTEADY states pass ``du_dt`` (stacked, same layout as ``u``):
    the identity then needs the inertial term ``int phi_j du/dt`` on the
    boundary rows — nonzero over the boundary cells even on a no-slip
    obstacle (only the boundary NODES of u are pinned).
    """
    dt_hi = jnp.dtype(asm.dtype)
    ru, _ = asm.residual(u.astype(dt_hi), p.astype(dt_hi), hi=True,
                         supg=supg)
    if du_dt is not None:
        M2 = asm.const_hi.M2
        if M2 is None:
            M2 = asm.pat_p2.matrix(asm.mass2_values(hi=True))
        comps = asm.split_u(du_dt.astype(dt_hi))
        ru = ru + jnp.concatenate([M2.mv(comps[a])
                                   for a in range(asm.dim)])
    sdofs = asm.W.V.facet_dofs(list(markers))
    return np.array([-float(jnp.sum(ru[a * asm.n2 + sdofs]))
                     for a in range(asm.dim)])


def eval_p1(asm, pvals, points) -> np.ndarray:
    """Evaluate a P1 (pressure-space) field at physical ``points`` (k, 2/3).

    Barycentric interpolation in the containing cell (host-side NumPy —
    post-processing, not a hot path).  Points that fall outside every cell
    (e.g. exactly on a snapped curved boundary) use the nearest vertex's
    value.  Works under dof reordering: values are addressed through
    ``W.Q.cell_dofs``, which is always aligned with ``mesh.cells``.
    """
    mesh = asm.mesh
    pvals = np.asarray(pvals)
    points = np.atleast_2d(np.asarray(points, dtype=np.float64))
    cd = np.asarray(asm.W.Q.cell_dofs)                 # (nc, d+1)
    verts = mesh.vertices[mesh.cells]                  # (nc, d+1, gdim)
    out = np.empty(points.shape[0])
    gdim = mesh.vertices.shape[1]
    for k, x in enumerate(points):
        # barycentric coordinates wrt every cell at once
        T = verts[:, 1:, :] - verts[:, :1, :]          # (nc, gdim, gdim)
        rhs = x[None, :] - verts[:, 0, :]              # (nc, gdim)
        det = np.linalg.det(T)
        ok = np.abs(det) > 1e-300
        lam = np.zeros((verts.shape[0], gdim))
        lam[ok] = np.linalg.solve(np.swapaxes(T[ok], 1, 2),
                                  rhs[ok][..., None])[..., 0]
        bary = np.concatenate([1.0 - lam.sum(axis=1, keepdims=True), lam],
                              axis=1)                  # (nc, d+1)
        inside = ok & (bary.min(axis=1) >= -1e-9)
        idx = np.where(inside)[0]
        if idx.size:
            c = idx[0]
            out[k] = float(bary[c] @ pvals[cd[c]])
        else:
            v = int(np.argmin(np.linalg.norm(mesh.vertices - x, axis=1)))
            # vertex v's pressure dof: find it in any incident cell
            c, loc = np.argwhere(mesh.cells == v)[0]
            out[k] = float(pvals[cd[c, loc]])
    return out
