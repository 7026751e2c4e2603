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
            M2 = asm.pat_p2_hi.matrix(asm.mass2_values(hi=True))
        comps = asm.split_u(du_dt.astype(dt_hi))
        ru = ru + jnp.concatenate([M2.mv(comps[a])
                                   for a in range(asm.dim)])
    sdofs = asm.W.V.facet_dofs(list(markers))
    return np.array([-float(jnp.sum(ru[a * asm.n2 + sdofs]))
                     for a in range(asm.dim)])


def p1_point_weights(asm, points):
    """Interpolation stencils for P1 point evaluation: ``(idx, wts)`` with
    ``idx`` (k, d+1) pressure-dof indices and ``wts`` (k, d+1) barycentric
    weights so that ``p_at = (p[idx] * wts).sum(axis=1)`` — the device-side
    form of :func:`eval_p1` (same containing-cell search and
    nearest-vertex fallback, done once on the host at setup)."""
    mesh = asm.mesh
    points = np.atleast_2d(np.asarray(points, dtype=np.float64))
    cd = np.asarray(asm.W.Q.cell_dofs)
    verts = mesh.vertices[mesh.cells]
    gdim = mesh.vertices.shape[1]
    idx = np.zeros((points.shape[0], gdim + 1), dtype=np.int32)
    wts = np.zeros((points.shape[0], gdim + 1))
    for k, x in enumerate(points):
        T = verts[:, 1:, :] - verts[:, :1, :]
        rhs = x[None, :] - verts[:, 0, :]
        det = np.linalg.det(T)
        ok = np.abs(det) > 1e-300
        lam = np.zeros((verts.shape[0], gdim))
        lam[ok] = np.linalg.solve(np.swapaxes(T[ok], 1, 2),
                                  rhs[ok][..., None])[..., 0]
        bary = np.concatenate([1.0 - lam.sum(axis=1, keepdims=True), lam],
                              axis=1)
        inside = ok & (bary.min(axis=1) >= -1e-9)
        cand = np.where(inside)[0]
        if cand.size:
            c = cand[0]
            idx[k] = cd[c]
            wts[k] = bary[c]
        else:
            v = int(np.argmin(np.linalg.norm(mesh.vertices - x, axis=1)))
            c, loc = np.argwhere(mesh.cells == v)[0]
            idx[k] = cd[c, loc]
            wts[k, 0] = 1.0
    return idx, wts


def make_device_functional(asm, markers: Sequence[int], points=(),
                           scheme: str = "steady", dt: float = None,
                           supg: bool = False):
    """Build a jit-traceable per-step functional ``fn(w_new, u_old, u_prev)
    -> (d + k,)``: boundary-reaction force components on ``markers``
    followed by the pressure values at ``points``.

    The device-resident form of :func:`boundary_reaction` + :func:`eval_p1`
    for the fused unsteady paths (``UnsteadySolver.make_full_unsteady(...,
    functional=...)``): forces ride the scan as scalars instead of the full
    state crossing to the host every step — on a remote-attached TPU the
    per-step d2h fetch dominates the whole time step otherwise.

    ``scheme``: "steady" (no inertial term), "theta" (backward-difference
    du/dt), or "bdf2" (second-order (3u - 4u_old + u_prev)/(2dt), matching
    the BDF2 stepper's own derivative — more accurate than the host
    callback's backward difference).
    """
    dt_hi = jnp.dtype(asm.dtype)
    n2, d = asm.n2, asm.dim
    n_u = d * n2
    sdofs = np.asarray(asm.W.V.facet_dofs(list(markers)))
    mask = np.zeros(n2)
    mask[sdofs] = 1.0
    mask = jnp.asarray(mask, dtype=dt_hi)
    if len(points):
        idx, wts = p1_point_weights(asm, points)
        idx = jnp.asarray(idx)
        wts = jnp.asarray(wts, dtype=dt_hi)
    M2 = None
    if scheme != "steady":
        if dt is None:
            raise ValueError("dt is required for unsteady schemes")
        M2 = asm.const_hi.M2
        if M2 is None:
            M2 = asm.pat_p2_hi.matrix(asm.mass2_values(hi=True))
        idt = 1.0 / dt

    def fn(w_new, u_old, u_prev):
        u = w_new[:n_u].astype(dt_hi)
        p = w_new[n_u:].astype(dt_hi)
        ru, _ = asm.residual(u, None, supg=supg)
        ru = ru + asm.grad_p(p)
        if scheme == "bdf2":
            du_dt = (1.5 * u - 2.0 * u_old.astype(dt_hi)
                     + 0.5 * u_prev.astype(dt_hi)) * idt
        elif scheme == "theta":
            du_dt = (u - u_old.astype(dt_hi)) * idt
        else:
            du_dt = None
        if du_dt is not None:
            ru = ru + jnp.concatenate(
                [M2.mv(du_dt[a * n2:(a + 1) * n2]) for a in range(d)])
        force = jnp.stack([-jnp.sum(ru[a * n2:(a + 1) * n2] * mask)
                           for a in range(d)])
        if len(points):
            p_at = jnp.sum(p[idx] * wts, axis=1)
            return jnp.concatenate([force, p_at])
        return force

    return fn


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
