"""Batched (vectorized) Taylor-Hood assembly in JAX.

TPU-native replacement for DOLFIN ``SystemAssembler`` + FFC element kernels
and for the operator-collection role of
``fenapack/assembling.py::PCDAssembler`` (SURVEY.md section 2.1 item 2,
section 2.2 item 6): per-cell element tensors are computed as batched einsums
over quadrature points (MXU-friendly), then scattered into static-sparsity
ELL matrices with one ``scatter-add``.

Lifecycle parity with ``PCDForm`` const/per-iteration flags: the constant
operators (viscous Laplacian, divergence, pressure mass Mp and stiffness Ap)
are assembled once per mesh; the wind-dependent ones (convection N(w), Newton
reaction, pressure convection Kp incl. the BRM2 inflow surface term) are pure
jit functions of the current velocity iterate.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import elements
from .mesh import TriMesh, INFLOW
from .dofmap import TaylorHood
from ..ops.sparse import ELL, SparsityPattern, pattern_from_dofmaps


def _pad_rows(a: np.ndarray, n_extra: int) -> np.ndarray:
    if not n_extra:
        return a
    return np.concatenate(
        [a, np.zeros((n_extra,) + a.shape[1:], dtype=a.dtype)])


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ConstOperators:
    """Mesh-constant operators (assembled once).

    ``L`` is the *unscaled* scalar P2 stiffness (vector Laplacian acts
    per-component); ``Dx``/``Dy`` are the divergence blocks with the
    ``-int q d_a u_a`` sign convention, so the monolithic system is
    ``[[A, D^T], [D, 0]]``; ``Mp`` is already scaled by 1/nu (fenapack demo
    convention ``mp = (1/nu) p q dx``); ``Ap`` is the unscaled pressure
    Laplacian ``grad p . grad q dx``.
    """
    L: ELL
    Dx: ELL
    Dy: ELL
    DxT: ELL
    DyT: ELL
    Mp: ELL
    Ap: ELL
    M2: ELL      # scalar P2 mass (unscaled) — unsteady M/dt velocity term

    def tree_flatten(self):
        fields = (self.L, self.Dx, self.Dy, self.DxT, self.DyT, self.Mp,
                  self.Ap, self.M2)
        return fields, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


class NSAssembler:
    """Vectorized Navier-Stokes / PCD operator assembly on one mesh.

    Host-side ``__init__`` precomputes geometry, dofmaps and sparsity
    patterns; every ``*_values``/``assemble_*`` method is a pure function of
    the velocity iterate, safe to call under ``jit``.
    """

    def __init__(self, mesh: TriMesh, nu: float, dtype=jnp.float64,
                 quad_degree: int = 5, inflow_marker: int = INFLOW,
                 row_align: int = 1):
        self.mesh = mesh
        self.nu = float(nu)
        self.dtype = dtype
        W = TaylorHood(mesh, align=row_align)
        self.W = W
        self.row_align = row_align
        self.n2 = W.n2                  # padded sizes (== real when align=1)
        self.n1 = W.n1
        self.n2_real = W.V.dim
        self.n1_real = W.Q.dim
        # active-dof masks (0.0 on alignment padding)
        p_act = np.zeros(self.n1)
        p_act[:self.n1_real] = 1.0
        u_act = np.zeros(2 * self.n2)
        u_act[:self.n2_real] = 1.0
        u_act[self.n2:self.n2 + self.n2_real] = 1.0
        self.p_active = jnp.asarray(p_act, dtype=dtype)
        self.u_active = jnp.asarray(u_act, dtype=dtype)

        # --- basis tables -------------------------------------------------
        qp, qw = elements.triangle_quadrature(quad_degree)
        phi2, dphi2 = elements.p2_basis(qp)       # (nq,6), (nq,6,2)
        phi1, dphi1 = elements.p1_basis(qp)       # (nq,3), (nq,3,2) const rows
        self.nq = qp.shape[0]

        # --- geometry -----------------------------------------------------
        v = mesh.vertices[mesh.cells]             # (nc,3,2)
        J = np.stack([v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]], axis=2)
        detJ = J[:, 0, 0] * J[:, 1, 1] - J[:, 0, 1] * J[:, 1, 0]
        Jinv = np.empty_like(J)
        Jinv[:, 0, 0] = J[:, 1, 1] / detJ
        Jinv[:, 0, 1] = -J[:, 0, 1] / detJ
        Jinv[:, 1, 0] = -J[:, 1, 0] / detJ
        Jinv[:, 1, 1] = J[:, 0, 0] / detJ
        adet = np.abs(detJ)

        cd2 = W.V.cell_dofs.astype(np.int32)      # (nc,6)
        cd1 = W.Q.cell_dofs.astype(np.int32)      # (nc,3)

        # physical gradients, precomputed (g2: (nc,nq,6,2); g1: (nc,3,2))
        g2 = np.einsum("qik,ckd->cqid", dphi2, Jinv)
        g1 = np.einsum("ik,ckd->cid", dphi1[0], Jinv)

        # cell-batch alignment padding: zero-measure phantom cells so the
        # cells axis is shardable over the device mesh; their quadrature
        # weights are zero and their scatter targets are out-of-bounds
        # (dropped), so they contribute nothing.
        nc = cd2.shape[0]
        self.nc_real = nc
        nc_pad = -(-nc // row_align) * row_align - nc
        if nc_pad:
            g2 = np.concatenate([g2, np.zeros((nc_pad,) + g2.shape[1:])])
            g1 = np.concatenate([g1, np.zeros((nc_pad,) + g1.shape[1:])])
            adet = np.concatenate([adet, np.zeros(nc_pad)])
        self.nc = nc + nc_pad

        self.cd2 = jnp.asarray(_pad_rows(cd2, nc_pad))
        self.cd1 = jnp.asarray(_pad_rows(cd1, nc_pad))
        # cell diameters (max edge length) for SUPG; 0 on phantom cells
        e = np.linalg.norm(v - np.roll(v, 1, axis=1), axis=2).max(axis=1)
        self.h_cell = jnp.asarray(np.concatenate([e, np.zeros(nc_pad)]),
                                  dtype=dtype)
        self.g2 = jnp.asarray(g2, dtype=dtype)
        self.g1 = jnp.asarray(g1, dtype=dtype)
        self.adet = jnp.asarray(adet, dtype=dtype)
        self.qw = jnp.asarray(qw, dtype=dtype)
        self.phi2 = jnp.asarray(phi2, dtype=dtype)
        self.phi1 = jnp.asarray(phi1, dtype=dtype)
        # combined quad weight * |det| (nc, nq)
        self.wdet = self.adet[:, None] * self.qw[None, :]

        # --- sparsity patterns --------------------------------------------
        self.pat_p2 = pattern_from_dofmaps(cd2, cd2, self.n2, self.n2)
        self.pat_p1 = pattern_from_dofmaps(cd1, cd1, self.n1, self.n1)
        self.pat_div = pattern_from_dofmaps(cd1, cd2, self.n1, self.n2)
        self.pat_divT = pattern_from_dofmaps(cd2, cd1, self.n2, self.n1)
        for pat, width in ((self.pat_p2, 36), (self.pat_p1, 9),
                           (self.pat_div, 18), (self.pat_divT, 18)):
            pat.pad_entries(nc_pad * width)

        # --- boundary facet data for surface integrals --------------------
        self._setup_facets(inflow_marker)

        # --- constant operators -------------------------------------------
        self.const = self._assemble_constant()

    # ------------------------------------------------------------------ #
    def _setup_facets(self, inflow_marker: int):
        """Precompute inflow-facet quadrature tables for the BRM2 kp surface
        term ``-(1/nu) (w.n) p q ds`` (fenapack demo; Olshanskii-Vassilevski
        2007 variant, SURVEY.md section 0)."""
        mesh = self.mesh
        sel = np.where(mesh.facet_markers == inflow_marker)[0]
        self.n_inflow_facets = sel.shape[0]
        if sel.shape[0] == 0:
            return
        facets = mesh.boundary_facets[sel]
        fcells = mesh.facet_cells[sel]
        normals = mesh.facet_normals()[sel]
        t, wq = elements.interval_quadrature(4)
        ntq = t.shape[0]
        nf = sel.shape[0]

        phi2_f = np.empty((nf, ntq, 6))
        phi1_f = np.empty((nf, ntq, 3))
        lengths = np.empty(nf)
        verts_ref = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
        for idx in range(nf):
            eid = facets[idx]
            c = fcells[idx]
            va, vb = mesh.edges[eid]
            lengths[idx] = np.linalg.norm(mesh.vertices[vb] - mesh.vertices[va])
            cell_v = list(mesh.cells[c])
            la, lb = cell_v.index(va), cell_v.index(vb)
            k = 3 - la - lb
            i_loc, j_loc = (k + 1) % 3, (k + 2) % 3
            if cell_v[i_loc] != va:
                i_loc, j_loc = j_loc, i_loc
            pref = ((1 - t)[:, None] * verts_ref[i_loc]
                    + t[:, None] * verts_ref[j_loc])
            p2, _ = elements.p2_basis(pref)
            p1, _ = elements.p1_basis(pref)
            phi2_f[idx] = p2
            phi1_f[idx] = p1

        dt = self.dtype
        self.f_phi2 = jnp.asarray(phi2_f, dtype=dt)
        self.f_phi1 = jnp.asarray(phi1_f, dtype=dt)
        self.f_wlen = jnp.asarray(lengths[:, None] * wq[None, :], dtype=dt)  # (nf, ntq)
        self.f_normals = jnp.asarray(normals, dtype=dt)
        self.f_cd2 = jnp.asarray(np.asarray(self.cd2)[fcells])   # (nf,6)
        f_cd1 = np.asarray(self.cd1)[fcells]
        self.f_cd1 = jnp.asarray(f_cd1)                          # (nf,3)
        # surface entries land in the *volume* P1 pattern's slots
        self.kp_surf_pos = self.pat_p1.entry_positions(f_cd1, f_cd1)

    # ------------------------------------------------------------------ #
    def _assemble_constant(self) -> ConstOperators:
        w, g2, g1 = self.wdet, self.g2, self.g1
        phi2, phi1 = self.phi2, self.phi1

        visc = jnp.einsum("cq,cqid,cqjd->cij", w, g2, g2)
        mass_p2 = jnp.einsum("cq,qi,qj->cij", w, phi2, phi2)
        mass_p1 = jnp.einsum("cq,ql,qm->clm", w, phi1, phi1) / self.nu
        stiff_p1 = jnp.einsum("c,cld,cmd->clm", jnp.sum(w, axis=1), g1, g1)
        # divergence: D[l,(j,a)] = -int psi_l d_a phi_j
        dx = -jnp.einsum("cq,ql,cqj->clj", w, phi1, g2[..., 0])
        dy = -jnp.einsum("cq,ql,cqj->clj", w, phi1, g2[..., 1])

        L = self.pat_p2.assemble(visc)
        Dx = self.pat_div.assemble(dx)
        Dy = self.pat_div.assemble(dy)
        DxT = self.pat_divT.assemble(jnp.swapaxes(dx, 1, 2))
        DyT = self.pat_divT.assemble(jnp.swapaxes(dy, 1, 2))
        Mp = self.pat_p1.assemble(mass_p1)
        Ap = self.pat_p1.assemble(stiff_p1)
        M2 = self.pat_p2.assemble(mass_p2)
        return ConstOperators(L=L, Dx=Dx, Dy=Dy, DxT=DxT, DyT=DyT, Mp=Mp,
                              Ap=Ap, M2=M2)

    # ------------------------------------------------------------------ #
    def wind_at_quad(self, u: jnp.ndarray) -> jnp.ndarray:
        """Velocity (stacked (2*n2,)) evaluated at cell quad points (nc,nq,2)."""
        ucell = jnp.stack([u[:self.n2][self.cd2], u[self.n2:][self.cd2]],
                          axis=-1)                       # (nc,6,2)
        return jnp.einsum("qi,cid->cqd", self.phi2, ucell)

    def convection_values(self, u: jnp.ndarray) -> jnp.ndarray:
        """Scalar convection N(w) ELL values: N[i,j] = int (w.grad phi_j) phi_i."""
        uq = self.wind_at_quad(u)
        elem = jnp.einsum("cq,qi,cqd,cqjd->cij", self.wdet, self.phi2,
                          uq, self.g2)
        return self.pat_p2.assemble_values(elem)

    def newton_reaction_values(self, u: jnp.ndarray) -> jnp.ndarray:
        """(2,2,n2,K) ELL values of R_ab[i,j] = int phi_j (d_b u_a) phi_i."""
        ucell = jnp.stack([u[:self.n2][self.cd2], u[self.n2:][self.cd2]],
                          axis=-1)                       # (nc,6,a)
        gradu = jnp.einsum("cqib,cia->cqab", self.g2, ucell)
        elem = jnp.einsum("cq,qi,qj,cqab->abcij", self.wdet, self.phi2,
                          self.phi2, gradu)              # (2,2,nc,6,6)
        flat = elem.reshape(4, -1)
        vals = jax.vmap(self.pat_p2.assemble_values)(flat)
        return vals.reshape(2, 2, self.pat_p2.n_rows, self.pat_p2.K)

    def kp_values(self, u: jnp.ndarray, surface: bool = False) -> jnp.ndarray:
        """Pressure convection Kp = (1/nu) int (w.grad p) q dx
        [+ BRM2 inflow surface term when ``surface``]."""
        uq = self.wind_at_quad(u)
        elem = jnp.einsum("cq,ql,cqd,cmd->clm", self.wdet, self.phi1,
                          uq, self.g1) / self.nu
        vals = self.pat_p1.assemble_values(elem)
        if surface and self.n_inflow_facets:
            ucell = jnp.stack([u[:self.n2][self.f_cd2],
                               u[self.n2:][self.f_cd2]], axis=-1)   # (nf,6,2)
            uq_f = jnp.einsum("fqi,fid->fqd", self.f_phi2, ucell)
            un = jnp.einsum("fqd,fd->fq", uq_f, self.f_normals)
            elem_s = -jnp.einsum("fq,fq,fql,fqm->flm", self.f_wlen, un,
                                 self.f_phi1, self.f_phi1) / self.nu
            flat = vals.reshape(-1).at[self.kp_surf_pos].add(elem_s.ravel())
            vals = flat.reshape(vals.shape)
        return vals

    def supg_values(self, u: jnp.ndarray) -> jnp.ndarray:
        """Streamline-diffusion (SUPG) stabilization element values.

        TPU-native counterpart of
        ``fenapack/stabilization.py::StabilizationParameterSD``: the demo adds
        ``delta * (w.grad u)(w.grad v)`` to the *preconditioner* velocity form
        ``J_pc`` so the 00-block subsolve stays robust at high Reynolds
        number.  Parameter (Elman-Silvester-Wathen, Finite Elements and Fast
        Iterative Solvers 2nd ed., sec. 8.3.2 / eq. for delta*):

            Pe_c   = |w|_c h_c / (2 nu)        (cell Peclet number)
            delta  = h_c / (2 |w|_c) * (1 - 1/Pe_c)   if Pe_c > 1 else 0
        """
        uq = self.wind_at_quad(u)                    # (nc,nq,2)
        umag = jnp.sqrt(jnp.sum(uq * uq, axis=-1))   # (nc,nq)
        h = self.h_cell[:, None]
        safe_u = jnp.maximum(umag, 1e-30)
        pe = safe_u * h / (2.0 * self.nu)
        delta = jnp.where(pe > 1.0, h / (2.0 * safe_u) * (1.0 - 1.0 / pe),
                          0.0)
        # (w . grad phi_i) at quad points: (nc, nq, 6)
        wg = jnp.einsum("cqd,cqid->cqi", uq, self.g2)
        elem = jnp.einsum("cq,cq,cqi,cqj->cij", self.wdet, delta, wg, wg)
        return self.pat_p2.assemble_values(elem)

    # ------------------------------------------------------------------ #
    def picard_matrix_values(self, u: jnp.ndarray) -> jnp.ndarray:
        """A1 = nu * L + N(u) scalar ELL values (applied to each component)."""
        return self.nu * self.const.L.vals + self.convection_values(u)

    def residual(self, u: jnp.ndarray, p: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Steady NS residual F(w) with zero body force, natural outflow:
        ``ru = A1(u) u + D^T p``, ``rp = D u`` (BC masking applied by caller)."""
        A1 = ELL(cols=self.pat_p2.cols, vals=self.picard_matrix_values(u),
                 n_cols=self.n2)
        ux, uy = u[:self.n2], u[self.n2:]
        c = self.const
        ru = jnp.concatenate([A1.mv(ux) + c.DxT.mv(p),
                              A1.mv(uy) + c.DyT.mv(p)])
        rp = c.Dx.mv(ux) + c.Dy.mv(uy)
        return ru, rp
