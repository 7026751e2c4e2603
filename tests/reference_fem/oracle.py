"""Reference ("oracle") FEM implementation: NumPy/scipy, loop-based, exact LU.

This module operationalizes the FEniCS+PETSc reference that cannot run here
(see SURVEY.md section 4 / BASELINE.md): an *independently coded* Taylor-Hood
P2/P1 assembly (explicit per-cell Python loops, scipy sparse) plus a dense
NumPy flexible GMRES whose PCD preconditioner uses exact sparse-LU subsolves
(the analogue of fenapack's ``--ls direct`` path with MUMPS/UMFPACK,
SURVEY.md section 2.2 item 5).

Golden outputs consumed by the test-suite:
  * assembled operators (entrywise comparison target for the JAX assembly),
  * outer FGMRES iteration counts for BRM1/BRM2 on the demo problems
    (the 10% parity band of BASELINE.json is measured against these).

The PCD math follows SURVEY.md section 0/3.4, i.e. fenapack's
``fenapack/preconditioners.py::PCDPC_BRM1/BRM2`` semantics:
  BRM1:  y = -Mp^{-1} (x + Kp Ap_bc^{-1} x_hat),  bcs on inflow
  BRM2:  y = -(w1 + Ap_bc^{-1} chop(Kp w1)), w1 = Mp^{-1} x, bcs on outflow,
         kp including the inflow surface term -(1/nu) (w.n) p q ds.
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

# Quadrature: independent tables (degree-5 Dunavant, same rule family as any
# standard FEM code; re-derived here rather than imported from the package).
_QP = np.array([
    [1 / 3, 1 / 3],
    [0.470142064105115, 0.470142064105115],
    [0.059715871789770, 0.470142064105115],
    [0.470142064105115, 0.059715871789770],
    [0.101286507323456, 0.101286507323456],
    [0.797426985353087, 0.101286507323456],
    [0.101286507323456, 0.797426985353087],
])
_QW = 0.5 * np.array([0.225,
                      0.132394152788506, 0.132394152788506, 0.132394152788506,
                      0.125939180544827, 0.125939180544827, 0.125939180544827])


def _bary(p):
    return np.array([1.0 - p[0] - p[1], p[0], p[1]])


def _p1_at(p):
    lam = _bary(p)
    grad = np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])
    return lam, grad


def _p2_at(p):
    lam, dlam = _p1_at(p)
    phi = np.empty(6)
    dphi = np.empty((6, 2))
    for k in range(3):
        phi[k] = lam[k] * (2 * lam[k] - 1)
        dphi[k] = (4 * lam[k] - 1) * dlam[k]
    for k in range(3):
        i, j = (k + 1) % 3, (k + 2) % 3
        phi[3 + k] = 4 * lam[i] * lam[j]
        dphi[3 + k] = 4 * (lam[i] * dlam[j] + lam[j] * dlam[i])
    return phi, dphi


# Precompute basis tables at quadrature points.
_P1 = [_p1_at(p) for p in _QP]
_P2 = [_p2_at(p) for p in _QP]


def p2_cell_dofs(mesh):
    nv = mesh.num_vertices
    return np.concatenate([mesh.cells, nv + mesh.cell_edges], axis=1)


class OracleOperators:
    """All Taylor-Hood operators on a mesh, scipy CSR, loop-assembled."""

    def __init__(self, mesh, nu):
        self.mesh = mesh
        self.nu = float(nu)
        self.n2 = mesh.num_vertices + mesh.num_edges    # scalar P2 dim
        self.n1 = mesh.num_vertices                     # P1 dim
        self.nu_dofs = 2 * self.n2
        self.cd2 = p2_cell_dofs(mesh)
        self.cd1 = mesh.cells
        self._geometry()
        self._assemble_constant()

    def _geometry(self):
        v = self.mesh.vertices[self.mesh.cells]
        self.J = np.stack([v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]], axis=2)  # (nc,2,2)
        self.detJ = np.linalg.det(self.J)
        self.Jinv = np.linalg.inv(self.J)

    def _cell_grads(self, c):
        """Physical gradients of P2 and P1 bases at each quad point for cell c.

        With xi = Jinv (x - x0), the chain rule gives
        grad_x phi[i, d] = sum_k dphi[i, k] Jinv[k, d]  (i.e. ``dphi @ Jinv``).
        """
        Jc = self.Jinv[c]
        g2 = [dphi @ Jc for (_, dphi) in _P2]
        g1 = _P1[0][1] @ Jc     # constant for P1
        return g2, g1

    def _assemble_constant(self):
        """Viscous block (scalar), divergence, pressure mass/stiffness."""
        nc = self.mesh.num_cells
        rows_a, cols_a, vals_a = [], [], []
        rows_b, cols_b, vals_b = [], [], []
        rows_m, cols_m, vals_m = [], [], []
        rows_k, cols_k, vals_k = [], [], []
        for c in range(nc):
            d2, d1 = self.cd2[c], self.cd1[c]
            g2, g1 = self._cell_grads(c)
            det = abs(self.detJ[c])
            Avisc = np.zeros((6, 6))
            Mp = np.zeros((3, 3))
            Ap = np.zeros((3, 3))
            Dx = np.zeros((3, 6))
            Dy = np.zeros((3, 6))
            for q, w in enumerate(_QW):
                phi2 = _P2[q][0]
                phi1 = _P1[q][0]
                G = g2[q]
                Avisc += w * det * (G @ G.T)
                Mp += w * det * np.outer(phi1, phi1)
                Ap += w * det * (g1 @ g1.T)
                # divergence rows: D[l, j] = -int psi_l d(phi_j)/dx_a
                Dx += -w * det * np.outer(phi1, G[:, 0])
                Dy += -w * det * np.outer(phi1, G[:, 1])
            for i in range(6):
                for j in range(6):
                    rows_a.append(d2[i]); cols_a.append(d2[j]); vals_a.append(Avisc[i, j])
            for l in range(3):
                for j in range(6):
                    rows_b.append(d1[l]); cols_b.append(d2[j]); vals_b.append(Dx[l, j])
                    rows_b.append(d1[l]); cols_b.append(self.n2 + d2[j]); vals_b.append(Dy[l, j])
                for m in range(3):
                    rows_m.append(d1[l]); cols_m.append(d1[m]); vals_m.append(Mp[l, m])
                    rows_k.append(d1[l]); cols_k.append(d1[m]); vals_k.append(Ap[l, m])
        n2, n1 = self.n2, self.n1
        self.L_scalar = sp.csr_matrix((vals_a, (rows_a, cols_a)), shape=(n2, n2))
        self.D = sp.csr_matrix((vals_b, (rows_b, cols_b)), shape=(n1, 2 * n2))
        self.Mp_raw = sp.csr_matrix((vals_m, (rows_m, cols_m)), shape=(n1, n1))
        self.Ap = sp.csr_matrix((vals_k, (rows_k, cols_k)), shape=(n1, n1))
        self.Mp = self.Mp_raw / self.nu      # fenapack demo scaling mp = (1/nu) p q dx

    def convection(self, wind):
        """N(w): vector-P2 convection matrix with wind w (stacked u-vector)."""
        wx, wy = wind[:self.n2], wind[self.n2:]
        rows, cols, vals = [], [], []
        for c in range(self.mesh.num_cells):
            d2 = self.cd2[c]
            g2, _ = self._cell_grads(c)
            det = abs(self.detJ[c])
            N = np.zeros((6, 6))
            for q, w in enumerate(_QW):
                phi2 = _P2[q][0]
                uq = np.array([phi2 @ wx[d2], phi2 @ wy[d2]])
                N += w * det * np.outer(phi2, g2[q] @ uq)
            for i in range(6):
                for j in range(6):
                    rows.append(d2[i]); cols.append(d2[j]); vals.append(N[i, j])
        return sp.csr_matrix((vals, (rows, cols)), shape=(self.n2, self.n2))

    def newton_reaction(self, ustate):
        """R[(i,a),(j,b)] = int phi_j (d_b u_a) phi_i for Newton Jacobian."""
        ux, uy = ustate[:self.n2], ustate[self.n2:]
        rows, cols, vals = [], [], []
        for c in range(self.mesh.num_cells):
            d2 = self.cd2[c]
            g2, _ = self._cell_grads(c)
            det = abs(self.detJ[c])
            R = np.zeros((2, 2, 6, 6))       # (a, b, i, j)
            for q, w in enumerate(_QW):
                phi2 = _P2[q][0]
                G = g2[q]
                gradu = np.stack([G.T @ ux[d2], G.T @ uy[d2]])   # (a=row: d_b u_a) (2,2)
                P = np.outer(phi2, phi2)
                for a in range(2):
                    for b in range(2):
                        R[a, b] += w * det * gradu[a, b] * P
            for a in range(2):
                for b in range(2):
                    for i in range(6):
                        for j in range(6):
                            rows.append(a * self.n2 + d2[i])
                            cols.append(b * self.n2 + d2[j])
                            vals.append(R[a, b, i, j])
        return sp.csr_matrix((vals, (rows, cols)), shape=(2 * self.n2, 2 * self.n2))

    def kp(self, wind, inflow_facets=None):
        """Kp(w) = (1/nu) int (w . grad p) q dx  [+ BRM2 surface term if
        ``inflow_facets`` (edge-id array) is given:
        -(1/nu) int_{Gamma_in} (w.n) p q ds]."""
        wx, wy = wind[:self.n2], wind[self.n2:]
        rows, cols, vals = [], [], []
        for c in range(self.mesh.num_cells):
            d2, d1 = self.cd2[c], self.cd1[c]
            g2, g1 = self._cell_grads(c)
            det = abs(self.detJ[c])
            K = np.zeros((3, 3))
            for q, w in enumerate(_QW):
                phi2 = _P2[q][0]
                phi1 = _P1[q][0]
                uq = np.array([phi2 @ wx[d2], phi2 @ wy[d2]])
                K += w * det * np.outer(phi1, g1 @ uq)
            K /= self.nu
            for l in range(3):
                for m in range(3):
                    rows.append(d1[l]); cols.append(d1[m]); vals.append(K[l, m])
        Kp = sp.csr_matrix((vals, (rows, cols)), shape=(self.n1, self.n1))
        if inflow_facets is not None and len(inflow_facets):
            Kp = Kp + self._kp_surface(wind, inflow_facets)
        return Kp

    def _kp_surface(self, wind, facet_ids):
        """-(1/nu) int_G (w.n) p q ds over the given boundary facet (edge) ids."""
        mesh = self.mesh
        wx, wy = wind[:self.n2], wind[self.n2:]
        # 3-pt Gauss on [0,1]
        t = np.array([0.5 - np.sqrt(15) / 10, 0.5, 0.5 + np.sqrt(15) / 10])
        wq = np.array([5 / 18, 8 / 18, 5 / 18])
        rows, cols, vals = [], [], []
        bf_list = list(mesh.boundary_facets)
        normals = mesh.facet_normals()
        for eid in facet_ids:
            bidx = bf_list.index(eid)
            c = mesh.facet_cells[bidx]
            n = normals[bidx]
            va, vb = mesh.edges[eid]
            a, b = mesh.vertices[va], mesh.vertices[vb]
            length = np.linalg.norm(b - a)
            d2, d1 = self.cd2[c], self.cd1[c]
            # local edge index within the cell
            cell_v = list(mesh.cells[c])
            la, lb = cell_v.index(va), cell_v.index(vb)
            k = 3 - la - lb   # the opposite local vertex = local edge id
            K = np.zeros((3, 3))
            verts_ref = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
            i_loc, j_loc = (k + 1) % 3, (k + 2) % 3
            # Reference edge runs i_loc -> j_loc; match physical param direction.
            if cell_v[i_loc] != va:
                i_loc, j_loc = j_loc, i_loc
            for tq, w in zip(t, wq):
                pref = (1 - tq) * verts_ref[i_loc] + tq * verts_ref[j_loc]
                phi2, _ = _p2_at(pref)
                phi1, _ = _p1_at(pref)
                uq = np.array([phi2 @ wx[d2], phi2 @ wy[d2]])
                un = uq @ n
                K += -w * length / self.nu * un * np.outer(phi1, phi1)
            for l in range(3):
                for m in range(3):
                    rows.append(d1[l]); cols.append(d1[m]); vals.append(K[l, m])
        return sp.csr_matrix((vals, (rows, cols)), shape=(self.n1, self.n1))

    def picard_matrix(self, wind):
        """Monolithic Oseen matrix [[A, D^T], [D, 0]] with A = nu L + N(wind)."""
        A1 = self.nu * self.L_scalar + self.convection(wind)
        A = sp.block_diag([A1, A1]).tocsr()
        Z = sp.csr_matrix((self.n1, self.n1))
        return sp.bmat([[A, self.D.T], [self.D, Z]]).tocsr()

    def newton_matrix(self, wind):
        A1 = self.nu * self.L_scalar + self.convection(wind)
        A = (sp.block_diag([A1, A1]) + self.newton_reaction(wind)).tocsr()
        Z = sp.csr_matrix((self.n1, self.n1))
        return sp.bmat([[A, self.D.T], [self.D, Z]]).tocsr()

    def residual(self, w):
        """F(w) for steady NS with zero body force (natural outflow)."""
        u = w[:self.nu_dofs]
        p = w[self.nu_dofs:]
        A1 = self.nu * self.L_scalar + self.convection(u)
        ru = np.concatenate([A1 @ u[:self.n2], A1 @ u[self.n2:]]) + self.D.T @ p
        rp = self.D @ u
        return np.concatenate([ru, rp])


def apply_bc_rows(A, bc_dofs):
    """Nonsymmetric elimination: zero rows, 1.0 on the diagonal (PETSc MatZeroRows)."""
    A = A.tolil(copy=True)
    for d in bc_dofs:
        A.rows[d] = [d]
        A.data[d] = [1.0]
    return A.tocsr()


def mask_system(A, bc_mask):
    """Symmetric Dirichlet elimination on the monolithic matrix (masked form)."""
    free = sp.diags(1.0 - bc_mask)
    pin = sp.diags(bc_mask)
    return (free @ A @ free + pin).tocsr()


class OraclePCD:
    """Exact-subsolve PCD preconditioner (BRM1/BRM2)."""

    def __init__(self, ops: OracleOperators, variant: str, pcd_bc_dofs, wind,
                 inflow_facets=None, nullspace=False):
        self.ops = ops
        self.variant = variant
        self.bc = np.asarray(pcd_bc_dofs, dtype=np.int64)
        self.nullspace = nullspace
        self._inflow_facets = inflow_facets
        Ap = apply_bc_rows(ops.Ap, self.bc) if len(self.bc) else ops.Ap.copy()
        if nullspace and not len(self.bc):
            # pure Neumann: pin dof 0, project constants out of in/out instead
            Ap = apply_bc_rows(Ap, [0])
        self.Ap_lu = spla.splu(Ap.tocsc())
        self.Mp_lu = spla.splu(ops.Mp.tocsc())
        self.update(wind)

    def update(self, wind):
        infl = self._inflow_facets if self.variant == "BRM2" else None
        self.Kp = self.ops.kp(wind, inflow_facets=infl)

    def _ap_solve(self, r):
        if self.nullspace:
            r = r - r.mean()
            z = self.Ap_lu.solve(r)
            return z - z.mean()
        return self.Ap_lu.solve(r)

    def apply(self, x):
        if self.variant == "BRM1":
            xh = x.copy()
            xh[self.bc] = 0.0
            w1 = self._ap_solve(xh)
            w2 = self.Kp @ w1 + x
            return -self.Mp_lu.solve(w2)
        elif self.variant == "BRM2":
            w1 = self.Mp_lu.solve(x)
            w2 = self.Kp @ w1
            w2[self.bc] = 0.0
            w3 = self._ap_solve(w2)
            return -(w1 + w3)
        raise ValueError(self.variant)


class OracleFieldsplit:
    """Upper-triangular Schur fieldsplit: z_p = S^-1 r_p; z_u = A^-1 (r_u - B^T z_p)."""

    def __init__(self, ops, A_uu_masked, pcd: OraclePCD, bc_mask_u):
        self.ops = ops
        self.A_lu = spla.splu(A_uu_masked.tocsc())
        self.pcd = pcd
        self.free_u = 1.0 - bc_mask_u

    def apply(self, r):
        nu_dofs = self.ops.nu_dofs
        r_u, r_p = r[:nu_dofs], r[nu_dofs:]
        z_p = self.pcd.apply(r_p)
        rhs = self.free_u * (r_u - self.ops.D.T @ z_p)
        z_u = self.A_lu.solve(rhs) + 0.0
        # BC dofs: increment = residual (identity block)
        z_u = self.free_u * z_u + (1.0 - self.free_u) * r_u
        return np.concatenate([z_u, z_p])


def fgmres(matvec, b, pc_apply, rtol=1e-8, atol=1e-12, maxiter=200, restart=None):
    """Right-preconditioned flexible GMRES (no restart by default).

    Returns (x, iters, res_history).  Mirrors PETSc KSPFGMRES semantics used by
    ``fenapack/field_split.py::PCDKrylovSolver`` (right PC, unpreconditioned
    residual norm convergence test).
    """
    n = b.shape[0]
    m = maxiter if restart is None else restart
    x = np.zeros(n)
    hist = []
    total = 0
    while True:
        r = b - matvec(x)
        beta = np.linalg.norm(r)
        if total == 0:
            tol = max(rtol * beta, atol)
        hist.append(beta)
        if beta <= tol or total >= maxiter:
            return x, total, np.array(hist)
        V = np.zeros((m + 1, n))
        Z = np.zeros((m, n))
        H = np.zeros((m + 1, m))
        cs, sn = np.zeros(m), np.zeros(m)
        g = np.zeros(m + 1)
        g[0] = beta
        V[0] = r / beta
        k = 0
        for k in range(m):
            Z[k] = pc_apply(V[k])
            w = matvec(Z[k])
            for i in range(k + 1):          # modified Gram-Schmidt
                H[i, k] = w @ V[i]
                w -= H[i, k] * V[i]
            H[k + 1, k] = np.linalg.norm(w)
            if H[k + 1, k] > 1e-300:
                V[k + 1] = w / H[k + 1, k]
            # apply existing Givens rotations
            for i in range(k):
                t = cs[i] * H[i, k] + sn[i] * H[i + 1, k]
                H[i + 1, k] = -sn[i] * H[i, k] + cs[i] * H[i + 1, k]
                H[i, k] = t
            denom = np.hypot(H[k, k], H[k + 1, k])
            cs[k], sn[k] = H[k, k] / denom, H[k + 1, k] / denom
            H[k, k] = denom
            H[k + 1, k] = 0.0
            g[k + 1] = -sn[k] * g[k]
            g[k] = cs[k] * g[k]
            total += 1
            hist.append(abs(g[k + 1]))
            if abs(g[k + 1]) <= tol or total >= maxiter:
                break
        y = np.linalg.solve(H[:k + 1, :k + 1], g[:k + 1])
        x = x + Z[:k + 1].T @ y
        if hist[-1] <= tol or total >= maxiter:
            # recompute true residual once for honesty
            return x, total, np.array(hist)
