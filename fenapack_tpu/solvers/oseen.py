"""The Oseen linear solver: FGMRES + upper Schur fieldsplit + PCD, one jit.

This is the TPU-native counterpart of the whole L1/L2 stack of the reference
(SURVEY.md section 1): ``fenapack/field_split.py::PCDKrylovSolver`` +
``fenapack/field_split_backend.py::PCDInterface`` + the petsc4py PC wiring.
Where the reference configures PETSc objects through an options database and
grabs sub-KSPs after ``PCSetUp`` (SURVEY.md section 3.2 notes the finicky
ordering), here the preconditioner is plain function composition and the
*entire* linear solve — operator assembly from the current wind, PCD setup,
FGMRES iteration — compiles to a single XLA program per (mesh, config).

Monolithic vector layout: ``x = [u_x (n2); u_y (n2); p (n1)]``.
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..fem.assemble import NSAssembler
from ..fem.dofmap import DirichletBC, merge_bcs
from ..fem import mesh as meshmod
from ..ops.sparse import ELL
from ..ops import subsolve
from .config import SolverConfig, SubsolveConfig
from .pcd import make_pcd_apply
from .fieldsplit import make_fieldsplit_upper
from .krylov import fgmres, FGMRESResult


def _dtype_of(cfg: SolverConfig):
    return jnp.dtype(cfg.dtype)


class OseenSolver:
    """Factory for jitted PCD-preconditioned Oseen solves on one mesh.

    Parameters
    ----------
    asm : assembled operator context (constant operators live here)
    bcs : velocity Dirichlet BCs
    config : solver configuration (Krylov / PCD / velocity subsolve)
    linearization : "picard" | "newton" (static; selects the operator)
    enclosed : no outflow — pressure defined up to a constant (cavity);
        activates nullspace projection (SURVEY.md 2.1 item 4 parity)
    pcd_marker : facet marker holding the PCD Dirichlet dofs; defaults to
        INFLOW for BRM1 and OUTFLOW for BRM2 (fenapack demo convention)
    """

    def __init__(self, asm: NSAssembler, bcs: Sequence[DirichletBC],
                 config: SolverConfig = SolverConfig(),
                 linearization: str = "picard",
                 enclosed: bool = False,
                 pcd_marker: Optional[int] = None,
                 ap_hierarchy=None, velocity_hierarchy=None):
        self.asm = asm
        self.config = config
        self.linearization = linearization
        self.enclosed = enclosed
        dt = _dtype_of(config)
        self.dtype = dt
        n2, n1 = asm.n2, asm.n1
        self.n_u = 2 * n2
        self.n = 2 * n2 + n1

        bc_mask_u, bc_vals_u = merge_bcs(bcs, self.n_u)
        self.bc_mask_u = jnp.asarray(bc_mask_u, dtype=dt)
        self.bc_vals_u = jnp.asarray(bc_vals_u, dtype=dt)
        self.free_u = 1.0 - self.bc_mask_u

        variant = config.pcd.variant
        if pcd_marker is None:
            pcd_marker = (meshmod.INFLOW if variant == "BRM1"
                          else meshmod.OUTFLOW)
        pcd_dofs = asm.W.Q.facet_dofs([pcd_marker])
        mask_p = np.zeros(n1)
        mask_p[pcd_dofs] = 1.0
        self.has_pcd_bcs = pcd_dofs.shape[0] > 0
        self.pcd_mask = jnp.asarray(mask_p, dtype=dt) if self.has_pcd_bcs else None

        self._build_subsolves(ap_hierarchy, velocity_hierarchy)
        self._solve_jit = jax.jit(self._solve_impl)

    # -------------------------------------------------------------- #
    def _masked_spd_matvec(self, ell: ELL, mask: Optional[jnp.ndarray]):
        """Symmetric bc-elimination: free A free + I_bc (identity on bc dofs)."""
        if mask is None:
            return ell.mv
        free = 1.0 - mask

        def mv(x):
            return free * ell.mv(free * x) + mask * x
        return mv

    def _make_spd_solver(self, ell: ELL, pattern, mask, cfg: SubsolveConfig,
                         hierarchy=None, level_ops=None):
        """Subsolver for an SPD pressure operator (Ap or Mp)."""
        dt = self.dtype
        if cfg.method == "lu":
            bc = np.zeros(ell.shape[0]) if mask is None else np.asarray(mask)
            return subsolve.masked_spd_solver_dense(
                ELL(ell.cols, ell.vals.astype(dt), ell.n_cols), pattern, bc, dt)
        if cfg.method == "lumped":
            dinv = subsolve.lumped_inverse(ell).astype(dt)
            if mask is None:
                return lambda r: dinv * r
            free = 1.0 - mask
            return lambda r: free * dinv * r + mask * r
        if cfg.method == "chebyshev":
            mv = self._masked_spd_matvec(
                ELL(ell.cols, ell.vals.astype(dt), ell.n_cols), mask)
            diag = ell.diag_from(pattern.diag_pos).astype(dt)
            if mask is not None:
                diag = jnp.where(mask > 0, 1.0, diag)
            dinv = 1.0 / diag
            if cfg.bounds is not None:
                lmin, lmax = cfg.bounds
            else:
                lmin, lmax = subsolve.power_bounds(mv, dinv, ell.shape[0],
                                                  dtype=dt)
            return subsolve.chebyshev_solver(mv, dinv, lmin, lmax, cfg.iters)
        if cfg.method == "gmg":
            from .gmg import make_gmg_solver
            return make_gmg_solver(hierarchy, cfg, self.dtype, bc_mask=mask)
        raise ValueError(f"unknown subsolve method {cfg.method!r}")

    def _build_subsolves(self, ap_hierarchy, velocity_hierarchy):
        asm, cfg = self.asm, self.config
        c = asm.const
        nullspace = self.enclosed and not self.has_pcd_bcs
        self.ap_solve = self._make_spd_solver(
            c.Ap, asm.pat_p1,
            self.pcd_mask if self.has_pcd_bcs else None,
            cfg.pcd.ap, hierarchy=ap_hierarchy)
        self.mp_solve = self._make_spd_solver(
            c.Mp, asm.pat_p1, None, cfg.pcd.mp)
        self.pcd_apply = make_pcd_apply(
            cfg.pcd.variant, self.ap_solve, self.mp_solve,
            self.pcd_mask, nullspace=nullspace)
        self.velocity_hierarchy = velocity_hierarchy

    # -------------------------------------------------------------- #
    def _ell_to_dense(self, vals: jnp.ndarray, cols: jnp.ndarray,
                      n_rows: int, n_cols: int) -> jnp.ndarray:
        dense = jnp.zeros((n_rows, n_cols), dtype=vals.dtype)
        rows = jnp.broadcast_to(jnp.arange(n_rows)[:, None], cols.shape)
        return dense.at[rows, cols].add(vals)

    def _velocity_solver(self, A1vals, R):
        """Build a_solve(r_u) for the current (traced) velocity operator."""
        asm, cfg = self.asm, self.config
        n2 = asm.n2
        dt = self.dtype
        method = cfg.velocity.method
        if method == "lu":
            # dense masked LU each call (validation scale; exact like MUMPS)
            A1 = self._ell_to_dense(A1vals, asm.pat_p2.cols, n2, n2)
            Z = jnp.zeros_like(A1)
            A = jnp.block([[A1, Z], [Z, A1]])
            if R is not None:
                A = A + jnp.concatenate([
                    jnp.concatenate([
                        self._ell_to_dense(R[a, b], asm.pat_p2.cols, n2, n2)
                        for b in range(2)], axis=1)
                    for a in range(2)], axis=0)
            free = self.free_u
            A = free[:, None] * A * free[None, :] + jnp.diag(self.bc_mask_u)
            lu, piv = jax.scipy.linalg.lu_factor(A)
            return lambda r: jax.scipy.linalg.lu_solve((lu, piv), r)
        if method == "gmg":
            from .gmg import make_velocity_gmg_solver
            return make_velocity_gmg_solver(
                self.velocity_hierarchy, cfg.velocity, A1vals, R,
                self.bc_mask_u, self.dtype)
        raise ValueError(f"unknown velocity method {method!r}")

    # -------------------------------------------------------------- #
    def _operator_values(self, wind):
        A1vals = self.asm.picard_matrix_values(wind).astype(self.dtype)
        R = None
        if self.linearization == "newton":
            R = self.asm.newton_reaction_values(wind).astype(self.dtype)
        return A1vals, R

    def _matvec_factory(self, A1vals, R):
        asm = self.asm
        n2, n_u = asm.n2, self.n_u
        c = asm.const
        A1 = ELL(asm.pat_p2.cols, A1vals, n2)
        free_u, bc_u = self.free_u, self.bc_mask_u

        def matvec(x):
            xu = free_u * x[:n_u]
            ux, uy = xu[:n2], xu[n2:]
            p = x[n_u:]
            yx = A1.mv(ux) + c.DxT.mv(p)
            yy = A1.mv(uy) + c.DyT.mv(p)
            if R is not None:
                R00 = ELL(asm.pat_p2.cols, R[0, 0], n2)
                R01 = ELL(asm.pat_p2.cols, R[0, 1], n2)
                R10 = ELL(asm.pat_p2.cols, R[1, 0], n2)
                R11 = ELL(asm.pat_p2.cols, R[1, 1], n2)
                yx = yx + R00.mv(ux) + R01.mv(uy)
                yy = yy + R10.mv(ux) + R11.mv(uy)
            yu = free_u * jnp.concatenate([yx, yy]) + bc_u * x[:n_u]
            yp = c.Dx.mv(ux) + c.Dy.mv(uy)
            return jnp.concatenate([yu, yp])
        return matvec

    def _bt_mv(self, p):
        c = self.asm.const
        return jnp.concatenate([c.DxT.mv(p), c.DyT.mv(p)])

    # -------------------------------------------------------------- #
    def _solve_impl(self, wind, b):
        cfg = self.config
        A1vals, R = self._operator_values(wind)
        kpvals = self.asm.kp_values(
            wind, surface=(cfg.pcd.variant == "BRM2")).astype(self.dtype)
        kp = ELL(self.asm.pat_p1.cols, kpvals, self.asm.n1)

        matvec = self._matvec_factory(A1vals, R)
        a_solve = self._velocity_solver(A1vals, R)
        schur_solve = lambda r_p: self.pcd_apply(kp, r_p)
        pc = make_fieldsplit_upper(self.n_u, a_solve, schur_solve,
                                   self._bt_mv, self.free_u)
        return fgmres(matvec, pc, b, maxiter=cfg.krylov.maxiter,
                      rtol=cfg.krylov.rtol, atol=cfg.krylov.atol)

    def solve(self, wind: jnp.ndarray, b: jnp.ndarray) -> FGMRESResult:
        """Solve the Oseen system linearized at ``wind`` with RHS ``b``."""
        return self._solve_jit(wind.astype(self.dtype), b.astype(self.dtype))
