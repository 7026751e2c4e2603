"""User-supplied-form PCD solver: the ``PCDAssembler`` API of the reference.

Mirrors ``fenapack/assembling.py::PCDAssembler`` +
``fenapack/nonlinear_solvers.py::PCDNonlinearProblem`` (SURVEY.md section
2.1 items 2 and 7) for problems whose variational forms differ from the
built-in Navier-Stokes ones: the user writes arbitrary forms in the
:mod:`fenapack_tpu.fem.forms` language (J, F, optional J_pc, and the PCD
forms ``mp, ap, kp`` or ``fp``), and this module assembles them into the
same jit solve pipeline (FGMRES + upper Schur fieldsplit + PCD) the
built-in path uses.

Reference lifecycle parity (``PCDForm`` flags): forms without coefficients
(``mp``, ``ap``) are assembled ONCE at construction; coefficient-dependent
forms (``J``, ``kp``, ``fp``) are re-assembled as pure jit value updates at
every nonlinear iteration.  The ``fp`` form enables the non-factored PCD
applies ``-Mp^{-1} Fp Ap^{-1}`` (BRM1) / ``-Ap^{-1} Fp Mp^{-1}`` (BRM2).
``gp`` (pressure-gradient form) follows the reference's B^T-from-form
semantics: when given, the fieldsplit's gradient application uses the
operator assembled from ``gp`` instead of the system matrix's up-block
(constant lifecycle — assembled once at construction).
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..fem import forms as F
from ..fem.dofmap import DirichletBC, TaylorHood, merge_bcs
from ..ops import subsolve
from .config import SolverConfig
from .krylov import fgmres, FGMRESResult
from .fieldsplit import make_fieldsplit_upper
from .pcd import make_pcd_apply


class PCDAssembler:
    """Collect user forms and assemble operators on demand.

    Parameters mirror the reference ctor
    (``PCDAssembler(a, L, bcs, a_pc=None, mp=..., ap=..., kp=..., fp=...,
    gp=..., bcs_pcd=[...])``); ``w`` names the coefficient carrying the
    current nonlinear iterate inside the forms.
    """

    def __init__(self, a: F.Form, L: F.Form, bcs: Sequence[DirichletBC],
                 a_pc: Optional[F.Form] = None,
                 mp: Optional[F.Form] = None, ap: Optional[F.Form] = None,
                 kp: Optional[F.Form] = None, fp: Optional[F.Form] = None,
                 gp: Optional[F.Form] = None,
                 bcs_pcd: Sequence[DirichletBC] = (),
                 w: Optional[F.Coefficient] = None,
                 W: Optional[TaylorHood] = None,
                 coefficients: Optional[Dict[str, jnp.ndarray]] = None,
                 quad_degree: int = 5, dtype=jnp.float64):
        if W is None:
            if w is None:
                raise ValueError("pass W or a coefficient w to infer it")
            W = w.W
        self.W = W
        self.w = w
        self.fc = F.FormCompiler(W, quad_degree=quad_degree, dtype=dtype)
        self.dtype = dtype
        self._a, self._L, self._a_pc = a, L, a_pc
        self._mp, self._ap, self._kp = mp, ap, kp
        self._fp, self._gp = fp, gp
        self.bcs = list(bcs)
        self.bcs_pcd = list(bcs_pcd)
        # extra fixed coefficients (body forces, material fields, ...):
        # name -> mixed-space dof values, merged into every assembly (the
        # reference binds such functions inside the UFL forms themselves)
        self.coefficients = dict(coefficients or {})

        # constant forms: assembled once (PCDForm const flag)
        self._mp_vals = (self.fc.assemble_block(mp, "p", "p",
                                                coeffs=self.coefficients)
                         if mp is not None else None)
        self._ap_vals = (self.fc.assemble_block(ap, "p", "p",
                                                coeffs=self.coefficients)
                         if ap is not None else None)

    # ------------------------------------------------------------- #
    def function_space(self) -> TaylorHood:
        return self.W

    def _coeffs(self, x) -> Dict[str, jnp.ndarray]:
        c = dict(self.coefficients)
        if self.w is not None:
            c[self.w.name] = x
        return c

    def system_matrix(self, x) -> Dict[str, jnp.ndarray]:
        """Block values of J(x): keys 'uu', 'up', 'pu', 'pp'."""
        c = self._coeffs(x)
        fc = self.fc
        return {
            "uu": fc.assemble_block(self._a, "u", "u", coeffs=c),
            "up": fc.assemble_block(self._a, "u", "p", coeffs=c),
            "pu": fc.assemble_block(self._a, "p", "u", coeffs=c),
            "pp": fc.assemble_block(self._a, "p", "p", coeffs=c),
        }

    def pc_matrix(self, x) -> Optional[jnp.ndarray]:
        """uu-block values of J_pc (None if no separate PC form given)."""
        if self._a_pc is None:
            return None
        return self.fc.assemble_block(self._a_pc, "u", "u",
                                      coeffs=self._coeffs(x))

    def rhs_vector(self, x) -> jnp.ndarray:
        """Residual vector F(x) (the reference's rhs is -F with BC rows
        handled by the driver; masking here matches the built-in path)."""
        c = self._coeffs(x)
        ru = self.fc.assemble_vector(self._L, "u", coeffs=c)
        rp = self.fc.assemble_vector(self._L, "p", coeffs=c)
        return jnp.concatenate([ru, rp])

    def ap(self) -> Optional[jnp.ndarray]:
        return self._ap_vals

    def mp(self) -> Optional[jnp.ndarray]:
        return self._mp_vals

    def kp(self, x) -> Optional[jnp.ndarray]:
        if self._kp is None:
            return None
        return self.fc.assemble_block(self._kp, "p", "p",
                                      coeffs=self._coeffs(x))

    def fp(self, x) -> Optional[jnp.ndarray]:
        if self._fp is None:
            return None
        return self.fc.assemble_block(self._fp, "p", "p",
                                      coeffs=self._coeffs(x))

    def gp(self) -> Optional[jnp.ndarray]:
        if self._gp is None:
            return None
        return self.fc.assemble_block(self._gp, "u", "p",
                                      coeffs=self.coefficients)

    def pcd_bcs(self) -> Sequence[DirichletBC]:
        return self.bcs_pcd


class PCDKrylovSolver:
    """FGMRES + upper Schur fieldsplit + PCD over a :class:`PCDAssembler`.

    The generic-form counterpart of :class:`fenapack_tpu.solvers.oseen
    .OseenSolver` and of the reference's
    ``fenapack/field_split.py::PCDKrylovSolver`` + ``init_pcd`` wiring: the
    operators come from the assembler's user forms instead of the built-in
    factored assembly.  Subsolves: dense-LU velocity/Ap/Mp (validation
    scale) or Chebyshev via ``config`` — the same SubsolveConfig knobs.
    """

    def __init__(self, assembler: PCDAssembler,
                 config: SolverConfig = SolverConfig()):
        self.asm = assembler
        self.config = config
        W = assembler.W
        self.W = W
        self.n_u = W.dim_u
        self.n = W.dim
        dt = jnp.dtype(config.dtype)
        self.dtype = dt
        fc = assembler.fc

        bc_mask_u, bc_vals_u = merge_bcs(assembler.bcs, self.n_u)
        self.bc_mask_u = jnp.asarray(bc_mask_u, dt)
        self.bc_vals_u = jnp.asarray(bc_vals_u, dt)
        self.free_u = 1.0 - self.bc_mask_u

        pcd_dofs = np.concatenate(
            [bc.dofs for bc in assembler.bcs_pcd]) if assembler.bcs_pcd \
            else np.zeros(0, np.int32)
        mask_p = np.zeros(W.dim_p)
        mask_p[pcd_dofs] = 1.0
        self.has_pcd_bcs = pcd_dofs.shape[0] > 0
        self.pcd_mask = (jnp.asarray(mask_p, dt) if self.has_pcd_bcs
                         else None)
        self._nullspace = not self.has_pcd_bcs

        # gp (B^T-from-form, reference fenapack/assembling.py gp semantics):
        # when given, the FIELDSPLIT's gradient application z_u =
        # A^{-1}(r_u - B^T z_p) uses the operator assembled from the user's
        # gp form instead of the system matrix's up-block — the PC can then
        # differ from J (e.g. J carries stabilization terms that should not
        # enter the Schur composition).  Constant lifecycle: assembled once.
        gp_vals = assembler.gp()
        self._gp_op = (fc.pattern("u", "p").matrix(gp_vals.astype(dt))
                       if gp_vals is not None else None)

        # constant pressure subsolves (built once)
        self._lift_refs = []      # Holders of dense inverses (lift_jit)
        self._ap_solve = self._spd_solver(
            assembler.ap(), self.pcd_mask, config.pcd.ap,
            nullspace=self._nullspace)
        self._mp_solve = self._spd_solver(
            assembler.mp(), None, config.pcd.mp)

        from ..runtime import lift_jit
        self._lift_roots = (self, assembler, fc)
        self._solve_jit = lift_jit(self._solve_impl, self._lift_roots)

    # ------------------------------------------------------------- #
    def _spd_solver(self, vals, mask, cfg, nullspace: bool = False):
        if vals is None:
            return None
        fc = self.asm.fc
        pat = fc.pattern("p", "p")
        dt = self.dtype
        ell = pat.matrix(vals.astype(dt))
        if cfg.method == "lu":
            bc = (np.zeros(ell.shape[0]) if mask is None
                  else np.asarray(mask))
            solve = subsolve.masked_spd_solver_dense(
                ell, pat, bc, dt, nullspace=nullspace)
            self._lift_refs.append(solve._holder)
            return solve
        if cfg.method == "lumped":
            dinv = subsolve.lumped_inverse(ell).astype(dt)
            if mask is None:
                return lambda r: dinv * r
            free = 1.0 - mask
            return lambda r: free * dinv * r + mask * r
        if cfg.method == "chebyshev":
            diag = ell.diag_from(pat.diag_pos).astype(dt)
            if mask is not None:
                diag = jnp.where(mask > 0, 1.0, diag)
            dinv = 1.0 / diag
            mv = self._masked_mv(ell, mask)
            if cfg.bounds is not None:
                lmin, lmax = cfg.bounds
            else:
                lmin, lmax = subsolve.power_bounds(mv, dinv, ell.shape[0],
                                                   dtype=dt)
            return subsolve.chebyshev_solver(mv, dinv, lmin, lmax, cfg.iters)
        raise ValueError(f"unsupported subsolve {cfg.method!r} for "
                         "custom-form problems")

    @staticmethod
    def _masked_mv(ell, mask):
        if mask is None:
            return ell.mv
        free = 1.0 - mask

        def mv(x):
            return free * ell.mv(free * x) + mask * x
        return mv

    # ------------------------------------------------------------- #
    def _block_matvec(self, blocks):
        fc = self.asm.fc
        n_u = self.n_u
        Auu = fc.pattern("u", "u").matrix(blocks["uu"].astype(self.dtype))
        Aup = fc.pattern("u", "p").matrix(blocks["up"].astype(self.dtype))
        Apu = fc.pattern("p", "u").matrix(blocks["pu"].astype(self.dtype))
        App = fc.pattern("p", "p").matrix(blocks["pp"].astype(self.dtype))
        free_u, bc_u = self.free_u, self.bc_mask_u

        def matvec(x):
            xu = free_u * x[:n_u]
            p = x[n_u:]
            yu = free_u * (Auu.mv(xu) + Aup.mv(p)) + bc_u * x[:n_u]
            yp = Apu.mv(xu) + App.mv(p)
            return jnp.concatenate([yu, yp])
        return matvec, Auu

    def _velocity_solver(self, Auu, pc_vals):
        cfg = self.config.velocity
        fc = self.asm.fc
        pat = fc.pattern("u", "u")
        vals = pc_vals.astype(self.dtype) if pc_vals is not None \
            else Auu.vals
        if cfg.method == "lu":
            A = pat.to_dense(vals)
            free = self.free_u
            A = free[:, None] * A * free[None, :] + jnp.diag(self.bc_mask_u)
            Ainv = jnp.linalg.inv(A)
            return lambda r: Ainv @ r
        if cfg.method in ("jacobi", "chebyshev"):
            op = pat.matrix(vals)
            diag = op.diag_from(pat.diag_pos)
            diag = jnp.where(self.bc_mask_u > 0, 1.0, diag)
            dinv = 1.0 / diag
            mv = self._masked_mv(op, self.bc_mask_u)
            if cfg.method == "jacobi":
                iters, omega = cfg.iters, 0.7

                def solve(b):
                    x = omega * dinv * b
                    for _ in range(iters - 1):
                        x = x + omega * dinv * (b - mv(x))
                    return x
                return solve
            bounds = cfg.bounds or (0.1, 2.0)
            return subsolve.chebyshev_solver(mv, dinv, bounds[0], bounds[1],
                                             cfg.iters)
        raise ValueError(f"unsupported velocity method {cfg.method!r}")

    def _pcd_apply(self, x):
        """PCD Schur solve closure for the current iterate ``x``."""
        asm = self.asm
        fc = asm.fc
        variant = self.config.pcd.variant
        pat = fc.pattern("p", "p")
        if asm._fp is not None:
            # non-factored apply with the user's full Fp form:
            # S^{-1} ~= -Mp^{-1} Fp Ap^{-1} (Kay-Loghin-Wathen order).
            # Only meaningful for BRM1: BRM2's Olshanskii-Vassilevski
            # variant is inherently factored (the exact nu*Ap*Ap^{-1} = I
            # folding interacts with the outflow BC rows; composing the raw
            # Fp there degrades the PC badly - measured stall at 100 iters).
            if variant != "BRM1":
                raise ValueError("fp form is only supported with BRM1")
            fp = pat.matrix(asm.fp(x).astype(self.dtype))
            ap_solve, mp_solve = self._ap_solve, self._mp_solve
            mask = self.pcd_mask
            chop = ((lambda r: r) if mask is None
                    else (lambda r: (1.0 - mask) * r))

            def schur(r):
                w1 = ap_solve(chop(r))
                z = fp.mv(w1)
                if mask is not None:
                    # repair bc rows: the masked Ap solve reproduces chop(r)
                    # only on free rows; (Fp w1)_bc is garbage relative to
                    # the factored apply's r_bc, and Mp^{-1} would spread
                    # that difference globally (measured 33% apply error)
                    z = z + mask * (r - z)
                return -mp_solve(z)
            return schur
        kp = pat.matrix(asm.kp(x).astype(self.dtype))
        apply = make_pcd_apply(variant, self._ap_solve, self._mp_solve,
                               self.pcd_mask, nullspace=self._nullspace)
        return lambda r: apply(kp, r)

    # ------------------------------------------------------------- #
    def _solve_impl(self, x_lin, b):
        cfg = self.config
        blocks = self.asm.system_matrix(x_lin)
        matvec, Auu = self._block_matvec(blocks)
        a_solve = self._velocity_solver(Auu, self.asm.pc_matrix(x_lin))
        schur = self._pcd_apply(x_lin)
        if self._gp_op is not None:
            bt_mv = self._gp_op.mv       # B^T from the user's gp form
        else:
            bt_mv = self.asm.fc.pattern("u", "p").matrix(
                blocks["up"].astype(self.dtype)).mv
        pc = make_fieldsplit_upper(self.n_u, a_solve, schur,
                                   bt_mv, self.free_u)
        return fgmres(matvec, pc, b, maxiter=cfg.krylov.maxiter,
                      rtol=cfg.krylov.rtol, atol=cfg.krylov.atol)

    def solve(self, x_lin: jnp.ndarray, b: jnp.ndarray) -> FGMRESResult:
        """One linear solve: J(x_lin) dx = b."""
        return self._solve_jit(x_lin.astype(self.dtype),
                               b.astype(self.dtype))


class PCDNewtonSolver:
    """Nonlinear driver over (PCDAssembler, PCDKrylovSolver) — the generic
    counterpart of the reference's ``PCDNewtonSolver``/
    ``PCDNonlinearProblem`` pair.  Picard vs Newton is chosen by which
    bilinear form the user passed as J (reference semantics)."""

    def __init__(self, solver: PCDKrylovSolver):
        self.solver = solver
        self.asm = solver.asm
        from ..runtime import lift_jit

        free_u = solver.free_u
        n_u = solver.n_u

        def residual(x):
            r = self.asm.rhs_vector(x)
            ru = free_u * r[:n_u]
            rp = r[n_u:]
            if solver._nullspace:
                rp = rp - jnp.mean(rp)
            return jnp.concatenate([ru, rp])

        self._residual = lift_jit(residual, solver._lift_roots)

    def initial_state(self) -> jnp.ndarray:
        s = self.solver
        x = jnp.zeros(s.n, dtype=s.dtype)
        return x.at[:s.n_u].set(s.bc_mask_u * s.bc_vals_u)

    def solve(self, x0: Optional[jnp.ndarray] = None, *, rtol: float = 1e-5,
              atol: float = 1e-12, max_steps: int = 25,
              verbose: bool = False):
        s = self.solver
        x = self.initial_state() if x0 is None else x0.astype(s.dtype)
        res_hist: List[float] = []
        it_hist: List[int] = []
        r0 = None
        converged = False
        for k in range(max_steps):
            Fv = self._residual(x)
            rn = float(jnp.linalg.norm(Fv))
            res_hist.append(rn)
            if r0 is None:
                r0 = rn if rn > 0 else 1.0
            if verbose:
                print(f"  step {k:2d}: |F| = {rn:.3e}")
            if rn <= max(rtol * r0, atol):
                converged = True
                break
            result = s.solve(x, -Fv)
            it_hist.append(int(result.iters))
            dx = result.x
            if s._nullspace:
                dx = dx.at[s.n_u:].add(-jnp.mean(dx[s.n_u:]))
            x = x + dx
        return x, res_hist, it_hist, converged
