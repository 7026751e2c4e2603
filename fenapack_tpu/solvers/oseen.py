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

import os
from typing import NamedTuple, Optional, Sequence

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
from . import krylov as krylov_mod


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
                 ap_hierarchy=None, velocity_hierarchy=None,
                 theta: float = 1.0, inv_dt: float = 0.0):
        self.asm = asm
        self.config = config
        self.linearization = linearization
        self.enclosed = enclosed
        # theta-scheme parameters: the velocity operator becomes
        # inv_dt*M + theta*A1(wind); steady = (1.0, 0.0)
        self.theta = float(theta)
        self.inv_dt = float(inv_dt)
        dt = _dtype_of(config)
        self.dtype = dt
        n2, n1 = asm.n2, asm.n1
        self.d = asm.dim
        self.n_u = self.d * n2
        self.n = self.n_u + n1

        bc_mask_u, bc_vals_u = merge_bcs(bcs, self.n_u)
        # alignment-padding velocity dofs are pinned to identity rows
        # host copies: device->host fetches cost O(100 s) via the axon tunnel
        u_act = (asm._u_active_np if hasattr(asm, "_u_active_np")
                 else np.asarray(asm.u_active))
        self.u_pad = 1.0 - u_act
        bc_mask_u = np.maximum(bc_mask_u, self.u_pad)
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
        self.pcd_marker = pcd_marker
        self.pcd_mask = jnp.asarray(mask_p, dtype=dt) if self.has_pcd_bcs else None
        # padded pressure dofs are pinned inside every pressure subsolve
        p_pad = (1.0 - asm._p_active_np if hasattr(asm, '_p_active_np')
                 else 1.0 - np.asarray(asm.p_active))
        self.has_p_pad = bool(p_pad.any())
        self.p_pad = jnp.asarray(p_pad, dtype=dt) if self.has_p_pad else None

        self._needs_cast = jnp.dtype(asm.const.L.vals.dtype) != dt
        self._lift_refs = []    # closure-held Holders (dense inverses etc.)
        self._df32_A1 = None
        if config.krylov.df32_matvec:
            self._build_df32()
        self._build_subsolves(ap_hierarchy, velocity_hierarchy)
        # lift_jit: operator/geometry arrays become jit ARGUMENTS — inlined
        # literals overflow the TPU compile-request limit at ~100k dofs
        from ..runtime import lift_jit
        self._lift_roots = (self, asm, ap_hierarchy, velocity_hierarchy)
        self._solve_jit = lift_jit(self._solve_impl, self._lift_roots)

    @property
    def const_lo(self):
        """Constant operators in compute precision.

        LAZY cast (on device, per trace): eager casting would materialize a
        second full set of operator constants, doubling the buffers every
        jit program embeds — at block-sparse fill ratios that overflows
        HLO-size limits (and HBM) long before the math does.
        """
        c = self.asm.const
        if not self._needs_cast:
            return c
        dt = self.dtype
        cast = lambda e: None if e is None else e.with_vals(e.vals.astype(dt))
        from ..fem.assemble import ConstOperators
        return ConstOperators(
            L=cast(c.L), Mp=cast(c.Mp), Ap=cast(c.Ap), M2=cast(c.M2),
            D=tuple(cast(e) for e in c.D),
            DT=tuple(cast(e) for e in c.DT))

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
                         hierarchy=None, nullspace: bool = False):
        """Return a FACTORY for the subsolver of an SPD pressure operator
        (Ap or Mp).

        Two-phase construction: expensive/eager setup (dense inverses,
        spectral bound estimation) runs here at __init__; the factory is
        invoked at *trace time* inside :meth:`_pipeline`, where the
        compute-precision casts of the big operator arrays are emitted as
        on-device ops — one cast per solve, hoisted out of the Krylov loop,
        and no duplicated constant buffers in the program.
        """
        dt = self.dtype
        if cfg.method == "lu":
            bc = jnp.zeros(ell.shape[0], dt) if mask is None else mask
            solve = subsolve.masked_spd_solver_dense(ell, pattern, bc, dt,
                                                     nullspace=nullspace)
            self._lift_refs.append(solve._holder)
            return lambda: solve
        if cfg.method == "lumped":
            dinv = subsolve.lumped_inverse(ell).astype(dt)
            if mask is None:
                return lambda: (lambda r: dinv * r)
            free = 1.0 - mask

            def factory():
                return lambda r: free * dinv * r + mask * r
            return factory
        if cfg.method == "chebyshev":
            diag = ell.diag_from(pattern.diag_pos).astype(dt)
            if mask is not None:
                diag = jnp.where(mask > 0, 1.0, diag)
            dinv = 1.0 / diag
            if cfg.bounds is not None:
                lmin, lmax = cfg.bounds
            else:
                # eager, setup-time: temporary cast not retained
                mv0 = self._masked_spd_matvec(
                    ell.with_vals(ell.vals.astype(dt)), mask)
                lmin, lmax = subsolve.power_bounds(mv0, dinv, ell.shape[0],
                                                   dtype=dt)

            def factory():
                op = ell.with_vals(ell.vals.astype(dt))   # traced cast
                mv = self._masked_spd_matvec(op, mask)
                return subsolve.chebyshev_solver(mv, dinv, lmin, lmax,
                                                 cfg.iters)
            return factory
        if cfg.method == "gmg":
            if bool(getattr(self.asm.W, "reorder", False)) != bool(
                    getattr(hierarchy, "reorder", False)):
                raise ValueError(
                    "pressure GMG ordering mismatch: assembler reorder="
                    f"{getattr(self.asm.W, 'reorder', False)} but "
                    f"hierarchy reorder={getattr(hierarchy, 'reorder', 0)}"
                    " — build both with the same flag (the per-level RCM"
                    " orderings are deterministic and coincide)")
            # the V-cycle's Dirichlet rows come from the hierarchy's own
            # pcd_markers, not from ``mask`` — a silent mismatch would make
            # the Ap subsolve approximate the wrong (e.g. singular Neumann)
            # operator, so validate markers against the solver's at setup
            hmarks = getattr(hierarchy, "pcd_markers", None)
            if hmarks is not None:
                want = {self.pcd_marker} if self.has_pcd_bcs else set()
                if set(hmarks) != want:
                    raise ValueError(
                        f"pressure GMG pcd-marker mismatch: hierarchy built"
                        f" with pcd_markers={tuple(hmarks)} but the solver's"
                        f" PCD Dirichlet rows are {sorted(want)} — rebuild"
                        " the PressureHierarchy with matching markers")
            from .gmg import make_gmg_solver
            solve = make_gmg_solver(hierarchy, cfg, self.dtype, bc_mask=mask)
            return lambda: solve
        raise ValueError(f"unknown subsolve method {cfg.method!r}")

    def _union(self, a, b):
        if a is None:
            return b
        if b is None:
            return a
        return jnp.maximum(a, b)

    def _build_subsolves(self, ap_hierarchy, velocity_hierarchy):
        asm, cfg = self.asm, self.config
        c = asm.const
        self._nullspace = self.enclosed and not self.has_pcd_bcs
        ap_mask = self._union(
            self.pcd_mask if self.has_pcd_bcs else None, self.p_pad)
        self._ap_factory = self._make_spd_solver(
            c.Ap, asm.pat_p1, ap_mask, cfg.pcd.ap, hierarchy=ap_hierarchy,
            nullspace=self._nullspace)
        self._mp_factory = self._make_spd_solver(
            c.Mp, asm.pat_p1, self.p_pad, cfg.pcd.mp)
        self.velocity_hierarchy = velocity_hierarchy

    def _make_pcd_apply(self):
        """Build the PCD apply at trace time (see _make_spd_solver)."""
        asm, cfg = self.asm, self.config
        ap_solve = self._ap_factory()
        mp_solve = self._mp_factory()
        return make_pcd_apply(
            cfg.pcd.variant, ap_solve, mp_solve,
            self.pcd_mask, nullspace=self._nullspace,
            active=asm.p_active if self.has_p_pad else None,
            theta=self.theta, inv_dt=self.inv_dt)

    # back-compat for tests/white-box callers: fresh closures on access;
    # assigning pcd_apply overrides the apply used by the pipeline
    @property
    def pcd_apply(self):
        if getattr(self, "_pcd_override", None) is not None:
            return self._pcd_override
        return self._make_pcd_apply()

    @pcd_apply.setter
    def pcd_apply(self, fn):
        self._pcd_override = fn

    @property
    def ap_solve(self):
        return self._ap_factory()

    @property
    def mp_solve(self):
        return self._mp_factory()

    # -------------------------------------------------------------- #
    def _velocity_solver(self, A1vals, R, wind=None):
        """Build a_solve(r_u) for the current (traced) velocity operator."""
        asm, cfg = self.asm, self.config
        n2 = asm.n2
        dt = self.dtype
        method = cfg.velocity.method
        d = self.d
        if method == "lu":
            # dense masked exact solve (validation scale; exact like MUMPS).
            # Explicit inverse: the apply is one MXU matmul per Krylov
            # iteration instead of sequential triangular backsolves.
            A1 = asm.pat_p2.to_dense(A1vals)
            Z = jnp.zeros_like(A1)
            A = jnp.block([[A1 if a == b else Z for b in range(d)]
                           for a in range(d)])
            if R is not None:
                A = A + jnp.concatenate([
                    jnp.concatenate([
                        asm.pat_p2.to_dense(R[a, b])
                        for b in range(d)], axis=1)
                    for a in range(d)], axis=0)
            free = self.free_u
            A = free[:, None] * A * free[None, :] + jnp.diag(self.bc_mask_u)
            Ainv = jnp.linalg.inv(A)
            return lambda r: Ainv @ r
        if method in ("jacobi", "chebyshev", "minres"):
            # matrix-free fixed-sweep smoothers for the velocity block —
            # the large-3D path (BASELINE config 4: batched subsolves, no
            # factorization); used as a weak-but-cheap PC inside FGMRES
            mv = self._velocity_block_mv(A1vals, R)
            diag1 = asm.pat_p2.matrix(A1vals).diag_from(
                asm.pat_p2.diag_pos)
            diag = jnp.concatenate([diag1] * d)
            if R is not None:
                rdiag = jnp.concatenate([
                    asm.pat_p2.matrix(R[a, a]).diag_from(
                        asm.pat_p2.diag_pos) for a in range(d)])
                diag = diag + rdiag
            diag = jnp.where(self.bc_mask_u > 0, 1.0, diag)
            dinv = 1.0 / diag
            iters = cfg.velocity.iters
            if method == "jacobi":
                omega = 0.7

                def solve(b, mv=mv, dinv=dinv):
                    x = omega * dinv * b
                    for _ in range(iters - 1):
                        x = x + omega * dinv * (b - mv(x))
                    return x
                return solve
            if method == "minres":
                # iterated minimal-residual polynomial: robust on the
                # NONSYMMETRIC velocity block where Chebyshev (an SPD
                # method) stalls — matrix-free like chebyshev, same
                # matvec count per sweep
                from .gmg import _minres_smooth
                rounds = max(1, iters // 4)

                def solve(b, mv=mv, dinv=dinv):
                    x = jnp.zeros_like(b)
                    for _ in range(rounds):
                        x = _minres_smooth(mv, dinv, 4, b, x)
                    return x
                return solve
            bounds = cfg.velocity.bounds or (0.1, 2.0)
            return subsolve.chebyshev_solver(mv, dinv, bounds[0], bounds[1],
                                             iters)
        if method == "gmg":
            from .gmg import make_velocity_gmg_from_wind
            return make_velocity_gmg_from_wind(
                self.velocity_hierarchy, cfg.velocity,
                wind.astype(dt), self.linearization == "newton",
                self.bc_mask_u, self.dtype,
                supg=(cfg.jpc_supg or cfg.system_supg),
                theta=self.theta, inv_dt=self.inv_dt,
                fine_values=(A1vals, R))
        raise ValueError(f"unknown velocity method {method!r}")

    # -------------------------------------------------------------- #
    def _operator_values_raw(self, wind, hi: bool = True):
        """theta-scheme effective operator values in the wind's dtype."""
        c32 = bool(hi) and self.config.krylov.hi_ops_f32
        A1 = self.asm.picard_matrix_values(wind, hi=hi, compute32=c32)
        if self.config.system_supg:
            A1 = A1 + self.asm.supg_values(wind, hi=hi).astype(A1.dtype)
        if self.theta != 1.0 or self.inv_dt != 0.0:
            M2 = (self.asm.const_hi if hi else self.asm.const).M2
            M2vals = (M2.vals if M2 is not None
                      else self.asm.mass2_values(hi=hi))
            A1 = self.theta * A1 + self.inv_dt * M2vals.astype(A1.dtype)
        R = None
        if self.linearization == "newton":
            R = self.asm.newton_reaction_values(wind, hi=hi, compute32=c32)
            if self.theta != 1.0:
                R = self.theta * R
        return A1, R

    def _operator_values(self, wind):
        A1vals, R = self._operator_values_raw(wind, hi=False)
        return (A1vals.astype(self.dtype),
                None if R is None else R.astype(self.dtype))

    def _velocity_block_mv(self, A1vals, R):
        """Matvec of the (bc-masked) d-component velocity block."""
        asm = self.asm
        n2, d = asm.n2, self.d
        A1 = asm.pat_p2.matrix(A1vals)
        free_u, bc_u = self.free_u, self.bc_mask_u

        def mv(x):
            xf = free_u * x
            comps = [xf[a * n2:(a + 1) * n2] for a in range(d)]
            ys = [A1.mv(comps[a]) for a in range(d)]
            if R is not None:
                for a in range(d):
                    for b in range(d):
                        ys[a] = ys[a] + asm.pat_p2.matrix(
                            R[a, b]).mv(comps[b])
            return free_u * jnp.concatenate(ys) + bc_u * x
        return mv

    def _build_df32(self):
        """Double-single Pallas matvec for the hi-precision path
        (``krylov.df32_matvec``): pure-f32 VPU arithmetic reproducing the
        emulated-f64 block matvec to ~1e-12 (ops.pallas_spmv docstring).

        Requires hi_block assembly (f64 operators in the block layout).
        The constant D/DT planes are split EAGERLY here — host context, so
        lift_jit passes them as jit arguments and no trace-time constants
        break GSPMD lowering; the wind-dependent A1 planes are split per
        nonlinear step inside the trace.
        """
        from ..ops.pallas_spmv import DF32BlockSpMV
        from ..runtime import Holder
        asm = self.asm
        if not all(hasattr(p, "nbr") for p in
                   (asm.pat_p2_hi, asm.pat_div_hi, asm.pat_divT_hi)):
            raise ValueError(
                "krylov.df32_matvec requires block-layout f64 operators: "
                "construct NSAssembler with block_size and hi_block=True "
                "(note: patterns evicted by the ops.sparse.block_layout_ok "
                "byte policy fall back to ELL and cannot feed the df32 "
                "kernel)")
        interp = jax.default_backend() != "tpu"
        mk = lambda p: DF32BlockSpMV.from_pattern(p, interpret=interp)
        self._df32_A1 = mk(asm.pat_p2_hi)
        self._df32_DT = mk(asm.pat_divT_hi)
        self._df32_D = mk(asm.pat_div_hi)
        c = asm.const_hi
        self._df32_const = Holder(
            DT=tuple(self._df32_DT.split_tiles(e.tiles) for e in c.DT),
            D=tuple(self._df32_D.split_tiles(e.tiles) for e in c.D))
        self._lift_refs.append(self._df32_const)

    def _matvec_df32(self, A1vals, R):
        """hi matvec via the compensated df32 kernel (see _build_df32).
        Input splits are computed once per component and shared between the
        A1/D applies (and R for Newton); all elementwise masking stays f64
        XLA."""
        asm = self.asm
        n2, n_u, d = asm.n2, self.n_u, self.d
        A1op, DTop, Dop = self._df32_A1, self._df32_DT, self._df32_D
        A1t = A1op.split_tiles(A1vals)            # per-step, in-trace
        Rt = None
        if R is not None:
            Rt = [[A1op.split_tiles(R[a, b]) for b in range(d)]
                  for a in range(d)]
        DTt, Dt = self._df32_const.DT, self._df32_const.D
        free_u, bc_u = self.free_u, self.bc_mask_u

        def matvec(x):
            xu = free_u * x[:n_u]
            comps = [xu[a * n2:(a + 1) * n2] for a in range(d)]
            comp3 = [A1op.split_x(comp) for comp in comps]
            p = x[n_u:]
            p3 = DTop.split_x(p)
            # multi-RHS (all d components in ONE kernel pass over the A1
            # tile planes) is opt-in: the traffic argument says tiles
            # dominate, but MEASURED on chip at the 2D bench scale the
            # d-RHS kernel is ~18% SLOWER per outer iteration (4.28 vs
            # 3.63 ms df32 matvec — the wider VMEM residency costs more
            # pipelining than the shared tile stream saves).  Flip with
            # FENAPACK_MRHS=1 where it measures faster.
            if os.environ.get("FENAPACK_MRHS", "0") == "1":
                yA = A1op(A1t, xs3=comp3)
            else:
                yA = [A1op(A1t, x3=comp3[a]) for a in range(d)]
            ys = [yA[a] + DTop(DTt[a], x3=p3) for a in range(d)]
            if Rt is not None:
                for a in range(d):
                    for b in range(d):
                        ys[a] = ys[a] + A1op(Rt[a][b], x3=comp3[b])
            yu = free_u * jnp.concatenate(ys) + bc_u * x[:n_u]
            yp = sum(Dop(Dt[a], x3=comp3[a]) for a in range(d))
            if self.has_p_pad:
                yp = yp + self.p_pad * p
            return jnp.concatenate([yu, yp])
        return matvec

    def _matvec_factory(self, A1vals, R, hi: bool = False):
        asm = self.asm
        n2, n_u, d = asm.n2, self.n_u, self.d
        if hi and self._df32_A1 is not None:
            return self._matvec_df32(A1vals, R)
        # high-precision values (IR residual path) use the compact ELL f64
        # operators; the compute-precision pipeline uses block/cast copies
        c = asm.const_hi if hi else self.const_lo
        pat = asm.pat_p2_hi if hi else asm.pat_p2
        A1 = pat.matrix(A1vals)
        free_u, bc_u = self.free_u, self.bc_mask_u

        def matvec(x):
            xu = free_u * x[:n_u]
            comps = [xu[a * n2:(a + 1) * n2] for a in range(d)]
            p = x[n_u:]
            ys = [A1.mv(comps[a]) + c.DT[a].mv(p) for a in range(d)]
            if R is not None:
                for a in range(d):
                    for b in range(d):
                        ys[a] = ys[a] + pat.matrix(
                            R[a, b]).mv(comps[b])
            yu = free_u * jnp.concatenate(ys) + bc_u * x[:n_u]
            yp = sum(c.D[a].mv(comps[a]) for a in range(d))
            if self.has_p_pad:
                yp = yp + self.p_pad * p     # identity on padding rows
            return jnp.concatenate([yu, yp])
        return matvec

    def _bt_mv(self, p):
        c = self.const_lo
        return jnp.concatenate([c.DT[a].mv(p) for a in range(self.d)])

    # -------------------------------------------------------------- #
    def _solve_impl(self, wind, b):
        cfg = self.config
        matvec, pc = self._pipeline(wind)
        return fgmres(matvec, pc, b, maxiter=cfg.krylov.maxiter,
                      rtol=cfg.krylov.rtol, atol=cfg.krylov.atol,
                      reorth_eta=cfg.krylov.reorth_eta)

    def solve(self, wind: jnp.ndarray, b: jnp.ndarray) -> FGMRESResult:
        """Solve the Oseen system linearized at ``wind`` with RHS ``b``."""
        return self._solve_jit(wind.astype(self.dtype), b.astype(self.dtype))

    def solve_batch(self, wind: jnp.ndarray, B: jnp.ndarray):
        """Solve one linearized system against a BATCH of right-hand sides
        (B: (nb, n)) with a single vmapped FGMRES program — the TPU
        batch-of-problems axis the MPI reference has no analogue for
        (SURVEY.md section 2.3): parameter sweeps, multiple forcings,
        adjoint/sensitivity RHS all amortize one operator setup.

        Returns ``(X, iters, converged)`` with leading batch axes.

        TPU precision caveat: under vmap the CGS2 projections lower as
        BATCHED matmuls, which the MXU runs at reduced precision (see
        doc/tpu_design.md) — residual estimates are trustworthy to ~1e-6
        relative here, so use rtol >= 1e-6 in compute f32 (the IR/hi paths
        cover tighter tolerances one RHS at a time).
        """
        from ..runtime import lift_jit

        # cache the lifted jit wrapper: a fresh wrapper per call would
        # retrace (and re-compile) the whole vmapped FGMRES program
        fn = getattr(self, "_solve_batch_jit", None)
        if fn is None:
            def batched(w_, B_):
                def one(b):
                    r = self._solve_impl(w_, b)
                    return r.x, r.iters, r.converged
                return jax.vmap(one)(B_)

            fn = self._solve_batch_jit = lift_jit(batched, self._lift_roots)
        return fn(wind.astype(self.dtype), B.astype(self.dtype))

    # -------------------------------------------------------------- #
    def _pipeline(self, wind):
        """Build (matvec, pc) for the compute-precision pipeline at ``wind``
        — shared by the one-shot solve and the fused-IR solve (where the
        velocity factorization must be hoisted out of the IR loop)."""
        cfg = self.config
        A1vals, R = self._operator_values(wind)
        kpvals = self.asm.kp_values(
            wind, surface=(cfg.pcd.variant == "BRM2")).astype(self.dtype)
        kp = self.asm.pat_p1.matrix(kpvals)
        matvec = self._matvec_factory(A1vals, R)
        A1pc = A1vals
        if cfg.jpc_supg and not cfg.system_supg:
            # system_supg folds SUPG into A1vals already
            A1pc = A1vals + self.asm.supg_values(wind).astype(self.dtype)
        a_solve = self._velocity_solver(A1pc, R, wind=wind)
        pcd = self.pcd_apply        # bind ONCE per trace (casts hoist here)
        schur_solve = lambda r_p: pcd(kp, r_p)
        pc = make_fieldsplit_upper(self.n_u, a_solve, schur_solve,
                                   self._bt_mv, self.free_u)
        return matvec, pc

    # ---- split-assembly pipeline (near-HBM-capacity problems) -------- #
    def _pipeline_values(self, wind):
        """ASSEMBLY half of :meth:`_pipeline`: every wind-dependent value
        as one pytree.  Runs as its own device program under
        ``krylov.split_assembly`` so the element-tensor einsums (the
        dominant, heavily tile-padded HLO temps at 3D scale — see
        gmg.velocity_gmg_values docstring) never share a program with the
        FGMRES loop."""
        cfg = self.config
        A1vals, R = self._operator_values(wind)
        kpvals = self.asm.kp_values(
            wind, surface=(cfg.pcd.variant == "BRM2")).astype(self.dtype)
        A1pc = None
        if cfg.jpc_supg and not cfg.system_supg:
            A1pc = A1vals + self.asm.supg_values(wind).astype(self.dtype)
        gvals = None
        if cfg.velocity.method == "gmg":
            from .gmg import velocity_gmg_values
            gvals = velocity_gmg_values(
                self.velocity_hierarchy, wind.astype(self.dtype),
                self.linearization == "newton", self.bc_mask_u,
                self.dtype, supg=(cfg.jpc_supg or cfg.system_supg),
                theta=self.theta, inv_dt=self.inv_dt,
                fine_values=(A1pc if A1pc is not None else A1vals, R))
        return {"A1vals": A1vals, "R": R, "kpvals": kpvals,
                "A1pc": A1pc, "gmg": gvals}

    def _pipeline_from_values(self, vals):
        """CLOSURE half of :meth:`_pipeline`: (matvec, pc) from
        pre-assembled values — no element-tensor assembly in the trace."""
        cfg = self.config
        A1vals, R = vals["A1vals"], vals["R"]
        kp = self.asm.pat_p1.matrix(vals["kpvals"])
        matvec = self._matvec_factory(A1vals, R)
        A1pc = vals["A1pc"] if vals["A1pc"] is not None else A1vals
        if cfg.velocity.method == "gmg":
            from .gmg import make_velocity_gmg_from_values
            a_solve = make_velocity_gmg_from_values(
                self.velocity_hierarchy, cfg.velocity, vals["gmg"],
                self.bc_mask_u, self.dtype)
        else:
            a_solve = self._velocity_solver(A1pc, R)
        pcd = self.pcd_apply
        schur_solve = lambda r_p: pcd(kp, r_p)
        pc = make_fieldsplit_upper(self.n_u, a_solve, schur_solve,
                                   self._bt_mv, self.free_u)
        return matvec, pc

    def _solve_vals_impl(self, vals, b):
        cfg = self.config
        matvec, pc = self._pipeline_from_values(vals)
        return fgmres(matvec, pc, b, maxiter=cfg.krylov.maxiter,
                      rtol=cfg.krylov.rtol, atol=cfg.krylov.atol,
                      reorth_eta=cfg.krylov.reorth_eta)

    def _split_jits(self):
        from ..runtime import lift_jit
        if not hasattr(self, "_values_jit"):
            self._values_jit = lift_jit(self._pipeline_values,
                                        self._lift_roots)
            self._solve_vals_jit = lift_jit(self._solve_vals_impl,
                                            self._lift_roots)
        return self._values_jit, self._solve_vals_jit

    def _solve_hi_body(self, pc, wind, b, rtol):
        """One high-honesty FGMRES solve: hi (df32/emulated-f64) outer
        matvec, f32 preconditioner, residual estimate trusted to the f64
        level — so a single round reaches targets the f32 estimate floor
        (~3e-5 per round) needs many stalling rounds for.  ``rtol`` is a
        traced scalar: per-IR-round targets don't recompile."""
        cfg = self.config
        dt_hi = jnp.dtype(self.asm.dtype)
        A1h, Rh = self._operator_values_raw(wind.astype(dt_hi), hi=True)
        matvec_hi = self._matvec_factory(A1h, Rh, hi=True)
        b_hi = b.astype(dt_hi)
        if cfg.krylov.ds_basis:
            return krylov_mod.fgmres_ds(
                matvec_hi, pc, b_hi, maxiter=cfg.krylov.maxiter,
                rtol=rtol, reorth_eta=cfg.krylov.reorth_eta)
        pc_hi = lambda r: pc(r.astype(self.dtype)).astype(dt_hi)
        return fgmres(matvec_hi, pc_hi, b_hi,
                      maxiter=cfg.krylov.maxiter, rtol=rtol,
                      reorth_eta=cfg.krylov.reorth_eta)

    def _solve_hi_vals_impl(self, vals, wind, b, rtol):
        _, pc = self._pipeline_from_values(vals)
        return self._solve_hi_body(pc, wind, b, rtol)

    def _solve_hi_wind_impl(self, wind, b, rtol):
        _, pc = self._pipeline(wind.astype(self.dtype))
        return self._solve_hi_body(pc, wind, b, rtol)

    def _hi_jits(self):
        from ..runtime import lift_jit
        if not hasattr(self, "_solve_hi_vals_jit"):
            self._solve_hi_vals_jit = lift_jit(self._solve_hi_vals_impl,
                                               self._lift_roots)
            self._solve_hi_wind_jit = lift_jit(self._solve_hi_wind_impl,
                                               self._lift_roots)
        return self._solve_hi_vals_jit, self._solve_hi_wind_jit

    def initial_recycle(self):
        """Empty GCRO-DR recycle space matching ``config.krylov.recycle``
        (single home for the dtype rule: the hi-Krylov space lives in the
        assembler precision, otherwise in compute precision)."""
        kcfg = self.config.krylov
        dt = (jnp.dtype(self.asm.dtype) if kcfg.hi_krylov else self.dtype)
        return krylov_mod.empty_recycle(kcfg.recycle, self.n, dt)

    def make_ir_solve(self, rtol: float = 1e-8, max_rounds: int = 8,
                      _jit: bool = True):
        """Return a JITTED ``(wind, b) -> (x, total_iters, true_resnorm)``
        running the whole mixed-precision iterative refinement loop on
        device (``lax.while_loop`` over rounds) — one host round-trip per
        linear solve instead of one per IR round.

        High-precision true residuals use the assembler dtype (f64); the
        velocity factorization and PCD setup are hoisted out of the loop
        (loop-invariant), unlike the host-loop :meth:`solve_ir` which
        refactors every round.
        """
        dt_hi = jnp.dtype(self.asm.dtype)
        cfg = self.config
        kr = cfg.krylov.recycle
        if cfg.krylov.hi_krylov and \
                jnp.zeros((), dt_hi).dtype != jnp.dtype("float64"):
            # without jax_enable_x64 every "f64" array silently truncates
            # to f32 and the hi-Krylov residual estimate is dishonest
            # (solves stall ~1e-4 relative) — fail loudly instead
            raise RuntimeError(
                "krylov.hi_krylov requires x64 semantics: call "
                "fenapack_tpu.jax_setup.setup(x64=True) (or "
                "jax.config.update('jax_enable_x64', True)) before "
                "building the solver")

        def ir(wind, b, rec=None):
            wind_hi = wind.astype(dt_hi)
            A1h, Rh = self._operator_values_raw(wind_hi, hi=True)
            matvec_hi = self._matvec_factory(A1h, Rh, hi=True)
            matvec, pc = self._pipeline(wind.astype(self.dtype))
            if cfg.krylov.hi_krylov:
                # single-round f64 FGMRES with the f32 preconditioner
                pc_hi = lambda r: pc(r.astype(self.dtype)).astype(dt_hi)
                b64 = b.astype(dt_hi)
                if kr:
                    if rec is None:
                        rec = krylov_mod.empty_recycle(kr, b.shape[0], dt_hi)
                    # factorizations in compute precision: f64 QR/eigh
                    # lowerings stall the axon TPU compile service
                    rec = krylov_mod.refresh_recycle(
                        matvec_hi, rec, factor_dtype=self.dtype)
                    res, rec = krylov_mod.fgmres_dr(
                        matvec_hi, pc_hi, b64, rec,
                        maxiter=cfg.krylov.maxiter, rtol=rtol,
                        factor_dtype=self.dtype,
                        reorth_eta=cfg.krylov.reorth_eta)
                elif cfg.krylov.ds_basis:
                    # f32-in/f32-out PC for the ds loop (no f64 casts on
                    # the n-vector path)
                    res = krylov_mod.fgmres_ds(
                        matvec_hi, pc, b64,
                        maxiter=cfg.krylov.maxiter, rtol=rtol,
                        reorth_eta=cfg.krylov.reorth_eta)
                else:
                    res = fgmres(matvec_hi, pc_hi, b64,
                                 maxiter=cfg.krylov.maxiter, rtol=rtol,
                                 reorth_eta=cfg.krylov.reorth_eta)
                rn = jnp.linalg.norm(b64 - matvec_hi(res.x))
                if kr:
                    return res.x, res.iters, rn, rec
                return res.x, res.iters, rn
            if cfg.krylov.hi_matvec:
                # outer matvec at high precision (PC/Krylov algebra stay
                # f32): raises the per-round attainable reduction
                matvec = lambda x: matvec_hi(
                    x.astype(dt_hi)).astype(self.dtype)
            if kr:
                if rec is None:
                    rec = krylov_mod.empty_recycle(kr, b.shape[0],
                                                   self.dtype)
                # the operator changed since the recycle space was built
                # (previous nonlinear step / time step): re-bind C = A U
                rec = krylov_mod.refresh_recycle(matvec, rec)

            b_hi = b.astype(dt_hi)
            bnorm = jnp.linalg.norm(b_hi)
            tol = jnp.maximum(rtol * bnorm, 1e-300)
            x0 = jnp.zeros_like(b_hi)

            # carry holds the TRUE residual (r, rn) of the current x, so
            # termination is exact and no correction is wasted.  ``att`` is
            # the believed per-round attainable true-residual reduction
            # (config prior, raised online whenever a round falls well
            # short of its target — evidence of larger estimate drift).
            att0 = jnp.asarray(cfg.krylov.ir_attainable, dt_hi)
            safety = cfg.krylov.ir_safety

            def cond(c):
                k, x, r, rn, att, total, rec = c
                return jnp.logical_and(k < max_rounds, rn > tol)

            def body(c):
                k, x, r, rn, att, total, rec = c
                scale = jnp.where(rn > 0, rn, 1.0)
                # schedule: split the remaining TRUE reduction evenly over
                # the minimum number of rounds a single round's attainable
                # accuracy allows — a lopsided split either over-solves
                # (estimate grinds below the true-residual stall) or misses
                # by a hair and pays a whole extra round.
                needed = jnp.clip(tol / scale, 1e-30, 1.0)
                n_r = jnp.maximum(jnp.ceil(jnp.log(needed)
                                           / jnp.log(att)), 1.0)
                target = jnp.exp(jnp.log(needed) / n_r)
                # estimate target undershoots the true target (drift margin);
                # floored at the est-attainable cfg tolerance, capped at 1e-2
                rtol_k = jnp.clip(target * safety, cfg.krylov.rtol, 1e-2)
                rhs = (r / scale).astype(self.dtype)
                if kr:
                    res, rec = krylov_mod.fgmres_dr(
                        matvec, pc, rhs, rec, maxiter=cfg.krylov.maxiter,
                        rtol=rtol_k.astype(self.dtype),
                        reorth_eta=cfg.krylov.reorth_eta)
                else:
                    res = fgmres(matvec, pc, rhs,
                                 maxiter=cfg.krylov.maxiter,
                                 rtol=rtol_k.astype(self.dtype),
                                 reorth_eta=cfg.krylov.reorth_eta)
                x = x + scale * res.x.astype(dt_hi)
                r = b_hi - matvec_hi(x)
                rn_new = jnp.linalg.norm(r)
                achieved = rn_new / scale
                # fell well short of the round target => the stall level is
                # higher than believed; adopt it (with margin) for the rest
                att = jnp.where(achieved > 4.0 * target,
                                jnp.maximum(att, 1.5 * achieved), att)
                return (k + 1, x, r, rn_new, att, total + res.iters, rec)

            k, x, r, rn, att, total, rec = jax.lax.while_loop(
                cond, body, (jnp.array(0, jnp.int32), x0, b_hi, bnorm,
                             att0, jnp.array(0, jnp.int32), rec))
            if kr:
                return x, total, rn, rec
            return x, total, rn

        # _jit=False for callers composing ir into a larger lifted jit
        if not _jit:
            return ir
        from ..runtime import lift_jit
        return lift_jit(ir, self._lift_roots)

    def make_true_residual(self):
        """Lifted ``(wind, x, b) -> (r, |r|)`` with the high-precision
        operator REBUILT from the wind inside the program (no per-call
        constants => no recompilation across IR rounds, small program)."""
        from ..runtime import lift_jit

        def true_res(wind, x, b):
            dt_hi = jnp.dtype(self.asm.dtype)
            A1h, Rh = self._operator_values_raw(wind.astype(dt_hi), hi=True)
            mv = self._matvec_factory(A1h, Rh, hi=True)
            r = b.astype(dt_hi) - mv(x)
            return r, jnp.linalg.norm(r)

        return lift_jit(true_res, self._lift_roots)

    def solve_ir(self, wind, b, rtol: float = 1e-8, atol: float = 0.0,
                 max_rounds: int = 12):
        """Mixed-precision iterative refinement to ``rtol`` on the TRUE
        residual.

        TPU is f32-native; a single f32 FGMRES stagnates near sqrt(eps) of
        the problem scale.  The production path to the reference's 1e-8
        tolerance (BASELINE.json metric) is classic IR: correction solves run
        in the configured (f32) pipeline, true residuals are evaluated with
        the assembler's high-precision operator (f64, XLA-emulated on TPU —
        one SpMV per round, off the hot path).  Returns
        ``(x, total_inner_iters, true_resnorms)``.
        """
        dt_hi = jnp.dtype(self.asm.dtype)
        wind_hi = wind.astype(dt_hi)
        if not hasattr(self, "_true_res_fn"):
            self._true_res_fn = self.make_true_residual()

        b_hi = b.astype(dt_hi)
        bnorm = float(jnp.linalg.norm(b_hi))
        tol = max(rtol * bnorm, atol)
        x = jnp.zeros_like(b_hi)
        wind_lo = wind.astype(self.dtype)
        vals = None
        if self.config.krylov.split_assembly:
            # assemble ONCE per wind as its own device program; each IR
            # round's solve program then takes the operator values as
            # arguments — no element-tensor temps inside the Krylov
            # while_loop (the 2.05M config-4 OOM class), and no per-round
            # re-assembly
            values_jit, solve_vals_jit = self._split_jits()
            vals = values_jit(wind_lo)
        use_hi = self.config.krylov.hi_krylov
        if use_hi:
            hi_vals_jit, hi_wind_jit = self._hi_jits()
        hist = []
        total = 0
        for rnd in range(max_rounds):
            if rnd:
                r, rn = self._true_res_fn(wind_hi, x, b_hi)
                rn = float(rn)
            else:
                r, rn = b_hi, bnorm
            hist.append(rn)
            if rn <= tol or rn == 0.0:
                break
            if use_hi:
                # honest (f64-level) residual estimate: target the FULL
                # remaining reduction in one round — restores oracle-like
                # outer counts where per-round f32 floors inflate them
                # (the cylinder mixed-path multiplier, VERDICT r4 weak #1)
                rt = jnp.asarray(max(tol / rn, 1e-14), dt_hi)
                r_sc = (r / rn).astype(dt_hi)
                # full-precision wind: the hi round's operator is the
                # accuracy-bearing one (the f32 wind only feeds the PC)
                res = (hi_vals_jit(vals, wind_hi, r_sc, rt)
                       if vals is not None
                       else hi_wind_jit(wind_hi, r_sc, rt))
            else:
                r_lo = (r / rn).astype(self.dtype)
                res = (solve_vals_jit(vals, r_lo) if vals is not None
                       else self._solve_jit(wind_lo, r_lo))
            total += int(res.iters)
            x = x + rn * res.x.astype(dt_hi)
        return x, total, hist
