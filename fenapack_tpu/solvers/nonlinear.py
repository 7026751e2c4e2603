"""Nonlinear drivers: Picard and Newton Oseen iterations.

TPU-native counterpart of ``fenapack/nonlinear_solvers.py::PCDNewtonSolver``
+ ``PCDNonlinearProblem`` (SURVEY.md section 2.1 item 7).  As in the
reference, Picard vs Newton is just a different linearized operator inside
the same loop; the loop itself runs in host Python (it is O(10) iterations of
O(ms) jit calls), while residual evaluation and the linear solve are jitted.

Extras beyond the reference loop (needed for the high-Re configs of
BASELINE.json): optional damping and Reynolds continuation helpers.
"""
from __future__ import annotations

import dataclasses
import time
from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..fem.assemble import NSAssembler
from ..fem.dofmap import DirichletBC
from .config import SolverConfig
from .oseen import OseenSolver


@dataclasses.dataclass
class NonlinearResult:
    w: jnp.ndarray                 # converged state [u_x; u_y; p]
    nonlinear_res: List[float]
    linear_iters: List[int]
    linear_resnorms: List[np.ndarray]
    converged: bool
    wall_time: float

    @property
    def total_linear_iters(self) -> int:
        return int(sum(self.linear_iters))


class NonlinearSolver:
    """Picard/Newton driver around :class:`OseenSolver`."""

    def __init__(self, asm: NSAssembler, bcs: Sequence[DirichletBC],
                 config: SolverConfig = SolverConfig(),
                 linearization: str = "picard", enclosed: bool = False,
                 pcd_marker: Optional[int] = None,
                 ap_hierarchy=None, velocity_hierarchy=None):
        self.asm = asm
        self.enclosed = enclosed
        self.linearization = linearization
        self.oseen = OseenSolver(asm, bcs, config, linearization=linearization,
                                 enclosed=enclosed, pcd_marker=pcd_marker,
                                 ap_hierarchy=ap_hierarchy,
                                 velocity_hierarchy=velocity_hierarchy)
        dt = self.oseen.dtype
        self.n_u, self.n = self.oseen.n_u, self.oseen.n

        free_u = self.oseen.free_u
        n_u = self.n_u
        n2 = asm.n2
        encl = enclosed

        p_active = asm.p_active.astype(dt)
        n_p_active = float(asm.n1_real)

        ssupg = config.system_supg

        def residual(w):
            u, p = w[:n_u], w[n_u:]
            ru, rp = asm.residual(u, p, supg=ssupg)
            ru = free_u * ru.astype(dt)
            rp = rp.astype(dt)
            if encl:
                rp = rp - (jnp.sum(rp * p_active) / n_p_active) * p_active
            return jnp.concatenate([ru, rp])

        from ..runtime import lift_jit
        self._residual = lift_jit(residual, self.oseen._lift_roots)
        # lifted-wrapper cache for make_step_ir/make_full_solve (a fresh
        # wrapper per call would recompile the fused programs every solve)
        self._jit_cache = {}

    def make_step_ir(self, rtol_lin: float = 1e-8, max_rounds: int = 8):
        """Fully fused nonlinear step for the TPU production path: ONE jitted
        call does high-precision residual evaluation + the whole
        mixed-precision IR linear solve (f32 FGMRES corrections, f64 true
        residuals, velocity factorization hoisted) + state update.

        Returns ``step(w) -> (w_new, |F|, inner_iters, lin_resnorm)`` with
        ``w`` carried in the assembler (high) precision.  This collapses the
        ~6 host round-trips per nonlinear step of the plain path into one —
        the dominant cost at small problem sizes on a remote-attached TPU.

        With ``config.krylov.recycle > 0`` the step becomes
        ``step(w, rec) -> (w_new, |F|, iters, rn, rec_new)``: the GCRO-DR
        recycle space is threaded through consecutive nonlinear steps
        (seed with :meth:`initial_recycle`).
        """
        key = ("step", rtol_lin, max_rounds)
        hit = self._jit_cache.get(key)
        if hit is not None:
            return hit
        asm = self.asm
        n_u = self.n_u
        dt_hi = jnp.dtype(asm.dtype)
        free_u = self.oseen.free_u.astype(dt_hi)
        encl = self.enclosed
        p_active = asm.p_active.astype(dt_hi)
        n_p_real = float(asm.n1_real)
        ir = self.oseen.make_ir_solve(rtol_lin, max_rounds, _jit=False)
        kr = self.oseen.config.krylov.recycle

        ssupg = self.oseen.config.system_supg
        c32 = self.oseen.config.krylov.hi_res_f32

        def residual_of(w):
            u, p = w[:n_u], w[n_u:]
            ru, rp = asm.residual(u.astype(dt_hi), p.astype(dt_hi),
                                  supg=ssupg, compute32=c32)
            ru = free_u * ru
            if encl:
                rp = rp - (jnp.sum(rp * p_active) / n_p_real) * p_active
            F = jnp.concatenate([ru, rp])
            return F, jnp.linalg.norm(F)

        from ..runtime import lift_jit
        if kr:
            def step_rec(w, rec):
                F, rn_nl = residual_of(w)
                x, iters, rn_lin, rec = ir(w[:n_u], -F, rec)
                return w + x, rn_nl, iters, rn_lin, rec
            out = lift_jit(step_rec, self.oseen._lift_roots)
        else:
            def step(w):
                F, rn_nl = residual_of(w)
                x, iters, rn_lin = ir(w[:n_u], -F)
                return w + x, rn_nl, iters, rn_lin
            out = lift_jit(step, self.oseen._lift_roots)
        self._jit_cache[key] = out
        return out

    def initial_recycle(self):
        """Empty GCRO-DR recycle space matching ``config.krylov.recycle``."""
        return self.oseen.initial_recycle()

    def initial_state(self) -> jnp.ndarray:
        w = jnp.zeros(self.n, dtype=self.oseen.dtype)
        return w.at[:self.n_u].set(self.oseen.bc_mask_u * self.oseen.bc_vals_u)

    def make_residual_hi(self):
        """Lifted high-precision residual (drives IR/nonlinear convergence)."""
        asm = self.asm
        n_u = self.n_u
        dt_hi = jnp.dtype(asm.dtype)
        free_u = self.oseen.free_u.astype(dt_hi)
        encl = self.enclosed
        p_active = asm.p_active.astype(dt_hi)
        n_p_real = float(asm.n1_real)

        ssupg = self.oseen.config.system_supg
        c32 = self.oseen.config.krylov.hi_res_f32

        def residual_hi(w):
            u, p = w[:n_u], w[n_u:]
            ru, rp = asm.residual(u.astype(dt_hi), p.astype(dt_hi),
                                  supg=ssupg, compute32=c32)
            ru = free_u * ru
            if encl:
                rp = rp - (jnp.sum(rp * p_active) / n_p_real) * p_active
            F = jnp.concatenate([ru, rp])
            return F, jnp.linalg.norm(F)

        from ..runtime import lift_jit
        return lift_jit(residual_hi, self.oseen._lift_roots)

    def solve_fused(self, w0: Optional[jnp.ndarray] = None, *,
                    rtol: float = 1e-5, rtol_lin: float = 1e-8,
                    max_steps: int = 25, verbose: bool = False,
                    damping: float = 1.0,
                    split_programs: bool = False) -> NonlinearResult:
        """Production driver around the fused IR step.

        True-residual IR restarts also repair f32 FGMRES estimate drift, so
        this path converges where the plain f32 loop stagnates.

        ``split_programs=True`` runs residual and IR solve as two device
        calls per step instead of one fused program — lower per-program
        peak memory (XLA plans each separately), for near-HBM-capacity
        problems; costs one extra host round-trip per step.
        """
        t0 = time.perf_counter()
        dt_hi = jnp.dtype(self.asm.dtype)
        kr = self.oseen.config.krylov.recycle
        if split_programs:
            res_fn = self.make_residual_hi()
        else:
            step = self.make_step_ir(rtol_lin=rtol_lin)
            rec = self.initial_recycle() if kr else None
        w = (self.initial_state() if w0 is None else w0).astype(dt_hi)
        res_hist: List[float] = []
        it_hist: List[int] = []
        r0 = None
        converged = False
        for k in range(max_steps):
            if split_programs:
                F, rn = res_fn(w)
                rn = float(rn)
            elif kr:
                w_new, rn, iters, _, rec = step(w, rec)
                rn = float(rn)
            else:
                w_new, rn, iters, _ = step(w)
                rn = float(rn)
            res_hist.append(rn)
            if r0 is None:
                r0 = rn if rn > 0 else 1.0
            if verbose:
                print(f"  nonlinear step {k:2d}: |F| = {rn:.3e}")
            if rn <= max(rtol * r0, 1e-300):
                converged = True
                break
            if split_programs:
                # host-driven IR rounds: each device program stays small
                x, iters, _ = self.oseen.solve_ir(w[:self.n_u], -F,
                                                  rtol=rtol_lin)
                w = w + damping * x.astype(dt_hi)
            elif damping != 1.0:
                # fused step returns the full update; blend on host
                # (high-Re continuation, matching solve()'s semantics)
                w = w + damping * (w_new - w)
            else:
                w = w_new
            it_hist.append(int(iters))
        return NonlinearResult(w=w, nonlinear_res=res_hist,
                               linear_iters=it_hist, linear_resnorms=[],
                               converged=converged,
                               wall_time=time.perf_counter() - t0)

    def make_full_solve(self, rtol: float = 1e-5, rtol_lin: float = 1e-8,
                        max_steps: int = 25, anderson: int = 0):
        """Whole nonlinear solve as ONE device program: ``lax.while_loop``
        over fused Picard steps (residual + linear solve + update) with the
        convergence test on device.

        Returns jitted ``full(w0) -> (w, n_steps, iters_per_step, res_hist)``
        — a single host round-trip for the entire solve (the per-step
        dispatch + scalar fetch of the host loop costs ~30-60 ms each
        through the remote-attached TPU tunnel).  With
        ``config.krylov.recycle > 0`` the GCRO-DR space rides the
        ``while_loop`` carry, deflating across Picard steps inside the one
        program.

        ``anderson=m >= 2`` adds device-side Anderson mixing (type-II,
        window ``m``) over the Picard map — the fused twin of
        ``solve_anderson``, which pays ~m^2 host scalar fetches per step
        through the tunnel for its Gram matrix.  Here the history rides the
        while_loop carry and the (m-1)^2 normal equations are built from
        unrolled on-device dots, so the 10-15% iteration saving comes at
        fused-step cost.
        """
        key = ("full", rtol, rtol_lin, max_steps, anderson)
        hit = self._jit_cache.get(key)
        if hit is not None:
            return hit
        asm = self.asm
        n_u = self.n_u
        dt_hi = jnp.dtype(asm.dtype)
        free_u = self.oseen.free_u.astype(dt_hi)
        encl = self.enclosed
        p_active = asm.p_active.astype(dt_hi)
        n_p_real = float(asm.n1_real)
        ssupg = self.oseen.config.system_supg
        c32 = self.oseen.config.krylov.hi_res_f32
        ir = self.oseen.make_ir_solve(rtol_lin, _jit=False)

        def residual_of(w):
            u, p = w[:n_u], w[n_u:]
            ru, rp = asm.residual(u.astype(dt_hi), p.astype(dt_hi),
                                  supg=ssupg, compute32=c32)
            ru = free_u * ru
            if encl:
                rp = rp - (jnp.sum(rp * p_active) / n_p_real) * p_active
            F = jnp.concatenate([ru, rp])
            return F, jnp.linalg.norm(F)

        kr = self.oseen.config.krylov.recycle
        m = int(anderson)
        n = self.n
        fdt = self.oseen.dtype

        def full(w0):
            w0 = w0.astype(dt_hi)
            iters0 = jnp.zeros(max_steps, jnp.int32)
            res0 = jnp.zeros(max_steps + 1, dt_hi)
            rec0 = self.initial_recycle() if kr else jnp.zeros(0)
            # Anderson history: last m (correction, iterate) pairs + count
            and0 = ((jnp.zeros((m, n), dt_hi), jnp.zeros((m, n), dt_hi),
                     jnp.array(0, jnp.int32))
                    if m >= 2 else jnp.zeros(0))

            def cond(c):
                k, w, r0, iters, res, done, rec, andc = c
                return jnp.logical_and(k < max_steps, jnp.logical_not(done))

            def body(c):
                k, w, r0, iters, res, done, rec, andc = c
                F, rn = residual_of(w)
                r0 = jnp.where(k == 0, jnp.where(rn > 0, rn, 1.0), r0)
                res = res.at[k].set(rn)
                conv = rn <= rtol * r0

                def take_step(op):
                    rec, andc = op
                    if kr:
                        x, it, _, rec = ir(w[:n_u], -F, rec)
                    else:
                        x, it, _ = ir(w[:n_u], -F)
                    g = w + x
                    if m < 2:
                        return g, it, rec, andc
                    # type-II Anderson mixing on the Picard map g(w)=w+x:
                    # minimize ||x - dF gamma|| over the affine history hull
                    Fh, Gh, hc = andc
                    Fh = jnp.roll(Fh, -1, axis=0).at[-1].set(x)
                    Gh = jnp.roll(Gh, -1, axis=0).at[-1].set(g)
                    hc = jnp.minimum(hc + 1, m)
                    dF = Fh[1:] - Fh[:-1]
                    dG = Gh[1:] - Gh[:-1]
                    # only the newest hc-1 difference columns are real
                    valid = jnp.arange(m - 1) >= (m - 1) - (hc - 1)
                    # Gram via unrolled vdots: (m,n)@(n,m) f64 contractions
                    # silently run ~f32 on this TPU (matvec/dots are clean)
                    G = jnp.stack([jnp.stack([jnp.vdot(dF[i], dF[j])
                                              for j in range(m - 1)])
                                   for i in range(m - 1)])
                    cvec = jnp.stack([jnp.vdot(dF[i], x)
                                      for i in range(m - 1)])
                    eye = jnp.eye(m - 1, dtype=dt_hi)
                    G = jnp.where(jnp.outer(valid, valid), G, eye)
                    cvec = jnp.where(valid, cvec, 0.0)
                    lam = 1e-12 * jnp.maximum(jnp.trace(G), 1e-30)
                    # tiny (m-1)^2 solve in compute precision (f64 dense
                    # factorizations stall the axon compile service)
                    gam = jnp.linalg.solve(
                        (G + lam * eye).astype(fdt),
                        cvec.astype(fdt)).astype(dt_hi)
                    gam = jnp.where(valid, gam, 0.0)
                    w_acc = g - sum(gam[j] * dG[j] for j in range(m - 1))
                    return w_acc, it, rec, (Fh, Gh, hc)

                # lax.cond: the converged final check pays NO linear solve
                w_new, it, rec, andc = jax.lax.cond(
                    conv,
                    lambda op: (w, jnp.array(0, jnp.int32), op[0], op[1]),
                    take_step, (rec, andc))
                iters = iters.at[k].set(it)
                return (k + jnp.where(conv, 0, 1), w_new, r0, iters, res,
                        conv, rec, andc)

            k, w, r0, iters, res, done, _, _ = jax.lax.while_loop(
                cond, body, (jnp.array(0, jnp.int32), w0,
                             jnp.array(1.0, dt_hi), iters0, res0, False,
                             rec0, and0))
            return w, k, iters, res

        from ..runtime import lift_jit
        out = lift_jit(full, self.oseen._lift_roots)
        self._jit_cache[key] = out
        return out

    def solve_anderson(self, w0: Optional[jnp.ndarray] = None, *,
                       m: int = 3, rtol: float = 1e-5,
                       rtol_lin: float = 1e-8, max_steps: int = 25,
                       verbose: bool = False) -> NonlinearResult:
        """Anderson-accelerated Picard (type-II mixing, window ``m``).

        The Picard map is ``g(w) = w + J(w)^{-1}(-F(w))`` (the fused IR
        step); Anderson extrapolates over the last ``m`` iterates by
        minimizing the fixed-point residual ``f = g(w) - w`` in the affine
        hull of the history — typically 20-40% fewer nonlinear steps than
        plain Picard at identical per-step cost (beyond-reference feature;
        the reference's only acceleration is switching to Newton).

        The (m-1)^2 Gram matrices are computed on device with UNROLLED dot
        products (TPU matrix-matrix precision landmine) and solved on host.
        """
        t0 = time.perf_counter()
        dt_hi = jnp.dtype(self.asm.dtype)
        kr = self.oseen.config.krylov.recycle
        step = self.make_step_ir(rtol_lin=rtol_lin)
        rec = self.initial_recycle() if kr else None
        w = (self.initial_state() if w0 is None else w0).astype(dt_hi)
        hist_f: List[jnp.ndarray] = []
        hist_g: List[jnp.ndarray] = []
        res_hist: List[float] = []
        it_hist: List[int] = []
        r0 = None
        converged = False
        for k in range(max_steps):
            if kr:
                w_new, rn, iters, _, rec = step(w, rec)
            else:
                w_new, rn, iters, _ = step(w)
            rn = float(rn)
            res_hist.append(rn)
            if r0 is None:
                r0 = rn if rn > 0 else 1.0
            if verbose:
                print(f"  anderson step {k:2d}: |F| = {rn:.3e}")
            if rn <= max(rtol * r0, 1e-300):
                converged = True
                break
            it_hist.append(int(iters))
            f = w_new - w
            g = w_new
            hist_f.append(f)
            hist_g.append(g)
            if len(hist_f) > m:
                hist_f.pop(0)
                hist_g.pop(0)
            if len(hist_f) >= 2:
                dF = [hist_f[j + 1] - hist_f[j]
                      for j in range(len(hist_f) - 1)]
                dG = [hist_g[j + 1] - hist_g[j]
                      for j in range(len(hist_g) - 1)]
                # normal equations via unrolled dots (device), solve on host
                G = np.array([[float(jnp.vdot(a, b)) for b in dF]
                              for a in dF])
                c = np.array([float(jnp.vdot(a, f)) for a in dF])
                lam = 1e-12 * max(np.trace(G), 1e-30)
                try:
                    gam = np.linalg.solve(G + lam * np.eye(G.shape[0]), c)
                except np.linalg.LinAlgError:
                    gam = np.zeros(G.shape[0])
                w = g - sum(float(gi) * dgi for gi, dgi in zip(gam, dG))
            else:
                w = g
        return NonlinearResult(w=w, nonlinear_res=res_hist,
                               linear_iters=it_hist, linear_resnorms=[],
                               converged=converged,
                               wall_time=time.perf_counter() - t0)

    def solve(self, w0: Optional[jnp.ndarray] = None, *, rtol: float = 1e-5,
              atol: float = 1e-12, max_steps: int = 25,
              damping: float = 1.0, verbose: bool = False) -> NonlinearResult:
        t0 = time.perf_counter()
        w = self.initial_state() if w0 is None else w0.astype(self.oseen.dtype)
        res_hist: List[float] = []
        it_hist: List[int] = []
        rn_hist: List[np.ndarray] = []
        r0 = None
        converged = False
        for step in range(max_steps):
            F = self._residual(w)
            rnorm = float(jnp.linalg.norm(F))
            res_hist.append(rnorm)
            if r0 is None:
                r0 = rnorm if rnorm > 0 else 1.0
            if verbose:
                print(f"  nonlinear step {step:2d}: |F| = {rnorm:.3e}")
            if rnorm <= max(rtol * r0, atol):
                converged = True
                break
            result = self.oseen.solve(w[:self.n_u], -F)
            it_hist.append(int(result.iters))
            rn_hist.append(np.asarray(result.resnorms))
            dw = result.x
            if self.enclosed:
                dp = dw[self.n_u:]
                act = self.asm.p_active.astype(dw.dtype)
                shift = jnp.sum(dp * act) / self.asm.n1_real
                dw = dw.at[self.n_u:].add(-shift * act)
            w = w + damping * dw
        return NonlinearResult(w=w, nonlinear_res=res_hist,
                               linear_iters=it_hist, linear_resnorms=rn_hist,
                               converged=converged,
                               wall_time=time.perf_counter() - t0)
