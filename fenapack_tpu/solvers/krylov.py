"""jit-compiled flexible GMRES (right-preconditioned).

TPU-native replacement for PETSc ``KSPFGMRES`` as driven by
``fenapack/field_split.py::PCDKrylovSolver`` (SURVEY.md section 2.2 item 2):
flexible because the PCD preconditioner contains iterative subsolves, i.e. it
is a (mildly) nonlinear operator.

Design notes (XLA semantics):
  * fixed ``maxiter`` Krylov dimension; the iteration runs under
    ``lax.while_loop`` with early exit on convergence;
  * orthogonalization is *masked* classical Gram-Schmidt with
    reorthogonalization (CGS2): each step does two (m+1, n) x (n,) matvecs,
    which XLA maps onto the MXU — the TPU-friendly alternative to the
    sequential modified Gram-Schmidt recursion PETSc uses;
  * the Hessenberg least-squares problem is triangularized on the fly with
    Givens rotations (rotations i >= k are identity, so the rotation sweep is
    a fixed-length ``fori_loop``);
  * convergence test on the unpreconditioned residual norm estimate |g[k+1]|
    (PETSc right-PC semantics), tolerance ``max(rtol * ||b||, atol)``.

Returns the solution together with the residual-norm history and iteration
count (the ``-ksp_monitor`` observability of the reference, SURVEY.md 5.5).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax


_EPS = {"float32": 6.0e-8, "float64": 2.3e-16, "bfloat16": 3.9e-3}


class FGMRESResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray          # scalar int32
    resnorms: jnp.ndarray       # (maxiter + 1,), padded with last value
    converged: jnp.ndarray      # scalar bool
    bnorm: jnp.ndarray


class RecycleSpace(NamedTuple):
    """GCRO-DR recycle space: ``k`` solution-space directions ``U`` (rows)
    with their operator images ``C = A U`` (rows, orthonormal).

    The TPU-native analogue of PETSc's ``KSPHPDDM``-style recycling: across
    the IR rounds of one linear solve the operator is IDENTICAL and across
    Picard steps it changes slowly, so re-deriving the slow Krylov directions
    from scratch every round pays the Arnoldi startup cost (~5 iterations)
    over and over.

    ``valid`` is PER COLUMN (0.0 | 1.0 per direction), so a space can fill
    up incrementally across solves shorter than ``k`` iterations — the
    IR rounds of the mixed-precision path run ~5-10 iterations each, and an
    all-or-nothing flag never bootstrapped there.  Invariants: invalid rows
    of ``U``/``C`` are exactly zero (every consumer — deflation projection,
    solution reconstruction, Gram/identity blocks — is then automatically
    correct without masking), and valid rows always come FIRST (harvest
    sorts by score), so factorizations only ever see trailing zero columns.
    """
    U: jnp.ndarray              # (k, n)
    C: jnp.ndarray              # (k, n) rows orthonormal, C = A U
    valid: jnp.ndarray          # (k,) float mask (0.0 | 1.0 per direction)


def empty_recycle(k: int, n: int, dtype) -> RecycleSpace:
    return RecycleSpace(U=jnp.zeros((k, n), dtype),
                        C=jnp.zeros((k, n), dtype),
                        valid=jnp.zeros((k,), dtype))


def refresh_recycle(matvec: Callable, rec: RecycleSpace,
                    factor_dtype=None) -> RecycleSpace:
    """Re-bind a recycle space to a NEW operator: recompute C = A U and
    re-orthonormalize (QR), folding the triangular factor into U so the
    invariant ``C = A U, C C^T = I`` holds for the new matrix.

    ``factor_dtype`` runs the tall QR factorization in a lower precision
    (the f64 QR/eigh lowerings stall the axon TPU compile service).  The
    f32 factor is then only a BASIS TRANSFORM: C is re-bound as
    ``R^{-T} (A U)`` in full precision (so ``C = A U`` holds to working
    precision regardless of the factor's accuracy) and its residual
    non-orthonormality — O(f32) — is repaired by one Cholesky refinement
    of the small Gram matrix, also in full precision.
    """
    k, n = rec.U.shape
    dt = rec.U.dtype
    fdt = factor_dtype or dt
    with jax.default_matmul_precision("highest"):
        # UNROLLED matvecs, not vmap: batched/matrix-matrix contractions on
        # the TPU are silently routed through reduced-precision MXU passes
        # (f32 -> bf16, and measured f64 -> ~f32 even under "highest"),
        # which corrupts the invariant C = A U and stalls deflated solves
        # at the corrupted level.  Matrix-VECTOR products lower cleanly.
        Cp = jnp.stack([matvec(rec.U[i]) for i in range(k)])   # (k, n)
        if fdt == dt:
            Q, R = jnp.linalg.qr(Cp.T)               # (n,k), (k,k)
            Rg = R + jnp.diag(_diag_guard(R))
            U_new = _tri_solve_rows(Rg.T, rec.U, lower=True)
            C_new = Q.T
        else:
            _, R32 = jnp.linalg.qr(Cp.T.astype(fdt))
            R = R32.astype(dt)
            Rg = R + jnp.diag(_diag_guard(R))
            # exact-precision re-binding through the approximate factor:
            # rows U1 = R^{-T} U, C1 = R^{-T} Cp  =>  C1 = A U1 exactly.
            # Wide-RHS triangular solves MUST be the unrolled row form —
            # see _tri_solve_rows: the library solve leaves ~f32 error in
            # C on TPU, which stalls 1e-8-rtol deflated solves at the cap.
            U1 = _tri_solve_rows(Rg.T, rec.U, lower=True)
            C1 = _tri_solve_rows(Rg.T, Cp, lower=True)
            # Cholesky refinement: C1 C1^T = I + O(f32); fold L^{-1} into
            # both so orthonormality AND the invariant hold in precision dt.
            # Gram rows via matrix-vector products (see Cp note above).
            S = jnp.stack([C1 @ C1[i] for i in range(k)]) + jnp.diag(
                jnp.where(rec.valid > 0, 0.0, 1.0).astype(dt))
            L = _cholesky_unrolled(S)
            U_new = _tri_solve_rows(L, U1, lower=True)
            C_new = _tri_solve_rows(L, C1, lower=True)
    ok = (rec.valid > 0)[:, None]
    return RecycleSpace(U=jnp.where(ok, U_new, 0.0),
                        C=jnp.where(ok, C_new, 0.0),
                        valid=rec.valid)


def _tri_solve_rows(T, B, lower=True):
    """Triangular solve ``T X = B`` with a WIDE (k, n) right-hand side as
    ``k`` unrolled row updates.

    ``jax.scipy.linalg.solve_triangular`` against a wide RHS lowers to
    matrix-matrix substitution passes, which the axon TPU executes at ~f32
    regardless of the requested precision (doc/tpu_design.md landmine —
    measured: hi_krylov recycled solves stalled at the ~1e-7 orthonormality
    floor this left in C, hitting the iteration cap on every post-harvest
    solve while the identical program converged on CPU).  Row-unrolled
    substitution is pure scalar*vector algebra, which lowers cleanly at
    full precision; k is the (small, static) recycle dimension.
    """
    k = B.shape[0]
    order = range(k) if lower else reversed(range(k))
    X = [None] * k
    for i in order:
        acc = B[i]
        for j in (range(i) if lower else range(i + 1, k)):
            acc = acc - T[i, j] * X[j]
        X[i] = acc / T[i, i]
    return jnp.stack(X)


def _cholesky_unrolled(S):
    """Scalar-unrolled Cholesky of a small (k, k) SPD matrix.

    ``jnp.linalg.cholesky`` lowers through blocked matrix algebra that the
    axon TPU executes at ~f32 even for f64 operands (the same landmine as
    the wide-RHS triangular solves, :func:`_tri_solve_rows`) — leaving
    O(1e-7) error in the refinement factor and re-stalling the 1e-8-rtol
    deflated solves the refinement exists to protect.  Scalar substitution
    lowers at full precision; k is the small static recycle dimension.
    """
    k = S.shape[0]
    L = [[None] * k for _ in range(k)]
    for i in range(k):
        for j in range(i + 1):
            acc = S[i, j]
            for p in range(j):
                acc = acc - L[i][p] * L[j][p]
            if i == j:
                # guard: invalid (masked) rows carry an identity pivot
                L[i][j] = jnp.sqrt(jnp.maximum(acc, 1e-300))
            else:
                L[i][j] = acc / L[j][j]
    zero = jnp.zeros((), S.dtype)
    return jnp.stack([jnp.stack([L[i][j] if j <= i else zero
                                 for j in range(k)]) for i in range(k)])


def _diag_guard(R, tiny: float = 1e-20):
    """Diagonal shift that pins (near-)zero pivots of a triangular factor to
    1 so the subsequent solve stays finite (results on those columns are
    masked out by the caller)."""
    d = jnp.abs(jnp.diagonal(R))
    return jnp.where(d > tiny, 0.0, 1.0).astype(R.dtype)


def fgmres(matvec: Callable, pc: Callable, b: jnp.ndarray,
           x0: Optional[jnp.ndarray] = None, *, maxiter: int = 100,
           rtol: float = 1e-8, atol: float = 0.0,
           reorth_eta: float = 0.0) -> FGMRESResult:
    """Solve ``A x = b`` with right preconditioner ``pc`` (flexible).

    ``matvec``/``pc`` are closures over device arrays; the whole function is
    jit-safe.  No restarts: ``maxiter`` is the Krylov dimension (PCD keeps
    outer counts in the tens, cf. BASELINE.md).

    ``reorth_eta``: 0.0 = unconditional CGS2 (two projection passes every
    iteration).  eta > 0 enables SELECTIVE reorthogonalization (the
    Kahan–Parlett "twice is enough" criterion): the second pass runs only
    when the first projection removed most of ``w`` — i.e. when
    ``|w_1| < eta * |w_0|`` — because only then can cancellation have left
    O(eps * |w_0| / |w_1|) of the old span in the new direction.  Classic
    choice eta = 1/sqrt(2); each skipped pass saves the two O(m n) ops
    (projection + basis update) that dominate Krylov-algebra time on TPU.
    """
    res, _ = _fgmres_impl(matvec, pc, b, x0, maxiter, rtol, atol, None,
                          reorth_eta=reorth_eta)
    return res


def fgmres_dr(matvec: Callable, pc: Callable, b: jnp.ndarray,
              rec: RecycleSpace, x0: Optional[jnp.ndarray] = None, *,
              maxiter: int = 100, rtol: float = 1e-8, atol: float = 0.0,
              factor_dtype=None, reorth_eta: float = 0.0):
    """Deflated-recycling FGMRES (GCRO-DR flavor, Parks et al. 2006).

    Solves with the Krylov space augmented by ``rec`` (deflating the slow
    directions of previous solves with the same/nearby operator) and returns
    ``(result, rec_new)`` where the new recycle space holds the ``k``
    smallest-singular-direction vectors of the combined space — the
    directions that dominate the iteration count next time.  The caller must
    :func:`refresh_recycle` when the operator changes between solves.
    """
    return _fgmres_impl(matvec, pc, b, x0, maxiter, rtol, atol, rec,
                        factor_dtype=factor_dtype, reorth_eta=reorth_eta)


def _rotation_sweep(h, cs, sn, m):
    """Apply the accumulated Givens rotations to a new Hessenberg column.

    The sweep
      out_i = c_i a_i + s_i h_{i+1};  a_{i+1} = -s_i a_i + c_i h_{i+1}
    is a first-order linear recurrence in the carry a — evaluated in
    log depth with an associative scan instead of m sequential steps
    (sequential scalar loops cost ~us/step on TPU).  Rotations i >= k are
    identity (cs=1, sn=0), so no masking is needed.
    """
    alpha = -sn
    beta = cs * h[1:]

    def comb(x, y):
        a1, b1 = x
        a2, b2 = y
        return a2 * a1, a2 * b1 + b2

    A, B = lax.associative_scan(comb, (alpha, beta))
    a = jnp.concatenate([h[:1], A * h[0] + B])      # a_0 .. a_m
    out = cs * a[:m] + sn * h[1:]
    return jnp.concatenate([out, a[m:m + 1]])


def _fgmres_impl(matvec, pc, b, x0, maxiter, rtol, atol,
                 rec: Optional[RecycleSpace], factor_dtype=None,
                 reorth_eta: float = 0.0):
    n = b.shape[0]
    dtype = b.dtype
    m = maxiter

    if x0 is None:
        r0 = b
        x0 = jnp.zeros_like(b)
    else:
        r0 = b - matvec(x0)

    bnorm = jnp.linalg.norm(b)
    tol = jnp.maximum(rtol * bnorm, atol)

    if rec is not None:
        kr = rec.U.shape[0]
        U, C = rec.U, rec.C
        # project out the recycle image space: the Arnoldi process runs on
        # (I - C C^T) A pc(.), and the C components of the solution are
        # reconstructed exactly at the end (alpha = c0 - B y)
        c0 = C @ r0
        r0 = r0 - C.T @ c0
        Bm0 = jnp.zeros((m, kr), dtype)
        Hm0 = jnp.zeros((m + 1, m), dtype)
    beta = jnp.linalg.norm(r0)

    V0 = jnp.zeros((m + 1, n), dtype)
    V0 = V0.at[0].set(r0 / jnp.where(beta > 0, beta, 1.0))
    Z0 = jnp.zeros((m, n), dtype)
    R0 = jnp.zeros((m, m), dtype)
    cs0 = jnp.ones(m, dtype)
    sn0 = jnp.zeros(m, dtype)
    g0 = jnp.zeros(m + 1, dtype).at[0].set(beta)
    hist0 = jnp.full(m + 1, beta, dtype)

    def cond(state):
        k, V, Z, R, cs, sn, g, hist, done, aux = state
        return jnp.logical_and(k < m, jnp.logical_not(done))

    def body(state):
        k, V, Z, R, cs, sn, g, hist, done, aux = state
        v = V[k]
        z = pc(v)
        w = matvec(z)
        Z = Z.at[k].set(z)

        if rec is not None:
            Bm, Hm = aux
            bk = C @ w
            w = w - C.T @ bk
            Bm = Bm.at[k].set(bk)

        # masked CGS(2): project onto span{V_0..V_k}
        wnorm_pre = jnp.linalg.norm(w)
        mask = (jnp.arange(m + 1) <= k).astype(dtype)
        h1 = (V @ w) * mask
        w = w - V.T @ h1
        if reorth_eta > 0.0:
            # selective second pass ("twice is enough"): reorthogonalize
            # only when the first projection collapsed w into the span
            wnorm1 = jnp.linalg.norm(w)

            def second(w):
                h2 = (V @ w) * mask
                return w - V.T @ h2, h2

            w, h2 = lax.cond(wnorm1 < reorth_eta * wnorm_pre,
                             second, lambda w: (w, jnp.zeros_like(h1)), w)
        else:
            h2 = (V @ w) * mask
            w = w - V.T @ h2
        h = h1 + h2
        wnorm = jnp.linalg.norm(w)
        # (near-)breakdown: the new direction is numerically inside the
        # current span — normalizing it would inject an amplified-noise
        # basis vector and silently decouple the residual ESTIMATE from the
        # true residual (observed: est 1e-11 vs true 5e+1 after hundreds of
        # unpreconditioned iterations).  Stop instead.
        breakdown = wnorm <= 100.0 * _EPS[jnp.dtype(dtype).name] * wnorm_pre
        h = h.at[k + 1].set(wnorm)
        V = V.at[k + 1].set(w / jnp.where(wnorm > 0, wnorm, 1.0))

        if rec is not None:
            Hm = Hm.at[:, k].set(h)          # pre-rotation Hessenberg column
            aux = (Bm, Hm)

        h = _rotation_sweep(h, cs, sn, m)

        denom = jnp.hypot(h[k], h[k + 1])
        safe = jnp.where(denom > 0, denom, 1.0)
        ck = jnp.where(denom > 0, h[k] / safe, 1.0)
        sk = jnp.where(denom > 0, h[k + 1] / safe, 0.0)
        cs = cs.at[k].set(ck)
        sn = sn.at[k].set(sk)
        h = h.at[k].set(denom).at[k + 1].set(0.0)
        R = R.at[:, k].set(h[:m])

        res = jnp.abs(sk * g[k])
        g = g.at[k + 1].set(-sk * g[k]).at[k].set(ck * g[k])
        hist = hist.at[k + 1].set(res)
        done = jnp.logical_or(res <= tol, breakdown)
        return (k + 1, V, Z, R, cs, sn, g, hist, done, aux)

    aux0 = (Bm0, Hm0) if rec is not None else ()
    init = (jnp.array(0, jnp.int32), V0, Z0, R0, cs0, sn0, g0, hist0,
            beta <= tol, aux0)
    k, V, Z, R, cs, sn, g, hist, done, aux = lax.while_loop(cond, body, init)

    # back-substitute on the active k x k triangle (pad diag with 1s)
    active = jnp.arange(m) < k
    Rm = R + jnp.diag(jnp.where(active, 0.0, 1.0).astype(dtype))
    gm = jnp.where(active, g[:m], 0.0)
    y = jax.scipy.linalg.solve_triangular(Rm, gm, lower=False)
    x = x0 + Z.T @ y
    rec_new = None
    if rec is not None:
        Bm, Hm = aux
        x = x + U.T @ (c0 - Bm.T @ y)
        # C-space correction passes: the reconstruction above trusts
        # C = A U, which holds only to f32 matvec/QR error |E|; that error
        # times |alpha| lands in the TRUE residual and stalls IR rounds.
        # Each pass cuts the C-space residual component by a further |E|
        # at the cost of one matvec (no preconditioner apply).
        for _ in range(2):
            rt = b - matvec(x)
            x = x + U.T @ (C @ rt)
        rec_new = _deflation_update(matvec, rec, V, Z, Bm, Hm, k, m,
                                    factor_dtype=factor_dtype)

    # pad history tail with the final residual for clean semantics
    idx = jnp.minimum(jnp.arange(m + 1), k)
    hist = hist[idx]
    # converged reports the TOLERANCE being met — a breakdown stop (or the
    # maxiter cap) must not masquerade as convergence
    return FGMRESResult(x=x, iters=k, resnorms=hist,
                        converged=hist[m] <= tol, bnorm=bnorm), rec_new


def fgmres_ds(matvec, pc, b, *, maxiter: int = 100, rtol: float = 1e-8,
              atol: float = 0.0, reorth_eta: float = 0.0) -> FGMRESResult:
    """FGMRES with the Krylov basis in double-single (two-f32) storage.

    Semantics of :func:`fgmres` at f64 honesty (residual estimate trustworthy
    to ~1e-12 relative), but every O(m n) vector operation — the CGS2
    projections, the basis updates, the norms — runs in compensated pure-f32
    arithmetic (ops/ds.py), avoiding the ~10x cost of XLA's emulated-f64
    dense algebra on TPU.  This is the TPU-native expression of PETSc's
    ``PetscReal = double`` KSP semantics (SURVEY.md 2.2 #2): same math,
    hardware-matched representation.

    Contracts: ``b`` is f64; ``matvec`` maps f64 -> f64 with f64-accurate
    values (the DF32BlockSpMV compensated kernel); ``pc`` maps f32 -> f32
    (flexible preconditioning: Z columns are whatever the PC returned, so
    storing them in their native f32 loses nothing — the Arnoldi relation
    uses the stored values themselves).  No recycling/restart support.
    """
    from ..ops import ds

    n = b.shape[0]
    m = maxiter
    f64 = jnp.float64

    b = b.astype(f64)
    bnorm = jnp.linalg.norm(b)
    tol = jnp.maximum(rtol * bnorm, atol)

    r0 = ds.from_f64(b)
    beta = ds.norm(r0)                                   # f64 scalar
    inv0 = ds.from_f64(jnp.where(beta > 0, 1.0 / beta, 1.0))
    v0 = ds.mul(r0, ds.DS(inv0.hi, inv0.lo))

    Vhi0 = jnp.zeros((m + 1, n), jnp.float32).at[0].set(v0.hi)
    Vlo0 = jnp.zeros((m + 1, n), jnp.float32).at[0].set(v0.lo)
    Z0 = jnp.zeros((m, n), jnp.float32)
    R0 = jnp.zeros((m, m), f64)
    cs0 = jnp.ones(m, f64)
    sn0 = jnp.zeros(m, f64)
    g0 = jnp.zeros(m + 1, f64).at[0].set(beta)
    hist0 = jnp.full(m + 1, beta, f64)

    def cond(state):
        k = state[0]
        done = state[-1]
        return jnp.logical_and(k < m, jnp.logical_not(done))

    def body(state):
        k, Vhi, Vlo, Z, R, cs, sn, g, hist, done = state
        V = ds.DS(Vhi, Vlo)
        z = pc(Vhi[k])                                   # f32 -> f32
        Z = Z.at[k].set(z)
        w = ds.from_f64(matvec(z.astype(f64)))

        mask = (jnp.arange(m + 1) <= k).astype(jnp.float32)
        wnorm_pre = ds.norm(w)
        # masked CGS(2) in compensated f32
        h1 = ds.mat_dots(V, w)
        h1 = ds.DS(h1.hi * mask, h1.lo * mask)
        w = ds.update(w, V, h1)
        if reorth_eta > 0.0:
            # selective second pass (see fgmres): skip the two O(m n)
            # compensated passes when the first projection kept most of w
            wnorm1 = ds.norm(w)

            def second(w):
                h2 = ds.mat_dots(ds.DS(Vhi, Vlo), w)
                h2 = ds.DS(h2.hi * mask, h2.lo * mask)
                return ds.update(w, ds.DS(Vhi, Vlo), h2), h2

            w, h2 = lax.cond(
                wnorm1 < reorth_eta * wnorm_pre, second,
                lambda w: (w, ds.DS(jnp.zeros_like(h1.hi),
                                    jnp.zeros_like(h1.lo))), w)
        else:
            h2 = ds.mat_dots(V, w)
            h2 = ds.DS(h2.hi * mask, h2.lo * mask)
            w = ds.update(w, V, h2)
        h = ds.to_f64(ds.add(h1, h2))                    # (m+1,) f64

        wnorm = ds.norm(w)
        # near-breakdown at the ds precision level (~2^-45): see the f64
        # path's comment — normalizing numerical noise decouples the
        # residual estimate from the true residual
        breakdown = wnorm <= 100.0 * 1e-13 * wnorm_pre
        h = h.at[k + 1].set(wnorm)
        winv = ds.from_f64(jnp.where(wnorm > 0, 1.0 / wnorm, 1.0))
        vnew = ds.mul(w, ds.DS(winv.hi, winv.lo))
        Vhi = Vhi.at[k + 1].set(vnew.hi)
        Vlo = Vlo.at[k + 1].set(vnew.lo)

        h = _rotation_sweep(h, cs, sn, m)
        denom = jnp.hypot(h[k], h[k + 1])
        safe = jnp.where(denom > 0, denom, 1.0)
        ck = jnp.where(denom > 0, h[k] / safe, 1.0)
        sk = jnp.where(denom > 0, h[k + 1] / safe, 0.0)
        cs = cs.at[k].set(ck)
        sn = sn.at[k].set(sk)
        h = h.at[k].set(denom).at[k + 1].set(0.0)
        R = R.at[:, k].set(h[:m])

        res = jnp.abs(sk * g[k])
        g = g.at[k + 1].set(-sk * g[k]).at[k].set(ck * g[k])
        hist = hist.at[k + 1].set(res)
        done = jnp.logical_or(res <= tol, breakdown)
        return (k + 1, Vhi, Vlo, Z, R, cs, sn, g, hist, done)

    init = (jnp.array(0, jnp.int32), Vhi0, Vlo0, Z0, R0, cs0, sn0, g0,
            hist0, beta <= tol)
    k, Vhi, Vlo, Z, R, cs, sn, g, hist, done = lax.while_loop(
        cond, body, init)

    active = jnp.arange(m) < k
    Rm = R + jnp.diag(jnp.where(active, 0.0, 1.0).astype(f64))
    gm = jnp.where(active, g[:m], 0.0)
    y = jax.scipy.linalg.solve_triangular(Rm, gm, lower=False)
    # x = Z^T y once per solve: y in f64, Z columns are exact f32 PC outputs
    x = (Z.astype(f64).T @ y)

    idx = jnp.minimum(jnp.arange(m + 1), k)
    hist = hist[idx]
    # as in fgmres: converged == tolerance met, not breakdown/maxiter stop
    return FGMRESResult(x=x, iters=k, resnorms=hist,
                        converged=hist[m] <= tol, bnorm=bnorm)


def _deflation_update(matvec, rec: RecycleSpace, V, Z, Bm, Hm, k_it, m,
                      factor_dtype=None):
    """Harvest the next recycle space from the combined space [U, Z].

    The exact Arnoldi relation of the augmented method is
    ``A [U, Z] = [C, V] G`` with ``G = [[I_k, B], [0, H]]``.  The new space
    SPAN is the ``k`` smallest-singular-value right directions of ``G`` (the
    SVD-deflation variant of GCRO-DR's harmonic Ritz extraction — a small
    dense problem that stays on device; smallest singular directions are the
    ones GMRES converges slowest on).  Inactive Arnoldi columns (j >= k_it)
    and an invalid incoming U (valid=0) are excluded by score shifting.

    Numerical shape: only the selected SPAN is taken from the small-matrix
    algebra; the invariant ``C = A U`` (which the solution reconstruction
    relies on directly — its error lands in the true residual) is re-bound
    by explicit matvecs + QR.  Mapping U through ``G``'s tiny singular
    values instead amplifies f32 SVD noise by 1/sigma_min and was measured
    to destroy the invariant (|AU - C| ~ 0.2 at sigma_min ~ 1e-3).
    """
    dtype = rec.U.dtype
    kr = rec.U.shape[0]
    U, C = rec.U, rec.C

    Gtop = jnp.concatenate(
        [jnp.diag(rec.valid.astype(dtype)), Bm.T], axis=1)     # (kr, kr+m)
    Gbot = jnp.concatenate(
        [jnp.zeros((m + 1, kr), dtype), Hm], axis=1)           # (m+1, kr+m)
    G = jnp.concatenate([Gtop, Gbot], axis=0)                  # (kr+m+1, kr+m)

    # exclude invalid columns: incoming-U cols when valid=0, Arnoldi cols
    # past the active iteration count.  Small dense algebra runs at full
    # f32 matmul precision: TPU f32 matrix-matrix products default to bf16
    # MXU passes whose ~1e-3 error defeats the span selection (measured);
    # these ops are tiny, the cost is nil.
    col_invalid = jnp.concatenate([
        (1.0 - rec.valid).astype(dtype),
        (jnp.arange(m) >= k_it).astype(dtype)])
    fdt = factor_dtype or dtype
    with jax.default_matmul_precision("highest"):
        # smallest singular directions via eigh of the Gram matrix (jnp
        # svd fails to lower under jit on the axon TPU backend; only the
        # SPAN is needed, so the squared conditioning is harmless).  The
        # factorizations run in ``factor_dtype`` (span quality only — the
        # invariant C = A U is re-bound below at full precision)
        lam, Vecs = jnp.linalg.eigh((G.T @ G).astype(fdt))     # ascending
        Vecs = Vecs.astype(dtype)
        sig = jnp.sqrt(jnp.maximum(lam, 0.0)).astype(dtype)
        inv_energy = (Vecs.T ** 2) @ col_invalid               # in [0, 1]
        scores = sig + 1e6 * inv_energy
        # ascending scores => valid candidates FIRST, invalid-column noise
        # last; a selected direction is kept only if it lives in the valid
        # columns.  Fewer than kr valid candidates (short solve, invalid
        # incoming space) fills the space PARTIALLY — per-column validity
        # lets it grow across the short IR rounds instead of never
        # bootstrapping (the old all-or-nothing flag required one solve of
        # >= kr iterations, which multi-round IR never performs).
        _, idx = lax.top_k(-scores, kr)
        W = Vecs[:, idx]                                       # (kr+m, kr)
        sel_ok = (inv_energy[idx] < 0.5).astype(dtype)         # (kr,)

        UZ = jnp.concatenate([U, Z], axis=0)                   # (kr+m, n)
        Ut = (W.T @ UZ) * sel_ok[:, None]                      # (kr, n)
        # orthonormalize the span (1/sigma scale otherwise); invalid rows
        # are zero and sorted last, so QR sees trailing zero columns only
        Qu, _ = jnp.linalg.qr(Ut.T.astype(fdt))
        Qu = Qu.astype(dtype) * sel_ok[None, :]
    # re-bind C = A U at full precision (zero rows stay zero end-to-end)
    return refresh_recycle(matvec, RecycleSpace(
        U=Qu.T, C=jnp.zeros_like(Qu.T), valid=sel_ok),
        factor_dtype=factor_dtype)
