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

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax


class FGMRESResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray          # scalar int32
    resnorms: jnp.ndarray       # (maxiter + 1,), padded with last value
    converged: jnp.ndarray      # scalar bool
    bnorm: jnp.ndarray


def fgmres(matvec: Callable, pc: Callable, b: jnp.ndarray,
           x0: Optional[jnp.ndarray] = None, *, maxiter: int = 100,
           rtol: float = 1e-8, atol: float = 0.0) -> FGMRESResult:
    """Solve ``A x = b`` with right preconditioner ``pc`` (flexible).

    ``matvec``/``pc`` are closures over device arrays; the whole function is
    jit-safe.  No restarts: ``maxiter`` is the Krylov dimension (PCD keeps
    outer counts in the tens, cf. BASELINE.md).
    """
    n = b.shape[0]
    dtype = b.dtype
    m = maxiter

    if x0 is None:
        r0 = b
        x0 = jnp.zeros_like(b)
    else:
        r0 = b - matvec(x0)

    bnorm = jnp.linalg.norm(b)
    beta = jnp.linalg.norm(r0)
    tol = jnp.maximum(rtol * bnorm, atol)

    V0 = jnp.zeros((m + 1, n), dtype)
    V0 = V0.at[0].set(r0 / jnp.where(beta > 0, beta, 1.0))
    Z0 = jnp.zeros((m, n), dtype)
    R0 = jnp.zeros((m, m), dtype)
    cs0 = jnp.ones(m, dtype)
    sn0 = jnp.zeros(m, dtype)
    g0 = jnp.zeros(m + 1, dtype).at[0].set(beta)
    hist0 = jnp.full(m + 1, beta, dtype)

    def cond(state):
        k, V, Z, R, cs, sn, g, hist, done = state
        return jnp.logical_and(k < m, jnp.logical_not(done))

    def body(state):
        k, V, Z, R, cs, sn, g, hist, done = state
        v = V[k]
        z = pc(v)
        w = matvec(z)
        Z = Z.at[k].set(z)

        # masked CGS2: project onto span{V_0..V_k}
        mask = (jnp.arange(m + 1) <= k).astype(dtype)
        h1 = (V @ w) * mask
        w = w - V.T @ h1
        h2 = (V @ w) * mask
        w = w - V.T @ h2
        h = h1 + h2
        wnorm = jnp.linalg.norm(w)
        h = h.at[k + 1].set(wnorm)
        V = V.at[k + 1].set(w / jnp.where(wnorm > 0, wnorm, 1.0))

        # apply existing rotations (identity for i >= k).  The sweep
        #   out_i = c_i a_i + s_i h_{i+1};  a_{i+1} = -s_i a_i + c_i h_{i+1}
        # is a first-order linear recurrence in the carry a — evaluated in
        # log depth with an associative scan instead of m sequential steps
        # (sequential scalar loops cost ~us/step on TPU).
        alpha = -sn
        beta = cs * h[1:]

        def comb(x, y):
            a1, b1 = x
            a2, b2 = y
            return a2 * a1, a2 * b1 + b2

        A, B = lax.associative_scan(comb, (alpha, beta))
        a = jnp.concatenate([h[:1], A * h[0] + B])      # a_0 .. a_m
        out = cs * a[:m] + sn * h[1:]
        h = jnp.concatenate([out, a[m:m + 1]])

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
        done = res <= tol
        return (k + 1, V, Z, R, cs, sn, g, hist, done)

    init = (jnp.array(0, jnp.int32), V0, Z0, R0, cs0, sn0, g0, hist0,
            beta <= tol)
    k, V, Z, R, cs, sn, g, hist, done = lax.while_loop(cond, body, init)

    # back-substitute on the active k x k triangle (pad diag with 1s)
    active = jnp.arange(m) < k
    Rm = R + jnp.diag(jnp.where(active, 0.0, 1.0).astype(dtype))
    gm = jnp.where(active, g[:m], 0.0)
    y = jax.scipy.linalg.solve_triangular(Rm, gm, lower=False)
    x = x0 + Z.T @ y

    # pad history tail with the final residual for clean semantics
    idx = jnp.minimum(jnp.arange(m + 1), k)
    hist = hist[idx]
    return FGMRESResult(x=x, iters=k, resnorms=hist, converged=done,
                        bnorm=bnorm)
