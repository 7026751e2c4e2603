"""Inner subsolves: Jacobi, Chebyshev, lumped mass, dense factorizations.

TPU-native replacement for the reference's inner ``KSP/PC`` solves — MUMPS /
UMFPACK LU on the direct path, Richardson+AMG / Chebyshev+Jacobi on the
iterative path (SURVEY.md section 2.2 items 4-5).  Everything here is a
*fixed-iteration* preconditioner: no data-dependent control flow, so each
subsolve unrolls into a static chain of SpMVs + AXPYs that XLA fuses.

Exact factorizations (LU/Cholesky) are kept for validation-scale runs and
for multigrid coarse solves: factors are computed at setup time (host/XLA)
and the jit-side apply is just two triangular solves.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from .sparse import ELL


# ---------------------------------------------------------------------- #
# diagonal / lumped preconditioners
# ---------------------------------------------------------------------- #

def make_jacobi(diag: jnp.ndarray) -> Callable:
    dinv = 1.0 / diag
    return lambda r: dinv * r


def lumped_inverse(M: ELL) -> jnp.ndarray:
    """Row-sum (lumped) mass inverse — exact for the constant mode, spectrally
    equivalent to Mp^{-1} (standard PCD practice for the mass subsolve).
    Empty rows (alignment padding) get identity."""
    rs = M.row_sums()
    return jnp.where(rs != 0, 1.0 / jnp.where(rs != 0, rs, 1.0), 1.0)


# ---------------------------------------------------------------------- #
# Chebyshev (Jacobi-preconditioned), fixed iteration count
# ---------------------------------------------------------------------- #

def chebyshev_solver(matvec: Callable, dinv: jnp.ndarray, lmin: float,
                     lmax: float, iters: int) -> Callable:
    """Return ``solve(b) ~= A^{-1} b`` via ``iters`` Chebyshev steps.

    ``lmin``/``lmax`` bound the spectrum of ``diag(A)^{-1} A`` (static floats
    baked into the compiled program).  Standard three-term recurrence
    (Saad, Iterative Methods, alg. 12.1), unrolled statically.
    """
    d = 0.5 * (lmax + lmin)
    c = 0.5 * (lmax - lmin)

    def solve(b):
        x = jnp.zeros_like(b)
        r = b
        p = jnp.zeros_like(b)
        alpha = 0.0
        for i in range(iters):
            z = dinv * r
            if i == 0:
                p = z
                alpha = 1.0 / d
            else:
                # first-step beta is (1/2)(c*alpha_0)^2; later steps
                # (c*alpha/2)^2 — verified against the optimal min-max bound
                # 1/T_k(sigma) (the halved first step is NOT a typo)
                beta = (0.5 * (c * alpha) ** 2 if i == 1
                        else (0.5 * c * alpha) ** 2)
                alpha = 1.0 / (d - beta / alpha)
                p = z + beta * p
            x = x + alpha * p
            r = r - alpha * matvec(p)
        return x
    return solve


def power_bounds(matvec: Callable, dinv: jnp.ndarray, n: int,
                 iters: int = 50, seed: int = 0,
                 dtype=jnp.float64) -> Tuple[float, float]:
    """Estimate (lmin, lmax) of ``diag^{-1} A`` for an SPD ``A``.

    Power iteration on D^{-1}A for lmax, then on (lmax I - D^{-1}A) for lmin.
    Setup-time only (host-driven loop, tiny cost vs. assembly).
    """
    rng = np.random.default_rng(seed)
    op = lambda v: dinv * matvec(v)

    v = jnp.asarray(rng.standard_normal(n), dtype=dtype)
    v = v / jnp.linalg.norm(v)
    lam = 1.0
    for _ in range(iters):
        w = op(v)
        lam = jnp.linalg.norm(w)
        v = w / lam
    lmax = float(lam)

    v = jnp.asarray(rng.standard_normal(n), dtype=dtype)
    v = v / jnp.linalg.norm(v)
    mu = 0.0
    for _ in range(iters):
        w = lmax * v - op(v)
        mu = jnp.linalg.norm(w)
        v = w / mu
    lmin = float(lmax - mu)
    return max(lmin, 1e-12), lmax * 1.01


# ---------------------------------------------------------------------- #
# dense factorization solvers (validation scale / MG coarse grids)
# ---------------------------------------------------------------------- #

def dense_lu_solver(A_dense: jnp.ndarray) -> Callable:
    """Exact dense solver via PRECOMPUTED EXPLICIT INVERSE.

    TPU-native choice: triangular backsolves (``lu_solve``) are sequential
    and latency-bound on TPU, while ``A_inv @ b`` is one MXU matmul — orders
    of magnitude faster per apply inside Krylov/V-cycle loops.  In
    preconditioner context the extra roundoff of the explicit inverse
    (~cond(A)*eps vs the backward-stable backsolve) is immaterial: FGMRES
    corrects it.  The inverse costs ~2x an LU factorization, paid once.
    """
    from ..runtime import Holder
    h = Holder(Ainv=jnp.linalg.inv(A_dense))

    def solve(b):
        return h.Ainv @ b
    solve._holder = h        # reachable for lift_jit via the owning solver
    return solve


def masked_spd_solver_dense(ell: ELL, pattern, bc_mask: np.ndarray,
                            dtype=None, nullspace: bool = False) -> Callable:
    """Dense exact solver of the symmetric bc-eliminated operator
    ``free A free + I_bc`` (validation path; exact like the reference's LU).

    ``nullspace=True`` (enclosed flows: pure-Neumann pressure Laplacian)
    adds the rank-1 constant shift ``(1/n) 1 1^T`` on the free block so the
    explicit inverse exists; combined with the constant-mode projections in
    the PCD apply this acts as the pseudo-inverse — the analogue of
    attaching a PETSc constant nullspace to the Ap KSP.
    """
    dt = dtype or ell.vals.dtype
    # built ON DEVICE (pattern.to_dense scatter): exporting the operator via
    # scipy would fetch device values — the first device->host transfer in a
    # process costs 30-500 s through the remote-attached TPU tunnel
    A = pattern.to_dense(ell.vals).astype(dt)
    bc = jnp.asarray(bc_mask, dt)    # device or host mask, no fetch
    free = 1.0 - bc
    A = free[:, None] * A * free[None, :] + jnp.diag(bc)
    if nullspace:
        n_free = jnp.maximum(jnp.sum(free), 1.0)
        A = A + jnp.outer(free, free) / n_free
    return dense_lu_solver(A)
