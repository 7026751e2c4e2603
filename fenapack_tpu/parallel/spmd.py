"""Hand-scheduled SPMD building blocks: shard_map row-block SpMV + reductions.

Complement to parallel/sharding.py (GSPMD): where GSPMD lets XLA place the
collectives, this module pins the distribution explicitly — the moral
equivalent of PETSc's MPIAIJ design (SURVEY.md section 5.8):

  * operators are row-block partitioned: device i owns rows
    [i*n_loc, (i+1)*n_loc) of every ELL matrix and vector (alignment padding
    guarantees divisibility — ``NSAssembler(row_align=n_devices)``);
  * SpMV: each device gathers the remote x entries it needs.  The general
    FEM graph makes per-neighbor halos data-dependent, so the portable
    implementation all-gathers x over ICI (jax.lax.all_gather) — on a ring
    this costs the same bandwidth as a halo exchange whenever the stencil
    spans neighbors, and XLA overlaps it with the local compute;
  * dot products / norms: local partial + ``psum`` (the MPI_Allreduce of the
    reference).

These primitives let a whole FGMRES run inside one ``shard_map`` region with
no host round-trips; fenapack_tpu's default multi-chip path remains GSPMD
(same math, compiler-chosen schedule), with this module as the explicit
fallback/optimization surface.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:                                    # jax >= 0.8
    from jax import shard_map
except ImportError:                     # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..ops.sparse import ELL


class RowBlockELL:
    """ELL matrix partitioned into contiguous row blocks over a mesh axis.

    Built host-side from a global ELL whose row count is divisible by the
    device count.  Inside a shard_map region, ``mv_local(x_local)`` computes
    the owned rows of ``A @ x`` (all-gathering x over the mesh axis).
    """

    def __init__(self, ell: ELL, axis: str):
        self.axis = axis
        self.ell = ell
        self.n_rows, _ = ell.shape
        self.n_cols = ell.n_cols

    def mv_local(self, vals_loc, cols_loc, x_loc):
        """Owned rows of A @ x from device-local blocks (shard_map body)."""
        x = jax.lax.all_gather(x_loc, self.axis, tiled=True)
        g = x[cols_loc]
        return jnp.sum(vals_loc * g, axis=1)


def pdot(a_loc, b_loc, axis: str):
    """Distributed dot product (allreduce over the mesh axis)."""
    return jax.lax.psum(jnp.vdot(a_loc, b_loc), axis)


def psum_minres_smooth(mv_local, dinv_loc, s_iters, b_loc, x_loc, axis: str):
    """Distributed minimal-residual (GMRES-polynomial) smoother step.

    The shard_map analogue of solvers.gmg._minres_smooth: Jacobi-scaled
    Krylov directions from the shard-local matvec, tiny Gram system psum'd
    over the mesh axis.  Robust on NONSYMMETRIC (convection-dominated)
    operators where damped Jacobi diverges."""
    r = b_loc - mv_local(x_loc)
    z = dinv_loc * r
    Zs, Ws = [], []
    for _ in range(s_iters):
        w = mv_local(z)
        Zs.append(z)
        Ws.append(w)
        z = dinv_loc * w
    W = jnp.stack(Ws)
    Z = jnp.stack(Zs)
    G = jax.lax.psum(W @ W.T, axis)
    c = jax.lax.psum(W @ r, axis)
    lam = 1e-7 * jnp.trace(G) / G.shape[0] + 1e-30
    y = jnp.linalg.solve(G + lam * jnp.eye(G.shape[0], dtype=G.dtype), c)
    return x_loc + Z.T @ y


def pnorm(a_loc, axis: str):
    return jnp.sqrt(jax.lax.psum(jnp.vdot(a_loc, a_loc), axis))


def make_spmd_spmv(ell: ELL, device_mesh: Mesh, axis: str = "dd"):
    """Return ``f(x) -> A @ x`` running as an explicit shard_map program:
    row-block local SpMV + all-gather of x over ICI.

    ``ell.shape[0]`` and ``ell.n_cols`` must be divisible by the mesh size.
    """
    n_dev = device_mesh.devices.size
    n_rows = ell.shape[0]
    if n_rows % n_dev or ell.n_cols % n_dev:
        raise ValueError(
            f"rows {n_rows} / cols {ell.n_cols} not divisible by {n_dev}; "
            "build the assembler with row_align=n_devices")

    rows = NamedSharding(device_mesh, P(axis))
    vals = jax.device_put(ell.vals, rows)
    cols = jax.device_put(ell.cols, rows)
    rb = RowBlockELL(ell, axis)

    @partial(shard_map, mesh=device_mesh,
             in_specs=(P(axis), P(axis), P(axis)), out_specs=P(axis))
    def spmv(vals_loc, cols_loc, x_loc):
        return rb.mv_local(vals_loc, cols_loc, x_loc)

    return lambda x: spmv(vals, cols, x)


def make_spmd_dot(device_mesh: Mesh, axis: str = "dd"):
    """Distributed dot product as a shard_map program (psum allreduce)."""

    @partial(shard_map, mesh=device_mesh, in_specs=(P(axis), P(axis)),
             out_specs=P())
    def dot(a_loc, b_loc):
        return pdot(a_loc, b_loc, axis)

    return dot


# --------------------------------------------------------------------- #
# ring halo exchange: the PETSc VecScatter of the TPU build
# --------------------------------------------------------------------- #

class RingHaloELL:
    """Row-block ELL SpMV whose remote reads are a ONE-HOP ring exchange.

    With bandwidth-reducing dof ordering (RCM, fem.dofmap) the columns
    referenced by device i's rows fall inside [start_{i-1}, end_{i+1}), so
    instead of all-gathering x (O(n) ICI traffic per SpMV) each device
    ppermutes a fixed-width halo slice to its ring neighbors (O(halo) —
    the moral equivalent of ring attention's neighbor passing and of
    PETSc's VecScatter ghost update, SURVEY.md section 5.7/5.8).

    Host-side setup verifies the one-hop property and rebases the column
    indices to the extended local vector [left_halo | x_loc | right_halo];
    construction raises if the sparsity needs more than one hop (fall back
    to :class:`RowBlockELL`).
    """

    def __init__(self, ell: ELL, n_dev: int, axis: str, valid=None):
        self.axis = axis
        n, K = ell.cols.shape
        n_cols = ell.n_cols
        if n % n_dev:
            raise ValueError(f"rows {n} not divisible by {n_dev}")
        if n_cols % n_dev:
            raise ValueError(f"cols {n_cols} not divisible by {n_dev}")
        n_loc = n // n_dev
        c_loc = n_cols // n_dev       # rectangular ops: col-space block size
        self.n_loc = n_loc
        self.c_loc = c_loc
        self.n_dev = n_dev
        cols = np.asarray(ell.cols)
        vals = np.asarray(ell.vals)
        # slot validity: the STRUCTURAL pattern when given.  Deriving it
        # from vals != 0 is only safe for constant operators — for
        # wind-dependent values (convection) entries that happen to be
        # zero at the current wind would shrink the halo, baking a
        # value-dependent layout into traced programs that are then reused
        # with other winds (bisected 2026-08-17: Re-2000 SPMD solves built
        # at the initial wind misindexed every later step's operators).
        valid_all = (np.asarray(valid) if valid is not None
                     else vals != 0)

        # halo width (in the COLUMN space): max reach of any row beyond the
        # column block co-owned with its row block, over all devices
        h = 0
        for i in range(n_dev):
            blk = cols[i * n_loc:(i + 1) * n_loc]
            # padded slots have col 0 and val 0 — exclude them from the
            # reach computation by re-pointing at the block start
            valid = valid_all[i * n_loc:(i + 1) * n_loc]
            c = np.where(valid, blk, i * c_loc)
            lo = int(c.min()) - i * c_loc
            hi = int(c.max()) - ((i + 1) * c_loc - 1)
            h = max(h, -lo, hi)
        if h > c_loc:
            raise ValueError(
                f"halo width {h} exceeds column block size {c_loc}: "
                "sparsity is not one-hop under this ordering; use "
                "RowBlockELL (all-gather) or reorder dofs (RCM)")
        self.halo = h

        # rebase columns to the extended local vector of device i:
        # ext = [x[start-h : start) | x_loc | x[end : end+h)]
        cols_ext = np.empty_like(cols)
        for i in range(n_dev):
            blk = slice(i * n_loc, (i + 1) * n_loc)
            c = np.where(valid_all[blk], cols[blk], i * c_loc)
            cols_ext[blk] = c - (i * c_loc - h)
        self.cols_ext = jnp.asarray(cols_ext.astype(np.int32))
        self.vals = ell.vals

    def mv_local(self, vals_loc, cols_loc, x_loc):
        """Owned rows of A @ x; one ppermute each way for the halos.
        ``x_loc`` is the device's slice of the COLUMN-space vector."""
        h, axis = self.halo, self.axis
        if h == 0:
            ext = x_loc
        else:
            nd = self.n_dev
            right = jax.lax.ppermute(          # my tail -> right neighbor
                x_loc[-h:], axis, [(i, i + 1) for i in range(nd - 1)])
            left = jax.lax.ppermute(           # my head -> left neighbor
                x_loc[:h], axis, [(i + 1, i) for i in range(nd - 1)])
            ext = jnp.concatenate([right, x_loc, left])
        g = ext[cols_loc]
        return jnp.sum(vals_loc * g, axis=1)


def make_ring_spmv(ell: ELL, device_mesh: Mesh, axis: str = "dd"):
    """``f(x) -> A @ x`` with one-hop ring halo exchange (see RingHaloELL)."""
    n_dev = device_mesh.devices.size
    rh = RingHaloELL(ell, n_dev, axis)
    rows = NamedSharding(device_mesh, P(axis))
    vals = jax.device_put(ell.vals, rows)
    cols = jax.device_put(rh.cols_ext, rows)

    @partial(shard_map, mesh=device_mesh,
             in_specs=(P(axis), P(axis), P(axis)), out_specs=P(axis))
    def spmv(vals_loc, cols_loc, x_loc):
        return rh.mv_local(vals_loc, cols_loc, x_loc)

    return lambda x: spmv(vals, cols, x)


# --------------------------------------------------------------------- #
# fully-SPMD FGMRES: one shard_map region, no host round-trips
# --------------------------------------------------------------------- #

def spmd_fgmres(device_mesh: Mesh, make_ops, operands, b,
                *, maxiter: int = 60, rtol: float = 1e-8,
                axis: str = "dd"):
    """Right-preconditioned FGMRES running entirely inside ``shard_map``.

    ``operands`` is a pytree of row-sharded arrays (operator values,
    rebased halo column indices, masks, diagonal inverses, ...);
    ``make_ops(operands_loc) -> (matvec_local, pc_local)`` builds the
    shard-local operator and preconditioner from the LOCAL blocks — they
    may use ring collectives themselves (e.g. :meth:`RingHaloELL.mv_local`;
    a Chebyshev PC built from it).  Krylov vectors stay sharded; the only
    cross-device traffic per iteration is the operator halos plus the psum
    reductions of the CGS2 projections — the explicit-schedule analogue of
    the GSPMD path in parallel/sharding.py, and the TPU equivalent of
    PETSc's MPI KSPFGMRES.

    Returns ``(x, iters, resnorm_estimate)``.
    """
    specs = jax.tree.map(lambda _: P(axis), operands)

    @partial(shard_map, mesh=device_mesh, in_specs=(specs, P(axis)),
             out_specs=(P(axis), P(), P()))
    def solve(operands_loc, b_loc):
        matvec_local, pc_local = make_ops(operands_loc)
        return _fgmres_local(matvec_local, pc_local, b_loc,
                             maxiter=maxiter, rtol=rtol, axis=axis)

    return solve(operands, b)


def _fgmres_local(matvec_local, pc_local, b_loc, *, maxiter: int,
                  rtol: float, axis: str):
    """Shard-local FGMRES body (callable inside any shard_map region)."""
    m = maxiter
    dtype = b_loc.dtype
    n_loc = b_loc.shape[0]
    bnorm = pnorm(b_loc, axis)
    tol = rtol * bnorm
    beta = bnorm
    V = jnp.zeros((m + 1, n_loc), dtype)
    V = V.at[0].set(b_loc / jnp.where(beta > 0, beta, 1.0))
    # mark the (all-zero) initial Z as device-varying: the while_loop body
    # writes shard-local pc outputs into it, and shard_map's vma type check
    # requires carry in/out agreement
    _pvary = getattr(jax.lax, "pcast", None)
    if _pvary is not None:              # jax >= 0.8
        Z = _pvary(jnp.zeros((m, n_loc), dtype), (axis,), to="varying")
    else:                               # pragma: no cover - older jax
        Z = jax.lax.pvary(jnp.zeros((m, n_loc), dtype), (axis,))
    R = jnp.zeros((m, m), dtype)
    cs = jnp.ones(m, dtype)
    sn = jnp.zeros(m, dtype)
    g = jnp.zeros(m + 1, dtype).at[0].set(beta)

    def cond(st):
        k, V, Z, R, cs, sn, g, done = st
        return jnp.logical_and(k < m, jnp.logical_not(done))

    def body(st):
        k, V, Z, R, cs, sn, g, done = st
        z = pc_local(V[k])
        w = matvec_local(z)
        Z = Z.at[k].set(z)
        mask = (jnp.arange(m + 1) <= k).astype(dtype)
        # CGS2 with distributed projections (psum'd (m+1,) dots)
        h1 = jax.lax.psum(V @ w, axis) * mask
        w = w - V.T @ h1
        h2 = jax.lax.psum(V @ w, axis) * mask
        w = w - V.T @ h2
        h = h1 + h2
        wnorm = pnorm(w, axis)
        h = h.at[k + 1].set(wnorm)
        V = V.at[k + 1].set(w / jnp.where(wnorm > 0, wnorm, 1.0))

        # replicated small algebra: rotation sweep (associative scan)
        alpha = -sn
        beta_ = cs * h[1:]

        def comb(x, y):
            a1, b1 = x
            a2, b2 = y
            return a2 * a1, a2 * b1 + b2

        A_, B_ = jax.lax.associative_scan(comb, (alpha, beta_))
        a = jnp.concatenate([h[:1], A_ * h[0] + B_])
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
        return (k + 1, V, Z, R, cs, sn, g, res <= tol)

    init = (jnp.array(0, jnp.int32), V, Z, R, cs, sn, g, beta <= tol)
    k, V, Z, R, cs, sn, g, done = jax.lax.while_loop(cond, body, init)

    active = jnp.arange(m) < k
    Rm = R + jnp.diag(jnp.where(active, 0.0, 1.0).astype(dtype))
    gm = jnp.where(active, g[:m], 0.0)
    y = jax.scipy.linalg.solve_triangular(Rm, gm, lower=False)
    x_loc = Z.T @ y
    res = jnp.abs(g[jnp.minimum(k, m)])
    return x_loc, k, res
