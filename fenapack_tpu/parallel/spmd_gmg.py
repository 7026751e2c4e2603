"""Explicitly-scheduled SPMD geometric multigrid (pressure Laplacian).

The single-device GMG (solvers/gmg.py) expressed as shard-local compute +
ring/ICI collectives, composable inside a ``shard_map`` region — the
distributed-multigrid analogue of PETSc's ``PCMG`` over MPIAIJ operators
(SURVEY.md section 2.2 item 8, round-backlog "sharded GMG"):

  * every level is row-block partitioned over the mesh axis, after a
    PER-LEVEL RCM relabeling so the level operator's halo is one ring hop
    (parallel/spmd.py::RingHaloELL) — smoother traffic is O(halo), not the
    O(n) an all-gather of the level vector would cost;
  * inter-level transfers are parent-pair gathers with uncorrelated
    orderings across levels, so prolongation all-gathers the COARSE vector
    (O(n_coarse) = O(n_fine/4) in 2D, /8 in 3D — bounded by a geometric
    series) and restriction psums per-device partial coarse vectors;
  * the coarsest operator is solved with a REPLICATED dense inverse (every
    device holds the small factor; no traffic).

Numerically identical to the single-device V-cycle up to SpMV reduction
order: Jacobi smoothing, the transfers, and the masks are all permutation-
equivariant.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.sparse import ELL
from ..fem.dofmap import rcm_rank
from .spmd import RingHaloELL, shard_map


def _pad_to(x: np.ndarray, n: int, fill=0):
    if x.shape[0] == n:
        return x
    pad = np.full((n - x.shape[0],) + x.shape[1:], fill, dtype=x.dtype)
    return np.concatenate([x, pad])


class _Level:
    """One sharded level: relabeled+padded operator, smoother data, masks."""

    def __init__(self, ell: ELL, mask, n_real: int, n_dev: int, axis: str,
                 dtype, rank: np.ndarray):
        self.n_real = n_real
        self.rank = rank                          # old -> new (unpadded ids)
        n_pad = -(-n_real // n_dev) * n_dev
        self.n_pad = n_pad

        cols = np.asarray(ell.cols)
        vals = np.asarray(ell.vals, dtype=np.float64)
        # relabel rows and columns; padding rows become identity
        K = cols.shape[1]
        new_cols = np.zeros((n_pad, K), dtype=np.int32)
        new_vals = np.zeros((n_pad, K))
        inv = np.argsort(rank)                    # new -> old
        nc_r = rank[cols[inv]]                    # (n_real, K) relabeled
        valid = vals[inv] != 0
        new_cols[:n_real] = np.where(valid, nc_r, 0)
        new_vals[:n_real] = np.where(valid, vals[inv], 0.0)
        # identity rows on padding (diagonal 1 in slot 0)
        for i in range(n_real, n_pad):
            new_cols[i, 0] = i
            new_vals[i, 0] = 1.0
        ell_new = ELL(cols=jnp.asarray(new_cols),
                      vals=jnp.asarray(new_vals, dtype=dtype), n_cols=n_pad)
        self.ring = RingHaloELL(ell_new, n_dev, axis)

        diag = np.zeros(n_pad)
        dmask = new_cols == np.arange(n_pad)[:, None]
        np.add.at(diag, np.where(dmask)[0], new_vals[dmask])
        m = np.zeros(n_pad)
        if mask is not None:
            m[:n_real] = np.asarray(mask)[inv]
        m[n_real:] = 1.0                          # padding rows pinned
        diag = np.where(m > 0, 1.0, np.where(diag != 0, diag, 1.0))
        self.dinv = jnp.asarray(1.0 / diag, dtype=dtype)
        self.mask = jnp.asarray(m, dtype=dtype)
        self.vals = ell_new.vals
        self.cols = self.ring.cols_ext


class SPMDPressureGMG:
    """Sharded V-cycle for the PCD ``Ap`` subsolve.

    Built from a single-device :class:`solvers.gmg.PressureHierarchy`;
    ``solve_local`` runs inside any shard_map region over ``axis`` whose
    vectors are sharded in THIS object's fine-level ordering (``fine_rank``
    maps assembler dof ids to it; identity ordering of the caller can be
    bridged with :meth:`permute_in_local` / :meth:`permute_out_local`).
    """

    def __init__(self, hierarchy, device_mesh: Mesh, *, axis: str = "dd",
                 dtype=jnp.float32, smooth_iters: int = 2, cycles: int = 1,
                 omega: float = 0.67):
        self.axis = axis
        self.mesh = device_mesh
        self.smooth_iters = smooth_iters
        self.cycles = cycles
        self.omega = omega
        n_dev = device_mesh.devices.size
        self.n_dev = n_dev
        self.dtype = dtype

        self.levels = []
        ranks = []
        for (asm, Ap, mask) in hierarchy.levels:
            n_real = asm.n1_real
            rank = rcm_rank(np.asarray(asm.W.Q.cell_dofs), n_real)
            ranks.append(rank)
            self.levels.append(_Level(Ap, mask, n_real, n_dev, axis,
                                      dtype, rank))
        self.fine_rank = ranks[-1]

        # transfers: fine new-id f' <- parents coarse new-ids; padding fine
        # rows gather coarse slot with weight 0
        self.transfers = []
        for l, t in enumerate(hierarchy.transfers):
            fine, coarse = self.levels[l + 1], self.levels[l]
            pa = np.asarray(t.pa)
            pb = np.asarray(t.pb)
            inv_f = np.argsort(fine.rank)
            pa_n = np.zeros(fine.n_pad, dtype=np.int32)
            pb_n = np.zeros(fine.n_pad, dtype=np.int32)
            w = np.zeros(fine.n_pad)
            pa_n[:fine.n_real] = coarse.rank[pa[inv_f]]
            pb_n[:fine.n_real] = coarse.rank[pb[inv_f]]
            w[:fine.n_real] = 0.5
            self.transfers.append((jnp.asarray(pa_n), jnp.asarray(pb_n),
                                   jnp.asarray(w, dtype=dtype)))

        # replicated dense coarse inverse (relabeled, padded)
        l0 = self.levels[0]
        A = np.zeros((l0.n_pad, l0.n_pad))
        cols = np.asarray(l0.cols)                # rebased ext indices
        vals = np.asarray(l0.vals, dtype=np.float64)
        h = l0.ring.halo
        n_loc = l0.ring.n_loc
        for i in range(n_dev):                    # undo the halo rebasing
            blk = slice(i * n_loc, (i + 1) * n_loc)
            c = cols[blk] + (i * n_loc - h)
            c = np.clip(c, 0, l0.n_pad - 1)
            for rr in range(n_loc):
                row = i * n_loc + rr
                for k in range(cols.shape[1]):
                    A[row, np.clip(c[rr, k], 0, l0.n_pad - 1)] += vals[
                        i * n_loc + rr, k]
        m0 = np.asarray(l0.mask, dtype=np.float64)
        free = 1.0 - m0
        A = free[:, None] * A * free[None, :] + np.diag(m0)
        if not np.asarray(l0.mask[:l0.n_real]).any():
            # pure-Neumann coarse operator: rank-1 constant regularization
            A = A + np.outer(free, free) / max(free.sum(), 1.0)
        self.coarse_inv = jnp.asarray(np.linalg.inv(A), dtype=dtype)

    # ---------------------------------------------------------------- #
    # shard-local bodies
    # ---------------------------------------------------------------- #
    def _mv_masked(self, lvl, vals_loc, cols_loc, mask_loc, x_loc):
        """Symmetric bc-eliminated level operator: free A free + I_bc."""
        ring = self.levels[lvl].ring
        free = 1.0 - mask_loc
        y = ring.mv_local(vals_loc, cols_loc, free * x_loc)
        return free * y + mask_loc * x_loc

    def _smooth_local(self, lvl, b_loc, x_loc, vals_loc, cols_loc,
                      dinv_loc, mask_loc, iters):
        for _ in range(iters):
            r = b_loc - self._mv_masked(lvl, vals_loc, cols_loc, mask_loc,
                                        x_loc)
            x_loc = x_loc + self.omega * dinv_loc * r
        return x_loc

    def _cycle_local(self, lvl, b_loc, ops):
        if lvl == 0:
            # replicated coarse solve: gather the (tiny) coarse residual,
            # dense-inverse matmul, take back the local slice
            b_full = jax.lax.all_gather(b_loc, self.axis, tiled=True)
            x_full = self.coarse_inv @ b_full
            i = jax.lax.axis_index(self.axis)
            n_loc = self.levels[0].ring.n_loc
            return jax.lax.dynamic_slice_in_dim(x_full, i * n_loc, n_loc)
        vals_loc, cols_loc, dinv_loc, mask_loc = ops[lvl]
        pa, pb, w = self.transfers[lvl - 1]
        free = 1.0 - mask_loc
        x = self._smooth_local(lvl, b_loc, jnp.zeros_like(b_loc),
                               vals_loc, cols_loc, dinv_loc, mask_loc,
                               self.smooth_iters)
        ring = self.levels[lvl].ring
        r = free * (b_loc - self._mv_masked(lvl, vals_loc, cols_loc,
                                            mask_loc, x))

        # restriction: partial full-length coarse vector + psum
        i = jax.lax.axis_index(self.axis)
        nf_loc = ring.n_loc
        pa_loc = jax.lax.dynamic_slice_in_dim(pa, i * nf_loc, nf_loc)
        pb_loc = jax.lax.dynamic_slice_in_dim(pb, i * nf_loc, nf_loc)
        w_loc = jax.lax.dynamic_slice_in_dim(w, i * nf_loc, nf_loc)
        ncp = self.levels[lvl - 1].n_pad
        rc = jnp.zeros(ncp, b_loc.dtype).at[pa_loc].add(w_loc * r)
        rc = rc.at[pb_loc].add(w_loc * r)
        rc = jax.lax.psum(rc, self.axis)
        nc_loc = ncp // self.n_dev
        _, _, _, mask_c = ops[lvl - 1]
        rc_loc = jax.lax.dynamic_slice_in_dim(rc, i * nc_loc, nc_loc)
        rc_loc = rc_loc * (1.0 - mask_c)

        ec_loc = self._cycle_local(lvl - 1, rc_loc, ops)

        # prolongation: all-gather the coarse correction, gather parents
        ec = jax.lax.all_gather(ec_loc, self.axis, tiled=True)
        x = x + free * (w_loc * (ec[pa_loc] + ec[pb_loc]))
        return self._smooth_local(lvl, b_loc, x, vals_loc, cols_loc,
                                  dinv_loc, mask_loc, self.smooth_iters)

    def solve_local(self, b_loc, ops):
        """V-cycle(s) on the fine level; callable inside shard_map.

        ``ops`` is the pytree from :meth:`sharded_operands`, already
        shard-local.
        """
        L = len(self.levels)
        x = self._cycle_local(L - 1, b_loc, ops)
        vals_loc, cols_loc, _, mask_loc = ops[L - 1]
        for _ in range(self.cycles - 1):
            r = b_loc - self._mv_masked(L - 1, vals_loc, cols_loc, mask_loc,
                                        x)
            x = x + self._cycle_local(L - 1, r, ops)
        return x

    # ---------------------------------------------------------------- #
    # host-side operand plumbing
    # ---------------------------------------------------------------- #
    def sharded_operands(self):
        """Row-sharded per-level (vals, cols_ext, dinv, mask) pytree."""
        rows = NamedSharding(self.mesh, P(self.axis))
        out = []
        for lv in self.levels:
            out.append((jax.device_put(lv.vals, rows),
                        jax.device_put(lv.cols, rows),
                        jax.device_put(lv.dinv, rows),
                        jax.device_put(lv.mask, rows)))
        return out

    def operand_specs(self):
        return [(P(self.axis),) * 4 for _ in self.levels]

    def make_solver(self) -> Callable:
        """Standalone jitted sharded solve(b) on the fine level (vectors in
        this object's fine ordering, padded to ``levels[-1].n_pad``)."""
        ops = self.sharded_operands()
        specs = (self.operand_specs(), P(self.axis))

        @partial(shard_map, mesh=self.mesh, in_specs=specs,
                 out_specs=P(self.axis))
        def run(ops_loc, b_loc):
            return self.solve_local(b_loc, ops_loc)

        return jax.jit(lambda b: run(ops, b))
