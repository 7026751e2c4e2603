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
from .spmd import RingHaloELL, RowBlockELL, shard_map


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
        try:
            self.ring = RingHaloELL(ell_new, n_dev, axis)
        except ValueError:
            # small/coarse levels (3D especially) can have RCM bandwidth
            # exceeding the per-device column block — fall back to the
            # all-gather SpMV: O(n_level) ICI traffic, bounded by the
            # geometric series of level sizes, and identical semantics
            self.ring = RowBlockELL(ell_new, axis)
            self.ring.n_loc = n_pad // n_dev
            self.ring.cols_ext = ell_new.cols    # NOT rebased:
            self.ring.halo = 0                   # global column indices

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
        rebased = not isinstance(l0.ring, RowBlockELL)
        for i in range(n_dev):                    # undo the halo rebasing
            blk = slice(i * n_loc, (i + 1) * n_loc)
            c = cols[blk] + ((i * n_loc - h) if rebased else 0)
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


# --------------------------------------------------------------------- #
# velocity (P2 vector) GMG — wind-dependent level operators
# --------------------------------------------------------------------- #

class SPMDVelocityGMG:
    """Sharded V-cycle for the velocity convection-diffusion block.

    Mirrors :func:`solvers.gmg.make_velocity_gmg_from_wind` in shard_map
    form: per-level RCM ring operators (relabeling PRECOMPUTED — per-step
    operand rebuild is a cheap host value permutation), P2 transfers via
    all-gathered coarse vectors (identity rows on surviving vertices +
    coarse-basis midpoint stencils), psum'd minimal-residual smoothing
    (the level operators are nonsymmetric), and a replicated dense coarse
    inverse rebuilt with the wind.

    Vectors are per-level u-space device-major: chunk i = [ux_i|uy_i(|uz_i)]
    of the padded scalar spaces.  ``newton=True`` re-discretizes the (d, d)
    reaction coupling per level (ring planes on the shared P2 pattern +
    a coupled dense coarse inverse).
    """

    def __init__(self, vh, device_mesh: Mesh, *, axis: str = "dd",
                 dtype=jnp.float64, smooth_iters: int = 4, cycles: int = 1,
                 supg: bool = False, theta: float = 1.0,
                 inv_dt: float = 0.0, newton: bool = False):
        self.vh = vh
        self.mesh = device_mesh
        self.axis = axis
        self.dtype = dtype
        self.smooth_iters = smooth_iters
        self.cycles = cycles
        # level-operator extras, mirroring gmg.make_velocity_gmg_from_wind's
        # level_values: SUPG stabilization (system_supg configs), the
        # theta-scheme mass term, and the Newton (d, d) reaction coupling
        # (re-discretized per level from the injected wind)
        self.supg = supg
        self.theta = float(theta)
        self.inv_dt = float(inv_dt)
        self.newton = newton
        n_dev = device_mesh.devices.size
        self.n_dev = n_dev
        self.d = vh.asms[0].dim
        d = self.d

        self.lv = []
        for l, asm in enumerate(vh.asms):
            n2 = asm.n2_real
            rank = rcm_rank(np.asarray(asm.W.V.cell_dofs), n2)
            n_pad = -(-n2 // n_dev) * n_dev
            inv = np.argsort(rank)
            pat = asm.pat_p2
            cols = np.asarray(pat.cols)
            used = np.zeros(pat.value_shape, dtype=bool).reshape(-1)
            used[np.asarray(pat._upos)] = True
            used = used.reshape(pat.value_shape)
            K = cols.shape[1]
            new_cols = np.zeros((n_pad, K), dtype=np.int32)
            new_used = np.zeros((n_pad, K), dtype=bool)
            nc_r = rank[cols[inv]]
            new_cols[:n2] = np.where(used[inv], nc_r, 0)
            new_used[:n2] = used[inv]
            # identity padding rows
            for i in range(n2, n_pad):
                new_cols[i, 0] = i
                new_used[i, 0] = True
            ell = ELL(cols=jnp.asarray(new_cols),
                      vals=jnp.asarray(new_used.astype(np.float64),
                                       dtype=dtype), n_cols=n_pad)
            try:
                ring = RingHaloELL(ell, n_dev, axis)
            except ValueError:
                # same policy as _Level (pressure side): small/coarse
                # levels whose RCM bandwidth exceeds the per-device block
                # fall back to the all-gather SpMV — identical semantics,
                # O(n_level) ICI traffic bounded by the level-size series
                ring = RowBlockELL(ell, axis)
                ring.n_loc = n_pad // n_dev
                ring.cols_ext = ell.cols         # NOT rebased: global ids
                ring.halo = 0
            mask_nat = np.asarray(vh.masks[l])[:n2]
            m = np.zeros(n_pad)
            m[:n2] = mask_nat[inv]
            m[n2:] = 1.0
            loc = n_pad // n_dev
            self.lv.append(dict(
                asm=asm, n2=n2, n_pad=n_pad, loc=loc, rank=rank, inv=inv,
                used=used, ring=ring, cols_ext=ring.cols_ext,
                mask=jnp.asarray(self._u_dm_arr(np.concatenate([m] * d),
                                                n_pad, loc), dtype),
                mask_s=m, diag_pos=np.asarray(pat.diag_pos)))

        # transfers: prolongation stencils in relabeled orderings
        self.tr = []
        for l, t in enumerate(vh.transfers):
            fine, coarse = self.lv[l + 1], self.lv[l]
            n2f, npf = fine["n2"], fine["n_pad"]
            nb2 = np.asarray(t.mid_dofs).shape[1]
            Pcols = np.zeros((npf, nb2), dtype=np.int32)
            Pw = np.zeros((npf, nb2))
            n_c = t.n_coarse
            inv_f = fine["inv"]
            mid_dofs = np.asarray(t.mid_dofs)
            mid_w = np.asarray(t.mid_w)
            for fpos in range(1):           # vectorized below
                pass
            nat = inv_f                      # fine natural id at each new pos
            is_vert = nat < n_c
            Pcols[:n2f][is_vert, 0] = coarse["rank"][nat[is_vert]]
            Pw[:n2f][is_vert, 0] = 1.0
            mids = nat[~is_vert] - n_c       # fine edge ids
            Pcols[:n2f][~is_vert] = coarse["rank"][mid_dofs[mids]]
            Pw[:n2f][~is_vert] = mid_w[mids]
            self.tr.append((jnp.asarray(Pcols), jnp.asarray(Pw, dtype)))

    def _u_dm_arr(self, stacked, n_pad, loc):
        """Stacked (d*n_pad,) -> u-space device-major ([ux_0|uy_0|ux_1|...])."""
        d, n_dev = self.d, self.n_dev
        out = np.zeros(d * n_pad, dtype=np.asarray(stacked).dtype)
        for a in range(d):
            j = np.arange(n_pad)
            dev = j // loc
            out[dev * d * loc + a * loc + (j - dev * loc)] = \
                stacked[a * n_pad + j]
        return out

    # ---------------------------------------------------------------- #
    def build_operands(self, wind_fine_asm):
        """Per-wind ring values + replicated dense coarse inverse.

        ``wind_fine_asm``: stacked (d*n2_fine,) velocity in the FINE
        assembler's natural ordering (numpy or device array)."""
        d = self.d
        rows = NamedSharding(self.mesh, P(self.axis))
        wind = np.asarray(wind_fine_asm)
        ops = {"levels": [], "coarse_inv": None}
        for l in reversed(range(len(self.lv))):
            lvd = self.lv[l]
            asm = lvd["asm"]
            n2 = lvd["n2"]
            wl = wind if l == len(self.lv) - 1 else wind_c
            if l > 0:
                t = self.vh.transfers[l - 1]
                nc = t.n_coarse
                wind_c = np.concatenate(
                    [wl[a * n2:a * n2 + nc] for a in range(d)])
            wl_dev = jnp.asarray(wl, self.dtype)
            A1 = np.asarray(asm.picard_matrix_values(wl_dev))
            if self.theta != 1.0 or self.inv_dt != 0.0:
                M2 = asm.const.M2
                M2v = np.asarray(M2.vals if M2 is not None
                                 else asm.mass2_values()).reshape(A1.shape)
                A1 = self.theta * A1 + self.inv_dt * M2v
            if self.supg:
                A1 = A1 + np.asarray(asm.supg_values(wl_dev)).reshape(
                    A1.shape)
            vals = A1.reshape(-1)  # ELL layout (n2, K)
            A1 = A1.reshape(lvd["used"].shape)
            K = lvd["used"].shape[1]
            n_pad = lvd["n_pad"]
            nv = np.zeros((n_pad, K))
            nv[:n2] = np.where(lvd["used"][lvd["inv"]], A1[lvd["inv"]], 0.0)
            nv[n2:, 0] = 1.0
            diag = np.zeros(n_pad)
            dnat = A1.reshape(-1)[lvd["diag_pos"]]
            diag[:n2] = dnat[lvd["inv"]]
            diag[n2:] = 1.0
            m = lvd["mask_s"]
            R = None
            if self.newton:
                # (d, d) reaction planes packed in the level layout
                # (no identity padding: the padding rows live in A1's plane)
                R = np.asarray(asm.newton_reaction_values(wl_dev))
                if self.theta != 1.0:
                    R = self.theta * R
                Rpk = np.zeros((n_pad, d * d * K))
                for a in range(d):
                    for bb in range(d):
                        Rab = R[a, bb].reshape(lvd["used"].shape)
                        Rpk[:n2, (a * d + bb) * K:(a * d + bb + 1) * K] = \
                            np.where(lvd["used"][lvd["inv"]],
                                     Rab[lvd["inv"]], 0.0)
            if R is not None:
                # per-component Jacobi diagonal incl. diag(R[a, a])
                comps = []
                for a in range(d):
                    da = diag.copy()
                    da[:n2] += (R[a, a].reshape(-1)[
                        lvd["diag_pos"]])[lvd["inv"]]
                    da = np.where(m > 0, 1.0, np.where(da != 0, da, 1.0))
                    comps.append(1.0 / da)
                dinv = self._u_dm_arr(np.concatenate(comps), n_pad,
                                      lvd["loc"])
            else:
                diag = np.where(m > 0, 1.0, np.where(diag != 0, diag, 1.0))
                dinv = self._u_dm_arr(np.concatenate([1.0 / diag] * d),
                                      n_pad, lvd["loc"])
            entry = [
                jax.device_put(jnp.asarray(nv, self.dtype), rows),
                jax.device_put(lvd["cols_ext"], rows),
                jax.device_put(jnp.asarray(dinv, self.dtype), rows),
                jax.device_put(lvd["mask"], rows)]
            if R is not None:
                entry.append(jax.device_put(jnp.asarray(Rpk, self.dtype),
                                            rows))
            ops["levels"].insert(0, tuple(entry))
            if l == 0:
                # replicated dense coarse inverse: block-diagonal over
                # components for Picard; full (d, d)-coupled for Newton
                import scipy.sparse as sp
                pat = asm.pat_p2

                def dense_of(flat_vals):
                    vn = flat_vals.reshape(-1)[np.asarray(pat._upos)]
                    Ad = sp.csr_matrix(
                        (vn, (pat._urow, pat._ucol)),
                        shape=(pat.n_rows, pat.n_cols)).toarray()[:n2, :n2]
                    rk = lvd["rank"]
                    Ar = np.zeros((n_pad, n_pad))
                    Ar[np.ix_(rk, rk)] = Ad
                    return Ar

                free = 1.0 - m
                Ar = dense_of(A1)
                for i in range(n2, n_pad):
                    Ar[i, i] = 1.0
                if R is None:
                    Ar = (free[:, None] * Ar * free[None, :]
                          + np.diag(m))
                    Ainv = np.linalg.inv(Ar)
                else:
                    blocks = [[Ar + dense_of(R[a, a]) if a == bb
                               else dense_of(R[a, bb])
                               for bb in range(d)] for a in range(d)]
                    A_full = np.block(blocks)
                    m_full = np.concatenate([m] * d)
                    f_full = 1.0 - m_full
                    A_full = (f_full[:, None] * A_full * f_full[None, :]
                              + np.diag(m_full))
                    Ainv = np.linalg.inv(A_full)
                ops["coarse_inv"] = jax.device_put(
                    jnp.asarray(Ainv, self.dtype),
                    NamedSharding(self.mesh, P()))
        for l, (pc, pw) in enumerate(self.tr):
            ops[f"P{l}"] = (jax.device_put(pc, rows),
                            jax.device_put(pw, rows))
        return ops

    def operand_specs(self, ops):
        specs = jax.tree.map(lambda x: P(self.axis), ops)
        specs["coarse_inv"] = P()
        return specs

    # ---------------------------------------------------------------- #
    def _bind_maps(self, l):
        """Lazy NUMPY index maps for the jit-safe :meth:`bind_operands`
        (numpy, never tracers — see SPMDPCDSolver._dev_maps)."""
        lvd = self.lv[l]
        m = lvd.get("_bind")
        if m is not None:
            return m
        d, n_dev = self.d, self.n_dev
        n2, n_pad, loc = lvd["n2"], lvd["n_pad"], lvd["loc"]
        udm_src = np.empty(d * n_pad, dtype=np.int64)
        for a in range(d):
            j = np.arange(n_pad)
            dev = j // loc
            udm_src[dev * d * loc + a * loc + (j - dev * loc)] = \
                a * n_pad + j
        m = dict(inv=lvd["inv"], used_inv=lvd["used"][lvd["inv"]],
                 diag_pos=lvd["diag_pos"], mask_s=lvd["mask_s"],
                 udm_src=udm_src)
        if l == 0:
            pat = lvd["asm"].pat_p2
            rk = lvd["rank"]
            urow, ucol = np.asarray(pat._urow), np.asarray(pat._ucol)
            keep = (urow < n2) & (ucol < n2)
            m.update(upos=np.asarray(pat._upos)[keep],
                     rr=rk[urow[keep]], cc=rk[ucol[keep]])
        lvd["_bind"] = m
        return m

    def bind_operands(self, wind_fine_nat, ops):
        """Jit-safe re-binding of the wind-dependent vgmg operands —
        the device-side mirror of :meth:`build_operands` for fused SPMD
        steps.  Level ring values, Jacobi diagonals, Newton reaction
        planes, and the replicated dense coarse inverse are all recomputed
        on device; cols/masks/transfers are reused from ``ops``.

        Caveat (untested on the axon TPU service): the coarse
        ``jnp.linalg.inv`` lowering at f64 may hit the same compile-service
        pathology as tall f64 QR/eigh — if it does, keep the host
        :meth:`build_operands` path for chip runs.
        """
        d, dt = self.d, self.dtype
        ops = dict(ops)
        levels = list(ops["levels"])
        wl = wind_fine_nat.astype(dt)
        wind_c = None
        for l in reversed(range(len(self.lv))):
            lvd = self.lv[l]
            asm = lvd["asm"]
            n2, n_pad = lvd["n2"], lvd["n_pad"]
            bm = self._bind_maps(l)
            if l < len(self.lv) - 1:
                wl = wind_c
            if l > 0:
                nc = self.vh.transfers[l - 1].n_coarse
                wind_c = jnp.concatenate(
                    [wl[a * n2:a * n2 + nc] for a in range(d)])
            A1 = asm.picard_matrix_values(wl).astype(dt)
            if self.theta != 1.0 or self.inv_dt != 0.0:
                M2 = asm.const.M2
                M2v = (M2.vals if M2 is not None
                       else asm.mass2_values()).astype(dt).reshape(A1.shape)
                A1 = self.theta * A1 + self.inv_dt * M2v
            if self.supg:
                A1 = A1 + asm.supg_values(wl).astype(dt).reshape(A1.shape)
            A1 = A1.reshape(lvd["used"].shape)
            K = lvd["used"].shape[1]
            nv = jnp.zeros((n_pad, K), dt)
            nv = nv.at[:n2].set(jnp.where(bm["used_inv"],
                                          A1[bm["inv"]], 0.0))
            nv = nv.at[n2:, 0].set(1.0)
            dnat = A1.reshape(-1)[bm["diag_pos"]]
            diag = jnp.ones(n_pad, dt).at[:n2].set(dnat[bm["inv"]])
            m = bm["mask_s"]
            R = None
            if self.newton:
                R = asm.newton_reaction_values(wl)
                if self.theta != 1.0:
                    R = self.theta * R
                Rpk = jnp.zeros((n_pad, d * d * K), dt)
                for a in range(d):
                    for bb in range(d):
                        Rab = R[a, bb].astype(dt).reshape(lvd["used"].shape)
                        Rpk = Rpk.at[
                            :n2, (a * d + bb) * K:(a * d + bb + 1) * K].set(
                            jnp.where(bm["used_inv"], Rab[bm["inv"]], 0.0))
            if R is not None:
                comps = []
                for a in range(d):
                    da = diag.at[:n2].add(
                        (R[a, a].astype(dt).reshape(-1)[
                            bm["diag_pos"]])[bm["inv"]])
                    da = jnp.where(m > 0, 1.0, jnp.where(da != 0, da, 1.0))
                    comps.append(1.0 / da)
                dinv = jnp.concatenate(comps)[bm["udm_src"]]
            else:
                dg = jnp.where(m > 0, 1.0, jnp.where(diag != 0, diag, 1.0))
                dinv = jnp.concatenate([1.0 / dg] * d)[bm["udm_src"]]
            old = levels[l]
            entry = [nv, old[1], dinv, old[3]]
            if R is not None:
                entry.append(Rpk)
            levels[l] = tuple(entry)
            if l == 0:
                free = 1.0 - m

                def dense_of(flat_vals):
                    Ar = jnp.zeros((n_pad, n_pad), dt)
                    return Ar.at[bm["rr"], bm["cc"]].add(
                        flat_vals.reshape(-1)[bm["upos"]].astype(dt))

                Ar = dense_of(A1)
                Ar = Ar.at[jnp.arange(n2, n_pad),
                           jnp.arange(n2, n_pad)].set(1.0)
                with jax.default_matmul_precision("highest"):
                    if R is None:
                        Am = (free[:, None] * Ar * free[None, :]
                              + jnp.diag(m.astype(dt)))
                        Ainv = jnp.linalg.inv(Am)
                    else:
                        blocks = [[Ar + dense_of(R[a, a]) if a == bb
                                   else dense_of(R[a, bb])
                                   for bb in range(d)] for a in range(d)]
                        A_full = jnp.block(blocks)
                        m_full = jnp.concatenate([m.astype(dt)] * d)
                        f_full = 1.0 - m_full
                        A_full = (f_full[:, None] * A_full * f_full[None, :]
                                  + jnp.diag(m_full))
                        Ainv = jnp.linalg.inv(A_full)
                ops["coarse_inv"] = Ainv
        ops["levels"] = levels
        return ops

    # ---------------------------------------------------------------- #
    # shard-local bodies (vectors: (d*loc,) per level)
    # ---------------------------------------------------------------- #
    def _mv(self, l, lops, x_loc):
        vals, cols, dinv, mask = lops[:4]
        Rv = lops[4] if len(lops) > 4 else None
        ring = self.lv[l]["ring"]
        d = self.d
        loc = self.lv[l]["loc"]
        K = vals.shape[1]
        free = 1.0 - mask
        xf = free * x_loc
        comps = [xf[a * loc:(a + 1) * loc] for a in range(d)]
        ys = [ring.mv_local(vals, cols, comps[a]) for a in range(d)]
        if Rv is not None:
            for a in range(d):
                for bb in range(d):
                    sl = Rv[:, (a * d + bb) * K:(a * d + bb + 1) * K]
                    ys[a] = ys[a] + ring.mv_local(sl, cols, comps[bb])
        return free * jnp.concatenate(ys) + mask * x_loc

    def _smooth(self, l, lops, b_loc, x_loc):
        from .spmd import psum_minres_smooth
        vals, cols, dinv, mask = lops[:4]
        mv = lambda x: self._mv(l, lops, x)
        for _ in range(max(1, self.smooth_iters // 4)):
            x_loc = psum_minres_smooth(mv, dinv, 4, b_loc, x_loc, self.axis)
        return x_loc

    def _cycle(self, l, b_loc, ops):
        lops = ops["levels"][l]
        vals, cols, dinv, mask = lops[:4]
        d = self.d
        if l == 0:
            # device-major gather -> per-component natural-RCM vectors
            b_full = jax.lax.all_gather(b_loc, self.axis, tiled=True)
            n_pad = self.lv[0]["n_pad"]
            loc = self.lv[0]["loc"]
            bf = b_full.reshape(self.n_dev, d, loc)
            i = jax.lax.axis_index(self.axis)
            if self.newton:
                # coupled coarse: one (d*n_pad) solve with the block inverse
                comp = jnp.concatenate(
                    [bf[:, a, :].reshape(n_pad) for a in range(d)])
                x = ops["coarse_inv"] @ comp
                out = [jax.lax.dynamic_slice_in_dim(
                    x[a * n_pad:(a + 1) * n_pad], i * loc, loc)
                    for a in range(d)]
                return jnp.concatenate(out)
            out = []
            for a in range(d):
                comp = bf[:, a, :].reshape(n_pad)
                x = ops["coarse_inv"] @ comp
                out.append(jax.lax.dynamic_slice_in_dim(x, i * loc, loc))
            return jnp.concatenate(out)
        free = 1.0 - mask
        x = self._smooth(l, lops, b_loc, jnp.zeros_like(b_loc))
        r = free * (b_loc - self._mv(l, lops, x))

        # restrict: per-component scatter into the full coarse vector + psum
        # (transfer operands are row-sharded: they arrive shard-local)
        Pc_loc, Pw_loc = ops[f"P{l - 1}"]
        i = jax.lax.axis_index(self.axis)
        loc_f = self.lv[l]["loc"]
        npc = self.lv[l - 1]["n_pad"]
        loc_c = self.lv[l - 1]["loc"]
        mask_c = ops["levels"][l - 1][3]
        rc_parts = []
        for a in range(d):
            ra = r[a * loc_f:(a + 1) * loc_f]
            rc = jnp.zeros(npc, r.dtype).at[Pc_loc].add(Pw_loc * ra[:, None])
            rc_parts.append(jax.lax.psum(rc, self.axis))
        rc_loc = jnp.concatenate([
            jax.lax.dynamic_slice_in_dim(rc_parts[a], i * loc_c, loc_c)
            for a in range(d)])
        rc_loc = rc_loc * (1.0 - mask_c)

        ec_loc = self._cycle(l - 1, rc_loc, ops)

        # prolong: all-gather coarse correction per component, local stencil
        ec_comp = [
            jax.lax.all_gather(ec_loc[a * loc_c:(a + 1) * loc_c],
                               self.axis, tiled=True) for a in range(d)]
        up = [jnp.sum(Pw_loc * ec_comp[a][Pc_loc], axis=1) for a in range(d)]
        x = x + free * jnp.concatenate(up)
        return self._smooth(l, lops, b_loc, x)

    def solve_local(self, b_loc, ops):
        L = len(self.lv)
        x = self._cycle(L - 1, b_loc, ops)
        for _ in range(self.cycles - 1):
            r = b_loc - self._mv(L - 1, ops["levels"][L - 1], x)
            x = x + self._cycle(L - 1, r, ops)
        return x
