"""Explicitly-scheduled SPMD Oseen solver: ring-halo FGMRES + PCD fieldsplit.

The full production multi-chip path in hand-scheduled ``shard_map`` form —
the TPU analogue of PETSc's MPI ``KSPFGMRES + PCFieldSplit + PCD`` stack
(SURVEY.md sections 2.2 item 8 / 5.8), completing what parallel/spmd.py
(ring SpMV + SPMD FGMRES) and parallel/spmd_gmg.py (sharded pressure GMG)
provide as pieces:

  * one GLOBAL device-major vector ``[ux_0|uy_0|p_0 | ux_1|uy_1|p_1 | ...]``
    — device i's shard is its contiguous chunk, holding its rows of every
    field.  Host-side ``pack``/``unpack`` map assembler ordering to it;
  * all operators (velocity A1, divergence D, gradient DT, pressure Kp, Mp)
    are :class:`RingHaloELL` row-blocks in the RCM-correlated orderings of
    ``TaylorHood(reorder=True)`` — every SpMV's remote reads are one ring
    hop over ICI (PETSc VecScatter analogue);
  * the PCD BRM1/BRM2 applies and the upper-triangular Schur fieldsplit run
    shard-local, with Chebyshev subsolves on ring operators; the Ap solve
    uses the sharded GMG (its own per-level ordering, bridged by a pressure
    all-gather — O(n_p) ICI traffic, small next to the velocity work);
  * the outer loop is the SPMD FGMRES of parallel/spmd.py (psum'd CGS2).

Validated against the single-device solver on the 8-device CPU mesh
(tests/test_spmd_pcd.py).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.sparse import ELL
from ..ops import subsolve
from .spmd import RingHaloELL, shard_map, _fgmres_local
from .spmd_gmg import SPMDPressureGMG


def _pad_len(n: int, n_dev: int) -> int:
    return -(-n // n_dev) * n_dev


def _pattern_used(pat) -> np.ndarray:
    """(n_rows, K) bool: which ELL slots are structural in the pattern."""
    used = np.zeros(pat.value_shape, dtype=bool).reshape(-1)
    used[np.asarray(pat._upos)] = True
    return used.reshape(pat.value_shape)


class _FieldRing:
    """RingHaloELL over a padded field: rows [0, n_rows_real) + identity-free
    padding rows; columns live in a possibly different (padded) field."""

    def __init__(self, ell: ELL, n_rows_real, n_rows_pad, n_cols_real,
                 n_cols_pad, n_dev, axis, dtype, diag_identity_pad=False,
                 used=None):
        cols = np.asarray(ell.cols)[:n_rows_real]
        vals = np.asarray(ell.vals)[:n_rows_real]
        K = cols.shape[1]
        # structural slot mask: MUST come from the sparsity pattern for
        # wind-dependent operators (vals != 0 is value-dependent and would
        # bake the current wind's accidental zeros into the ring layout)
        valid = (np.asarray(used)[:n_rows_real] if used is not None
                 else vals != 0)
        nc = np.zeros((n_rows_pad, K), dtype=np.int32)
        nv = np.zeros((n_rows_pad, K))
        va = np.zeros((n_rows_pad, K), dtype=bool)
        nc[:n_rows_real] = np.where(valid, cols, 0)
        nv[:n_rows_real] = np.where(valid, vals, 0.0)
        va[:n_rows_real] = valid
        if diag_identity_pad:
            for i in range(n_rows_real, n_rows_pad):
                nc[i, 0] = min(i, n_cols_pad - 1)
                nv[i, 0] = 1.0
                va[i, 0] = True
        e = ELL(cols=jnp.asarray(nc), vals=jnp.asarray(nv, dtype=dtype),
                n_cols=n_cols_pad)
        self.ring = RingHaloELL(e, n_dev, axis, valid=va)
        self.vals = e.vals
        self.cols = self.ring.cols_ext
        # device-side re-binding support: the layout is STRUCTURAL (pattern
        # slots + constant pad rows), so new wind-dependent values drop in
        # as a masked copy — jit-safe, no host round-trip per step
        self._n_rows_real = n_rows_real
        self._valid_real = jnp.asarray(valid)
        self._tail_vals = e.vals[n_rows_real:]

    def operands(self):
        return (self.vals, self.cols)

    def rebind(self, vals_full):
        """New ring VALUES from the pattern's ELL value array (same
        structural layout; jit-safe).  ``vals_full`` rows beyond the real
        row count (assembler alignment padding) are dropped; the ring's
        own pad rows keep their constant (identity/zero) values."""
        v = jnp.where(self._valid_real,
                      vals_full[:self._n_rows_real], 0.0)
        return jnp.concatenate([v.astype(self.vals.dtype),
                                self._tail_vals])


class SPMDPCDSolver:
    """Sharded PCD-preconditioned Oseen solve for one linearization point.

    Built from a single-device :class:`solvers.oseen.OseenSolver` whose
    assembler uses ``reorder=True`` (RCM; correlated orderings keep every
    operator one-hop) and NO alignment padding requirements — padding to the
    device count is handled here.  The wind enters through the A1/Kp element
    values at :meth:`build_operands` (re-binding per nonlinear step reuses
    the compiled solve).
    """

    def __init__(self, oseen, device_mesh: Mesh, *, axis: str = "dd",
                 ap_gmg: Optional[SPMDPressureGMG] = None,
                 velocity_gmg=None,
                 cheb_velocity_iters: int = 8,
                 maxiter: int = 60, rtol: float = 1e-6):
        self.oseen = oseen
        self.mesh = device_mesh
        self.axis = axis
        self.maxiter = maxiter
        self.rtol = rtol
        asm = oseen.asm
        self.asm = asm
        self.d = asm.dim
        n_dev = device_mesh.devices.size
        self.n_dev = n_dev
        dt = oseen.dtype
        self.dtype = dt

        self.n2r = asm.n2_real
        self.n1r = asm.n1_real
        self.n2p = _pad_len(self.n2r, n_dev)
        self.n1p = _pad_len(self.n1r, n_dev)
        self.loc2 = self.n2p // n_dev
        self.loc1 = self.n1p // n_dev
        self.nloc = self.d * self.loc2 + self.loc1
        self.n_glob = n_dev * self.nloc
        self.cheb_velocity_iters = cheb_velocity_iters
        self.ap_gmg = ap_gmg
        self.velocity_gmg = velocity_gmg

        # host-side pack/unpack index maps (assembler order <-> device-major)
        # global device-major index of scalar-P2 dof j: device i = j//loc2
        # owns it at i*nloc + (j - i*loc2) within component a's subslot.
        self._build_pack_maps()

        # masks.  Per-field operands are sharded in their OWN field
        # layouts: u-space arrays device-major over components
        # ([ux_0|uy_0|ux_1|uy_1|...], chunk i = [ux_i|uy_i]), pressure-space
        # arrays plain block layout (chunk i = p_i).
        mask_u = np.zeros(self.d * self.n2p)
        bm = np.asarray(oseen.bc_mask_u)
        for a in range(self.d):
            seg = bm[a * asm.n2: a * asm.n2 + self.n2r]
            mask_u[a * self.n2p: a * self.n2p + self.n2r] = seg
            mask_u[a * self.n2p + self.n2r: (a + 1) * self.n2p] = 1.0
        self.mask_u_dm = jnp.asarray(self._u_dm(mask_u), dt)

        mask_p = np.zeros(self.n1p)
        if oseen.pcd_mask is not None:
            mask_p[:self.n1r] = np.asarray(oseen.pcd_mask)[:self.n1r]
        mask_p[self.n1r:] = 1.0
        self.mask_p_dm = jnp.asarray(mask_p, dt)
        p_pad_only = np.zeros(self.n1p)
        p_pad_only[self.n1r:] = 1.0
        self.p_pad_dm = jnp.asarray(p_pad_only, dt)

        # Mp: Jacobi-Chebyshev on a ring operator (mesh-uniform bounds)
        c = oseen.const_lo
        self.mp_ring = _FieldRing(c.Mp, self.n1r, self.n1p, self.n1r,
                                  self.n1p, n_dev, axis, dt,
                                  diag_identity_pad=True)
        mp_diag = np.zeros(self.n1p)
        mp_diag[:self.n1r] = np.asarray(
            c.Mp.diag_from(asm.pat_p1.diag_pos))[:self.n1r]
        mp_diag[self.n1r:] = 1.0
        self.mp_dinv_dm = jnp.asarray(1.0 / mp_diag, dt)

        # Ap fallback (no GMG hierarchy supplied): Jacobi-Chebyshev on a
        # ring operator — the sharded analogue of pcd.ap.method="chebyshev".
        # Keeps small/validation problems and the driver dryrun on the SAME
        # code shape as production instead of hard-requiring ap_gmg.
        if ap_gmg is None:
            self.ap_ring = _FieldRing(c.Ap, self.n1r, self.n1p, self.n1r,
                                      self.n1p, n_dev, axis, dt,
                                      diag_identity_pad=True)
            ap_diag = np.ones(self.n1p)
            ap_diag[:self.n1r] = np.asarray(
                c.Ap.diag_from(asm.pat_p1.diag_pos))[:self.n1r]
            # masked rows (PCD Dirichlet + padding) act as identity
            ap_diag = np.where(np.asarray(self.mask_p_dm) > 0, 1.0, ap_diag)
            self.ap_dinv_dm = jnp.asarray(1.0 / ap_diag, dt)
            ap_cfg = oseen.config.pcd.ap
            if ap_cfg.bounds is not None:
                self._ap_bounds = tuple(ap_cfg.bounds)
            else:
                # setup-time host power iteration on the SEQUENTIAL masked
                # operator: the ring-local operator is the same matrix with
                # identity on masked rows, so the Jacobi-scaled spectrum
                # coincides (layout-independent)
                ap_mask_seq = oseen._union(
                    oseen.pcd_mask if oseen.has_pcd_bcs else None,
                    oseen.p_pad)
                op0 = c.Ap.with_vals(c.Ap.vals.astype(dt))
                diag0 = c.Ap.diag_from(asm.pat_p1.diag_pos).astype(dt)
                if ap_mask_seq is not None:
                    diag0 = jnp.where(ap_mask_seq > 0, 1.0, diag0)
                mv0 = oseen._masked_spd_matvec(op0, ap_mask_seq)
                self._ap_bounds = subsolve.power_bounds(
                    mv0, 1.0 / diag0, c.Ap.shape[0], dtype=dt)
            self._ap_iters = oseen.config.pcd.ap.iters

        # divergence / gradient rings (rectangular)
        self.D_rings = [
            _FieldRing(c.D[a], self.n1r, self.n1p, self.n2r, self.n2p,
                       n_dev, axis, dt) for a in range(self.d)]
        self.DT_rings = [
            _FieldRing(c.DT[a], self.n2r, self.n2p, self.n1r, self.n1p,
                       n_dev, axis, dt) for a in range(self.d)]

        if velocity_gmg is not None:
            # the velocity GMG's fine layout must equal this solver's
            # u-space layout: both RCM-rank the same natural P2 dofmap, so
            # the orderings coincide by construction — verify.
            lvf = velocity_gmg.lv[-1]
            if (lvf["n_pad"] != self.n2p
                    or not np.array_equal(lvf["rank"],
                                          np.asarray(asm.W.V.rank))):
                raise ValueError(
                    "SPMD velocity GMG fine ordering does not match the "
                    "solver's u-space layout (same mesh + RCM required)")

        # GMG ordering bridge: pressure ASSEMBLER order -> gmg fine order.
        # The outer assembler may itself be RCM-relabeled (reorder=True):
        # compose natural->asm (W.Q.rank) with natural->gmg (fine_rank).
        if ap_gmg is not None:
            q = asm.W.Q
            q_rank = (np.asarray(q.rank) if hasattr(q, "rank")
                      else np.arange(self.n1r, dtype=np.int32))
            g_rank = ap_gmg.fine_rank                # natural -> gmg id
            self._gmg_npad = ap_gmg.levels[-1].n_pad
            # gmg-order slot g holds assembler dof asm_of_gmg[g]
            asm_of_gmg = np.zeros(self._gmg_npad, dtype=np.int32)
            asm_of_gmg[g_rank] = q_rank              # for each natural n
            self._gmg_from_asm = jnp.asarray(asm_of_gmg)
            # assembler-order slot a holds gmg idx gmg_of_asm[a]
            gmg_of_asm = np.zeros(self.n1p, dtype=np.int32)
            gmg_of_asm[q_rank] = g_rank
            self._asm_from_gmg = jnp.asarray(gmg_of_asm)

        self._solve_fn = None
        self._rings = None

    # ---------------------------------------------------------------- #
    def _build_pack_maps(self):
        d, n_dev = self.d, self.n_dev
        loc2, loc1, nloc = self.loc2, self.loc1, self.nloc
        # device-major position of padded-field indices
        u_pos = np.empty(d * self.n2p, dtype=np.int64)
        for a in range(d):
            j = np.arange(self.n2p)
            dev = j // loc2
            u_pos[a * self.n2p:(a + 1) * self.n2p] = (
                dev * nloc + a * loc2 + (j - dev * loc2))
        p_pos = np.empty(self.n1p, dtype=np.int64)
        j = np.arange(self.n1p)
        dev = j // loc1
        p_pos[:] = dev * nloc + d * loc2 + (j - dev * loc1)
        self._u_pos, self._p_pos = u_pos, p_pos

    def _pack_u(self, u_padded: np.ndarray) -> np.ndarray:
        """Scatter a padded stacked-velocity vector into a device-major
        global vector (pressure slots left zero)."""
        out = np.zeros(self.n_glob, dtype=u_padded.dtype)
        out[self._u_pos] = u_padded
        return out

    def _u_dm(self, u_padded: np.ndarray) -> np.ndarray:
        """Stacked padded u (d*n2p) -> u-space device-major (d*n2p)."""
        d, loc2, n_dev = self.d, self.loc2, self.n_dev
        out = np.zeros(d * self.n2p, dtype=u_padded.dtype)
        for a in range(d):
            j = np.arange(self.n2p)
            dev = j // loc2
            out[dev * d * loc2 + a * loc2 + (j - dev * loc2)] = \
                u_padded[a * self.n2p + j]
        return out

    def _pack_p(self, p_padded: np.ndarray) -> np.ndarray:
        out = np.zeros(self.n_glob, dtype=p_padded.dtype)
        out[self._p_pos] = p_padded
        return out

    def pack(self, u_asm: np.ndarray, p_asm: np.ndarray) -> np.ndarray:
        """Assembler-order (stacked u over n2-padded comps, p) -> global
        device-major vector."""
        asm = self.asm
        up = np.zeros(self.d * self.n2p)
        for a in range(self.d):
            up[a * self.n2p: a * self.n2p + self.n2r] = \
                np.asarray(u_asm)[a * asm.n2: a * asm.n2 + self.n2r]
        pp = np.zeros(self.n1p)
        pp[:self.n1r] = np.asarray(p_asm)[:self.n1r]
        out = np.zeros(self.n_glob)
        out[self._u_pos] = up
        out[self._p_pos] = pp
        return out

    def unpack(self, x_dm: np.ndarray):
        """Global device-major vector -> (u stacked assembler-padded, p)."""
        asm = self.asm
        x_dm = np.asarray(x_dm)
        up = x_dm[self._u_pos]
        pp = x_dm[self._p_pos]
        u = np.zeros(self.d * asm.n2)
        for a in range(self.d):
            u[a * asm.n2: a * asm.n2 + self.n2r] = \
                up[a * self.n2p: a * self.n2p + self.n2r]
        p = np.zeros(asm.n1)
        p[:self.n1r] = pp[:self.n1r]
        return u, p

    # ---------------------------------------------------------------- #
    def build_operands(self, wind_asm):
        """Ring operators for the current wind: velocity A1 and pressure Kp
        element values from the single-device assembler (host path), packed
        into ring layouts."""
        oseen, asm, dt = self.oseen, self.asm, self.dtype
        A1vals, R = oseen._operator_values(wind_asm.astype(self.dtype))
        if (R is not None and self.velocity_gmg is not None
                and not getattr(self.velocity_gmg, "newton", False)):
            raise ValueError(
                "Newton linearization with a Picard-level velocity GMG: "
                "construct SPMDVelocityGMG(..., newton=True) so the levels "
                "carry the reaction coupling")
        kpvals = asm.kp_values(
            wind_asm.astype(self.dtype),
            surface=(oseen.config.pcd.variant == "BRM2")).astype(dt)
        A1 = asm.pat_p2.matrix(A1vals)
        Kp = asm.pat_p1.matrix(kpvals)
        used_p2 = _pattern_used(asm.pat_p2)
        used_p1 = _pattern_used(asm.pat_p1)
        a1_ring = _FieldRing(A1, self.n2r, self.n2p, self.n2r, self.n2p,
                             self.n_dev, self.axis, dt,
                             diag_identity_pad=True, used=used_p2)
        kp_ring = _FieldRing(Kp, self.n1r, self.n1p, self.n1r, self.n1p,
                             self.n_dev, self.axis, dt, used=used_p1)
        # Newton: the (d, d) convective-reaction block u_b d_b(u) rides as
        # d^2 extra rings on the SAME P2 pattern (reference-parity:
        # fenapack's Newton J vs Picard Oseen operator differ only here)
        R_rings = None
        if R is not None:
            used_p2r = _pattern_used(asm.pat_p2)
            R_rings = [[_FieldRing(asm.pat_p2.matrix(R[a, b]), self.n2r,
                                   self.n2p, self.n2r, self.n2p,
                                   self.n_dev, self.axis, dt, used=used_p2r)
                        for b in range(self.d)] for a in range(self.d)]
        a1_diag = np.zeros(self.n2p)
        a1_diag[:self.n2r] = np.asarray(
            A1.diag_from(asm.pat_p2.diag_pos))[:self.n2r]
        a1_diag[self.n2r:] = 1.0
        # velocity Chebyshev bounds via host power iteration on the diagonal-
        # scaled SYMMETRIC PART surrogate: bounds only shape the polynomial
        lo, hi = self.oseen.config.velocity.bounds or (0.06, 1.95)

        rows = NamedSharding(self.mesh, P(self.axis))
        put = lambda x: jax.device_put(x, rows)
        ops = {
            "a1": tuple(put(x) for x in a1_ring.operands()),
            "kp": tuple(put(x) for x in kp_ring.operands()),
            "mp": tuple(put(x) for x in self.mp_ring.operands()),
            "D": tuple(tuple(put(x) for x in r.operands())
                       for r in self.D_rings),
            "DT": tuple(tuple(put(x) for x in r.operands())
                        for r in self.DT_rings),
            "a1_dinv": put(self._put_u_diag(a1_diag) if R is None else
                           self._put_u_diag_newton(a1_diag, R)),
            "mask_u": put(self.mask_u_dm),
            "mask_p": put(self.mask_p_dm),
            "p_pad": put(self.p_pad_dm),
            "mp_dinv": put(self.mp_dinv_dm),
        }
        self._a1_bounds = (float(lo), float(hi))
        if self.velocity_gmg is not None:
            # the velocity GMG's assemblers are NATURAL-ordered; the wind
            # arrives in the (RCM-reordered) solver-assembler ordering —
            # bridge per component (new id = rank[nat], so nat = new[rank]).
            # Passing the reordered wind through unpermuted scrambles the
            # level convection operators: invisible at diffusion-dominated
            # Re, fatal at Re >~ 1000 (bisected 2026-08-17).
            rank = (np.asarray(asm.W.V.rank)
                    if getattr(asm.W.V, "rank", None) is not None
                    else np.arange(self.n2r))
            wind_np = np.asarray(wind_asm)
            ops["vgmg"] = self.velocity_gmg.build_operands(
                np.concatenate([
                    wind_np[a * asm.n2: a * asm.n2 + self.n2r][rank]
                    for a in range(self.d)]))
        if self.ap_gmg is None:
            ops["ap"] = tuple(put(x) for x in self.ap_ring.operands())
            ops["ap_dinv"] = put(self.ap_dinv_dm)
        if self.ap_gmg is not None:
            ops["gmg"] = self.ap_gmg.sharded_operands()
            ops["gmg_from_asm"] = jax.device_put(self._gmg_from_asm,
                                                 NamedSharding(self.mesh, P()))
            ops["asm_from_gmg"] = jax.device_put(self._asm_from_gmg,
                                                 NamedSharding(self.mesh, P()))
        if R_rings is not None:
            ops["R"] = tuple(tuple(tuple(put(x) for x in r.operands())
                                   for r in row) for row in R_rings)
        # ring objects used inside the local body (static layout info)
        self._rings = dict(a1=a1_ring, kp=kp_ring, R=R_rings)
        return ops

    def _put_u_diag(self, a1_diag):
        up = np.zeros(self.d * self.n2p)
        for a in range(self.d):
            up[a * self.n2p:(a + 1) * self.n2p] = a1_diag
        return jnp.asarray(self._u_dm(1.0 / up), self.dtype)

    def _put_u_diag_newton(self, a1_diag, R):
        """Per-component Jacobi diagonal incl. the reaction block's
        diagonal contribution diag(R[a, a])."""
        asm = self.asm
        up = np.zeros(self.d * self.n2p)
        for a in range(self.d):
            da = np.array(a1_diag)
            da[:self.n2r] += np.asarray(asm.pat_p2.matrix(R[a, a]).diag_from(
                asm.pat_p2.diag_pos))[:self.n2r]
            up[a * self.n2p:(a + 1) * self.n2p] = da
        return jnp.asarray(self._u_dm(1.0 / up), self.dtype)

    # ---------------------------------------------------------------- #
    # shard-local solve body
    # ---------------------------------------------------------------- #
    def _local_ops(self, ops_loc):
        d = self.d
        loc2, loc1 = self.loc2, self.loc1
        axis = self.axis
        a1_ring = self._rings["a1"].ring
        kp_ring = self._rings["kp"].ring
        mp_ring = self.mp_ring.ring
        D_rings = [r.ring for r in self.D_rings]
        DT_rings = [r.ring for r in self.DT_rings]

        def split(x_loc):
            us = [x_loc[a * loc2:(a + 1) * loc2] for a in range(d)]
            return us, x_loc[d * loc2:]

        def join(us, p):
            return jnp.concatenate(us + [p])

        a1v, a1c = ops_loc["a1"]
        R_ops = ops_loc.get("R")
        R_rings = (None if R_ops is None else
                   [[fr.ring for fr in row] for row in self._rings["R"]])
        kpv, kpc = ops_loc["kp"]
        mpv, mpc = ops_loc["mp"]
        mask_u = ops_loc["mask_u"]
        mask_p = ops_loc["mask_p"]
        p_pad = ops_loc["p_pad"]
        mp_dinv = ops_loc["mp_dinv"]
        a1_dinv = ops_loc["a1_dinv"]
        # u-space locals are [ux_i | uy_i] (d*loc2); pressure locals (loc1)
        mus = [mask_u[a * loc2:(a + 1) * loc2] for a in range(d)]
        fus = [1.0 - m for m in mus]

        def reaction_mv(a, ufs):
            """sum_b R[a, b] u_b (Newton coupling; zero for Picard)."""
            y = 0.0
            if R_rings is not None:
                for b in range(d):
                    rv, rc = R_ops[a][b]
                    y = y + R_rings[a][b].mv_local(rv, rc, ufs[b])
            return y

        def matvec_local(x_loc):
            us, p = split(x_loc)
            ufs = [f * u for f, u in zip(fus, us)]
            ys = []
            for a in range(d):
                y = a1_ring.mv_local(a1v, a1c, ufs[a]) + reaction_mv(a, ufs)
                dv, dc = ops_loc["DT"][a]
                y = y + DT_rings[a].mv_local(dv, dc, p)
                ys.append(fus[a] * y + mus[a] * us[a])
            yp = jnp.zeros_like(p)
            for a in range(d):
                dv, dc = ops_loc["D"][a]
                yp = yp + D_rings[a].mv_local(dv, dc, ufs[a])
            yp = yp + p_pad * p
            return join(ys, yp)

        # velocity subsolve: Jacobi-Chebyshev on the masked ring operator
        lo, hi = self._a1_bounds

        def vel_mv(u_all):
            us = [u_all[a * loc2:(a + 1) * loc2] for a in range(d)]
            ufs = [f * u for f, u in zip(fus, us)]
            ys = []
            for a in range(d):
                y = a1_ring.mv_local(a1v, a1c, ufs[a]) + reaction_mv(a, ufs)
                ys.append(fus[a] * y + mus[a] * us[a])
            return jnp.concatenate(ys)

        # iterated minimal-residual polynomial (robust on the nonsymmetric
        # velocity block, where Chebyshev stalls — measured); shared with
        # the sharded-GMG smoother
        from .spmd import psum_minres_smooth

        def _psum_minres(mv, dinv, s_iters, b, x):
            return psum_minres_smooth(mv, dinv, s_iters, b, x, self.axis)

        rounds = max(1, self.cheb_velocity_iters // 4)

        if self.velocity_gmg is not None:
            vgmg = self.velocity_gmg
            vgmg_ops = ops_loc["vgmg"]

            def vel_solve(b):
                return vgmg.solve_local(b, vgmg_ops)
        else:
            def vel_solve(b):
                x = jnp.zeros_like(b)
                for _ in range(rounds):
                    x = _psum_minres(vel_mv, a1_dinv, 4, b, x)
                return x

        # honor pcd.mp.* overrides (bounds/iters) like the sequential path;
        # the SPMD Mp subsolve is always the Chebyshev polynomial (other
        # methods have no ring-local formulation here)
        mp_cfg = self.oseen.config.pcd.mp
        mp_lmin, mp_lmax = mp_cfg.bounds or (0.5, 2.5)  # Wathen tri+tet
        mp_iters = mp_cfg.iters

        def mp_solve(r):
            fp = 1.0 - p_pad

            def mp_mv(x):
                y = mp_ring.mv_local(mpv, mpc, fp * x)
                return fp * y + p_pad * x
            ch = subsolve.chebyshev_solver(mp_mv, mp_dinv, mp_lmin, mp_lmax,
                                           mp_iters)
            return ch(r)

        if self.ap_gmg is not None:
            gmg_ops = ops_loc["gmg"]
            g_from_a = ops_loc["gmg_from_asm"]
            a_from_g = ops_loc["asm_from_gmg"]
            gmg = self.ap_gmg
            npad_g = self._gmg_npad
            nloc_g = npad_g // self.n_dev

            def ap_solve(r_loc):
                # bridge orderings: all-gather assembler-order pressure,
                # gather the gmg-order local slice
                r_full = jax.lax.all_gather(r_loc, self.axis, tiled=True)
                i = jax.lax.axis_index(self.axis)
                idx = jax.lax.dynamic_slice_in_dim(g_from_a, i * nloc_g,
                                                   nloc_g)
                rg = r_full[idx]          # gmg-order local slice (asm vals)
                eg = gmg.solve_local(rg, gmg_ops)
                e_full = jax.lax.all_gather(eg, self.axis, tiled=True)
                idx2 = jax.lax.dynamic_slice_in_dim(a_from_g, i * loc1,
                                                    loc1)
                # padding slots map to gmg slot 0: zero them out
                return (1.0 - p_pad) * e_full[idx2]
        else:
            # Chebyshev-Ap fallback (same masked-ring shape as mp_solve);
            # chebyshev has no inner products, so it is shard-local-safe
            apv, apc = ops_loc["ap"]
            ap_dinv = ops_loc["ap_dinv"]
            ap_ring = self.ap_ring.ring
            ap_lmin, ap_lmax = self._ap_bounds
            ap_iters = self._ap_iters

            def ap_solve(r_loc):
                free_ap = 1.0 - mask_p

                def ap_mv(x):
                    y = ap_ring.mv_local(apv, apc, free_ap * x)
                    return free_ap * y + mask_p * x
                ch = subsolve.chebyshev_solver(ap_mv, ap_dinv, ap_lmin,
                                               ap_lmax, ap_iters)
                return free_ap * ch(r_loc)

        variant = self.oseen.config.pcd.variant
        free_p = 1.0 - mask_p
        # theta-scheme: Fp = Mp/dt + theta (nu Ap + Kp) — same factored
        # applies as solvers/pcd.py (steady: theta=1, inv_dt=0)
        theta, inv_dt = self.oseen.theta, self.oseen.inv_dt

        # enclosed flow (no pcd BCs): constant pressure nullspace projected
        # out around the Ap solve and from the Schur output — the sharded
        # form of solvers/pcd.py's project() (mean over REAL dofs via psum)
        nullspace = getattr(self.oseen, "_nullspace", False)
        act_p = 1.0 - p_pad
        n_act = float(self.n1r)

        def project(x):
            if not nullspace:
                return x
            s = jax.lax.psum(jnp.sum(x * act_p), self.axis)
            return x - (s / n_act) * act_p

        def ap_inv(x):
            if nullspace:
                return project(ap_solve(project(x)))
            return ap_solve(x)

        def kp_mv(x):
            return kp_ring.mv_local(kpv, kpc, x)

        if variant == "BRM1":
            def schur(r_p):
                w1 = ap_inv(free_p * r_p)
                return project(-(theta * mp_solve(r_p + kp_mv(w1))
                                 + inv_dt * w1))
        else:
            def schur(r_p):
                w1 = mp_solve(r_p)
                w2 = free_p * (theta * kp_mv(w1) + inv_dt * r_p)
                return project(-(theta * w1 + ap_inv(w2)))

        def pc_local(r_loc):
            us, rp = split(r_loc)
            zp = schur(rp)
            # z_u = A^{-1} (r_u - B^T z_p)
            rhs = []
            for a in range(d):
                dv, dc = ops_loc["DT"][a]
                rhs.append(fus[a] * (us[a] - DT_rings[a].mv_local(dv, dc,
                                                                  zp)))
            zu = vel_solve(jnp.concatenate(rhs))
            zus = [fus[a] * zu[a * loc2:(a + 1) * loc2] + mus[a] * us[a]
                   for a in range(d)]
            return join(zus, zp)

        return matvec_local, pc_local

    def _make_run(self, ops):
        """The shard_map'd sharded solve ``run(ops, b_dm)`` (unjitted, for
        composition into larger fused programs)."""
        axis = self.axis
        # specs: replicated index maps, row-sharded everything else
        ops_specs = jax.tree.map(lambda x: P(axis), ops)
        if self.ap_gmg is not None:
            ops_specs["gmg_from_asm"] = P()
            ops_specs["asm_from_gmg"] = P()
        if self.velocity_gmg is not None:
            ops_specs["vgmg"] = self.velocity_gmg.operand_specs(ops["vgmg"])

        @partial(shard_map, mesh=self.mesh, in_specs=(ops_specs, P(axis)),
                 out_specs=(P(axis), P(), P()))
        def run(ops_loc, b_loc):
            matvec_local, pc_local = self._local_ops(ops_loc)
            return _fgmres_local(matvec_local, pc_local, b_loc,
                                 maxiter=self.maxiter, rtol=self.rtol,
                                 axis=axis)

        return run

    def solve(self, ops, b_dm):
        if self._solve_fn is None:
            self._solve_fn = jax.jit(self._make_run(ops))
        return self._solve_fn(ops, jnp.asarray(b_dm, self.dtype))

    # ---------------------------------------------------------------- #
    # device-side per-step re-binding (fused-step support)
    # ---------------------------------------------------------------- #
    def _dev_maps(self):
        """Device index maps for jit-safe pack/unpack/_u_dm (lazy)."""
        m = getattr(self, "_devmaps", None)
        if m is not None:
            return m
        d, n2, n2r, n2p = self.d, self.asm.n2, self.n2r, self.n2p
        loc2 = self.loc2
        pad_u_dst = np.concatenate(
            [a * n2p + np.arange(n2r) for a in range(d)])
        pad_u_src = np.concatenate(
            [a * n2 + np.arange(n2r) for a in range(d)])
        # u-space device-major permutation: out[o] = up[udm_src[o]]
        udm_src = np.empty(d * n2p, dtype=np.int64)
        for a in range(d):
            j = np.arange(n2p)
            dev = j // loc2
            udm_src[dev * d * loc2 + a * loc2 + (j - dev * loc2)] = \
                a * n2p + j
        # cache NUMPY index arrays: jnp constants created while tracing a
        # fused step would cache as tracers and leak out of the trace
        m = dict(pad_u_dst=pad_u_dst, pad_u_src=pad_u_src, udm_src=udm_src,
                 u_pos=self._u_pos, p_pos=self._p_pos)
        self._devmaps = m
        return m

    def pack_dev(self, u_asm, p_asm):
        """jit-safe :meth:`pack` (assembler order -> device-major)."""
        m = self._dev_maps()
        dt = self.dtype
        up = jnp.zeros(self.d * self.n2p, dt).at[m["pad_u_dst"]].set(
            u_asm[m["pad_u_src"]].astype(dt))
        out = jnp.zeros(self.n_glob, dt).at[m["u_pos"]].set(up)
        return out.at[m["p_pos"][:self.n1r]].set(
            p_asm[:self.n1r].astype(dt))

    def unpack_dev(self, x_dm):
        """jit-safe :meth:`unpack` -> (u stacked assembler-padded, p)."""
        m = self._dev_maps()
        up = x_dm[m["u_pos"]]
        u = jnp.zeros(self.d * self.asm.n2, x_dm.dtype).at[
            m["pad_u_src"]].set(up[m["pad_u_dst"]])
        p = jnp.zeros(self.asm.n1, x_dm.dtype).at[:self.n1r].set(
            x_dm[m["p_pos"][:self.n1r]])
        return u, p

    def bind_operands(self, wind_asm, ops):
        """Jit-safe re-binding of the wind-dependent ``ops`` entries
        (a1/kp/R ring values + the Jacobi diagonal + velocity-GMG levels)
        on DEVICE — the fused-step replacement for the host
        :meth:`build_operands` after the template has been built once."""
        oseen, asm, dt = self.oseen, self.asm, self.dtype
        rings = self._rings
        if rings is None or rings.get("a1") is None:
            raise RuntimeError("call build_operands once to set the "
                               "structural ring layouts")
        wind = wind_asm.astype(dt)
        A1vals, R = oseen._operator_values(wind)
        kpvals = asm.kp_values(
            wind, surface=(oseen.config.pcd.variant == "BRM2")).astype(dt)
        ops = dict(ops)
        ops["a1"] = (rings["a1"].rebind(A1vals), ops["a1"][1])
        ops["kp"] = (rings["kp"].rebind(kpvals), ops["kp"][1])
        if R is not None:
            ops["R"] = tuple(tuple(
                (rings["R"][a][b].rebind(R[a, b]), ops["R"][a][b][1])
                for b in range(self.d)) for a in range(self.d))
        # Jacobi diagonal (incl. Newton reaction diag), u-dm layout
        m = self._dev_maps()
        n2r, n2p = self.n2r, self.n2p
        diag = asm.pat_p2.matrix(A1vals).diag_from(asm.pat_p2.diag_pos)
        base = jnp.ones(n2p, dt).at[:n2r].set(diag[:n2r].astype(dt))
        comps = []
        for a in range(self.d):
            da = base
            if R is not None:
                rd = asm.pat_p2.matrix(R[a, a]).diag_from(
                    asm.pat_p2.diag_pos)
                da = da.at[:n2r].add(rd[:n2r].astype(dt))
            comps.append(da)
        up = jnp.concatenate(comps)
        ops["a1_dinv"] = (1.0 / up)[m["udm_src"]]
        if self.velocity_gmg is not None:
            # bridge to the vgmg's NATURAL ordering (see build_operands)
            rank = (np.asarray(asm.W.V.rank)
                    if getattr(asm.W.V, "rank", None) is not None
                    else np.arange(n2r))
            wind_nat = jnp.concatenate(
                [wind[a * asm.n2: a * asm.n2 + n2r][rank]
                 for a in range(self.d)])
            ops["vgmg"] = self.velocity_gmg.bind_operands(wind_nat,
                                                          ops["vgmg"])
        return ops


class SPMDNonlinearSolver:
    """Picard/Newton driver whose linear solves run on the explicit-SPMD path.

    Production wiring of :class:`SPMDPCDSolver`: the nonlinear loop mirrors
    ``solvers.nonlinear.NonlinearSolver`` (the reference's
    ``PCDNewtonSolver`` loop, fenapack/nonlinear_solvers.py), but each
    linearized system is solved by the hand-scheduled shard_map FGMRES —
    ring-halo operators, psum'd CGS2, shard-local PCD fieldsplit — instead
    of the single-device (or GSPMD) program.  Per step only the wind-
    dependent element VALUES are re-bound (``build_operands``); the compiled
    sharded solve is traced once and reused.

    Picard vs Newton follows the wrapped solver's ``linearization`` (as in
    the reference, the same loop runs both — Newton adds the (d, d)
    reaction rings).  With a velocity GMG, construct it as
    ``SPMDVelocityGMG(..., newton=True)`` so the levels carry the
    reaction coupling.
    """

    def __init__(self, nl, device_mesh: Mesh = None, *, axis: str = "dd",
                 ap_gmg: Optional[SPMDPressureGMG] = None,
                 velocity_gmg=None, cheb_velocity_iters: int = 8,
                 maxiter: int = 60, rtol_lin: float = 1e-6,
                 spmd_solver: Optional[SPMDPCDSolver] = None):
        self.nl = nl
        if spmd_solver is not None:
            self.sp = spmd_solver
        else:
            self.sp = SPMDPCDSolver(nl.oseen, device_mesh, axis=axis,
                                    ap_gmg=ap_gmg,
                                    velocity_gmg=velocity_gmg,
                                    cheb_velocity_iters=cheb_velocity_iters,
                                    maxiter=maxiter, rtol=rtol_lin)

    def initial_state(self):
        return self.nl.initial_state()

    def make_step_fused(self):
        """ONE device program per Picard/Newton step: residual + device-
        side operand re-binding + the sharded solve + state update.  The
        host loop of :meth:`solve` dispatches ~4 programs and fetches
        full vectors through the host every step (``np.asarray`` on F and
        x); on a remote-attached TPU pod those round-trips dominate small-
        step costs.

        Returns ``(step, ops)`` with jitted
        ``step(w, ops, damping) -> (w_new, |F|, iters)``.
        """
        nl, sp = self.nl, self.sp
        n_u = nl.n_u
        ops0 = sp.build_operands(nl.initial_state()[:n_u])  # template
        run = sp._make_run(ops0)
        resid = nl._residual

        def step(w, ops, damping):
            F = resid(w)
            rn = jnp.linalg.norm(F)
            b = sp.pack_dev(-F[:n_u], -F[n_u:])
            ops2 = sp.bind_operands(w[:n_u], ops)
            x, k, _ = run(ops2, b)
            du, dp = sp.unpack_dev(x)
            dw = jnp.concatenate([du, dp]).astype(w.dtype)
            return w + damping * dw, rn, k

        return jax.jit(step), ops0

    def solve_fused(self, w0=None, rtol: float = 1e-5, atol: float = 0.0,
                    max_steps: int = 25, damping: float = 1.0):
        """:meth:`solve` over the fused one-call-per-step path."""
        import time
        from ..solvers.nonlinear import NonlinearResult

        nl = self.nl
        if getattr(self, "_fused", None) is None:
            self._fused = self.make_step_fused()
        step, ops = self._fused
        w = nl.initial_state() if w0 is None else jnp.asarray(w0)
        t0 = time.time()
        res_hist, lin_iters = [], []
        r0 = None
        converged = False
        damp = jnp.asarray(damping, w.dtype)
        for _ in range(max_steps):
            w_new, rn, k = step(w, ops, damp)
            rn = float(rn)
            res_hist.append(rn)
            if r0 is None:
                r0 = rn if rn > 0 else 1.0
            if rn <= max(rtol * r0, atol):
                converged = True
                break
            w = w_new
            lin_iters.append(int(k))
        return NonlinearResult(w=w, nonlinear_res=res_hist,
                               linear_iters=lin_iters, linear_resnorms=[],
                               converged=converged,
                               wall_time=time.time() - t0)

    def solve(self, w0=None, rtol: float = 1e-5, atol: float = 0.0,
              max_steps: int = 25, damping: float = 1.0):
        """Run the Picard loop; returns ``solvers.nonlinear.NonlinearResult``
        with the state in assembler ordering (same convention as the
        single-device driver)."""
        import time
        from ..solvers.nonlinear import NonlinearResult

        nl, sp = self.nl, self.sp
        n_u = nl.n_u
        w = nl.initial_state() if w0 is None else jnp.asarray(w0)
        t0 = time.time()
        res_hist, lin_iters, lin_resnorms = [], [], []
        r0 = None
        converged = False
        for _ in range(max_steps):
            F = np.asarray(nl._residual(w))
            rn = float(np.linalg.norm(F))
            res_hist.append(rn)
            if r0 is None:
                r0 = rn if rn > 0 else 1.0
            if rn <= max(rtol * r0, atol):
                converged = True
                break
            ops = sp.build_operands(w[:n_u])
            b_dm = sp.pack(-F[:n_u], -F[n_u:])
            x_dm, k, lrn = sp.solve(ops, b_dm)
            du, dp = sp.unpack(np.asarray(x_dm))
            dw = jnp.asarray(np.concatenate([du, dp]), w.dtype)
            w = w + damping * dw
            lin_iters.append(int(k))
            lin_resnorms.append(np.asarray(lrn))
        return NonlinearResult(w=w, nonlinear_res=res_hist,
                               linear_iters=lin_iters,
                               linear_resnorms=lin_resnorms,
                               converged=converged,
                               wall_time=time.time() - t0)


class SPMDUnsteadySolver:
    """theta-scheme time stepping whose linear solves run explicit-SPMD.

    Wraps a single-device :class:`solvers.unsteady.UnsteadySolver` (which
    owns the theta-scheme residual and an OseenSolver carrying
    ``theta``/``inv_dt`` — the sharded Schur apply picks those up); each
    inner Picard solve is the ring-halo sharded FGMRES.
    """

    def __init__(self, us, device_mesh: Mesh = None, *, axis: str = "dd",
                 ap_gmg: Optional[SPMDPressureGMG] = None,
                 velocity_gmg=None, cheb_velocity_iters: int = 8,
                 maxiter: int = 60, rtol_lin: float = 1e-6,
                 spmd_solver: Optional[SPMDPCDSolver] = None):
        if getattr(us, "bc_fn", None) is not None:
            raise ValueError(
                "time-dependent BCs (bc_fn) need the exact host-loop path "
                "(UnsteadySolver.solve); the fused SPMD step bakes the t=0 "
                "BC values into the traced program and every later step "
                "would silently reuse them")
        self.us = us
        if spmd_solver is not None:
            self.sp = spmd_solver
        else:
            self.sp = SPMDPCDSolver(us.oseen, device_mesh, axis=axis,
                                    ap_gmg=ap_gmg,
                                    velocity_gmg=velocity_gmg,
                                    cheb_velocity_iters=cheb_velocity_iters,
                                    maxiter=maxiter, rtol=rtol_lin)

    def make_step_fused(self):
        """ONE device program per time step (semi-implicit, as
        ``step(picard_iters=1)``): residual + device-side operand
        re-binding + the sharded solve + update — the SPMD analogue of
        ``UnsteadySolver.make_step_ir``.

        Returns ``(step, ops)`` with jitted
        ``step(w, u_prev, ops) -> (w_new, |F|, iters)``; ``u_prev`` is the
        BDF2 two-steps-ago velocity (ignored by the theta scheme — pass
        ``w[:n_u]``).
        """
        us, sp = self.us, self.sp
        n_u = us.n_u
        bdf2 = us.scheme == "bdf2"
        ops0 = sp.build_operands(us.initial_state()[:n_u])  # template
        run = sp._make_run(ops0)
        resid = us._residual_full
        conv_part = us._conv_part

        def step(w, u_prev, ops):
            u_old = w[:n_u]
            aux = u_prev if bdf2 else conv_part(u_old)
            F = resid(w, u_old, aux)
            rn = jnp.linalg.norm(F)
            b = sp.pack_dev(-F[:n_u], -F[n_u:])
            ops2 = sp.bind_operands(u_old, ops)
            x, k, _ = run(ops2, b)
            du, dp = sp.unpack_dev(x)
            dw = jnp.concatenate([du, dp]).astype(w.dtype)
            return w + dw, rn, k

        return jax.jit(step), ops0

    def solve_fused(self, t_end: float, w0=None, *, keep_history=False,
                    callback=None):
        """Time loop over the fused one-call-per-step sharded path."""
        import time
        from ..solvers.unsteady import UnsteadyResult

        us = self.us
        t0 = time.perf_counter()
        if getattr(self, "_fused", None) is None:
            self._fused = self.make_step_fused()
        step, ops = self._fused
        w = us.initial_state() if w0 is None else jnp.asarray(w0)
        u_prev = w[:us.n_u]
        t = 0.0
        times, iters, resid = [], [], []
        hist = [] if keep_history else None
        n_steps = int(round(t_end / us.dt))
        for k in range(n_steps):
            u_old = w[:us.n_u]
            w, rn, it = step(w, u_prev, ops)
            u_prev = u_old
            t += us.dt
            times.append(t)
            iters.append(int(it))
            resid.append(float(rn))
            if keep_history:
                hist.append(np.asarray(w))
            if callback is not None:
                callback(k, t, w)
        return UnsteadyResult(w=w, times=times, linear_iters=iters,
                              step_res=resid,
                              wall_time=time.perf_counter() - t0,
                              history=hist)

    def step(self, w, *, picard_iters: int = 1, rtol: float = 1e-6,
             u_prev=None):
        us, sp = self.us, self.sp
        n_u = us.n_u
        u_old = w[:n_u]
        aux = us._step_aux(u_old, u_prev)    # constant across Picard iters
        total = 0
        rn = None
        for _ in range(max(picard_iters, 1)):
            F = np.asarray(us._residual_full(w, u_old, aux))
            rn = float(np.linalg.norm(F))
            if rn <= rtol:
                break
            ops = sp.build_operands(w[:n_u])
            x_dm, k, _ = sp.solve(ops, sp.pack(-F[:n_u], -F[n_u:]))
            du, dp = sp.unpack(np.asarray(x_dm))
            w = w + jnp.asarray(np.concatenate([du, dp]), w.dtype)
            total += int(k)
        return w, total, rn

    def solve(self, t_end: float, w0=None, *, picard_iters: int = 1,
              keep_history: bool = False, callback=None):
        import time
        from ..solvers.unsteady import UnsteadyResult

        us = self.us
        t0 = time.perf_counter()
        w = us.initial_state() if w0 is None else jnp.asarray(w0)
        t = 0.0
        times, iters, resid = [], [], []
        hist = [] if keep_history else None
        n_steps = int(round(t_end / us.dt))
        u_prev = None
        for k in range(n_steps):
            u_old = w[:us.n_u]
            w, it, rn = self.step(w, picard_iters=picard_iters,
                                  u_prev=u_prev)
            u_prev = u_old                   # BDF2 history (ignored: theta)
            t += us.dt
            times.append(t)
            iters.append(it)
            resid.append(rn)
            if keep_history:
                hist.append(np.asarray(w))
            if callback is not None:
                callback(k, t, w)
        return UnsteadyResult(w=w, times=times, linear_iters=iters,
                              step_res=resid,
                              wall_time=time.perf_counter() - t0,
                              history=hist)
