"""Batched (vectorized) Taylor-Hood assembly in JAX — dimension-generic.

TPU-native replacement for DOLFIN ``SystemAssembler`` + FFC element kernels
and for the operator-collection role of
``fenapack/assembling.py::PCDAssembler`` (SURVEY.md section 2.1 item 2,
section 2.2 item 6): per-cell element tensors are computed as batched einsums
over quadrature points (MXU-friendly), then scattered into static-sparsity
ELL matrices with one ``scatter-add``.

The same code path serves 2D (P2/P1 triangles) and 3D (P2/P1 tets,
BASELINE.json config 4): the spatial dimension ``d`` only changes table
shapes and the number of divergence blocks ``D[a]``.

Lifecycle parity with ``PCDForm`` const/per-iteration flags: the constant
operators (viscous Laplacian, divergence, masses, pressure stiffness Ap) are
assembled once per mesh; the wind-dependent ones (convection N(w), Newton
reaction, pressure convection Kp incl. the BRM2 inflow surface term, SUPG)
are pure jit functions of the current velocity iterate.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .mesh import INFLOW
from .dofmap import TaylorHood
from ..ops.sparse import ELL, SparsityPattern, pattern_from_dofmaps
from ..runtime import intern as _intern


def _pad_rows(a: np.ndarray, n_extra: int) -> np.ndarray:
    if not n_extra:
        return a
    return np.concatenate(
        [a, np.zeros((n_extra,) + a.shape[1:], dtype=a.dtype)])


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ConstOperators:
    """Mesh-constant operators (assembled once).

    ``L`` is the *unscaled* scalar P2 stiffness (vector Laplacian acts
    per-component); ``D[a]``/``DT[a]`` are the divergence/gradient blocks per
    spatial direction with the ``-int q d_a u_a`` sign convention, so the
    monolithic system is ``[[A, D^T], [D, 0]]``; ``Mp`` is scaled by 1/nu
    (fenapack demo convention ``mp = (1/nu) p q dx``); ``Ap`` the unscaled
    pressure Laplacian; ``M2`` the unscaled scalar P2 mass (unsteady M/dt).
    """
    L: ELL
    Mp: ELL
    Ap: ELL
    M2: ELL
    D: Tuple[ELL, ...]
    DT: Tuple[ELL, ...]

    # 2D-era named accessors (kept for existing call sites/tests)
    @property
    def Dx(self):
        return self.D[0]

    @property
    def Dy(self):
        return self.D[1]

    @property
    def DxT(self):
        return self.DT[0]

    @property
    def DyT(self):
        return self.DT[1]

    def tree_flatten(self):
        return (self.L, self.Mp, self.Ap, self.M2, self.D, self.DT), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


class NSAssembler:
    """Vectorized Navier-Stokes / PCD operator assembly on one mesh (2D/3D).

    Host-side ``__init__`` precomputes geometry, dofmaps and sparsity
    patterns; every ``*_values``/``residual`` method is a pure function of
    the velocity iterate, safe to call under ``jit``.

    Velocity layout: ``u = [u_0 (n2); ...; u_{d-1} (n2)]`` (n2 = padded
    scalar P2 size when ``row_align > 1``).
    """

    def __init__(self, mesh, nu: float, dtype=jnp.float64,
                 quad_degree: int = 5, inflow_marker: int = INFLOW,
                 row_align: int = 1, block_size: Optional[int] = None,
                 reorder: Optional[bool] = None, block_dtype=None,
                 hi_block: bool = False, p1_only: bool = False,
                 m2_hi: bool = True):
        """``p1_only``: pressure-space-only assembler (pat_p1 + Ap/Mp).

        PressureHierarchy levels need exactly the P1 Laplacian; the full
        constructor also builds P2/div patterns, L/M2/D/DT constants,
        flat-assembly tables and facet data — measured 3.5+ GB of dead
        device residency at the 2.05M config-4 scale
        (scripts/r5_resident_audit.py) and ~30 s of the per-level setup.
        """
        self._p1_only = bool(p1_only)
        self.mesh = mesh
        self.nu = float(nu)
        self.dtype = dtype
        self.quad_degree = quad_degree
        self._load_u = None             # set_body_force installs -f load
        d = mesh.vertices.shape[1]
        self.dim = d
        # block-sparse layout (TPU production path: MXU tile SpMV instead of
        # the scalar-slow XLA gather) wants RCM-relabeled dofs
        self.block_size = block_size
        if reorder is None:
            reorder = block_size is not None
        W = TaylorHood(mesh, align=row_align, reorder=reorder)
        self.W = W
        self.row_align = row_align
        self.n2 = W.n2                  # padded sizes (== real when align=1)
        self.n1 = W.n1
        self.n2_real = W.V.dim
        self.n1_real = W.Q.dim
        # active-dof masks (0.0 on alignment padding)
        p_act = np.zeros(self.n1)
        p_act[:self.n1_real] = 1.0
        u_act = np.zeros(d * self.n2)
        for a in range(d):
            u_act[a * self.n2:a * self.n2 + self.n2_real] = 1.0
        self._p_active_np = p_act
        self._u_active_np = u_act
        self.p_active = jnp.asarray(p_act, dtype=dtype)
        self.u_active = jnp.asarray(u_act, dtype=dtype)

        # --- basis tables -------------------------------------------------
        if d == 2:
            from . import elements as el
            qp, qw = el.triangle_quadrature(quad_degree)
            phi2, dphi2 = el.p2_basis(qp)
            phi1, dphi1 = el.p1_basis(qp)
        else:
            from . import elements3d as el
            qp, qw = el.tet_quadrature(quad_degree)
            phi2, dphi2 = el.p2_basis(qp)
            phi1, dphi1 = el.p1_basis(qp)
        self.nq = qp.shape[0]
        self.nb2 = phi2.shape[1]        # 6 (2D) / 10 (3D)
        self.nb1 = phi1.shape[1]        # 3 (2D) / 4 (3D)

        # --- geometry -----------------------------------------------------
        v = mesh.vertices[mesh.cells]                 # (nc, d+1, d)
        J = np.stack([v[:, i + 1] - v[:, 0] for i in range(d)], axis=2)
        detJ = np.linalg.det(J)
        Jinv = np.linalg.inv(J)
        adet = np.abs(detJ)
        self._v0 = v[:, 0]
        self._Jinv_np = Jinv

        cd2 = W.V.cell_dofs.astype(np.int32)          # (nc, nb2)
        cd1 = W.Q.cell_dofs.astype(np.int32)          # (nc, nb1)

        # physical P1 gradients (g1: (nc,nb1,d), const rows — small); the P2
        # gradient table g2 (nc,nq,nb2,d) is NOT stored: it is the largest
        # array in the problem (GBs at 3D scale) and is recomputed on the
        # fly from Jinv (nc,d,d) inside each assembly einsum — XLA fuses the
        # contraction, trading negligible FLOPs for memory/constant size.
        g1 = np.einsum("ik,ckd->cid", dphi1[0], Jinv)

        # cell-batch alignment padding: zero-measure phantom cells so the
        # cells axis is shardable over the device mesh; their quadrature
        # weights are zero and their scatter targets are out-of-bounds
        # (dropped), so they contribute nothing.
        nc = cd2.shape[0]
        self.nc_real = nc
        nc_pad = -(-nc // row_align) * row_align - nc
        if nc_pad:
            # phantom Jinv = 0: gradients vanish, weights are 0 anyway
            Jinv = np.concatenate([Jinv, np.zeros((nc_pad, d, d))])
            g1 = np.concatenate([g1, np.zeros((nc_pad,) + g1.shape[1:])])
            adet = np.concatenate([adet, np.zeros(nc_pad)])
        self.nc = nc + nc_pad

        self._cd2_np = _pad_rows(cd2, nc_pad)
        self._cd1_np = _pad_rows(cd1, nc_pad)
        self.cd2 = _intern(self._cd2_np)
        self.cd1 = _intern(self._cd1_np)
        # cell diameters (max edge length) for SUPG; 0 on phantom cells
        e = np.linalg.norm(v - np.roll(v, 1, axis=1), axis=2).max(axis=1)
        self.h_cell = jnp.asarray(np.concatenate([e, np.zeros(nc_pad)]),
                                  dtype=dtype)
        self.Jinv = _intern(Jinv, dtype=dtype)           # (nc, d, d) padded
        self.dphi2 = jnp.asarray(dphi2, dtype=dtype)     # (nq, nb2, d)
        self.g1 = jnp.asarray(g1, dtype=dtype)
        self.adet = _intern(adet, dtype=dtype)
        self.qw = jnp.asarray(qw, dtype=dtype)
        self.phi2 = jnp.asarray(phi2, dtype=dtype)
        self.phi1 = jnp.asarray(phi1, dtype=dtype)
        # host copies for the CPU constant-assembly path at 3D scale (a
        # device->host fetch here would pay the tunnel warmup stall)
        self._host_tabs = dict(Jinv=Jinv, dphi2=dphi2, g1=g1, adet=adet,
                               qw=qw, phi2=phi2, phi1=phi1)
        # combined quad weight * |det| (nc, nq)
        self.wdet = self.adet[:, None] * self.qw[None, :]

        # --- sparsity patterns --------------------------------------------
        # compute layout (block tiles on the TPU production path) + an ELL
        # "hi" layout kept for high-precision IR residual operators: block
        # fill-in at f64 would bloat every jit program's constants ~30x
        bs = block_size
        nb2, nb1 = self.nb2, self.nb1
        widths = (nb2 * nb2, nb1 * nb1, nb1 * nb2, nb2 * nb1)

        # Block tiles trade fill-in for streaming bandwidth (a ~25x slot/nnz
        # ratio still beats the gather ELL SpMV ~10x in time).  But the
        # RECTANGULAR div/grad patterns under natural dof ordering (which
        # GMG transfers require) lose block locality with mesh size — the
        # neighbor-block count m grows ~4x per 3D refinement (measured m=45
        # -> 186 at 172k cells), and the tiles alone exhaust HBM (~5 GB at
        # 761k dofs vs ~20 MB in ELL).  Any pattern whose estimated tile
        # bytes blow past the ops.sparse.block_layout_ok policy falls back
        # to the compact ELL layout: D/DT are applied once per matvec
        # (small share of its cost), so the gather penalty is noise while
        # the memory win is the difference between fitting on one chip or
        # not.
        from ..ops.sparse import block_layout_ok

        def build_patterns(block):
            dofmaps = ((cd2, cd2, self.n2, self.n2),
                       (cd1, cd1, self.n1, self.n1),
                       (cd1, cd2, self.n1, self.n2),
                       (cd2, cd1, self.n2, self.n1))
            # byte-budget scale by hotness: P2/P1 square operators run in
            # every smoothing sweep; the rectangular div/grad only once
            # per monolithic matvec
            scales = (2.0, 2.0, 0.5, 0.5)
            pats = []
            for (cr, cc, nr, ncol), width, sc in zip(dofmaps, widths,
                                                     scales):
                if self._p1_only and nr + ncol != 2 * self.n1:
                    pats.append(None)
                    continue
                pat = pattern_from_dofmaps(cr, cc, nr, ncol, block=block)
                if (block and hasattr(pat, "fill_ratio")
                        and not block_layout_ok(pat, scale=sc)):
                    pat = pattern_from_dofmaps(cr, cc, nr, ncol, block=None)
                pat.pad_entries(nc_pad * width)
                pats.append(pat)
            return tuple(pats)

        self.pat_p2, self.pat_p1, self.pat_div, self.pat_divT = \
            build_patterns(bs)
        if bs and not hi_block:
            (self.pat_p2_hi, self.pat_p1_hi, self.pat_div_hi,
             self.pat_divT_hi) = build_patterns(None)
        else:
            # hi_block: f64 operators share the BLOCK layout — the f64 ELL
            # gather SpMV is ~12x slower than the block-tile path (measured
            # 9.2 ms vs 0.8 ms at 26k dofs) and dominates hi_krylov outer
            # iterations; the f64 block fill-in is affordable at 2D scale
            # (opt-in: it exhausts HBM at 3D scale)
            self.pat_p2_hi, self.pat_p1_hi = self.pat_p2, self.pat_p1
            self.pat_div_hi, self.pat_divT_hi = self.pat_div, self.pat_divT

        if not self._p1_only:
            # flat-assembly tables: EAGER build (host context) — see _flat
            _ = self._flat

            # --- boundary facet data for surface integrals ----------------
            self._setup_facets(inflow_marker)
        else:
            self.n_inflow_facets = 0

        # --- constant operators -------------------------------------------
        if bs:
            # compute-precision block constants (f32, cast op-by-op so the
            # f64 temporaries never coexist — they peak over HBM at 3D
            # scale) + hi-precision ELL.  M2 (unsteady mass) is kept
            # ELL-only: block fill would double the largest constant and it
            # sits off the steady hot path.
            # block_dtype=float32 (set by the TPU production entry points)
            # assembles the compute constants natively in f32 — f64 block
            # tiles exhaust HBM at 3D scale; None keeps assembler precision
            # (exact parity with the ELL layout, used by the CPU test suite)
            # m2_hi=False: skip the hi-precision P2 mass constant — the
            # single largest f64 buffer (445 MB at 2.05M dofs), read only
            # by unsteady schemes and unsteady functionals (which fall
            # back to mass2_values on demand)
            self.const_hi = self._assemble_constant(hi=True,
                                                    skip_m2=not m2_hi)
            self.const = self._assemble_constant(hi=False,
                                                 out_dtype=block_dtype,
                                                 skip_m2=True)
        else:
            self.const = self._assemble_constant()
            self.const_hi = self.const

    # ------------------------------------------------------------------ #
    def _setup_facets(self, inflow_marker: int):
        """Precompute inflow-facet quadrature tables for the BRM2 kp surface
        term ``-(1/nu) (w.n) p q ds`` (fenapack demo; Olshanskii-Vassilevski
        2007 variant, SURVEY.md section 0).

        Dimension-generic strategy: build physical facet quadrature points
        from the facet vertices, then recover each point's reference
        coordinates in the OWNING cell via the inverse affine map — no
        local-edge/face bookkeeping.
        """
        mesh = self.mesh
        d = self.dim
        sel = np.where(mesh.facet_markers == inflow_marker)[0]
        self.n_inflow_facets = sel.shape[0]
        if sel.shape[0] == 0:
            return

        if d == 2:
            from . import elements as el
            fv = mesh.edges[mesh.boundary_facets[sel]]        # (nf, 2)
            fcells = mesh.facet_cells[sel]
            normals = mesh.facet_normals()[sel]
            t, wq = el.interval_quadrature(4)                 # sums to 1
            bary = np.stack([1 - t, t], axis=1)               # (ntq, 2)
            a = mesh.vertices[fv[:, 0]]
            b = mesh.vertices[fv[:, 1]]
            measure = np.linalg.norm(b - a, axis=1)           # length
            basis2, basis1 = el.p2_basis, el.p1_basis
        else:
            from . import elements3d as el3
            from . import elements as el2
            fv = mesh.boundary_faces[sel]                     # (nf, 3)
            fcells = mesh.face_cells[sel]
            normals = mesh.face_normals()[sel]
            qp2, wq = el2.triangle_quadrature(4)              # sums to 1/2
            bary = np.concatenate([1 - qp2.sum(1, keepdims=True), qp2],
                                  axis=1)                     # (ntq, 3)
            measure = 2.0 * mesh.face_areas()[sel]            # 2A * w == ds
            basis2, basis1 = el3.p2_basis, el3.p1_basis

        # physical quad points: (nf, ntq, d)
        verts = mesh.vertices[fv]                             # (nf, nv_f, d)
        pts = np.einsum("qv,fvd->fqd", bary, verts)
        # reference coords in owning cell
        v0 = self._v0[fcells][:, None, :]                     # (nf, 1, d)
        Jinv = self._Jinv_np[fcells]                          # (nf, d, d)
        pref = np.einsum("fkd,fqd->fqk", Jinv, pts - v0)
        nf, ntq = pref.shape[:2]
        flat = pref.reshape(-1, d)
        p2, _ = basis2(flat)
        p1, _ = basis1(flat)

        dt = self.dtype
        self.f_phi2 = jnp.asarray(p2.reshape(nf, ntq, -1), dtype=dt)
        self.f_phi1 = jnp.asarray(p1.reshape(nf, ntq, -1), dtype=dt)
        self.f_wlen = jnp.asarray(measure[:, None] * wq[None, :], dtype=dt)
        self.f_normals = jnp.asarray(normals, dtype=dt)
        # host copies: a device->host fetch here costs O(100 s) through the
        # remote-attached (axon tunnel) TPU at 3D scale
        cd2np = self._cd2_np
        cd1np = self._cd1_np
        self.f_cd2 = jnp.asarray(cd2np[fcells])
        f_cd1 = cd1np[fcells]
        self.f_cd1 = jnp.asarray(f_cd1)
        # surface entries land in the *volume* P1 pattern's slots
        self.kp_surf_pos = self.pat_p1.entry_positions(f_cd1, f_cd1)

    # ------------------------------------------------------------------ #
    @property
    def g2(self):
        """Physical P2 gradients (nc,nq,nb2,d), recomputed from Jinv on the
        fly (see __init__ note — not stored).  Prefer the factored einsums
        below — materializing g2 costs (nc*nq*nb2*d) memory."""
        return jnp.einsum("qik,ckd->cqid", self.dphi2, self.Jinv)

    def _pats(self, hi: bool):
        if hi:
            return (self.pat_p2_hi, self.pat_p1_hi, self.pat_div_hi,
                    self.pat_divT_hi)
        return (self.pat_p2, self.pat_p1, self.pat_div, self.pat_divT)

    def _assemble_constant(self, hi: bool = False, out_dtype=None,
                           skip_m2: bool = False) -> ConstOperators:
        """Constant operators via FACTORED element integrals.

        The affine-element structure separates ``wdet = adet (x) qw`` and
        ``grad = dphi . Jinv``: every integral reduces to a tiny
        reference-cell tensor (contracted over quadrature once) composed
        with per-cell metric tensors of size O(nc * d * d) — no
        (nc, nq, nb2, ...) intermediates, which OOM at 3D scale.
        """
        g1 = self.g1
        phi1, dphi2, Jinv = self.phi1, self.dphi2, self.Jinv
        adet, qw = self.adet, self.qw
        p2, p1, pdiv, pdivT = self._pats(hi)

        # at 3D scale the (nc, d, d)/(nc, nb, nb) intermediates of these
        # SETUP-ONLY einsums explode under TPU tile padding (measured 57x
        # on bf16-emulated f64 buffers -> 17 GB HBM at 467k cells): run the
        # whole constant assembly on the host CPU device and ship only the
        # final value arrays; the per-iteration hot path is unaffected.
        import os as _os
        import jax as _jax
        # 50k default (was 200k): at 172k cells / 761k dofs the padded
        # setup einsums + the now-eager flat tables and block constants
        # exceed the 16 GB HBM (observed RESOURCE_EXHAUSTED); host setup
        # costs minutes once, the per-iteration hot path is unaffected
        big = self.nc > int(_os.environ.get(
            "FENAPACK_HOST_ASM_CELLS", "50000"))
        on_cpu = big and _jax.default_backend() != "cpu"
        if on_cpu:
            cpu = _jax.devices("cpu")[0]
            tgt = _jax.devices()[0]                    # the real accelerator
            ctx = _jax.default_device(cpu)
            h = self._host_tabs
            put = lambda x: _jax.device_put(
                np.asarray(x, dtype=np.float64), cpu)
            Jinv, dphi2, g1 = put(h["Jinv"]), put(h["dphi2"]), put(h["g1"])
            adet, qw = put(h["adet"]), put(h["qw"])
            phi1 = put(h["phi1"])
        else:
            ctx = None

        import contextlib
        phi2 = self.phi2 if not on_cpu else put(self._host_tabs["phi2"])

        # storage dtype: out_dtype when given; otherwise the ASSEMBLER
        # dtype.  The host path above always computes in f64 — without the
        # cast an f32 assembler (pressure/velocity hierarchy levels) keeps
        # every constant at twice the bytes (measured: f64 level constants
        # were a leading term of the 14 GB residency at 2.05M dofs)
        od = out_dtype
        if od is None and jnp.dtype(self.dtype) != jnp.dtype(jnp.float64):
            od = self.dtype

        def asm_op(pat, elem):
            vals = pat.assemble_values(elem, host=on_cpu)
            if od is not None:
                # accumulate in assembler precision (f64), cast the RESULT:
                # f32-accumulated sums carry ~2e-6 relative error, which
                # costs extra IR rounds; one op's f64 temporary at a time
                # (eager init context) stays within HBM with the factored
                # integrals
                vals = jax.block_until_ready(vals.astype(od))
            if on_cpu:
                vals = jax.device_put(np.asarray(vals), tgt)
            return pat.matrix(vals)

        with (ctx if ctx is not None else contextlib.nullcontext()):
            # masses: adet_c * (sum_q qw phi phi)
            mref1 = jnp.einsum("q,ql,qm->lm", qw, phi1, phi1)
            mass_p1 = adet[:, None, None] * mref1[None] / self.nu

            stiff_p1 = jnp.einsum("c,cld,cmd->clm", adet * jnp.sum(qw),
                                  g1, g1)

            if self._p1_only:
                return ConstOperators(L=None, Mp=asm_op(p1, mass_p1),
                                      Ap=asm_op(p1, stiff_p1), M2=None,
                                      D=(), DT=())

            # viscous: adet_c * M_ckl * T_klij ; M = Jinv Jinv^T (metric),
            # T_klij = sum_q qw dphi_qik dphi_qjl   (reference tensor)
            M = jnp.einsum("ckd,cld->ckl", Jinv, Jinv)
            T = jnp.einsum("q,qik,qjl->klij", qw, dphi2, dphi2)
            visc = jnp.einsum("c,ckl,klij->cij", adet, M, T)

            if not skip_m2:
                mref2 = jnp.einsum("q,qi,qj->ij", qw, phi2, phi2)
                mass_p2 = adet[:, None, None] * mref2[None]

            # divergence: D_a[l,j] = -adet * (sum_q qw phi1 dphi_qjk) Jinv
            R = jnp.einsum("q,ql,qjk->ljk", qw, phi1, dphi2)
            div_all = -jnp.einsum("c,ljk,cka->clja", adet, R, Jinv)
            div = [div_all[..., a] for a in range(self.dim)]

            L = asm_op(p2, visc)
            D = tuple(asm_op(pdiv, da) for da in div)
            DT = tuple(asm_op(pdivT, jnp.swapaxes(da, 1, 2)) for da in div)
            Mp = asm_op(p1, mass_p1)
            Ap = asm_op(p1, stiff_p1)
            M2 = None if skip_m2 else asm_op(p2, mass_p2)
        return ConstOperators(L=L, Mp=Mp, Ap=Ap, M2=M2, D=D, DT=DT)

    # ------------------------------------------------------------------ #
    def split_u(self, u: jnp.ndarray):
        """Components of the stacked velocity vector."""
        n2 = self.n2
        return [u[a * n2:(a + 1) * n2] for a in range(self.dim)]

    def u_cell(self, u: jnp.ndarray) -> jnp.ndarray:
        """Per-cell velocity dof values (nc, nb2, d)."""
        comps = self.split_u(u)
        return jnp.stack([c[self.cd2] for c in comps], axis=-1)

    def wind_at_quad(self, u: jnp.ndarray) -> jnp.ndarray:
        """Velocity (stacked (d*n2,)) evaluated at cell quad points (nc,nq,d)."""
        return jnp.einsum("qi,cid->cqd", self.phi2, self.u_cell(u))

    def mass2_values(self, hi: bool = False) -> jnp.ndarray:
        """Scalar P2 mass values (for layouts where const.M2 is not kept)."""
        mref = jnp.einsum("q,qi,qj->ij", self.qw, self.phi2, self.phi2)
        elem = self.adet[:, None, None] * mref[None]
        return self._pats(hi)[0].assemble_values(elem)


    # ------------------------------------------------------------------ #
    # flat-shape per-step assembly (TPU layout-friendly)
    # ------------------------------------------------------------------ #
    @property
    def _flat(self):
        """Host-precomputed tables for the FLAT (2D, big-last-dim) per-step
        assembly path.

        The einsum forms materialize (nc, nq, d)/(nc, nb, nb)-shaped
        intermediates whose tiny trailing dims suffer 6-57x TPU tile
        padding (measured: the config-4 2M-DoF solve program needs 17.8 GB
        of which 81% is padding).  The flat path keeps every per-cell array
        2D with a >=30-wide last dim (pad <= 4x) and turns the quadrature
        contractions into plain (nc, M) @ (M, N) matmuls.

        Device tables are created EAGERLY on first host-side access (never
        inside a trace: trace-created constants become TypedNdArray
        literals that the multi-device GSPMD lowering cannot shard), and
        live on a runtime.Holder so lift_jit passes the big ones as jit
        arguments.
        """
        if getattr(self, "_flat_hold", None) is not None:
            return dict(vars(self._flat_hold))
        if getattr(self, "_flat_tabs", None) is None:
            h = self._host_tabs
            d, nq, nb2, nb1 = self.dim, self.nq, self.nb2, self.nb1
            phi2, dphi2, phi1 = h["phi2"], h["dphi2"], h["phi1"]
            # uq: (nc, d*nb2) @ P -> (nc, nq*d); P[(a,i),(q,b)] = phi2 d_ab
            P = np.zeros((d * nb2, nq * d))
            for a in range(d):
                for i in range(nb2):
                    for q in range(nq):
                        P[a * nb2 + i, q * d + a] = phi2[q, i]
            # conv: elem_(ij) = t_(q,k) @ B2[(q,k),(i,j)],
            #   B2 = phi2_qi * dphi2_qjk
            B2 = np.zeros((nq * d, nb2 * nb2))
            for q in range(nq):
                for k in range(d):
                    B2[q * d + k] = np.outer(phi2[q], dphi2[q, :, k]).ravel()
            # kp: elem_(lm) = v_(q,m) @ B1 with v = uq . g1;
            #   B1[(q,m),(l,m')] = phi1_ql delta_mm'
            B1 = np.zeros((nq * nb1, nb1 * nb1))
            for q in range(nq):
                for m in range(nb1):
                    for l in range(nb1):
                        B1[q * nb1 + m, l * nb1 + m] = phi1[q, l]
            # newton reaction: du_(q,a,k) = ucell_flat @ Pg,
            #   Pg[(a,i), (q*d+a)*d+k] = dphi2[q,i,k]
            Pg = np.zeros((d * nb2, nq * d * d))
            for a in range(d):
                for i in range(nb2):
                    for q in range(nq):
                        for k in range(d):
                            Pg[a * nb2 + i, (q * d + a) * d + k] = \
                                dphi2[q, i, k]
            # Bp[(q), (i,j)] = phi2_qi phi2_qj (mass-like q-contraction)
            Bp = np.zeros((nq, nb2 * nb2))
            for q in range(nq):
                Bp[q] = np.outer(phi2[q], phi2[q]).ravel()
            Jf = h["Jinv"].reshape(self.nc, d * d)       # (nc, d*d)
            g1f = h["g1"].reshape(self.nc, nb1 * d)      # (nc, nb1*d)
            self._flat_tabs = dict(P=P, B2=B2, B1=B1, Pg=Pg, Bp=Bp,
                                   Jf=Jf, g1f=g1f)
        from ..runtime import Holder
        self._flat_hold = Holder(**{k: jnp.asarray(v, self.dtype)
                                    for k, v in self._flat_tabs.items()})
        return dict(vars(self._flat_hold))

    def _u_cell_flat(self, u):
        """(nc, d*nb2) per-cell velocity dofs (flat layout)."""
        comps = self.split_u(u)
        return jnp.concatenate([c[self.cd2] for c in comps], axis=1)

    def _uq_flat(self, u, w):
        """(nc, nq*d) wind at quadrature points, flat layout."""
        tabs = self._flat
        return self._u_cell_flat(u) @ w(tabs["P"])

    def convection_values(self, u: jnp.ndarray, hi: bool = False,
                          compute32: bool = False) -> jnp.ndarray:
        """Scalar convection N(w) values: N[i,j] = int (w.grad phi_j) phi_i.

        Factored through Jinv (intermediates O(nc*nq*d), see
        _assemble_constant): s = (wdet*uq).Jinv, B = phi (x) dphi.

        ``compute32`` runs the per-step element einsums in f32 and casts the
        assembled values up: emulated-f64 einsums dominate the per-step wall
        on TPU, and a 1e-7-perturbed *integral* is still a perfectly
        consistent discrete operator (matvec/residual/PC all read the same
        values) — only the constant parts (nu L, Mp/dt) carry f64 integrals.
        """
        cd = jnp.float32 if compute32 else None
        w = (lambda x: x.astype(cd)) if cd is not None else (lambda x: x)
        import os as _os
        if _os.environ.get("FENAPACK_FLAT_ASM", "1") != "1":
            # einsum fallback (FENAPACK_FLAT_ASM=0): for bisecting backend
            # issues with the flat path
            uq = jnp.einsum("qi,cid->cqd", w(self.phi2), w(self.u_cell(u)))
            t = jnp.einsum("cq,cqd,ckd->cqk", w(self.wdet), uq,
                           w(self.Jinv))
            B = jnp.einsum("qi,qjk->qijk", w(self.phi2), w(self.dphi2))
            elem = jnp.einsum("cqk,qijk->cij", t, B)
            vals = self._pats(hi)[0].assemble_values(elem)
            return vals.astype(self.dtype) if cd is not None else vals
        d, nq = self.dim, self.nq
        tabs = self._flat
        uqf = w(self._uq_flat(u, w))                      # (nc, nq*d)
        wdet = w(self.wdet)                               # (nc, nq)
        Jf = w(tabs["Jf"])                                # (nc, d*d)
        # t[(q,k)] = wdet_q * sum_b uq_(q,b) Jinv_(k,b) — d*d elementwise
        # passes over (nc, nq) slices, all 2D
        cols = []
        for k in range(d):
            acc = 0.0
            for b in range(d):
                acc = acc + uqf[:, b::d] * Jf[:, k * d + b, None]
            cols.append(wdet * acc)
        # interleave to (nc, nq*d) with (q, k) C-order
        t = jnp.stack(cols, axis=2).reshape(uqf.shape[0], nq * d)
        elem = t @ w(tabs["B2"])                          # (nc, nb2*nb2)
        vals = self._pats(hi)[0].assemble_values(elem)
        return vals.astype(self.dtype) if cd is not None else vals

    def newton_reaction_values(self, u: jnp.ndarray, hi: bool = False,
                               compute32: bool = False) -> jnp.ndarray:
        """(d,d,*value_shape) values of R_ab[i,j] = int phi_j (d_b u_a) phi_i.

        ``compute32``: see :meth:`convection_values`."""
        d, nq, nb2 = self.dim, self.nq, self.nb2
        pat = self._pats(hi)[0]
        cd = jnp.float32 if compute32 else None
        w = (lambda x: x.astype(cd)) if cd is not None else (lambda x: x)
        import os as _os
        if _os.environ.get("FENAPACK_FLAT_ASM", "1") != "1":
            # einsum fallback: (nc, nq, d, d) intermediates
            U = jnp.einsum("cia,qik->cqak", w(self.u_cell(u)),
                           w(self.dphi2))
            gradu = jnp.einsum("cqak,ckb->cqab", U, w(self.Jinv))
            P = jnp.einsum("qi,qj->qij", w(self.phi2), w(self.phi2))
            elem = jnp.einsum("cq,cqab,qij->abcij", w(self.wdet), gradu, P)
            flat = elem.reshape(d * d, -1)
            vals = jax.vmap(pat.assemble_values)(flat)
            if cd is not None:
                vals = vals.astype(self.dtype)
            return vals.reshape((d, d) + pat.value_shape)
        # FLAT path: du = ucell_flat @ Pg, then per-(a, b) (nc, nq) slices
        tabs = self._flat
        ucf = w(self._u_cell_flat(u))
        du = ucf @ w(tabs["Pg"])                         # (nc, nq*d*d)
        Jf = w(tabs["Jf"])
        wdet = w(self.wdet)
        Bp = w(tabs["Bp"])
        outs = []
        for a in range(d):
            for b in range(d):
                gu = 0.0
                for k in range(d):
                    # du column ((q*d + a)*d + k), stride d*d over q
                    gu = gu + du[:, a * d + k::d * d] * Jf[:, k * d + b,
                                                           None]
                elem = (wdet * gu) @ Bp                  # (nc, nb2*nb2)
                vals = pat.assemble_values(elem)
                if cd is not None:
                    vals = vals.astype(self.dtype)
                outs.append(vals)
        return jnp.stack(outs).reshape((d, d) + pat.value_shape)

    def kp_values(self, u: jnp.ndarray, surface: bool = False) -> jnp.ndarray:
        """Pressure convection Kp = (1/nu) int (w.grad p) q dx
        [+ BRM2 inflow surface term when ``surface``]."""
        import os as _os
        if _os.environ.get("FENAPACK_FLAT_ASM", "1") != "1":
            uq = self.wind_at_quad(u)
            v = jnp.einsum("cqd,cmd->cqm", uq, self.g1)
            elem = jnp.einsum("cq,ql,cqm->clm", self.wdet, self.phi1,
                              v) / self.nu
            vals = self.pat_p1.assemble_values(elem)
            return self._kp_surface(vals, u) if surface else vals
        d, nq, nb1 = self.dim, self.nq, self.nb1
        tabs = self._flat
        ident = lambda x: x
        uqf = self._uq_flat(u, ident)                      # (nc, nq*d)
        g1f = tabs["g1f"].astype(uqf.dtype)                # (nc, nb1*d)
        # v[(q,m)] = wdet_q * sum_d uq_(q,d) g1_(m,d) — flat elementwise
        cols = []
        for m in range(nb1):
            acc = 0.0
            for b in range(d):
                acc = acc + uqf[:, b::d] * g1f[:, m * d + b, None]
            cols.append(self.wdet.astype(uqf.dtype) * acc)
        v = jnp.stack(cols, axis=2).reshape(uqf.shape[0], nq * nb1)
        elem = (v @ tabs["B1"].astype(uqf.dtype)) / self.nu  # (nc, nb1*nb1)
        vals = self.pat_p1.assemble_values(elem)
        return self._kp_surface(vals, u) if surface else vals

    def _kp_surface(self, vals, u):
        """BRM2 inflow surface term added into the volume Kp values."""
        if not self.n_inflow_facets:
            return vals
        comps = self.split_u(u)
        ucell = jnp.stack([c[self.f_cd2] for c in comps], axis=-1)
        uq_f = jnp.einsum("fqi,fid->fqd", self.f_phi2, ucell)
        un = jnp.einsum("fqd,fd->fq", uq_f, self.f_normals)
        elem_s = -jnp.einsum("fq,fq,fql,fqm->flm", self.f_wlen, un,
                             self.f_phi1, self.f_phi1) / self.nu
        flat = vals.reshape(-1).at[self.kp_surf_pos].add(elem_s.ravel())
        return flat.reshape(vals.shape)

    def supg_p1_values(self, u: jnp.ndarray) -> jnp.ndarray:
        """Streamline-diffusion values for the SCALAR P1 convection-diffusion
        operator ``nu Ap + nu Kp(u)`` (the GMG p-coarsening bottom level,
        solvers/gmg.py::PCoarseTransfer).

        Same Elman-Silvester-Wathen delta as :meth:`supg_values`, assembled
        on P1 test/trial gradients (cell-constant, so the streamline term is
        ``delta_c (w . g1_l)(w . g1_m)`` per quadrature point).  Without it
        the bottom level's EXACT inverse amplifies the oscillatory Galerkin
        modes at cell Peclet > 1 (measured on DFG 2D-1 l0: wind-on steps
        cost 85-94 outer iterations vs the 41-50 oracle; wind-off step 1
        matches at 42-43)."""
        uq = self.wind_at_quad(u)                       # (nc, nq, d)
        umag = jnp.sqrt(jnp.sum(uq * uq, axis=-1))      # (nc, nq)
        h = self.h_cell[:, None]
        pe = umag * h / (2.0 * self.nu)
        delta = jnp.where(pe > 1.0,
                          h / jnp.maximum(2.0 * umag, 1e-30)
                          * (1.0 - 1.0 / jnp.maximum(pe, 1.0)), 0.0)
        v = jnp.einsum("cqd,cmd->cqm", uq, self.g1)     # (w . grad q_m)
        elem = jnp.einsum("cq,cql,cqm->clm", self.wdet * delta, v, v)
        return self.pat_p1.assemble_values(elem)

    def supg_values(self, u: jnp.ndarray, hi: bool = False) -> jnp.ndarray:
        """Streamline-diffusion (SUPG) stabilization element values.

        TPU-native counterpart of
        ``fenapack/stabilization.py::StabilizationParameterSD``: the demo adds
        ``delta * (w.grad u)(w.grad v)`` to the *preconditioner* velocity form
        ``J_pc`` so the 00-block subsolve stays robust at high Reynolds
        number.  Parameter (Elman-Silvester-Wathen, Finite Elements and Fast
        Iterative Solvers 2nd ed., sec. 8.3.2):

            Pe_c   = |w|_c h_c / (2 nu)        (cell Peclet number)
            delta  = h_c / (2 |w|_c) * (1 - 1/Pe_c)   if Pe_c > 1 else 0
        """
        import os as _os
        d, nq, nb2 = self.dim, self.nq, self.nb2
        if _os.environ.get("FENAPACK_FLAT_ASM", "1") != "1":
            uq = self.wind_at_quad(u)
            umag = jnp.sqrt(jnp.sum(uq * uq, axis=-1))
            h = self.h_cell[:, None]
            safe_u = jnp.maximum(umag, 1e-30)
            pe = safe_u * h / (2.0 * self.nu)
            delta = jnp.where(pe > 1.0,
                              h / (2.0 * safe_u) * (1.0 - 1.0 / pe), 0.0)
            s = jnp.einsum("cqd,ckd->cqk", uq, self.Jinv)
            wg = jnp.einsum("cqk,qik->cqi", s, self.dphi2)
            elem = jnp.einsum("cq,cq,cqi,cqj->cij", self.wdet, delta, wg, wg)
            return self._pats(hi)[0].assemble_values(elem)
        # FLAT path (2D big-last-dim shapes; see convection_values)
        tabs = self._flat
        ident = lambda x: x
        uqf = self._uq_flat(u, ident)                      # (nc, nq*d)
        # |u| per (c, q) and the SD parameter delta
        umag2 = 0.0
        for b in range(d):
            ub = uqf[:, b::d]
            umag2 = umag2 + ub * ub
        umag = jnp.sqrt(umag2)                             # (nc, nq)
        h = self.h_cell[:, None]
        safe_u = jnp.maximum(umag, 1e-30)
        pe = safe_u * h / (2.0 * self.nu)
        delta = jnp.where(pe > 1.0, h / (2.0 * safe_u) * (1.0 - 1.0 / pe),
                          0.0)
        # s_(q,k) = sum_b uq_(q,b) Jinv_(k,b); wg_(q,i) = sum_k s_(q,k)
        # dphi2[q,i,k] — per-q fixed tables, all (nc, X) elementwise
        Jf = tabs["Jf"].astype(uqf.dtype)
        dphi2 = self._host_tabs["dphi2"]
        sw = self.wdet.astype(uqf.dtype) * delta           # (nc, nq)
        elem = 0.0
        for q in range(nq):
            s_k = []
            for k in range(d):
                sk = 0.0
                for b in range(d):
                    sk = sk + uqf[:, q * d + b] * Jf[:, k * d + b]
                s_k.append(sk)
            wg_cols = [sum(float(dphi2[q, i, k]) * s_k[k] for k in range(d))
                       for i in range(nb2)]
            wgq = jnp.stack(wg_cols, axis=1)               # (nc, nb2)
            outer = wgq[:, :, None] * wgq[:, None, :]
            elem = elem + sw[:, q, None] * outer.reshape(
                uqf.shape[0], nb2 * nb2)
        return self._pats(hi)[0].assemble_values(elem)

    # ------------------------------------------------------------------ #
    def picard_matrix_values(self, u: jnp.ndarray, hi: bool = False,
                             compute32: bool = False) -> jnp.ndarray:
        """A1 = nu * L + N(u) scalar values (applied to each component)."""
        L = self.const_hi.L if hi else self.const.L
        conv = self.convection_values(u, hi=hi, compute32=compute32)
        return self.nu * L.vals.astype(conv.dtype) + conv

    def residual(self, u: jnp.ndarray, p: Optional[jnp.ndarray],
                 hi: bool = True, supg: bool = False,
                 compute32: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Steady NS residual F(w) with zero body force, natural outflow:
        ``ru_a = A1(u) u_a + DT_a p``, ``rp = sum_a D_a u_a``
        (BC masking applied by caller).  ``hi`` selects the high-precision
        ELL operators (the residual drives nonlinear/IR convergence).
        ``p=None`` skips the pressure-gradient term (convection-diffusion
        part only — the theta-weighted pieces of the unsteady residual).

        ``supg=True`` evaluates the SUPG-STABILIZED residual: the momentum
        rows gain ``delta (u.grad v)(u.grad u)`` — the system-operator
        stabilization of BASELINE config 5 (without it the Galerkin system
        at cell-Peclet >> 1 is oscillatory and outer Krylov stalls at any
        subsolve quality; measured at Re=2000, level 1-2).  The Picard
        operator lags the same term (consistent linearization).

        ``compute32`` (see :meth:`convection_values`) runs the per-call
        convection element integrals in f32: at 2M dofs the emulated-f64
        einsum temporaries inside the residual program are what pushes the
        16 GB HBM over the edge (measured: the first fused-step residual
        RESOURCE_EXHAUSTEDs at l=3/length=9 without it)."""
        A1vals = self.picard_matrix_values(u, hi=hi, compute32=compute32)
        if supg:
            A1vals = A1vals + self.supg_values(u, hi=hi).astype(A1vals.dtype)
        A1 = self._pats(hi)[0].matrix(A1vals)
        comps = self.split_u(u)
        c = self.const_hi if hi else self.const
        ru = jnp.concatenate([A1.mv(comps[a]) for a in range(self.dim)])
        if p is not None:
            ru = ru + self.grad_p(p, hi=hi)
        if self._load_u is not None:
            # body force enters every scheme correctly from here: a
            # time-independent f is theta-invariant, and the Jacobian is
            # untouched (the load is state-independent).  Note: not
            # SUPG-test-weighted (the delta (u.grad v).f term is omitted).
            ru = ru - self._load_u.astype(ru.dtype)
        rp = sum(c.D[a].mv(comps[a]) for a in range(self.dim))
        return ru, rp

    def set_body_force(self, f) -> None:
        """Install a body force: ``residual`` gains ``-∫ f·v dx``.

        ``f(x: (k, d)) -> (k, d)`` is evaluated at the quadrature points of
        every cell and integrated against the P2 basis (host-side NumPy,
        setup-time; the resulting load vector lives on the assembler so
        ``lift_jit`` passes it as a program argument).  The reference
        expresses body forces inside the UFL linear form L — this is the
        factored-path equivalent (the custom-forms path takes them via
        ``solvers.custom.PCDAssembler(coefficients=...)``).
        """
        d, mesh = self.dim, self.mesh
        if d == 2:
            from . import elements as el
            qp, qw = el.triangle_quadrature(self.quad_degree)
        else:
            from . import elements3d as el
            qp, qw = el.tet_quadrature(self.quad_degree)
        phi2, _ = el.p2_basis(qp)                     # (nq, nb2)
        nc = mesh.num_cells
        v = mesh.vertices[mesh.cells]                 # (nc, d+1, d)
        v0 = v[:, 0]
        E = v[:, 1:] - v0[:, None]                    # (nc, d, d) edge vecs
        adet = np.abs(np.linalg.det(
            np.stack([E[:, i] for i in range(d)], axis=2)))
        xq = v0[:, None, :] + np.einsum("qk,nkd->nqd", qp, E)
        fq = np.asarray(f(xq.reshape(-1, d))).reshape(nc, len(qw), d)
        elem = np.einsum("n,q,nqa,qi->nai", adet, qw, fq, phi2)
        cd2 = self._cd2_np[:nc]                       # (nc, nb2) real cells
        b = np.zeros(d * self.n2)
        for a in range(d):
            np.add.at(b, a * self.n2 + cd2, elem[:, a, :])
        b *= self._u_active_np                        # padding rows stay 0
        self._load_u = jnp.asarray(b, dtype=self.dtype)

    def grad_p(self, p: jnp.ndarray, hi: bool = True) -> jnp.ndarray:
        """Pressure-gradient apply ``B^T p`` stacked over components
        (theta-scheme residuals apply it UNSCALED, matching the Jacobian
        block; the compute-precision pipeline has its own copies in
        OseenSolver._matvec_factory/_bt_mv)."""
        c = self.const_hi if hi else self.const
        return jnp.concatenate([c.DT[a].mv(p) for a in range(self.dim)])
