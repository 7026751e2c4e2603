"""Pallas TPU kernel for ELL SpMV.

Reference-parity: PETSc SeqAIJ ``MatMult`` (SURVEY.md section 2.2 item 1) —
the single hottest primitive of the whole solver (every FGMRES iteration does
one monolithic SpMV plus several preconditioner SpMVs).

Design (per /opt/skills/guides/pallas_guide.md):
  * ELL layout ``vals``/``cols`` of shape (n, K) — static sparsity, padded
    slots have col 0 / val 0.
  * Speed of light = HBM traffic: read n*K values + n*K column indices + the
    gathered x entries + write n outputs.  The kernel tiles rows into
    (TILE_R, K) VMEM blocks streamed by the Pallas pipeline while ``x`` is
    held whole in VMEM across the grid (FEM vectors at practical sizes are
    well under the ~16 MB VMEM budget; a 2M-dof f32 vector is 8 MB).
  * The inner gather ``x[cols_tile]`` + row reduction maps onto the VPU.

Row counts are padded to a multiple of the tile on the host side (ELL
matrices built by fenapack_tpu.ops.sparse always carry zero-padded slots, so
extra rows simply produce zeros that callers slice away).

Falls back transparently to the XLA gather implementation when Pallas/Mosaic
cannot compile the kernel on the current backend (CPU tests run
``interpret=True``).

TOOLCHAIN STATUS (probed 2026-08-16 on TPU v5e via the axon tunnel): this
jax/Mosaic build only lowers gathers whose ``indices.shape ==
operand.shape + (1,)`` (within-row ``take_along_axis``), and the backend
compiler rejects cross-lane index ranges beyond a vreg — so an
arbitrary-column ELL gather cannot be expressed as a Pallas kernel here.
``PallasSpMV`` therefore auto-falls back to the XLA gather SpMV on TPU
(which XLA lowers natively and which is HBM-bandwidth-bound — the same
speed-of-light bound the kernel would have); the Pallas path stays active
in interpret mode and on toolchains whose Mosaic supports general gathers.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _spmv_kernel(x_ref, vals_ref, cols_ref, out_ref):
    x = x_ref[:]                       # (n_pad,) resident in VMEM
    vals = vals_ref[:]                 # (TILE_R, K)
    cols = cols_ref[:]                 # (TILE_R, K)
    g = jnp.take(x, cols, axis=0)      # VPU gather
    out_ref[:] = jnp.sum(vals * g, axis=1)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("tile_r", "interpret"))
def _ell_spmv_pallas(x, vals, cols, *, tile_r: int, interpret: bool):
    n, K = vals.shape
    grid = (n // tile_r,)
    return pl.pallas_call(
        _spmv_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x whole, VMEM-resident
            pl.BlockSpec((tile_r, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n,), vals.dtype),
        interpret=interpret,
    )(x, vals, cols)


class PallasSpMV:
    """Host-side wrapper: pads row/column dimensions once, then applies.

    Usage: ``op = PallasSpMV(ell)`` at setup; ``op(x)`` inside jit.
    """

    def __init__(self, ell, tile_r: int = 256, interpret: bool = False):
        n, K = ell.vals.shape
        self.n = n
        self.n_cols = ell.n_cols
        self.tile_r = tile_r
        self.n_pad = _round_up(n, tile_r)
        self.interpret = interpret
        # see module docstring: Mosaic on this toolchain cannot lower the
        # arbitrary-column gather — compiled mode only off-TPU/interpret
        self.use_pallas = interpret or jax.default_backend() not in ("tpu",)
        self._ell = ell
        pad = self.n_pad - n
        if pad:
            self.vals = jnp.pad(ell.vals, ((0, pad), (0, 0)))
            self.cols = jnp.pad(ell.cols, ((0, pad), (0, 0)))
        else:
            self.vals, self.cols = ell.vals, ell.cols

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if not self.use_pallas:
            return self._ell.mv(x)
        y = _ell_spmv_pallas(x, self.vals, self.cols,
                             tile_r=self.tile_r, interpret=self.interpret)
        return y[:self.n]


def ell_spmv(ell, x, tile_r: int = 256, interpret: bool = False):
    """One-shot Pallas ELL SpMV (pads per call — prefer :class:`PallasSpMV`
    inside solvers)."""
    return PallasSpMV(ell, tile_r=tile_r, interpret=interpret)(x)


# --------------------------------------------------------------------- #
# block-sparse-row SpMV kernel (flat tiles)
# --------------------------------------------------------------------- #
#
# Unlike the arbitrary-column ELL gather (Mosaic-blocked, see module
# docstring), the BSR gather is BY BLOCK: the kernel reads each neighbor
# block of x with a scalar-indexed dynamic slice (supported), so the whole
# SpMV streams the tile array at HBM bandwidth while x stays VMEM-resident.
# Layout matches ops.sparse.BlockELL flat tiles (nb, b, m*b).
#
# TOOLCHAIN STATUS (probed 2026-08-17, axon v5e): BOTH formulations below
# compile and run on the chip (the earlier 1D-concatenate form was rejected
# by Mosaic).  At bench scale (26k dofs, m=16) the scratch variant runs
# 0.41 ms vs the XLA flat-tile einsum's 0.35 ms — XLA stays the production
# f32 path; the kernel's value is the DF32 compensated variant below, which
# XLA cannot express (f32 inputs + f64-accurate accumulation: XLA's
# preferred_element_type=f64 emulation measured 24 ms).

def _nbr_mode(nb_pad: int) -> str:
    """SMEM strategy for the neighbor table, keyed on PADDED block rows.

    ``prefetch`` (PrefetchScalarGridSpec) holds the WHOLE nbr array in SMEM
    — chip-proven at 2D bench scale, but SMEM is ~1 MB and Mosaic pads the
    (nb, m) i32 table's minor dim to 128 LANES regardless of m: the real
    SMEM footprint is ``nb_pad * 128 * 4`` bytes, NOT ``nb * m * 4``.
    (Measured from AOT compile errors 2026-08-19: 2d-l3 b=8 nb_pad=5704
    → 'u8[2920448] would exceed memory (space=smem)' = 5704*128*4 exactly;
    the 3D 761k b=8 failure u8[15548416] matches the same formula — the
    root cause of the round-1 '761k worker crash'.)  ``blocked`` streams
    per-grid-step (R, m) SMEM slices instead (the kernel only ever reads
    its own panel's rows), removing the scale ceiling.
    FENAPACK_BSR_SMEM: auto (by padded size) | blocked | prefetch.
    """
    import os
    mode = os.environ.get("FENAPACK_BSR_SMEM", "auto")
    if mode in ("blocked", "prefetch"):
        return mode
    return "prefetch" if nb_pad * 128 * 4 <= 512 * 1024 else "blocked"


def _make_bsr_kernel(blocked: bool):
    """Scratch-row formulation: the gathered neighbor blocks are written
    into a VMEM scratch row ``g_ref`` (1, m*b) at static lane offsets, then
    the whole block-row product is ONE fused VPU multiply-reduce over the
    flat (b, m*b) tile.  (A 1D ``jnp.concatenate`` of the gathered pieces is
    not lowerable on this Mosaic: "input offsets outside of the first
    tile".)  ``blocked``: nbr_ref is the per-step (R, m) SMEM slice;
    otherwise the whole scalar-prefetched table."""

    def kernel(nbr_ref, tiles_ref, x_ref, out_ref, g_ref):
        R, b, mb = tiles_ref.shape
        m = mb // b
        base = 0 if blocked else pl.program_id(0) * R
        for r in range(R):                   # static unroll over panel rows
            for j in range(m):
                g_ref[0, j * b:(j + 1) * b] = (
                    x_ref[pl.ds(nbr_ref[base + r, j], 1), :][0])
            out_ref[r, :] = jnp.sum(tiles_ref[r] * g_ref[:], axis=1)
    return kernel


def _make_bsr_kernel_accum(blocked: bool):
    """Per-neighbor accumulation formulation: m static (b, b) column slices
    of the flat tile, each multiplied against its gathered x block and
    lane-reduced.  No scratch, no concatenate."""

    def kernel(nbr_ref, tiles_ref, x_ref, out_ref):
        R, b, mb = tiles_ref.shape
        m = mb // b
        base = 0 if blocked else pl.program_id(0) * R
        for r in range(R):
            acc = jnp.zeros((b,), out_ref.dtype)
            for j in range(m):
                xg = x_ref[pl.ds(nbr_ref[base + r, j], 1), :]   # (1, b)
                t = tiles_ref[r, :, j * b:(j + 1) * b]          # (b, b)
                acc = acc + jnp.sum(t * xg, axis=1)
            out_ref[r, :] = acc
    return kernel


class PallasBSRSpMV:
    """Pallas kernel for :class:`ops.sparse.BlockELL` (flat tiles).

    ``op = PallasBSRSpMV(block_ell)`` at setup; ``op(x)`` inside jit.
    ``rows_per_step`` block rows are processed per grid step (their tiles
    stream through VMEM; the neighbor ids ride in SMEM).
    """

    def __init__(self, bell, rows_per_step: int = 8,
                 interpret: bool = False, variant: str = "scratch"):
        nb, b, mb = bell.tiles.shape
        self.bell = bell
        self.b = b
        self.R = rows_per_step
        # Mosaic block constraints: pad the block-row count to the panel
        # size (padding rows have nbr=0 and zero tiles — they compute zeros)
        self.nb_pad = -(-nb // self.R) * self.R
        self.interpret = interpret
        self.variant = variant
        ncb = -(-bell.n_cols // b) * b
        self.ncb = ncb

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        bell, b, R = self.bell, self.b, self.R
        nb, _, mb = bell.tiles.shape
        xb = jnp.pad(x, (0, self.ncb - bell.n_cols)).reshape(-1, b)
        tiles = bell.tiles
        nbr = bell.nbr
        if self.nb_pad != nb:
            tiles = jnp.pad(tiles, ((0, self.nb_pad - nb), (0, 0), (0, 0)))
            nbr = jnp.pad(nbr, ((0, self.nb_pad - nb), (0, 0)))
            nb = self.nb_pad
        blocked = _nbr_mode(nb) == "blocked"
        scratch = []
        if self.variant == "scratch":
            kernel = _make_bsr_kernel(blocked)
            scratch = [pltpu.VMEM((1, mb), tiles.dtype)]
        else:
            kernel = _make_bsr_kernel_accum(blocked)
        if blocked:
            m = mb // b
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(nb // R,),
                in_specs=[
                    # per-step SMEM slice of the neighbor table
                    pl.BlockSpec((R, m), lambda i: (i, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((R, b, mb), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # x whole
                ],
                out_specs=pl.BlockSpec((R, b), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=scratch,
            )
        else:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nb // R,),
                in_specs=[
                    pl.BlockSpec((R, b, mb), lambda i, nbr: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # x whole
                ],
                out_specs=pl.BlockSpec((R, b), lambda i, nbr: (i, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=scratch,
            )
        # x64 semantics OFF around the trace: under global jax_enable_x64
        # the Mosaic lowering embeds i64 index arithmetic that crashes the
        # backend compiler (same bisect as DF32BlockSpMV; operands here are
        # explicit f32/i32 so nothing changes semantically)
        with jax.enable_x64(False):
            y = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((nb, b), tiles.dtype),
                grid_spec=grid_spec,
                interpret=self.interpret,
            )(nbr, tiles, xb)
        return y.reshape(-1)[:bell.n_rows]


# --------------------------------------------------------------------- #
# double-single (df32) compensated BSR SpMV kernel
# --------------------------------------------------------------------- #
#
# Replaces the emulated-f64 monolithic matvec of the hi_krylov outer loop
# (reference-parity: PETSc MatMult at PetscReal=double — SURVEY.md 2.2 #1).
# TPU v5e has no native f64; XLA emulation of the block matvec costs ~9 ms
# at 26k dofs vs 0.35 ms for f32.  This kernel computes y = A x with
# ~2^-45 relative accuracy from pure-f32 VPU arithmetic:
#
#   * the f64 tile values are split HOST/GRAPH-side into three f32 planes
#     (T1 + T2 = f32(A) with <=12-bit mantissas each — Veltkamp split — and
#     Tl = f32(A - f32(A))); x is split the same way per apply.
#   * every hi*hi partial product (T1 g1, T1 g2, T2 g1, T2 g2) is EXACT in
#     f32 (12+12-bit mantissas); the lo cross terms are ~2^-24-relative and
#     plain f32 rounding on them lands at ~2^-48.
#   * the only remaining rounding — merging the exact products and the lane
#     reduction — is compensated with branch-free TwoSum at every level of
#     the reduction tree; the collected error terms are returned as a
#     separate f32 correction plane C with y = f64(S) + f64(C).
#
# Accuracy requirement: the hi_krylov true residual r = b - A x cancels to
# ~1e-8 |b|, so err(Ax) must sit well below that; measured relerr of this
# kernel vs emulated f64 is ~1e-13 (interpret and compiled), far inside the
# f32 estimate floor (~1e-6) that forced the f64 path.

def _twosum(a, b):
    s = a + b
    bv = s - a
    av = s - bv
    return s, (a - av) + (b - bv)


def _comp_tree_rowsum(s):
    """Compensated binary-tree reduction over the lane axis.

    ``s`` (b, W) -> (rowsum (b,), error (b,)).  W halves while even; a
    small odd remainder (W = odd * 2^k, odd <= ~7 for the mult-of-16
    block padding) finishes with a sequential compensated fold.  Each
    level's TwoSum errors are themselves plain-summed (they are ~2^-24
    relative to the result, so their rounding is ~2^-48).

    Mosaic notes: offset lane slices of COMPUTED values lower fine (the
    pow2 tree always did ``s[:, half:]``); offset slices of ref-loaded
    kernel operands do NOT ("Invalid input layout", probed 2026-08-19) —
    that is why the caller reduces full-width products instead of
    chunking the operands."""
    b, W = s.shape
    err = jnp.zeros((b,), s.dtype)
    while W > 1:
        if W % 2 == 0:
            half = W // 2
            t, e = _twosum(s[:, :half], s[:, half:])
            err = err + jnp.sum(e, axis=1)
            s = t
            W = half
        else:
            # odd W: sequential compensated fold over the few lanes left
            acc = s[:, 0:1]
            for i in range(1, W):
                acc, e = _twosum(acc, s[:, i:i + 1])
                err = err + jnp.sum(e, axis=1)
            s = acc
            W = 1
    # jnp.sum, not s[:, 0]: a lane-indexed extraction from a (b, 1) array
    # crashes the Mosaic backend compiler (bisected 2026-08-17); the sum
    # over the singleton lane axis is value-identical and lowers fine
    return jnp.sum(s, axis=1), err


def _make_bsr_df32_kernel(blocked: bool, nrhs: int = 1):
    """``nrhs`` right-hand sides share one pass over the tile planes: the
    velocity block applies the SAME scalar operator to every component, so
    a d-RHS kernel streams the (3x) tile planes from HBM once instead of d
    times (the tiles dominate the traffic: m*b f32 per row vs b per x)."""
    def kernel(*refs):
        nbr_ref = refs[0]
        t1_ref, t2_ref, tl_ref = refs[1:4]
        xrefs = refs[4:4 + 3 * nrhs]
        outs = refs[4 + 3 * nrhs:4 + 5 * nrhs]
        g1_ref, g2_ref, gl_ref = refs[-3:]
        R, b, mb = t1_ref.shape
        m = mb // b
        base = 0 if blocked else pl.program_id(0) * R
        for r in range(R):
            t1, t2, tl = t1_ref[r], t2_ref[r], tl_ref[r]
            for k in range(nrhs):
                x1_ref, x2_ref, xl_ref = xrefs[3 * k:3 * k + 3]
                s_ref, c_ref = outs[2 * k], outs[2 * k + 1]
                for j in range(m):
                    blk = pl.ds(nbr_ref[base + r, j], 1)
                    g1_ref[0, j * b:(j + 1) * b] = x1_ref[blk, :][0]
                    g2_ref[0, j * b:(j + 1) * b] = x2_ref[blk, :][0]
                    gl_ref[0, j * b:(j + 1) * b] = xl_ref[blk, :][0]
                g1, g2, gl = g1_ref[:], g2_ref[:], gl_ref[:]
                p0 = t1 * g1                             # exact
                pm = t1 * g2 + t2 * g1 + t2 * g2         # exact products
                q = (t1 + t2) * gl + tl * (g1 + g2)      # ~2^-24-rel terms
                s, e = _twosum(p0, pm)                   # elementwise merge
                row, tree_err = _comp_tree_rowsum(s)
                s_ref[r, :] = row
                c_ref[r, :] = tree_err + jnp.sum(e + q, axis=1)
    return kernel


def split_f64(v, out_dtype=jnp.float32):
    """Split f64 values into (hi1, hi2, lo) f32 planes: hi1 + hi2 = f32(v)
    with <=12-bit mantissas (Veltkamp), lo = f32(v - f32(v))."""
    vh = v.astype(out_dtype)
    vl = (v - vh.astype(v.dtype)).astype(out_dtype)
    c = vh * 4097.0                    # 2^12 + 1 (weak-typed: stays f32)
    v1 = c - (c - vh)
    v2 = vh - v1
    return v1, v2, vl


class DF32BlockSpMV:
    """f64-accurate block SpMV from pure-f32 Pallas arithmetic.

    Setup once per sparsity pattern::

        op = DF32BlockSpMV(bell_pattern_matrix, rows_per_step=8)

    then inside jit, with f64 tile values ``vals`` (nb, b, m*b) and f64
    ``x``::

        tiles3 = op.split_tiles(vals)      # per operator update (Picard step)
        y = op(tiles3, x)                  # per apply; y is f64

    The neighbor table is padded (repeating block 0 with zero tiles) to the
    128-lane alignment multiple, nudged so the odd part of ``m_pad`` stays
    small — the compensated reduction halves while even and finishes with a
    short sequential fold (see ``_comp_tree_rowsum``), so no power-of-two
    padding is needed.
    """

    def __init__(self, bell, rows_per_step: int = 8,
                 interpret: bool = False):
        nb, b, mb = bell.tiles.shape
        self._setup(bell.nbr, nb, b, mb // b, bell.n_rows, bell.n_cols,
                    rows_per_step, interpret)

    @classmethod
    def from_pattern(cls, pat, rows_per_step: int = 8,
                     interpret: bool = False):
        """Construct from a BlockSparsityPattern (no values needed)."""
        self = object.__new__(cls)
        self._setup(pat.nbr, pat.nb, pat.block, pat.m,
                    pat.n_rows, pat.n_cols, rows_per_step, interpret)
        return self

    def _setup(self, nbr, nb, b, m, n_rows, n_cols, rows_per_step,
               interpret):
        if rows_per_step % 8:
            raise ValueError("rows_per_step must be a multiple of 8: the "
                             "(R, b) output block's sublane dim must be "
                             "8-divisible for the Mosaic lowering")
        # the generalized reduction tree (halve-while-even + short odd
        # fold) frees m_pad from the next-power-of-two requirement that
        # blew the scoped-VMEM budget of the nrhs=2 bench kernel (16.73M
        # vs 16M, AOT compile error 2026-08-19).  Pad to the 128-lane
        # alignment multiple, nudged so the odd part of m_pad stays <= 7
        # (bounds the sequential fold): m=41/b=32 -> 48 not 64 (-25%
        # VMEM + HBM traffic per tile plane), m=37/b=16 -> 40 not 64.
        min_mult = max(1, 128 // b)
        if b & (b - 1):                       # non-pow2 b: legacy pow2 pad
            self.m_pad = max(1 << (m - 1).bit_length(), min_mult)
        else:
            mp = -(-m // min_mult) * min_mult
            while True:
                q = mp
                while q % 2 == 0:
                    q //= 2
                if q <= 7:
                    break
                mp += min_mult
            self.m_pad = mp
        self.b, self.m = b, m
        self.R = rows_per_step
        self.nb_pad = -(-nb // self.R) * self.R
        self.nb = nb
        self.interpret = interpret
        self.n_rows, self.n_cols = n_rows, n_cols
        self.ncb = -(-n_cols // b) * b
        if self.m_pad != m:
            nbr = jnp.pad(nbr, ((0, 0), (0, self.m_pad - m)))
        if self.nb_pad != nb:
            nbr = jnp.pad(nbr, ((0, self.nb_pad - nb), (0, 0)))
        self.nbr = nbr

    def split_tiles(self, vals):
        """(nb, b, m*b) f64 -> three padded (nb_pad, b, m_pad*b) f32 planes."""
        nb, b, mb = vals.shape
        pads = ((0, self.nb_pad - nb), (0, 0), (0, (self.m_pad * b) - mb))
        return tuple(jnp.pad(p, pads) for p in split_f64(vals))

    def split_x(self, x):
        """f64 (n_cols,) -> three (ncb/b, b) f32 planes."""
        xp = jnp.pad(x, (0, self.ncb - self.n_cols))
        return tuple(p.reshape(-1, self.b) for p in split_f64(xp))

    def __call__(self, tiles3, x=None, x3=None, xs3=None):
        """Apply.  Pass f64 ``x`` OR a pre-split ``x3`` (from
        :meth:`split_x`) when several operators share one input vector, OR
        ``xs3`` — a LIST of pre-split inputs — to apply the operator to
        several right-hand sides in one kernel pass (returns a list): the
        d velocity components share one streaming of the tile planes."""
        single = xs3 is None
        if single:
            xs3 = [x3 if x3 is not None else self.split_x(x)]
        nrhs = len(xs3)
        R, b, mbp = self.R, self.b, self.m_pad * self.b
        nb = self.nb_pad
        blocked = _nbr_mode(self.nb_pad) == "blocked"
        if blocked:
            in_specs = [
                pl.BlockSpec((R, self.m_pad), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
            ] + [
                pl.BlockSpec((R, b, mbp), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)] * 3 + [
                pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 * nrhs)
            out_specs = [pl.BlockSpec((R, b), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)] * (2 * nrhs)
            n_prefetch = 0
        else:
            in_specs = [
                pl.BlockSpec((R, b, mbp), lambda i, nbr: (i, 0, 0),
                             memory_space=pltpu.VMEM)] * 3 + [
                pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 * nrhs)
            out_specs = [pl.BlockSpec((R, b), lambda i, nbr: (i, 0),
                                      memory_space=pltpu.VMEM)] * (2 * nrhs)
            n_prefetch = 1
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_prefetch,
            grid=(nb // R,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((1, mbp), jnp.float32)] * 3,
        )
        xflat = [p for x3_ in xs3 for p in x3_]
        # trace the kernel with x64 semantics OFF: under global
        # jax_enable_x64 the Mosaic lowering embeds i64 index arithmetic
        # that crashes the backend compiler (bisected 2026-08-17: the
        # identical kernel compiles without x64 and 500s with it, at any
        # size).  All kernel operands are explicit f32/i32, so the scoped
        # disable changes nothing semantically.
        with jax.enable_x64(False):
            outs = pl.pallas_call(
                _make_bsr_df32_kernel(blocked, nrhs),
                out_shape=[jax.ShapeDtypeStruct((nb, b),
                                                jnp.float32)] * (2 * nrhs),
                grid_spec=grid_spec,
                interpret=self.interpret,
            )(self.nbr, *tiles3, *xflat)
        ys = []
        for k in range(nrhs):
            s, c = outs[2 * k], outs[2 * k + 1]
            y = s.astype(jnp.float64) + c.astype(jnp.float64)
            ys.append(y.reshape(-1)[:self.n_rows])
        return ys[0] if single else ys
