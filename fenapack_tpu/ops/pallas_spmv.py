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
# TOOLCHAIN STATUS (probed 2026-08-17, axon v5e): interpret mode is exact;
# the remote compile helper dies with an opaque HTTP 500 lowering the
# compiled kernel (the same service was also crashing its worker on large
# XLA programs that day — see SURVEY.md).  Callers should treat the XLA
# flat-tile einsum (BlockELL.mv, 0.41 ms at 26k dofs) as the production
# path until the service accepts the kernel; the kernel is kept compiled-
# path-ready and parity-tested in interpret mode.

def _bsr_kernel(nbr_ref, tiles_ref, x_ref, out_ref, g_ref):
    """Scratch-row formulation: the gathered neighbor blocks are written
    into a VMEM scratch row ``g_ref`` (1, m*b) at static lane offsets, then
    the whole block-row product is ONE fused VPU multiply-reduce over the
    flat (b, m*b) tile.  (A 1D ``jnp.concatenate`` of the gathered pieces is
    not lowerable on this Mosaic: "input offsets outside of the first
    tile".)"""
    R, b, mb = tiles_ref.shape
    m = mb // b
    i = pl.program_id(0)
    for r in range(R):                       # static unroll over panel rows
        for j in range(m):
            g_ref[0, j * b:(j + 1) * b] = (
                x_ref[pl.ds(nbr_ref[i * R + r, j], 1), :][0])
        out_ref[r, :] = jnp.sum(tiles_ref[r] * g_ref[:], axis=1)


def _bsr_kernel_accum(nbr_ref, tiles_ref, x_ref, out_ref):
    """Per-neighbor accumulation formulation: m static (b, b) column slices
    of the flat tile, each multiplied against its gathered x block and
    lane-reduced.  No scratch, no concatenate."""
    R, b, mb = tiles_ref.shape
    m = mb // b
    i = pl.program_id(0)
    for r in range(R):
        acc = jnp.zeros((b,), out_ref.dtype)
        for j in range(m):
            xg = x_ref[pl.ds(nbr_ref[i * R + r, j], 1), :]      # (1, b)
            t = tiles_ref[r, :, j * b:(j + 1) * b]              # (b, b)
            acc = acc + jnp.sum(t * xg, axis=1)
        out_ref[r, :] = acc


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
        scratch = []
        kernel = _bsr_kernel_accum
        if self.variant == "scratch":
            kernel = _bsr_kernel
            scratch = [pltpu.VMEM((1, mb), tiles.dtype)]
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
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nb, b), tiles.dtype),
            grid_spec=grid_spec,
            interpret=self.interpret,
        )(nbr, tiles, xb)
        return y.reshape(-1)[:bell.n_rows]
