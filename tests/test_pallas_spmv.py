"""Pallas ELL SpMV kernel: interpret-mode correctness vs the XLA gather."""
import numpy as np
import jax.numpy as jnp

from fenapack_tpu.ops.sparse import SparsityPattern
from fenapack_tpu.ops.pallas_spmv import PallasSpMV


def test_pallas_ell_spmv_matches_xla():
    rng = np.random.default_rng(0)
    n, nnz = 513, 5000          # deliberately not a tile multiple
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, n, nnz)
    pat = SparsityPattern(rows, cols, n, n)
    ell = pat.assemble(jnp.asarray(rng.standard_normal(nnz)))
    x = jnp.asarray(rng.standard_normal(n))
    op = PallasSpMV(ell, tile_r=64, interpret=True)
    err = float(jnp.max(jnp.abs(op(x) - ell.mv(x))))
    assert err < 1e-12, err


import pytest


@pytest.mark.parametrize("block", [8, 16, 32])
def test_bsr_kernel_interpret_matches_blockell(block):
    """Tile-size-generic: b=8 is the 3D HBM-fallback layout (the campaign
    retries 761k/2M runs at b=8 — scripts/block_fill_audit.py)."""
    import numpy as np
    import jax.numpy as jnp
    from fenapack_tpu.ops.sparse import pattern_from_dofmaps
    from fenapack_tpu.ops.pallas_spmv import PallasBSRSpMV
    rng = np.random.default_rng(0)
    cd = rng.integers(0, 512, size=(400, 6)).astype(np.int64)
    pat = pattern_from_dofmaps(cd, cd, 512, 512, block=block)
    vals = rng.standard_normal((400, 6, 6)).astype(np.float32)
    op = pat.assemble(jnp.asarray(vals))
    x = jnp.asarray(rng.standard_normal(512).astype(np.float32))
    y_ref = np.asarray(op.mv(x))
    for variant in ("scratch", "accum"):
        y = np.asarray(PallasBSRSpMV(op, interpret=True,
                                     variant=variant)(x))
        assert np.abs(y - y_ref).max() < 1e-4, variant


def test_df32_kernel_interpret_f64_accuracy():
    """The compensated df32 kernel must reproduce the emulated-f64 block
    matvec to ~1e-11 — 4+ decades inside plain f32 (the accuracy that lets
    it replace the hi_krylov f64 outer matvec)."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from fenapack_tpu.ops.sparse import pattern_from_dofmaps
    from fenapack_tpu.ops.pallas_spmv import DF32BlockSpMV
    rng = np.random.default_rng(1)
    n = 1024
    cd = rng.integers(0, n, size=(700, 6)).astype(np.int64)
    pat = pattern_from_dofmaps(cd, cd, n, n, block=32)
    vals = rng.standard_normal((700, 6, 6))
    vals *= 10.0 ** rng.uniform(-3, 3, size=vals.shape)
    bell = pat.assemble(jnp.asarray(vals, dtype=jnp.float64))
    x = jnp.asarray(rng.standard_normal(n), dtype=jnp.float64)
    y_ref = np.asarray(bell.mv(x))
    op = DF32BlockSpMV(bell, interpret=True)
    y = np.asarray(op(op.split_tiles(bell.tiles), x))
    scale = np.abs(y_ref).max()
    assert np.abs(y - y_ref).max() / scale < 1e-10
    # sanity: plain f32 is far worse on the same problem
    y32 = np.asarray(bell.with_vals(bell.tiles.astype(jnp.float32))
                     .mv(x.astype(jnp.float32)))
    assert np.abs(y32 - y_ref).max() / scale > 1e-8


def test_df32_oseen_matvec_parity():
    """The df32 hi matvec (krylov.df32_matvec) must reproduce the f64 ELL
    hi matvec on the real assembled Oseen operator to ~1e-11 — the accuracy
    contract that lets hi_krylov trust its residual estimate to 1e-8.
    End-to-end fused Picard solves were verified to give IDENTICAL
    iteration counts (311 total at level 0) with and without df32."""
    import numpy as np
    import jax.numpy as jnp
    from fenapack_tpu.fem import mesh as meshmod
    from fenapack_tpu.fem.assemble import NSAssembler
    from fenapack_tpu.fem.dofmap import DirichletBC
    from fenapack_tpu.solvers.config import SolverConfig, overrides
    from fenapack_tpu.solvers.oseen import OseenSolver

    mesh = meshmod.backward_step_mesh(0)

    def inflow(x):
        v = np.zeros((x.shape[0], 2))
        v[:, 0] = 4 * x[:, 1] * (1 - x[:, 1])
        return v

    def build(hi_block, df32):
        asm = NSAssembler(mesh, 0.02, dtype=jnp.float64, block_size=32,
                          reorder=False, block_dtype=jnp.float32,
                          hi_block=hi_block)
        bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL],
                                    lambda x: np.zeros((x.shape[0], 2))),
               DirichletBC.velocity(asm.W, [meshmod.INFLOW], inflow)]
        cfg = overrides(SolverConfig(), {
            "dtype": "float32", "krylov.hi_krylov": True,
            "krylov.df32_matvec": df32})
        return OseenSolver(asm, bcs, cfg)

    ref, new = build(False, False), build(True, True)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal(ref.n_u) * 0.1)
    x = jnp.asarray(rng.standard_normal(ref.n))
    A1r, Rr = ref._operator_values_raw(w.astype(jnp.float64), hi=True)
    A1n, Rn = new._operator_values_raw(w.astype(jnp.float64), hi=True)
    yr = np.asarray(ref._matvec_factory(A1r, Rr, hi=True)(x))
    yn = np.asarray(new._matvec_factory(A1n, Rn, hi=True)(x))
    assert np.abs(yn - yr).max() / np.abs(yr).max() < 1e-10


def test_nbr_mode_counts_smem_lane_padding(monkeypatch):
    """The prefetch/blocked auto choice must budget the PADDED SMEM
    footprint nb_pad*128*4 (Mosaic pads the (nb, m) i32 table's minor dim
    to 128 lanes), not the raw nb*m*4 bytes.  Regression for the 2d-l3 b=8
    AOT failure: nb_pad=5704, m=11 -> raw 250 KB chose 'prefetch' but the
    padded table is 2.92 MB > the ~1 MB SMEM (measured compile error
    u8[2920448] == 5704*128*4, 2026-08-19)."""
    from fenapack_tpu.ops.pallas_spmv import _nbr_mode
    monkeypatch.delenv("FENAPACK_BSR_SMEM", raising=False)
    assert _nbr_mode(1024) == "prefetch"          # 512 KB padded: fits
    assert _nbr_mode(1025) == "blocked"
    assert _nbr_mode(5704) == "blocked"           # the failing 2d-l3 shape
    monkeypatch.setenv("FENAPACK_BSR_SMEM", "prefetch")
    assert _nbr_mode(10**6) == "prefetch"         # explicit override wins


def test_df32_multirhs_matches_single():
    """xs3 multi-RHS (one tile-plane pass for all velocity components)
    must be bit-identical to per-component single-RHS applies — same
    arithmetic, shared streaming."""
    import numpy as np
    import jax.numpy as jnp
    from fenapack_tpu.ops.sparse import pattern_from_dofmaps
    from fenapack_tpu.ops.pallas_spmv import DF32BlockSpMV
    rng = np.random.default_rng(7)
    n = 512
    cd = rng.integers(0, n, size=(300, 6)).astype(np.int64)
    pat = pattern_from_dofmaps(cd, cd, n, n, block=32)
    vals = rng.standard_normal((300, 6, 6))
    bell = pat.assemble(jnp.asarray(vals, dtype=jnp.float64))
    op = DF32BlockSpMV(bell, interpret=True)
    t3 = op.split_tiles(bell.tiles)
    xs = [jnp.asarray(rng.standard_normal(n), dtype=jnp.float64)
          for _ in range(2)]
    xs3 = [op.split_x(x) for x in xs]
    singles = [np.asarray(op(t3, x3=x3)) for x3 in xs3]
    multi = op(t3, xs3=xs3)
    assert len(multi) == 2
    for ys, ym in zip(singles, multi):
        assert np.array_equal(ys, np.asarray(ym))
