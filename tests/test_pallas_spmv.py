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


def test_bsr_kernel_interpret_matches_blockell():
    import numpy as np
    import jax.numpy as jnp
    from fenapack_tpu.ops.sparse import pattern_from_dofmaps
    from fenapack_tpu.ops.pallas_spmv import PallasBSRSpMV
    rng = np.random.default_rng(0)
    cd = rng.integers(0, 512, size=(400, 6)).astype(np.int64)
    pat = pattern_from_dofmaps(cd, cd, 512, 512, block=32)
    vals = rng.standard_normal((400, 6, 6)).astype(np.float32)
    op = pat.assemble(jnp.asarray(vals))
    x = jnp.asarray(rng.standard_normal(512).astype(np.float32))
    y_ref = np.asarray(op.mv(x))
    for variant in ("scratch", "accum"):
        y = np.asarray(PallasBSRSpMV(op, interpret=True,
                                     variant=variant)(x))
        assert np.abs(y - y_ref).max() < 1e-4, variant
