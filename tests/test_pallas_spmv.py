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
