"""Native (C++) host-side setup kernels vs NumPy semantics.

The radix unique/searchsorted must match ``np.unique``/``np.searchsorted``
bit-for-bit (sparsity patterns and mesh topology are built on them); RCM must
produce a valid permutation with bandwidth no worse than scipy's.
"""
import numpy as np
import pytest

from fenapack_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


@pytest.mark.parametrize("n,hi", [(0, 10), (1, 10), (57, 4), (10_000, 10**6),
                                  (200_000, 10**12), (100_000, 3)])
def test_unique_matches_numpy(n, hi):
    rng = np.random.default_rng(n + hi)
    keys = rng.integers(0, hi, size=n).astype(np.int64)
    u1, i1 = native.unique_i64(keys)
    u2, i2 = np.unique(keys, return_inverse=True)
    assert np.array_equal(u1, u2)
    assert np.array_equal(i1, i2.ravel())


def test_unique_presorted_and_constant():
    keys = np.arange(1000, dtype=np.int64)
    u, i = native.unique_i64(keys)
    assert np.array_equal(u, keys) and np.array_equal(i, keys)
    keys = np.full(1000, 7, dtype=np.int64)
    u, i = native.unique_i64(keys)
    assert np.array_equal(u, [7]) and not i.any()


def test_searchsorted_matches_numpy():
    rng = np.random.default_rng(0)
    uniq = np.unique(rng.integers(0, 10**9, size=5000).astype(np.int64))
    q = np.concatenate([rng.choice(uniq, 3000),
                        rng.integers(0, 10**9, size=2000)]).astype(np.int64)
    pos, hits = native.searchsorted_i64(uniq, q)
    ref = np.searchsorted(uniq, q)
    assert np.array_equal(pos, ref)
    in_uniq = np.isin(q, uniq)
    assert hits == int(in_uniq.sum())


def test_rcm_valid_permutation_and_bandwidth():
    from fenapack_tpu.fem import mesh as meshmod
    from fenapack_tpu.fem.dofmap import TaylorHood
    m = meshmod.backward_step_mesh(1)
    W = TaylorHood(m)
    cd = W.V.cell_dofs.astype(np.int32)
    rank = native.rcm_rank(cd, W.V.dim)
    assert rank is not None
    assert np.array_equal(np.sort(rank), np.arange(W.V.dim))

    def bandwidth(rk):
        a = cd.shape[1]
        rows = rk[np.repeat(cd, a, axis=1).ravel()]
        cols = rk[np.tile(cd, (1, a)).ravel()]
        return int(np.abs(rows - cols).max())

    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    a = cd.shape[1]
    rows = np.repeat(cd, a, axis=1).ravel()
    cols = np.tile(cd, (1, a)).ravel()
    A = sp.csr_matrix((np.ones(rows.shape[0], np.int8), (rows, cols)),
                      shape=(W.V.dim, W.V.dim))
    perm = reverse_cuthill_mckee(A, symmetric_mode=True)
    rank_scipy = np.empty(W.V.dim, dtype=np.int32)
    rank_scipy[perm] = np.arange(W.V.dim, dtype=np.int32)
    assert bandwidth(rank) <= int(1.2 * bandwidth(rank_scipy))


def test_pattern_uses_native_and_matches():
    """SparsityPattern built through the native path equals a hand-built
    scipy pattern on a small dofmap."""
    from fenapack_tpu.ops.sparse import pattern_from_dofmaps
    rng = np.random.default_rng(3)
    cd = rng.integers(0, 40, size=(30, 6)).astype(np.int64)
    pat = pattern_from_dofmaps(cd, cd, 40, 40)
    import scipy.sparse as sp
    vals = rng.standard_normal((30, 6, 6))
    rows = np.repeat(cd, 6, axis=1).ravel()
    cols = np.tile(cd, (1, 6)).ravel()
    ref = sp.csr_matrix((vals.ravel(), (rows, cols)), shape=(40, 40)).toarray()
    got = np.asarray(pat.to_dense(pat.assemble_values(vals)))
    assert np.allclose(got, ref, atol=1e-12)
