"""runtime.intern: content-keyed device-upload dedup (round-5 residency fix).

The 2.05M config-4 residency audit measured ~5.9 GB of int32 pattern
indices resident as 8-16 identical copies (scripts/r5_resident_audit.py);
intern collapses identical uploads to one buffer.  The tracer guard is
load-bearing: the mini-UFL form compiler uploads under an active trace,
and a pooled tracer leaks into unrelated later solves (measured as
UnexpectedTracerError / executable buffer-count mismatches).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fenapack_tpu.runtime import intern, _INTERN_POOL


def test_identical_content_shares_buffer():
    a = np.arange(32768, dtype=np.int32)
    d1 = intern(a)
    d2 = intern(a.copy())                    # distinct host array, same bytes
    assert d1 is d2


def test_distinct_content_distinct_buffers():
    a = np.arange(32768, dtype=np.int32)
    b = a[::-1].copy()
    assert intern(a) is not intern(b)


def test_dtype_is_part_of_the_key():
    a = np.zeros(32768, dtype=np.int32)
    d1 = intern(a)
    d2 = intern(a, dtype=np.float32)
    assert d1.dtype == jnp.int32 and d2.dtype == jnp.float32


def test_small_arrays_not_pooled():
    a = np.arange(16, dtype=np.int32)
    assert intern(a) is not intern(a)


def test_tracer_never_pooled():
    before = dict(_INTERN_POOL)
    host = np.arange(65536, dtype=np.int32)

    @jax.jit
    def f(x):
        c = intern(host)                     # upload under an active trace
        return x + c[0]

    out = f(jnp.zeros((), jnp.int32))
    assert int(out) == 0
    leaked = [v for k, v in _INTERN_POOL.items()
              if k not in before and isinstance(v, jax.core.Tracer)]
    assert not leaked
    # and the pool still works afterwards with the same content
    d = intern(host)
    assert not isinstance(d, jax.core.Tracer)
    assert intern(host.copy()) is d


def test_sparsity_patterns_share_index_uploads():
    from fenapack_tpu.ops.sparse import pattern_from_dofmaps
    rng = np.random.default_rng(0)
    cd = rng.integers(0, 4000, size=(9000, 6))
    p1 = pattern_from_dofmaps(cd, cd, 4000, 4000, block=None)
    p2 = pattern_from_dofmaps(cd.copy(), cd.copy(), 4000, 4000, block=None)
    assert p1.cols is p2.cols
    assert p1.entry_pos is p2.entry_pos
