#!/usr/bin/env python
"""Isolate which part of the production df32 PROGRAM breaks the compile
helper (the bare kernel compiles fine at the same shapes):

  A  pallas kernel only, f32 planes in, (S, C) f32 out
  B  A + f64 combine of the outputs inside the jit
  C  B + f64 split_x inside the jit            (= production __call__)
  D  C + f64 split_tiles inside the jit        (= per-step production use)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from fenapack_tpu.ops import sparse
from fenapack_tpu.ops.pallas_spmv import DF32BlockSpMV, split_f64


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    b = 32
    nb = int(os.environ.get("BIS_NB", "832"))
    m = int(os.environ.get("BIS_M", "16"))
    n = nb * b
    nbr = np.zeros((nb, m), np.int32)
    for i in range(nb):
        lo = max(0, min(i - m // 2, nb - m))
        nbr[i] = np.arange(lo, lo + m)
    tiles = rng.standard_normal((nb, b, m * b))
    bell = sparse.BlockELL(tiles=jnp.asarray(tiles),
                           nbr=jnp.asarray(nbr), n_rows=n, n_cols=n)
    x = jnp.asarray(rng.standard_normal(n))
    op = DF32BlockSpMV(bell, rows_per_step=8)
    t3 = tuple(jax.device_put(np.asarray(p))
               for p in jax.jit(op.split_tiles)(bell.tiles))
    x3 = tuple(jax.device_put(np.asarray(p))
               for p in jax.jit(op.split_x)(x))
    y_ref = np.asarray(jax.jit(bell.mv)(x))

    def kernel_only(x3):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        from fenapack_tpu.ops.pallas_spmv import _bsr_df32_kernel
        R, bb, mbp = op.R, op.b, op.m_pad * op.b
        nbp = op.nb_pad
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nbp // R,),
            in_specs=[pl.BlockSpec((R, bb, mbp), lambda i, nbr: (i, 0, 0),
                                   memory_space=pltpu.VMEM)] * 3 +
                     [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=[pl.BlockSpec((R, bb), lambda i, nbr: (i, 0),
                                    memory_space=pltpu.VMEM)] * 2,
            scratch_shapes=[pltpu.VMEM((1, mbp), jnp.float32)] * 3,
        )
        return pl.pallas_call(
            _bsr_df32_kernel,
            out_shape=[jax.ShapeDtypeStruct((nbp, bb), jnp.float32)] * 2,
            grid_spec=grid_spec)(op.nbr, *t3, *x3)

    tests = {
        "A_kernel_only": lambda: jax.jit(kernel_only)(x3),
        "B_f64_combine": lambda: jax.jit(
            lambda x3: (lambda sc: (sc[0].astype(jnp.float64)
                                    + sc[1].astype(jnp.float64))
                        .reshape(-1)[:n])(kernel_only(x3)))(x3),
        "C_split_x": lambda: jax.jit(lambda v: op(t3, v))(x),
        "D_split_tiles": lambda: jax.jit(
            lambda v: op(op.split_tiles(bell.tiles), v))(x),
    }
    for name, fn in tests.items():
        t0 = time.time()
        try:
            out = jax.block_until_ready(fn())
            if name == "A_kernel_only":
                y = (np.asarray(out[0], np.float64)
                     + np.asarray(out[1], np.float64)).reshape(-1)[:n]
            else:
                y = np.asarray(out)
            err = np.abs(y - y_ref).max() / np.abs(y_ref).max()
            print(f"{name}: OK ({time.time()-t0:.0f}s) relerr={err:.2e}",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:250]}",
                  flush=True)


if __name__ == "__main__":
    main()
