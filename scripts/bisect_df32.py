#!/usr/bin/env python
"""Bisect which construct of the df32 kernel crashes the Mosaic compiler.

Variants (cumulative):
  g1   one scratch gather + plain sum, one output     (= working scratch kernel)
  g3   THREE scratch gathers + plain sum, one output
  out2 g3 + TWO outputs (plain sums)
  merge out2 + elementwise TwoSum merge
  tree128 merge + compensated tree down to width 128, plain sum rest
  tree1  full compensated tree to width 1 (= production df32 kernel body)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
if os.environ.get("BIS_X64", "0") == "1":
    jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _twosum(a, b):
    s = a + b
    bv = s - a
    av = s - bv
    return s, (a - av) + (b - bv)


def comp_tree(s, min_width):
    b, W = s.shape
    err = jnp.zeros((b,), s.dtype)
    while W > min_width:
        half = W // 2
        t, e = _twosum(s[:, :half], s[:, half:])
        err = err + jnp.sum(e, axis=1)
        s = t
        W = half
    return jnp.sum(s, axis=1), err


def make_kernel(mode):
    def kernel(nbr_ref, t1_ref, t2_ref, tl_ref, x1_ref, x2_ref, xl_ref,
               s_ref, c_ref, g1_ref, g2_ref, gl_ref):
        R, b, mb = t1_ref.shape
        m = mb // b
        i = pl.program_id(0)
        for r in range(R):
            for j in range(m):
                blk = pl.ds(nbr_ref[i * R + r, j], 1)
                g1_ref[0, j * b:(j + 1) * b] = x1_ref[blk, :][0]
                if mode != "g1":
                    g2_ref[0, j * b:(j + 1) * b] = x2_ref[blk, :][0]
                    gl_ref[0, j * b:(j + 1) * b] = xl_ref[blk, :][0]
            t1 = t1_ref[r]
            g1 = g1_ref[:]
            if mode == "g1":
                s_ref[r, :] = jnp.sum(t1 * g1, axis=1)
                c_ref[r, :] = jnp.zeros((b,), jnp.float32)
                continue
            t2, tl = t2_ref[r], tl_ref[r]
            g2, gl = g2_ref[:], gl_ref[:]
            p0 = t1 * g1
            pm = t1 * g2 + t2 * g1 + t2 * g2
            q = (t1 + t2) * gl + tl * (g1 + g2)
            if mode == "g3":
                s_ref[r, :] = jnp.sum(p0 + pm + q, axis=1)
                c_ref[r, :] = jnp.zeros((b,), jnp.float32)
                continue
            if mode == "out2":
                s_ref[r, :] = jnp.sum(p0 + pm, axis=1)
                c_ref[r, :] = jnp.sum(q, axis=1)
                continue
            s, e = _twosum(p0, pm)
            if mode == "merge":
                s_ref[r, :] = jnp.sum(s, axis=1)
                c_ref[r, :] = jnp.sum(e + q, axis=1)
                continue
            min_w = {"tree128": 128, "tree8": 8, "tree1": 1}[mode]
            row, terr = comp_tree(s, min_w)
            s_ref[r, :] = row
            c_ref[r, :] = terr + jnp.sum(e + q, axis=1)
    return kernel


def run(mode, nb=64, m=8, b=32, R=8):
    rng = np.random.default_rng(0)
    n = nb * b
    nbr = np.zeros((nb, m), np.int32)
    for i in range(nb):
        lo = max(0, min(i - m // 2, nb - m))
        nbr[i] = np.arange(lo, lo + m)
    t = [jnp.asarray(rng.standard_normal((nb, b, m * b)).astype(np.float32))
         for _ in range(3)]
    x = [jnp.asarray(rng.standard_normal((nb, b)).astype(np.float32))
         for _ in range(3)]
    mbp = m * b
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb // R,),
        in_specs=[pl.BlockSpec((R, b, mbp), lambda i, nbr: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 3 +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec((R, b), lambda i, nbr: (i, 0),
                                memory_space=pltpu.VMEM)] * 2,
        scratch_shapes=[pltpu.VMEM((1, mbp), jnp.float32)] * 3,
    )
    f = pl.pallas_call(make_kernel(mode),
                       out_shape=[jax.ShapeDtypeStruct((nb, b),
                                                       jnp.float32)] * 2,
                       grid_spec=grid_spec)
    t0 = time.time()
    try:
        s, c = jax.jit(lambda: f(jnp.asarray(nbr), *t, *x))()
        jax.block_until_ready((s, c))
        print(f"{mode}: OK ({time.time()-t0:.0f}s) "
              f"|s|={float(jnp.abs(s).max()):.3f}", flush=True)
    except Exception as e:
        print(f"{mode}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    modes = (sys.argv[1].split(",") if len(sys.argv) > 1 else
             ["g1", "g3", "out2", "merge", "tree128", "tree8", "tree1"])
    nb = int(os.environ.get("BIS_NB", "64"))
    m = int(os.environ.get("BIS_M", "8"))
    for mode in modes:
        for R in (int(r) for r in
                  os.environ.get("BIS_R", "8").split(",")):
            print(f"--- {mode} nb={nb} m={m} R={R}", flush=True)
            run(mode, nb=nb, m=m, R=R)
