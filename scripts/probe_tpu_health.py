#!/usr/bin/env python
"""Probe the axon TPU service health for the two blocked paths.

1. Pallas BSR kernel compile (was HTTP 500 on 2026-08-17 ~04:00 UTC).
2. Large-program execution (worker crashed at >=761k-dof 3D solves).

Run: python scripts/probe_tpu_health.py [bsr|big3d]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def probe_bsr():
    import jax
    import jax.numpy as jnp
    from fenapack_tpu.ops import sparse
    from fenapack_tpu.ops.pallas_spmv import PallasBSRSpMV

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    b = 32
    nb = int(os.environ.get("PROBE_NB", "832"))     # ~26k dofs, bench-like
    m = int(os.environ.get("PROBE_M", "16"))
    n = nb * b
    nbr = np.zeros((nb, m), np.int32)
    for i in range(nb):
        nbr[i] = rng.choice(nb, size=m, replace=False)
    tiles = rng.standard_normal((nb, b, m * b)).astype(np.float32)
    bell = sparse.BlockELL(
        tiles=jnp.asarray(tiles.reshape(nb, b, m * b)
                          if tiles.ndim != 3 else tiles),
        nbr=jnp.asarray(nbr), n_rows=n, n_cols=n)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    interp = os.environ.get("PROBE_INTERPRET", "0") == "1"
    n_chain = int(os.environ.get("PROBE_CHAIN", "100"))

    def timed_chain(apply_fn):
        """Per-apply ms amortized over ``n_chain`` chained applies in ONE
        jit program (dispatch/tunnel latency excluded)."""
        @jax.jit
        def chain(x):
            def body(v, _):
                y = apply_fn(v)
                return y / (jnp.linalg.norm(y) + 1e-30), None
            out, _ = jax.lax.scan(body, x, None, length=n_chain)
            return out
        t0 = time.time()
        jax.block_until_ready(chain(x))
        t_compile = time.time() - t0
        ts = []
        for _ in range(5):
            t0 = time.time()
            jax.block_until_ready(chain(x))
            ts.append(time.time() - t0)
        return t_compile, min(ts) * 1e3 / n_chain

    # reference via XLA flat-tile einsum
    y_ref = np.asarray(jax.block_until_ready(jax.jit(bell.mv)(x)))
    _, t_xla = timed_chain(bell.mv)
    print(f"XLA einsum: {t_xla:.4f} ms/apply", flush=True)
    for variant in os.environ.get("PROBE_VARIANTS", "scratch,accum").split(","):
        try:
            op = PallasBSRSpMV(bell, rows_per_step=8, variant=variant,
                               interpret=interp)
            y = jax.block_until_ready(jax.jit(op.__call__)(x))
            err = float(np.max(np.abs(np.asarray(y) - y_ref)) /
                        (np.max(np.abs(y_ref)) + 1e-30))
            t_compile, t_pallas = timed_chain(op)
        except Exception as e:
            print(f"BSR[{variant}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:500]}", flush=True)
            continue
        print(f"BSR[{variant}] OK compile={t_compile:.1f}s relerr={err:.2e} "
              f"pallas={t_pallas:.4f}ms xla={t_xla:.4f}ms", flush=True)


def probe_big3d():
    """Minimal large-program probe: a big SpMV-loop program, not the full
    solve — enough to see whether the worker survives >=761k-dof scale."""
    import jax
    import jax.numpy as jnp
    print("backend:", jax.default_backend(), flush=True)
    n = 800_000
    k = 64
    rng = np.random.default_rng(1)
    vals = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    cols = jnp.asarray(rng.integers(0, n, size=(n, k)).astype(np.int32))
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    @jax.jit
    def loop(x, vals, cols):
        def body(i, x):
            y = jnp.sum(vals * jnp.take(x, cols, axis=0), axis=1)
            return y / (jnp.linalg.norm(y) + 1e-30)
        return jax.lax.fori_loop(0, 50, body, x)

    t0 = time.time()
    y = jax.block_until_ready(loop(x, vals, cols))
    print(f"BIG3D PROBE OK wall={time.time()-t0:.1f}s "
          f"norm={float(jnp.linalg.norm(y)):.3f}", flush=True)


def probe_df32():
    """Compiled df32 kernel vs emulated-f64 XLA block matvec (the hi_krylov
    outer-matvec replacement candidate) at bench-like scale/structure."""
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from fenapack_tpu.ops import sparse
    from fenapack_tpu.ops.pallas_spmv import DF32BlockSpMV

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    b = 32
    nb = int(os.environ.get("PROBE_NB", "832"))
    m = int(os.environ.get("PROBE_M", "16"))
    n = nb * b
    # banded neighbor structure (RCM-like locality)
    nbr = np.zeros((nb, m), np.int32)
    for i in range(nb):
        lo = max(0, min(i - m // 2, nb - m))
        nbr[i] = np.arange(lo, lo + m)
    tiles = rng.standard_normal((nb, b, m * b))
    tiles *= 10.0 ** rng.uniform(-2, 2, size=tiles.shape)
    bell = sparse.BlockELL(tiles=jnp.asarray(tiles),
                           nbr=jnp.asarray(nbr), n_rows=n, n_cols=n)
    x = jnp.asarray(rng.standard_normal(n))
    n_chain = int(os.environ.get("PROBE_CHAIN", "50"))

    def timed_chain(apply_fn):
        @jax.jit
        def chain(x):
            def body(v, _):
                y = apply_fn(v)
                return y / (jnp.linalg.norm(y) + 1e-30), None
            out, _ = jax.lax.scan(body, x, None, length=n_chain)
            return out
        t0 = time.time()
        jax.block_until_ready(chain(x))
        t_compile = time.time() - t0
        ts = []
        for _ in range(5):
            t0 = time.time()
            jax.block_until_ready(chain(x))
            ts.append(time.time() - t0)
        return t_compile, min(ts) * 1e3 / n_chain

    y_ref = np.asarray(jax.jit(bell.mv)(x))
    tc64, t64 = timed_chain(bell.mv)
    print(f"XLA f64 block mv: {t64:.4f} ms/apply (compile {tc64:.0f}s)",
          flush=True)
    bell32 = bell.with_vals(bell.tiles.astype(jnp.float32))
    _, t32 = timed_chain(lambda v: bell32.mv(v.astype(jnp.float32))
                         .astype(jnp.float64))
    print(f"XLA f32 block mv: {t32:.4f} ms/apply", flush=True)
    for R in (8, 16):
        try:
            op = DF32BlockSpMV(bell, rows_per_step=R)
            t3 = jax.jit(op.split_tiles)(bell.tiles)
            jax.block_until_ready(t3)
            y = np.asarray(jax.jit(lambda v: op(t3, v))(x))
            err = float(np.max(np.abs(y - y_ref)) / np.max(np.abs(y_ref)))
            tc, t = timed_chain(lambda v: op(t3, v))
        except Exception as e:
            print(f"DF32[R={R}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:600]}", flush=True)
            continue
        print(f"DF32[R={R}] OK compile={tc:.0f}s relerr={err:.2e} "
              f"df32={t:.4f}ms f64={t64:.4f}ms f32={t32:.4f}ms", flush=True)




def probe_cgs():
    """Synthetic FGMRES-shaped program at 761k scale: big while_loop carry
    (V (m+1, n) f32), masked CGS2 matmuls, Givens scan — no FEM setup, so
    the worker-crash bisection iterates in minutes (the real fgmres program
    crashes the axon worker at this scale while its components pass)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    n = int(os.environ.get("PROBE_N", "710000"))
    m = int(os.environ.get("PROBE_M2", "60"))
    iters = int(os.environ.get("PROBE_ITERS", "30"))
    mode = os.environ.get("PROBE_MODE", "while")     # while|scan|matmul
    print(f"backend: {jax.default_backend()}  n={n} m={m} mode={mode}",
          flush=True)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    mv_kind = os.environ.get("PROBE_MV", "roll")   # roll|bell|pallas
    if mv_kind in ("bell", "pallas"):
        # real-shaped block operator (761k-scale: nb=n/32, m=30)
        from fenapack_tpu.ops import sparse
        bnb = n // 32
        mm = int(os.environ.get("PROBE_BM", "30"))
        nbr = np.zeros((bnb, mm), np.int32)
        for j in range(mm):
            nbr[:, j] = (np.arange(bnb) + j * 7) % bnb
        tiles = (rng.standard_normal((bnb, 32, mm * 32)) / (mm * 32)
                 ).astype(np.float32)
        bell = sparse.BlockELL(tiles=jnp.asarray(tiles),
                               nbr=jnp.asarray(nbr),
                               n_rows=n, n_cols=n)
        if mv_kind == "pallas":
            os.environ["FENAPACK_PALLAS_BSR"] = "1"
        else:
            os.environ["FENAPACK_PALLAS_BSR"] = "0"

        def fake_mv(x):
            return x + bell.mv(x)
    else:
        def fake_mv(x):
            # cheap stand-in operator: shift + scale (no gather)
            return 0.5 * x + 0.25 * jnp.roll(x, 1) + 0.25 * jnp.roll(x, -1)

    if mode == "matmul":
        V = jnp.asarray(rng.standard_normal((m + 1, n)).astype(np.float32))

        @jax.jit
        def chain(w):
            def body(x, _):
                h = V @ x
                x = x - V.T @ h
                return x / (jnp.linalg.norm(x) + 1e-30), None
            out, _ = lax.scan(body, w, None, length=iters)
            return out
        t0 = time.time()
        jax.block_until_ready(chain(b))
        print(f"matmul chain OK compile+run {time.time()-t0:.1f}s",
              flush=True)
        return

    def run_fgmres_like():
        V0 = jnp.zeros((m + 1, n), jnp.float32).at[0].set(
            b / jnp.linalg.norm(b))
        g0 = jnp.zeros(m + 1, jnp.float32).at[0].set(jnp.linalg.norm(b))
        cs0 = jnp.ones(m, jnp.float32)
        sn0 = jnp.zeros(m, jnp.float32)

        def cond(state):
            k = state[0]
            return k < iters

        def body(state):
            k, V, cs, sn, g = state
            w = fake_mv(V[k])
            mask = (jnp.arange(m + 1) <= k).astype(jnp.float32)
            h1 = (V @ w) * mask
            w = w - V.T @ h1
            h2 = (V @ w) * mask
            w = w - V.T @ h2
            h = h1 + h2
            wn = jnp.linalg.norm(w)
            h = h.at[k + 1].set(wn)
            V = V.at[k + 1].set(w / jnp.where(wn > 0, wn, 1.0))
            alpha = -sn
            beta = cs * h[1:]

            def comb(x, y):
                a1, b1 = x
                a2, b2 = y
                return a2 * a1, a2 * b1 + b2
            A, B = lax.associative_scan(comb, (alpha, beta))
            a = jnp.concatenate([h[:1], A * h[0] + B])
            out = cs * a[:m] + sn * h[1:]
            h = jnp.concatenate([out, a[m:m + 1]])
            denom = jnp.hypot(h[k], h[k + 1])
            safe = jnp.where(denom > 0, denom, 1.0)
            ck = jnp.where(denom > 0, h[k] / safe, 1.0)
            sk = jnp.where(denom > 0, h[k + 1] / safe, 0.0)
            cs = cs.at[k].set(ck)
            sn = sn.at[k].set(sk)
            g = g.at[k + 1].set(-sk * g[k]).at[k].set(ck * g[k])
            return (k + 1, V, cs, sn, g)

        init = (jnp.array(0, jnp.int32), V0, cs0, sn0, g0)
        if mode == "while":
            k, V, cs, sn, g = lax.while_loop(cond, body, init)
        else:
            def sbody(c, _):
                return body(c), None
            (k, V, cs, sn, g), _ = lax.scan(sbody, init, None, length=iters)
        return g

    f = jax.jit(run_fgmres_like)
    t0 = time.time()
    g = jax.block_until_ready(f())
    print(f"fgmres-like[{mode}] OK compile+run {time.time()-t0:.1f}s "
          f"g1={float(g[1]):.3e}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "bsr"
    {"bsr": probe_bsr, "big3d": probe_big3d, "df32": probe_df32,
     "cgs": probe_cgs}[which]()
