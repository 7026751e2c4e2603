#!/usr/bin/env python
"""Probe: does the axon TPU service kill long single-program executions?

Bisect evidence (scripts/bisect_cylinder.py): the SAME IR program at the
82k-dof cylinder shape survives with max_rounds=1 and crashes the worker
with max_rounds=8 — identical structure, longer execution.  This probe
runs a trivially-correct bandwidth-bound fori_loop (no sparse kernels, no
Pallas, no precision tricks) whose execution time is set by the iteration
count, to separate "program content" from "execution duration".

First run (2026-08-20 06:21): a ~minutes-long execution of this probe
died UNAVAILABLE within ~4 min — on a program with no custom kernels at
all, confirming the duration hypothesis.  Also learned: on axon,
``block_until_ready`` returns at ENQUEUE, not completion — only a d2h
fetch synchronizes.  All timing below forces a scalar fetch.

    python scripts/probe_exec_watchdog.py 30 60 120 240   # duration ladder
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    targets = [float(a) for a in sys.argv[1:]] or [30.0, 60.0, 120.0, 240.0]
    from fenapack_tpu.jax_setup import setup as jax_setup
    jax_setup(x64=False)
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)
    n = 16 * 1024 * 1024          # 64 MB f32: each iter reads 2x + writes 1x
    x = jnp.ones(n, jnp.float32) / n

    @jax.jit
    def run(x, k):
        def body(i, x):
            return 0.999 * x + 0.001 * x[::-1]
        return jax.lax.fori_loop(0, k, body, x).sum()

    def timed(k):
        t0 = time.time()
        v = float(run(x, k))      # fetch = the only real sync on axon
        return time.time() - t0, v

    dt, v = timed(10)             # compile + first fetch (tunnel stall)
    print(f"warmup(10) {dt:.1f}s sum={v:.3e}", flush=True)
    dt, v = timed(2000)
    per_iter = dt / 2000
    print(f"calibrated {per_iter*1e3:.3f} ms/iter ({dt:.1f}s/2000)",
          flush=True)

    for target_s in targets:
        iters = max(1, int(target_s / per_iter))
        print(f"-> single execution target {target_s:.0f}s "
              f"({iters} iters)", flush=True)
        try:
            dt, v = timed(iters)
            print(f"   OK exec={dt:.1f}s sum={v:.3e}", flush=True)
        except Exception as e:
            print(f"   KILLED after target={target_s:.0f}s: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            return


if __name__ == "__main__":
    main()
