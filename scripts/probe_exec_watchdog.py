#!/usr/bin/env python
"""Probe: does the axon TPU worker kill long single-program executions?

Bisect evidence (scripts/bisect_cylinder.py): the SAME IR program at the
82k-dof cylinder shape survives with max_rounds=1 and crashes the worker
with max_rounds=8 — identical structure, longer execution.  This probe
runs a trivially-correct bandwidth-bound loop (no sparse kernels, no
Pallas, no precision tricks) whose execution time is set by the iteration
count, to separate "program content" from "execution duration".

    python scripts/probe_exec_watchdog.py 10000     # ~15 s exec: expect OK
    python scripts/probe_exec_watchdog.py 200000    # ~5 min exec: crash?
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    target_s = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    from fenapack_tpu.jax_setup import setup as jax_setup
    jax_setup(x64=False)
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)
    n = 16 * 1024 * 1024          # 64 MB f32: each iter reads+writes it
    x = jnp.ones(n, jnp.float32) / n

    @jax.jit
    def run(x, k):
        def body(i, x):
            return 0.999 * x + 0.001 * x[::-1]
        return jax.lax.fori_loop(0, k, body, x)

    # calibrate: compile + measure per-iteration cost
    t0 = time.time()
    y = run(x, 10).block_until_ready()
    print(f"warmup(10) {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    y = run(x, 500).block_until_ready()
    per_iter = (time.time() - t0) / 500
    print(f"calibrated {per_iter*1e3:.2f} ms/iter", flush=True)

    iters = max(1, int(target_s / per_iter))
    print(f"running one execution of ~{target_s:.0f}s ({iters} iters)",
          flush=True)
    t0 = time.time()
    y = run(x, iters).block_until_ready()
    dt = time.time() - t0
    print(f"PROBE OK target={target_s:.0f}s exec={dt:.1f}s "
          f"sum={float(y.sum()):.3e}", flush=True)


if __name__ == "__main__":
    main()
