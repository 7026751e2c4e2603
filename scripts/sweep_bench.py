#!/usr/bin/env python
"""Sweep solver configs for the headline bench in ONE process (the first
device->host fetch pays a 30-500s tunnel warmup; per-process sweeps would
pay it per point).

Sweeps the CURRENT production path — hi_krylov + fully-fused Picard solve
(one device program per solve) — over the knobs that still matter:
ds-basis outer algebra, Krylov cap, Mp/velocity subsolve strength, and the
legacy 2-round f32-IR mode for comparison.

    SWEEP_LEVEL=2 python scripts/sweep_bench.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (performs its own TPU probe / jax setup)

LEVEL = int(os.environ.get("SWEEP_LEVEL", "2"))
ORACLE = {1: 287, 2: 271}.get(LEVEL)


def run(tag, over_str, hik="1", df32="1", recycle="0", anderson=0):
    os.environ["BENCH_OVER"] = over_str
    os.environ["BENCH_HIK"] = hik
    os.environ["BENCH_DF32"] = df32
    os.environ["BENCH_RECYCLE"] = recycle
    import jax
    import jax.numpy as jnp
    import numpy as np

    nl = bench.build(LEVEL, "BRM2", ls="iterative", block_size=32)
    # make_full_solve carries the GCRO-DR space AND the Anderson history
    # through the while_loop, so every config fuses the same way
    full = nl.make_full_solve(rtol=1e-5, rtol_lin=1e-8, max_steps=25,
                              anderson=anderson)
    w0 = nl.initial_state().astype(jnp.float64)
    jax.block_until_ready(full(w0))          # warmup/compile
    t0 = time.perf_counter()
    w, k, iters_a, _ = full(w0)
    jax.block_until_ready((w, k, iters_a))
    wall = time.perf_counter() - t0
    iters = [int(i) for i in np.asarray(iters_a)[:int(k)]]
    total = sum(iters)
    print(json.dumps({
        "tag": tag, "over": over_str, "hik": hik, "df32": df32,
        "recycle": recycle, "anderson": anderson,
        "wall_s": round(wall, 3), "total_iters": total,
        "vs_baseline": round(ORACLE / max(total, 1), 4) if ORACLE else None,
        "iters": iters}), flush=True)


POINTS = [
    # measured 2026-08-19 (TPU v5e, level 2): baseline 3.30 s / 284 iters;
    # subsolve-strength points (mp6, apcyc2, vcyc3, vsmooth4, cap40) all
    # saturate at 283-284 — outer counts are not subsolve-limited.
    # ds_basis: 2.54 s at identical counts.  host anderson4: 257 iters
    # (beats oracle 271) but 6.75 s of tunnel fetches -> now fused.
    ("baseline", "", {}),
    ("ds_basis", "krylov.ds_basis=true", {}),
    ("anderson4", "", {"anderson": 4}),
    ("anderson4_ds", "krylov.ds_basis=true", {"anderson": 4}),
    ("anderson6_ds", "krylov.ds_basis=true", {"anderson": 6}),
    ("anderson4_rec16", "", {"anderson": 4, "recycle": "16"}),
    # the oracle's LATE Picard steps decay (28 -> 24, 23) while ours stay
    # flat: GCRO-DR deflation across steps targets exactly that tail
    ("hik_rec16", "", {"recycle": "16"}),
    ("f32ir_rec16", "", {"hik": "0", "recycle": "16"}),
]

if __name__ == "__main__":
    for tag, over, kw in POINTS:
        try:
            run(tag, over, **kw)
        except Exception as e:
            print(json.dumps({"tag": tag, "error": repr(e)[:300]}),
                  flush=True)
