"""Generate golden iteration counts from the scipy-LU oracle.

Writes ``tests/golden_counts.json``: per (problem, level, variant,
linearization) the oracle's per-nonlinear-step FGMRES iteration counts with
exact (LU) subsolves at rtol_lin=1e-8.  bench.py compares the TPU path
against these (the 10% band of BASELINE.json).

Run on CPU:  JAX_PLATFORMS=cpu python scripts/gen_golden.py [max_level]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

from tests.reference_fem.driver import build_step_problem, solve_oracle


def main(max_level=1):
    out = {}
    for level in range(max_level + 1):
        mesh, W, bcs = build_step_problem(level=level)
        for variant in ("BRM1", "BRM2"):
            r = solve_oracle(mesh, W, bcs, nu=0.02, variant=variant,
                             linearization="picard", rtol_nl=1e-5,
                             rtol_lin=1e-8, max_nl=30, max_lin=400)
            key = f"step2d/l{level}/{variant}/picard"
            out[key] = {
                "linear_iters": [int(i) for i in r.linear_iters],
                "nonlinear_steps": len(r.linear_iters),
                "total": int(sum(r.linear_iters)),
            }
            print(key, out[key], flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden_counts.json")
    existing = {}
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
    existing.update(out)
    with open(path, "w") as f:
        json.dump(existing, f, indent=1, sort_keys=True)
    print("wrote", path)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
