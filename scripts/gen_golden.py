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

from tests.reference_fem.driver import (build_step_problem,
                                        build_cylinder_problem, solve_oracle)


def main(max_level=1, problem="step2d"):
    out = {}
    for level in range(max_level + 1):
        if problem == "cylinder":
            # DFG 2D-1 geometry/regime of demos/demo_cylinder.py: Re=20,
            # nu=1e-3, Newton (the demo default) — VERDICT r3 #3 asks for
            # oracle counts on the one geometry with published physics
            mesh, W, bcs = build_cylinder_problem(level=level)
            runs = [("BRM2", "newton"), ("BRM2", "picard")]
            nu = 1e-3
        else:
            mesh, W, bcs = build_step_problem(level=level)
            runs = [("BRM1", "picard"), ("BRM2", "picard")]
            nu = 0.02
        for variant, nls in runs:
            r = solve_oracle(mesh, W, bcs, nu=nu, variant=variant,
                             linearization=nls, rtol_nl=1e-5,
                             rtol_lin=1e-8, max_nl=30, max_lin=500)
            key = f"{problem}/l{level}/{variant}/{nls}"
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
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1,
         sys.argv[2] if len(sys.argv) > 2 else "step2d")
