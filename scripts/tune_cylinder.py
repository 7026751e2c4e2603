#!/usr/bin/env python
"""Cylinder PCD efficiency sweep (VERDICT r3 #3).

The scipy-LU oracle solves DFG 2D-1 l0 Newton in [41, 50, 50, 45] outer
iterations; the demo's iterative path saturates its 100-400 caps.  This
sweep isolates WHICH subsolve (velocity GMG / Ap GMG / Mp Chebyshev) loses
the oracle counts, on CPU f64 where the estimate floor is not in play.

    JAX_PLATFORMS=cpu python scripts/tune_cylinder.py -l 0 --configs demo,strongv
"""
import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "demos"))

CONFIGS = {
    # demo defaults (the cap-saturating configuration)
    "demo": {},
    # stronger velocity GMG
    "strongv": {"velocity.cycles": 4, "velocity.smooth_iters": 4},
    "strongv8": {"velocity.cycles": 8, "velocity.smooth_iters": 4},
    # stronger Ap GMG
    "stronga": {"pcd.ap.cycles": 4, "pcd.ap.smooth_iters": 4},
    # both strong
    "strong2": {"velocity.cycles": 4, "velocity.smooth_iters": 4,
                "pcd.ap.cycles": 4, "pcd.ap.smooth_iters": 4},
    # exact subsolves where feasible (isolates PC math from subsolve quality)
    "exactv": {"velocity.method": "lu"},
    "exacta": {"pcd.ap.method": "lu"},
    "exactm": {"pcd.mp.method": "lu"},
    "exactall": {"velocity.method": "lu", "pcd.ap.method": "lu",
                 "pcd.mp.method": "lu"},
    # more Mp chebyshev
    "mp8": {"pcd.mp.iters": 8},
    # jacobi smoother instead of minres
    "jacobi": {"velocity.smoother": "jacobi"},
    "brm1": {"pcd.variant": "BRM1"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-l", "--level", type=int, default=0)
    ap.add_argument("--configs", default="demo,strongv,stronga,strong2")
    ap.add_argument("--nls", default="newton")
    ap.add_argument("--rtol", type=float, default=1e-5)
    ap.add_argument("--maxiter", type=int, default=200)
    args = ap.parse_args()

    from fenapack_tpu.jax_setup import setup as jax_setup
    jax_setup(x64=True)
    import demo_cylinder
    from fenapack_tpu.solvers.config import overrides
    from fenapack_tpu.solvers.nonlinear import NonlinearSolver

    results = {}
    for name in args.configs.split(","):
        over = dict(CONFIGS[name])
        over["krylov.maxiter"] = args.maxiter
        asm, bcs, cfg, ap_h, v_h, nu = demo_cylinder.build(
            args.level, 20, "float64", ls="iterative", nls=args.nls)
        cfg = overrides(cfg, over)
        nl = NonlinearSolver(asm, bcs, cfg, linearization=args.nls,
                             ap_hierarchy=ap_h, velocity_hierarchy=v_h)
        t0 = time.perf_counter()
        try:
            res = nl.solve(rtol=args.rtol, verbose=False)
            iters = [int(i) for i in res.linear_iters]
            out = {"iters": iters, "total": sum(iters),
                   "converged": bool(res.converged),
                   "wall_s": round(time.perf_counter() - t0, 1)}
        except Exception as e:                        # noqa: BLE001
            out = {"error": f"{type(e).__name__}: {e}"[:200]}
        results[name] = out
        print(name, json.dumps(out), flush=True)
    print(json.dumps({"level": args.level, "nls": args.nls,
                      "results": results}))


if __name__ == "__main__":
    main()
