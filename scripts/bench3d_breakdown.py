#!/usr/bin/env python
"""Per-stage device-time breakdown of the 3D config-4 solve (VERDICT #2 at
3D scale).

Runs a few nonlinear steps of demos/demo_step3d.py's exact configuration,
then times {outer matvec, PC apply, velocity GMG, PCD apply, B^T} in
isolation via bench.stage_breakdown and prints ONE JSON line.

    python scripts/bench3d_breakdown.py -l 2 --dtype float32 --block 8
    python scripts/bench3d_breakdown.py -l 3 --dtype float32 --block 8 --steps 2
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from demos.demo_step3d import make_parser, build


def main():
    ap = make_parser()
    ap.add_argument("--steps", type=int, default=3,
                    help="nonlinear steps to run before timing stages")
    ap.add_argument("--n-apply", type=int, default=30)
    args = ap.parse_args()

    solver = build(args)
    import jax
    from bench import stage_breakdown

    t0 = time.perf_counter()
    res = solver.solve_fused(rtol=args.rtol, verbose=True,
                             max_steps=args.steps,
                             rtol_lin=max(args.rtol * 1e-2, 1e-8),
                             split_programs=(args.level >= 3))
    wall = time.perf_counter() - t0
    iters = list(map(int, res.linear_iters))
    # wall includes per-step compile the first time; re-run one step for a
    # compile-free per-iteration wall when the budget allows
    t1 = time.perf_counter()
    res2 = solver.solve_fused(w0=res.w, rtol=args.rtol, verbose=False,
                              max_steps=1,
                              rtol_lin=max(args.rtol * 1e-2, 1e-8),
                              split_programs=(args.level >= 3))
    wall_warm = time.perf_counter() - t1
    it_warm = int(res2.linear_iters[0]) if len(res2.linear_iters) else 0

    bd = stage_breakdown(solver, res.w, wall_warm, max(it_warm, 1),
                         n_apply=args.n_apply)
    n = 3 * solver.asm.n2_real + solver.asm.n1_real
    print(json.dumps({
        "metric": f"step3d_l{args.level}_breakdown",
        "n_dof": int(n), "block": args.block, "dtype": args.dtype,
        "steps_run": len(iters), "iters_per_step": iters,
        "warm_step_iters": it_warm, "warm_step_wall_s": round(wall_warm, 3),
        "cold_wall_s": round(wall, 3),
        "stage_breakdown": bd,
    }))


if __name__ == "__main__":
    main()
