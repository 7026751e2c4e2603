#!/usr/bin/env python
"""Config-4 2.05M-dof solve with audit-gated launch (VERDICT r4 #1).

One process, one setup: build the l=3 length=9 solver, compile-audit the
krylov.split_assembly program pair (values + from-values FGMRES) against
the HBM budget, and only if BOTH fit run the actual solve.  The round-4
campaign burned 6 x ~20 min setups into RESOURCE_EXHAUSTED; the audit
verdict ("19.48G of 15.75G hbm") is available at compile time, so pay
setup once and gate on it.

    python scripts/r5_2m_solve.py -l 3 --length 9 --block 8 --maxiter 40 \
        --out results/r5_2m_solve.json
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "demos"))


def main():
    import demo_step3d
    ap = demo_step3d.make_parser()
    ap.add_argument("--out", default="results/r5_2m_solve.json")
    ap.add_argument("--hbm-budget", type=float, default=14.5e9,
                    help="per-program temp+args gate (15.75 GB HBM minus "
                         "reserved + resident headroom)")
    ap.add_argument("--audit-only", action="store_true")
    ap.add_argument("--probe", action="store_true",
                    help="time each split program alone (crash bisect)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    t_setup = time.time()
    solver = demo_step3d.build(args)
    t_setup = time.time() - t_setup
    oseen = solver.oseen
    n_u = solver.n_u
    n = n_u + solver.asm.n1
    dt_lo = jnp.dtype(oseen.dtype)

    # ---- residency: what does setup leave on the device? --------------
    live = sorted(jax.live_arrays(), key=lambda a: -a.nbytes)
    tot = sum(a.nbytes for a in live) / 1e9
    print(f"[resident] {len(live)} arrays, {tot:.2f} GB; top 12:",
          flush=True)
    for a in live[:12]:
        print(f"  {a.nbytes/1e6:9.1f} MB  {a.dtype}  {a.shape}", flush=True)

    # ---- compile-audit the split pair ---------------------------------
    audit = {}

    def ma_of(tag, lowered):
        t0 = time.time()
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        rec = {"temp_gb": ma.temp_size_in_bytes / 1e9,
               "args_gb": ma.argument_size_in_bytes / 1e9,
               "out_gb": ma.output_size_in_bytes / 1e9,
               "compile_s": round(time.time() - t0, 1)}
        audit[tag] = rec
        print(f"[audit:{tag}] temp {rec['temp_gb']:.2f} GB  args "
              f"{rec['args_gb']:.2f} GB  out {rec['out_gb']:.2f} GB  "
              f"({rec['compile_s']}s)", flush=True)
        return rec

    values_jit, solve_vals_jit = oseen._split_jits()
    low_v = values_jit.lower(jax.ShapeDtypeStruct((n_u,), dt_lo))
    rec_v = ma_of("values", low_v)
    vals_info = low_v.out_info
    low_s = solve_vals_jit.lower(vals_info,
                                 jax.ShapeDtypeStruct((n,), dt_lo))
    rec_s = ma_of("solve", low_s)
    # the residual program (hi assembly) runs per Newton step as its own
    # program too; audit it for completeness
    res_fn = solver.make_residual_hi()
    rec_r = ma_of("residual", res_fn.lower(
        jax.ShapeDtypeStruct((n,), jnp.dtype(solver.asm.dtype))))

    budget = args.hbm_budget / 1e9
    # the execution-time constraint is temps + ALL resident device bytes
    # (constants, tiles, hierarchies), not temps + this program's args:
    # attempt 1 passed the per-program gate and still OOMed executing the
    # residual.  Measure residency directly.
    resident_gb = None
    try:
        ms = jax.local_devices()[0].memory_stats()
        if ms and "bytes_in_use" in ms:
            resident_gb = ms["bytes_in_use"] / 1e9
    except Exception:
        pass
    if resident_gb is None:
        resident_gb = sum(x.nbytes for x in jax.live_arrays()) / 1e9
    audit["resident_gb"] = round(resident_gb, 2)
    hbm = 15.75
    fits = all(r["temp_gb"] + resident_gb <= hbm - 0.5
               for r in (rec_v, rec_s, rec_r)) and \
        all(r["temp_gb"] + r["args_gb"] <= budget
            for r in (rec_v, rec_s, rec_r))
    print(f"audit verdict: fits={fits} (budget {budget:.1f} GB, "
          f"resident {resident_gb:.2f} GB)", flush=True)
    out = {"metric": "config4_2M_solve", "n_dof": 3 * solver.asm.n2_real
           + solver.asm.n1_real, "setup_s": round(t_setup, 1),
           "audit": audit, "fits": fits,
           "maxiter": args.maxiter, "block": args.block}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    if args.audit_only or not fits:
        print(json.dumps(out), flush=True)
        return 0 if fits else 3

    if args.probe:
        # bisect the worker crash: execute each split program alone with a
        # scalar fetch (this backend's block_until_ready returns at
        # enqueue), timing wall per program.  The service kills single
        # executions at ~120 s (results/r3_exec_watchdog_tpu.log) — this
        # names the stage that breaches it.
        import numpy as _np
        rng = _np.random.default_rng(0)
        wind = jnp.asarray(rng.standard_normal(n_u) * 1e-3, dt_lo)
        t0 = time.time()
        vals = values_jit(wind)
        s = float(jax.tree_util.tree_leaves(vals)[0].ravel()[0])
        print(f"[probe] values program: {time.time()-t0:.1f}s "
              f"(leaf0 {s:.3e})", flush=True)
        r = jnp.asarray(rng.standard_normal(n), dt_lo)
        r = r / jnp.linalg.norm(r)
        # maxiter LADDER in one process: smallest first — the first kill
        # severs the device connection, so order = most information.
        # Per-iter wall falls out of the survivors; a kill at the smallest
        # rung means program CONTENT, not duration.
        import dataclasses as _dc
        for mi in (2, 8):
            oseen.config = _dc.replace(
                oseen.config,
                krylov=_dc.replace(oseen.config.krylov, maxiter=mi))
            for a in ("_values_jit", "_solve_vals_jit"):
                if hasattr(oseen, a):
                    delattr(oseen, a)
            _, sj = oseen._split_jits()
            t0 = time.time()
            res = sj(vals, r)
            it = int(res.iters)
            print(f"[probe] solve maxiter={mi}: {time.time()-t0:.1f}s "
                  f"({it} iters, rn {float(res.resnorms[-1]):.2e})",
                  flush=True)
        # ladder survived: restore the target Krylov dimension and fall
        # through to the actual solve in the same process
        oseen.config = _dc.replace(
            oseen.config,
            krylov=_dc.replace(oseen.config.krylov, maxiter=args.maxiter))
        for a in ("_values_jit", "_solve_vals_jit"):
            if hasattr(oseen, a):
                delattr(oseen, a)

    # ---- the solve ----------------------------------------------------
    t0 = time.time()
    res = solver.solve_fused(rtol=args.rtol, verbose=True, max_steps=20,
                             rtol_lin=max(args.rtol * 1e-2, 1e-8),
                             split_programs=True)
    wall = time.time() - t0
    out.update({"converged": bool(res.converged),
                "iters_per_step": [int(i) for i in res.linear_iters],
                "nonlinear_res": [float(r) for r in res.nonlinear_res],
                "wall_s": round(wall, 1),
                "steps": len(res.linear_iters)})
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    return 0 if res.converged else 4


if __name__ == "__main__":
    raise SystemExit(main())
