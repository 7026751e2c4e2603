#!/usr/bin/env python
"""Device-memory audit of the config-4 3D setup (2M-dof OOM hunt).

Replicates demos/demo_step3d.py's build() phase by phase, printing
memory_stats (TPU) and the top live arrays after each, so the resident-set
growth that exhausts the 16 GB HBM is attributable to a specific structure.
Off-TPU (JAX_PLATFORMS=cpu) the same inventory is valid — the array set is
backend-independent; only memory_stats is TPU-only.

    python scripts/mem_audit3d.py -l 3 --length 9 --block 8
    python scripts/mem_audit3d.py -l 3 --length 9 --block 8 --solver --residual
"""
import argparse
import collections
import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def report(tag, top=14):
    import jax
    dev = jax.devices()[0]
    try:
        ms = dev.memory_stats()
        used = ms.get("bytes_in_use", 0) / 1e9
        peak = ms.get("peak_bytes_in_use", 0) / 1e9
        lim = ms.get("bytes_limit", 0) / 1e9
        print(f"[{tag}] in_use {used:.2f} GB  peak {peak:.2f} GB  "
              f"limit {lim:.2f} GB", flush=True)
    except Exception as e:
        print(f"[{tag}] memory_stats unavailable: {e}", flush=True)
    # aggregate live arrays by (shape, dtype); on a CPU backend the arrays
    # ARE the audit (same set the TPU run would hold), so don't filter them
    on_cpu = jax.default_backend() == "cpu"
    agg = collections.Counter()
    try:
        for a in jax.live_arrays():
            if getattr(a, "is_deleted", lambda: False)():
                continue
            try:
                if (not on_cpu and a.devices()
                        and list(a.devices())[0].platform == "cpu"):
                    continue
            except Exception:
                pass
            agg[(str(a.shape), str(a.dtype))] += a.nbytes
        for (shape, dt), nb in agg.most_common(top):
            print(f"    {nb/1e6:10.1f} MB  {shape} {dt}", flush=True)
        print(f"    total live: {sum(agg.values())/1e9:.2f} GB", flush=True)
    except Exception as e:
        print(f"    live_arrays failed: {e}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-l", "--level", type=int, default=3)
    ap.add_argument("--length", type=float, default=3.0)
    ap.add_argument("--block", type=int, default=32)
    ap.add_argument("--nu", type=float, default=0.05)
    ap.add_argument("--maxiter", type=int, default=120)
    ap.add_argument("--dtype", default="float32",
                    help="compute dtype (demo default on TPU)")
    ap.add_argument("--solver", action="store_true",
                    help="also build the NonlinearSolver (demo parity)")
    ap.add_argument("--residual", action="store_true",
                    help="lift + run the hi-precision residual once "
                         "(catches lift_jit inline warnings; implies "
                         "--solver)")
    ap.add_argument("--compile-residual", action="store_true",
                    help="lower + compile the hi-residual program and "
                         "print XLA memory_analysis (the program the "
                         "2.05M split_programs run OOMed in)")
    ap.add_argument("--compile-ir", action="store_true",
                    help="lower + compile the IR solve program and print "
                         "XLA memory_analysis (slow at scale; implies "
                         "--solver)")
    ap.add_argument("--compile-split", action="store_true",
                    help="lower + compile the krylov.split_assembly pair "
                         "(values program + from-values FGMRES program) "
                         "and print XLA memory_analysis of each — the "
                         "round-5 2.05M fix is validated when BOTH fit "
                         "HBM individually (implies --solver)")
    args = ap.parse_args()
    if (args.residual or args.compile_ir or args.compile_residual
            or args.compile_split):
        args.solver = True

    import jax
    from fenapack_tpu.jax_setup import setup as jax_setup
    jax_setup(x64=True)
    import jax.numpy as jnp
    from fenapack_tpu.fem import mesh3d, mesh as meshmod
    from fenapack_tpu.fem.assemble import NSAssembler
    from fenapack_tpu.solvers import gmg

    warnings.simplefilter("always")
    print("backend:", jax.default_backend(), flush=True)
    report("start")

    t0 = time.time()
    hier = gmg.build_hierarchy(
        mesh3d.backward_step_mesh3d(0, length=args.length), args.level)
    mesh = hier.fine
    print(f"hierarchy built {time.time()-t0:.1f}s cells={mesh.num_cells}",
          flush=True)
    report("hierarchy")

    t0 = time.time()
    bdt = jnp.float32 if args.dtype == "float32" else jnp.float64
    asm = NSAssembler(mesh, args.nu, dtype=jnp.float64, quad_degree=4,
                      block_size=args.block or None,
                      block_dtype=jnp.float32 if args.dtype == "float32"
                      else None)
    print(f"NSAssembler {time.time()-t0:.1f}s "
          f"dofs={3*asm.n2_real + asm.n1_real}", flush=True)
    report("assembler")

    t0 = time.time()
    ap_h = gmg.PressureHierarchy(hier, bdt,
                                 pcd_markers=[meshmod.OUTFLOW],
                                 block_size=args.block or None,
                                 reorder=bool(args.block),
                                 fine_asm=asm)
    print(f"PressureHierarchy {time.time()-t0:.1f}s", flush=True)
    report("pressure_hier")

    t0 = time.time()
    v_h = gmg.VelocityHierarchy(hier, args.nu, bdt,
                                bc_markers=[meshmod.WALL, meshmod.INFLOW],
                                fine_asm=asm, block_size=args.block or None)
    print(f"VelocityHierarchy {time.time()-t0:.1f}s", flush=True)
    report("velocity_hier")

    if not args.solver:
        return

    from fenapack_tpu.fem.dofmap import DirichletBC
    from fenapack_tpu.solvers.config import SolverConfig, overrides
    from fenapack_tpu.solvers.nonlinear import NonlinearSolver

    def inflow(x):
        v = np.zeros((x.shape[0], 3))
        v[:, 0] = 16.0 * x[:, 1] * (1 - x[:, 1]) * x[:, 2] * (1 - x[:, 2])
        return v

    bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL],
                                lambda x: np.zeros((x.shape[0], 3))),
           DirichletBC.velocity(asm.W, [meshmod.INFLOW], inflow)]
    over = {"krylov.hi_res_f32": args.level >= 3,    # demo_step3d default
            "pcd.variant": "BRM2", "dtype": args.dtype,
            "velocity.method": "gmg", "velocity.smooth_iters": 3,
            "velocity.cycles": 2, "pcd.ap.method": "gmg",
            "pcd.mp.method": "chebyshev",
            "krylov.maxiter": min(args.maxiter, 120),
            "krylov.rtol": 2e-6 if args.dtype == "float32" else 1e-8}
    cfg = overrides(SolverConfig(), over)
    t0 = time.time()
    solver = NonlinearSolver(asm, bcs, cfg, linearization="picard",
                             ap_hierarchy=ap_h, velocity_hierarchy=v_h)
    print(f"NonlinearSolver {time.time()-t0:.1f}s", flush=True)
    report("solver")

    if args.residual:
        t0 = time.time()
        res_fn = solver.make_residual_hi()
        w = solver.initial_state()
        F, rn = res_fn(w)
        rn = float(rn)
        print(f"residual lift+run {time.time()-t0:.1f}s  |F|={rn:.3e}",
              flush=True)
        report("residual")

    if args.compile_residual:
        # the program the 2.05M w6 run died in (split_programs residual):
        # lower+compile only, print XLA's buffer-assignment totals
        t0 = time.time()
        n = solver.n_u + solver.asm.n1
        lowered = solver.make_residual_hi().lower(
            jax.ShapeDtypeStruct((n,), jnp.float64))
        print(f"residual lowered {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        compiled = lowered.compile()
        print(f"residual compiled {time.time()-t0:.1f}s", flush=True)
        ma = compiled.memory_analysis()
        print(f"  temp {ma.temp_size_in_bytes/1e9:.2f} GB  "
              f"args {ma.argument_size_in_bytes/1e9:.2f} GB  "
              f"out {ma.output_size_in_bytes/1e9:.2f} GB", flush=True)

    if args.compile_ir:
        t0 = time.time()
        n_u = solver.n_u
        n = n_u + solver.asm.n1
        # the split_programs per-round program (one capped FGMRES solve),
        # lowered through its LIFTED wrapper: a bare jax.jit here inlines
        # every operator constant into the serialized program and the
        # remote compiler rejects it at 2M (HTTP 413, measured round 4)
        dt_lo = jnp.dtype(jnp.float32 if args.dtype == "float32"
                          else jnp.float64)
        lowered = solver.oseen._solve_jit.lower(
            jax.ShapeDtypeStruct((n_u,), dt_lo),
            jax.ShapeDtypeStruct((n,), dt_lo))
        print(f"IR lowered {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        compiled = lowered.compile()
        print(f"IR compiled {time.time()-t0:.1f}s", flush=True)
        try:
            ma = compiled.memory_analysis()
            print(f"  temp {ma.temp_size_in_bytes/1e9:.2f} GB  "
                  f"args {ma.argument_size_in_bytes/1e9:.2f} GB  "
                  f"out {ma.output_size_in_bytes/1e9:.2f} GB  "
                  f"gen {ma.generated_code_size_in_bytes/1e6:.1f} MB",
                  flush=True)
        except Exception as e:
            print(f"  memory_analysis unavailable: {e}", flush=True)
        report("ir_compiled")

    if args.compile_split:
        def pa(tag, compiled):
            try:
                ma = compiled.memory_analysis()
                print(f"  [{tag}] temp {ma.temp_size_in_bytes/1e9:.2f} GB  "
                      f"args {ma.argument_size_in_bytes/1e9:.2f} GB  "
                      f"out {ma.output_size_in_bytes/1e9:.2f} GB",
                      flush=True)
            except Exception as e:
                print(f"  [{tag}] memory_analysis unavailable: {e}",
                      flush=True)

        n_u = solver.n_u
        n = n_u + solver.asm.n1
        dt_lo = jnp.dtype(jnp.float32 if args.dtype == "float32"
                          else jnp.float64)
        values_jit, solve_vals_jit = solver.oseen._split_jits()
        t0 = time.time()
        low_v = values_jit.lower(jax.ShapeDtypeStruct((n_u,), dt_lo))
        print(f"values lowered {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        comp_v = low_v.compile()
        print(f"values compiled {time.time()-t0:.1f}s", flush=True)
        pa("values", comp_v)
        # abstract operator-values pytree for the solve program's shapes
        vals_info = low_v.out_info
        t0 = time.time()
        low_s = solve_vals_jit.lower(vals_info,
                                     jax.ShapeDtypeStruct((n,), dt_lo))
        print(f"solve-from-values lowered {time.time()-t0:.1f}s",
              flush=True)
        t0 = time.time()
        comp_s = low_s.compile()
        print(f"solve-from-values compiled {time.time()-t0:.1f}s",
              flush=True)
        pa("solve", comp_s)
        report("split_compiled")


if __name__ == "__main__":
    main()
