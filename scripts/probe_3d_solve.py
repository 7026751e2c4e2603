#!/usr/bin/env python
"""Bisect the 761k-dof worker crash: run the solve's component programs
one at a time at l=3 scale, printing progress so the crashing stage is
identifiable.  (The synthetic 800k SpMV loop passes; the real FGMRES+GMG
program kills the axon worker — this narrows which op class does it.)

    python scripts/probe_3d_solve.py -l 3 [--stages mv,pcd,gmg,fgmres,ir]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-l", "--level", type=int, default=3)
    ap.add_argument("--length", type=float, default=3.0)
    ap.add_argument("--stages", default="mv,pcd,vgmg,fgmres,ir")
    ap.add_argument("--maxiter", type=int, default=60)
    ap.add_argument("--block", type=int, default=32,
                    help="tile size (8 cuts operator-set HBM 2.7x at 761k "
                         "— scripts/block_fill_audit.py)")
    args = ap.parse_args()

    import jax
    from fenapack_tpu.jax_setup import setup as jax_setup
    jax_setup(x64=True)
    import jax.numpy as jnp
    from fenapack_tpu.fem import mesh3d, mesh as meshmod
    from fenapack_tpu.fem.assemble import NSAssembler
    from fenapack_tpu.fem.dofmap import DirichletBC
    from fenapack_tpu.solvers.config import SolverConfig, overrides
    from fenapack_tpu.solvers.nonlinear import NonlinearSolver
    from fenapack_tpu.solvers import gmg

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.time()
    hier = gmg.build_hierarchy(
        mesh3d.backward_step_mesh3d(0, length=args.length), args.level)
    mesh = hier.fine
    asm = NSAssembler(mesh, 0.05, dtype=jnp.float64, quad_degree=4,
                      block_size=args.block, block_dtype=jnp.float32)

    def inflow(x):
        v = np.zeros((x.shape[0], 3))
        v[:, 0] = 16.0 * x[:, 1] * (1 - x[:, 1]) * x[:, 2] * (1 - x[:, 2])
        return v

    bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL],
                                lambda x: np.zeros((x.shape[0], 3))),
           DirichletBC.velocity(asm.W, [meshmod.INFLOW], inflow)]
    over = {"pcd.variant": "BRM2", "dtype": "float32",
            "velocity.method": "gmg", "velocity.smooth_iters": 3,
            "velocity.cycles": 2, "pcd.ap.method": "gmg",
            "pcd.mp.method": "chebyshev",
            "krylov.rtol": 2e-6, "krylov.maxiter": args.maxiter}
    ap_h = gmg.PressureHierarchy(hier, jnp.float32,
                                 pcd_markers=[meshmod.OUTFLOW],
                                 block_size=args.block, reorder=True, fine_asm=asm)
    v_h = gmg.VelocityHierarchy(hier, 0.05, jnp.float32,
                                bc_markers=[meshmod.WALL, meshmod.INFLOW],
                                fine_asm=asm, block_size=args.block)
    cfg = overrides(SolverConfig(), over)
    nl = NonlinearSolver(asm, bcs, cfg, ap_hierarchy=ap_h,
                         velocity_hierarchy=v_h)
    oseen = nl.oseen
    print(f"setup {time.time()-t0:.0f}s dofs={3*asm.n2_real+asm.n1_real}",
          flush=True)

    w0 = nl.initial_state()
    wind = w0[: nl.n_u].astype(jnp.float32)
    n = nl.n_u + asm.n1
    rng = np.random.default_rng(0)
    b32 = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    stages = args.stages.split(",")

    def timed(tag, fn, *a):
        t0 = time.time()
        out = jax.block_until_ready(fn(*a))
        print(f"[{tag}] compile+run {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        out = jax.block_until_ready(fn(*a))
        print(f"[{tag}] run {time.time()-t0:.2f}s OK", flush=True)
        return out

    # big arrays must ride as jit ARGUMENTS (lift_jit) — closed-over device
    # arrays inline into the serialized program and overflow the remote
    # compile request (HTTP 413); locals (A1vals, kpvals) are explicit args
    from fenapack_tpu.runtime import lift_jit
    A1vals, _ = oseen._operator_values(wind)

    if "mv" in stages:
        def mv_chain(A1vals, x):
            mv = oseen._matvec_factory(A1vals, None)

            def body(v, _):
                y = mv(v)
                return y / (jnp.linalg.norm(y) + 1e-30), None
            out, _ = jax.lax.scan(body, x, None, length=30)
            return out
        timed("mv x30", lift_jit(mv_chain, oseen._lift_roots), A1vals, b32)

    if "pcd" in stages:
        kpvals = asm.kp_values(wind, surface=True).astype(jnp.float32)

        def pcd_chain(kpvals, r):
            kp = asm.pat_p1.matrix(kpvals)

            def body(x, _):
                y = oseen.pcd_apply(kp, x)
                return y / (jnp.linalg.norm(y) + 1e-30), None
            out, _ = jax.lax.scan(body, r, None, length=30)
            return out
        timed("pcd x30", lift_jit(pcd_chain, oseen._lift_roots),
              kpvals, b32[nl.n_u:])

    if "vgmg" in stages:
        def vgmg_chain(A1vals, wind, r):
            vs = oseen._velocity_solver(A1vals, None, wind=wind)

            def body(x, _):
                y = vs(x)
                return y / (jnp.linalg.norm(y) + 1e-30), None
            out, _ = jax.lax.scan(body, r, None, length=5)
            return out
        timed("vgmg x5", lift_jit(vgmg_chain, oseen._lift_roots),
              A1vals, wind, b32[: nl.n_u])

    if "asm" in stages:
        # _solve_impl assembles the wind-dependent operator values INSIDE
        # the solve program (picard_matrix_values + kp_values at 172k cells)
        # — the one component the passing mv/pcd/vgmg chains all excluded
        # (they took precomputed values as jit args).  Isolate it.
        def asm_chain(w):
            def body(w, _):
                A1 = oseen._operator_values(w)[0]
                kpv = asm.kp_values(w, surface=True).astype(jnp.float32)
                s = jnp.sum(A1) + jnp.sum(kpv)
                return w + 1e-30 * s, None          # keep assembly live
            out, _ = jax.lax.scan(body, w, None, length=3)
            return out
        timed("asm x3", lift_jit(asm_chain, oseen._lift_roots), wind)

    if "fgmres_pre" in stages:
        # FGMRES loop + CGS2 + basis with the assembly EXCLUDED: operator
        # values ride as jit args, subsolves are chebyshev (smallest PC).
        # If this passes while fgmres[cheb] crashes, the killer is the
        # in-program assembly; if it crashes too, it's the Krylov loop.
        from fenapack_tpu.solvers.krylov import fgmres
        from fenapack_tpu.solvers.fieldsplit import make_fieldsplit_upper
        cfgc = overrides(cfg, {"velocity.method": "chebyshev",
                               "velocity.iters": 10,
                               "pcd.ap.method": "chebyshev",
                               "pcd.ap.bounds": None, "pcd.ap.iters": 10})
        nlc = NonlinearSolver(asm, bcs, cfgc)
        oc = nlc.oseen
        kpvals = asm.kp_values(wind, surface=True).astype(jnp.float32)

        def pre(A1vals, kpvals, b):
            kp = asm.pat_p1.matrix(kpvals)
            matvec = oc._matvec_factory(A1vals, None)
            a_solve = oc._velocity_solver(A1vals, None)
            pcd = oc.pcd_apply
            pc = make_fieldsplit_upper(oc.n_u, a_solve,
                                       lambda r: pcd(kp, r),
                                       oc._bt_mv, oc.free_u)
            return fgmres(matvec, pc, b, maxiter=args.maxiter,
                          rtol=2e-6).iters
        res = timed(f"fgmres_pre[m{args.maxiter}]",
                    lift_jit(pre, oc._lift_roots), A1vals, kpvals, b32)
        print(f"fgmres_pre iters:", int(res), flush=True)

    if "fgmres" in stages:
        # variant ladder: cheapest/smallest-program PC first, so the crash
        # point identifies which composition kills the worker
        for tag, vover in [
            ("cheb", {"velocity.method": "chebyshev", "velocity.iters": 10,
                      "pcd.ap.method": "chebyshev", "pcd.ap.bounds": None,
                      "pcd.ap.iters": 10}),
            ("gmg1", {"velocity.cycles": 1, "pcd.ap.cycles": 1}),
            ("gmg2", {}),
        ]:
            cfgv = overrides(cfg, vover)
            nlv = NonlinearSolver(asm, bcs, cfgv,
                                  ap_hierarchy=(None if tag == "cheb"
                                                else ap_h),
                                  velocity_hierarchy=(None if tag == "cheb"
                                                      else v_h))
            ov = nlv.oseen
            res = timed(f"fgmres[{tag}]", lift_jit(
                lambda wind, b, ov=ov: ov._solve_impl(wind, b).iters,
                ov._lift_roots), wind, b32)
            print(f"fgmres[{tag}] iters:", int(res), flush=True)

    if "ir" in stages:
        ir = oseen.make_ir_solve(rtol=1e-8)
        F = nl._residual(w0)
        x, total, rn = ir(wind, -F.astype(jnp.float64))
        jax.block_until_ready(x)
        print("ir OK iters", int(total), "rn", float(rn), flush=True)


if __name__ == "__main__":
    main()
