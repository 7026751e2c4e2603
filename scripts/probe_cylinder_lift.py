"""Locate the mixed-container lift_jit warning on the cylinder path.

Reproduces the `results/r3_dfg2d1_l2_cpu.log` warning (shape (36660,) f64 =
pressure-space array at l2) at level 0/1 on CPU with full attribute paths.

Usage:  JAX_PLATFORMS=cpu python scripts/probe_cylinder_lift.py [-l 1]
"""
import argparse
import os
import sys
import warnings

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-l", type=int, default=1)
    ap.add_argument("--thresh", type=int, default=1 << 10)
    ap.add_argument("--unsteady", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "demos"))
    import demo_cylinder
    from fenapack_tpu.jax_setup import setup as jax_setup
    jax_setup(x64=True)
    from fenapack_tpu import runtime as rt
    from fenapack_tpu.solvers.nonlinear import NonlinearSolver
    from probe_lift_sites import walk

    rt.LIFT_THRESHOLD_BYTES = args.thresh
    re = 100 if args.unsteady else 20
    asm, bcs, cfg, ap_h, v_h, nu = demo_cylinder.build(
        args.l, re, "mixed", ls="iterative", nls="newton",
        unsteady=args.unsteady)

    if args.unsteady:
        from fenapack_tpu.solvers.unsteady import UnsteadySolver
        from fenapack_tpu.utils.functionals import make_device_functional
        from fenapack_tpu.fem import mesh as meshmod
        us = UnsteadySolver(asm, bcs, cfg, dt=0.0125, scheme="bdf2",
                            ap_hierarchy=ap_h, velocity_hierarchy=v_h)
        fn = make_device_functional(asm, [meshmod.CYLINDER],
                                    points=[(0.15, 0.2), (0.25, 0.2)],
                                    scheme="bdf2", dt=0.0125)
        with warnings.catch_warnings(record=True) as wlog:
            warnings.simplefilter("always")
            full = us.make_full_unsteady(2, functional=fn,
                                         external_carry=True)
            import jax.numpy as jnp
            w = us.initial_state()
            n_u = 2 * asm.n2
            carry = (w, w[:n_u], jnp.zeros(0))
            full(carry)
        roots = us.oseen._lift_roots
    else:
        nl = NonlinearSolver(asm, bcs, cfg, linearization="newton",
                             ap_hierarchy=ap_h, velocity_hierarchy=v_h)
        with warnings.catch_warnings(record=True) as wlog:
            warnings.simplefilter("always")
            nl.solve_fused(rtol=1e-1, verbose=False, max_steps=1,
                           rtol_lin=1e-2)
        roots = nl.oseen._lift_roots

    hits = [w for w in wlog if "mixed container" in str(w.message)]
    print(f"{len(hits)} mixed-container warnings on the solve path")
    for w in hits[:5]:
        print("  ", str(w.message)[:120])

    hidden = walk(roots, args.thresh)
    for path, shape, dt, nbytes in sorted(hidden, key=lambda h: -h[3]):
        print(f"{nbytes/1e6:10.3f} MB  {dt:>8}  {shape!s:>18}  {path}")
    if not hidden:
        print("construction-time roots clean; warning came from "
              "solve-time roots (check make_* call sites)")


if __name__ == "__main__":
    main()
