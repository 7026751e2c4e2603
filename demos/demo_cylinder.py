#!/usr/bin/env python
"""Schafer-Turek "flow around a cylinder" benchmark (DFG 2D-1 / 2D-2).

The quantitative-physics workload of the reference family (upstream
fenapack's unsteady demo geometry; BASELINE config 3 "channel/cylinder"):
channel [0, 2.2] x [0, 0.41], cylinder r = 0.05 at (0.2, 0.2), Taylor-Hood
P2/P1, parabolic inflow.

    2D-1 (steady, Re = 20):   python demos/demo_cylinder.py -l 2
    2D-2 (unsteady, Re = 100): python demos/demo_cylinder.py --unsteady \
        -l 2 --t-end 8.0 --dt 0.0125

Reports drag/lift coefficients (discrete-consistent boundary reaction,
utils/functionals.py), the front/back pressure difference, and — for the
unsteady run — the Strouhal number from the lift signal's periods, against
the published benchmark intervals (Schafer & Turek 1996):

    2D-1: c_D in [5.5700, 5.5900], c_L in [0.0104, 0.0110],
          dP in [0.1172, 0.1176]
    2D-2: c_Dmax in [3.2200, 3.2400], c_Lmax in [0.9900, 1.0100],
          St in [0.2950, 0.3050]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

UBAR = {20: 0.2, 100: 1.0}       # mean inflow velocity per benchmark Re
D = 0.1                          # cylinder diameter


def build(level, re, dtype_str, ls="iterative", nls="newton",
          unsteady=False, block=None):
    import jax.numpy as jnp
    from fenapack_tpu.fem import mesh as meshmod
    from fenapack_tpu.fem.assemble import NSAssembler
    from fenapack_tpu.fem.dofmap import DirichletBC
    from fenapack_tpu.solvers.config import (SolverConfig, env_overrides,
                                             overrides)
    from fenapack_tpu.solvers import gmg

    nu = UBAR[re] * D / re
    u_m = 1.5 * UBAR[re]                 # parabola peak
    hier = gmg.build_hierarchy(meshmod.cylinder_channel_mesh(0), level,
                               snap=meshmod.snap_to_circle)
    mesh = hier.fine
    # "mixed" (the TPU production mode): f64 assembler/residual + f32
    # compute/preconditioner — the fused IR steps carry the state in f64
    # honest to rtol_lin, so forces (lift is 0.2% of drag) stay sharp
    adtype = jnp.float32 if dtype_str == "float32" else jnp.float64
    sdtype = "float64" if dtype_str == "float64" else "float32"
    # block: BSR tile layout + RCM reorder (the 3D demo's production
    # layout) — the unblocked path runs every SpMV as an XLA gather,
    # ~100x off HBM bandwidth on TPU (doc/spmv_table.md); measured
    # identical functionals/counts (dof relabeling commutes with the
    # residual row-sum and point-eval functionals)
    asm = NSAssembler(mesh, nu, dtype=adtype, block_size=block,
                      block_dtype=(jnp.float32
                                   if block and sdtype == "float32"
                                   else None))

    def inflow(x):
        v = np.zeros((x.shape[0], 2))
        v[:, 0] = 4.0 * u_m * x[:, 1] * (0.41 - x[:, 1]) / 0.41 ** 2
        return v

    noslip = [meshmod.WALL, meshmod.CYLINDER]
    bcs = [DirichletBC.velocity(asm.W, noslip,
                                lambda x: np.zeros((x.shape[0], 2))),
           DirichletBC.velocity(asm.W, [meshmod.INFLOW], inflow)]
    over = {"pcd.variant": "BRM2", "dtype": sdtype}
    ap_h = v_h = None
    if ls == "iterative":
        over.update({"velocity.method": "gmg", "velocity.smooth_iters": 3,
                     "velocity.cycles": 2, "pcd.ap.method": "gmg",
                     # level operators are nonsymmetric; minres smoothing
                     # is the safe default on the velocity hierarchy
                     "velocity.smoother": "minres"})
        hdtype = jnp.dtype(sdtype)
        ap_h = gmg.PressureHierarchy(hier, hdtype,
                                     pcd_markers=[meshmod.OUTFLOW],
                                     fine_asm=asm, block_size=block,
                                     reorder=bool(block))
        v_h = gmg.VelocityHierarchy(hier, nu, hdtype, bc_markers=noslip
                                    + [meshmod.INFLOW], fine_asm=asm,
                                    block_size=block)
    cfg = overrides(SolverConfig(), over)
    cfg = env_overrides(cfg)
    return asm, bcs, cfg, ap_h, v_h, nu


def coefficients(asm, w, n_u, supg=False):
    """(c_D, c_L, dP) from the state vector ``w`` (steady normalization
    factors applied by the caller)."""
    from fenapack_tpu.fem import mesh as meshmod
    from fenapack_tpu.utils.functionals import boundary_reaction, eval_p1
    F = boundary_reaction(asm, w[:n_u], w[n_u:], [meshmod.CYLINDER],
                          supg=supg)
    p2 = eval_p1(asm, np.asarray(w[n_u:]), [(0.15, 0.2), (0.25, 0.2)])
    return F[0], F[1], p2[0] - p2[1]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-l", "--level", type=int, default=1,
                    help="refinements of the level-0 cylinder mesh")
    ap.add_argument("--nls", choices=["picard", "newton"], default="newton")
    ap.add_argument("--ls", choices=["direct", "iterative"],
                    default="iterative")
    ap.add_argument("--dtype", default=None)
    ap.add_argument("--rtol", type=float, default=1e-6)
    ap.add_argument("--unsteady", action="store_true",
                    help="DFG 2D-2: Re=100 vortex shedding + Strouhal")
    ap.add_argument("--t-end", type=float, default=8.0)
    ap.add_argument("--dt", type=float, default=0.0125)
    ap.add_argument("--chunk", default="auto",
                    help="2D-2: time steps per fused device call; 'auto' "
                         "measures the first chunks and sizes against the "
                         "~120 s service execution budget (doc/tpu_design"
                         ".md) instead of hand-tuning per campaign")
    ap.add_argument("--hist", default="/tmp/cylinder_2d2_hist.csv",
                    help="2D-2: streamed (t, cD, cL, dP) history file")
    ap.add_argument("--ckpt", default=None,
                    help="2D-2: checkpoint file (default <hist>.ckpt.npz); "
                         "state + step count saved per chunk, so a TPU "
                         "worker fault resumes mid-trajectory instead of "
                         "restarting from t=0")
    ap.add_argument("--no-resume", action="store_true",
                    help="ignore an existing checkpoint")
    ap.add_argument("--warm-from", default=None,
                    help="2D-2: seed the scan by FE-prolonging a one-level-"
                         "coarser run's checkpoint (its developed limit "
                         "cycle) instead of the impulsive start — the St/"
                         "cDmax/cLmax window only needs established "
                         "shedding, so the fine level can skip the "
                         "transient's wall-clock entirely")
    ap.add_argument("--maxiter", type=int, default=None,
                    help="Krylov dimension cap (program size; default "
                         "config value — shrink on near-capacity runs)")
    ap.add_argument("--block", type=int, default=None,
                    help="BSR tile size (e.g. 32) + RCM reorder: the TPU "
                         "production layout (gather SpMV is ~100x off "
                         "bandwidth); default None = ELL/gather")
    ap.add_argument("--split-programs", action="store_true",
                    help="steady path: run residual + each IR round as "
                         "separate device calls instead of one fused "
                         "program per nonlinear step — bounds single-"
                         "program execution time (the axon service kills "
                         "long-running executions; see "
                         "scripts/probe_exec_watchdog.py) and peak memory")
    args = ap.parse_args()

    import jax
    from fenapack_tpu.jax_setup import setup as jax_setup
    jax_setup(x64=args.dtype in (None, "float64", "mixed"))
    import jax.numpy as jnp
    from fenapack_tpu.solvers.nonlinear import NonlinearSolver

    dtype = args.dtype or ("float64" if jax.default_backend() == "cpu"
                           else "mixed")
    re = 100 if args.unsteady else 20
    asm, bcs, cfg, ap_h, v_h, nu = build(args.level, re, dtype, ls=args.ls,
                                         nls=args.nls,
                                         unsteady=args.unsteady,
                                         block=args.block)
    if args.maxiter is not None:
        from fenapack_tpu.solvers.config import overrides
        cfg = overrides(cfg, {"krylov.maxiter": args.maxiter})
    n_u = 2 * asm.n2
    coeff = 2.0 / (UBAR[re] ** 2 * D)
    print(f"cylinder channel  l={args.level}  Re={re}  nu={nu:g}  "
          f"dofs={2 * asm.n2_real + asm.n1_real}")

    if not args.unsteady:
        solver = NonlinearSolver(asm, bcs, cfg, linearization=args.nls,
                                 ap_hierarchy=ap_h, velocity_hierarchy=v_h)
        if dtype == "mixed":
            # fused IR Picard/Newton steps: f64-carried state honest to
            # the linear rtol even though the compute path is f32
            res = solver.solve_fused(rtol=args.rtol, verbose=True,
                                     split_programs=args.split_programs)
        else:
            res = solver.solve(rtol=args.rtol, verbose=True)
        print(f"converged: {res.converged}  iters/step: {res.linear_iters}")
        fd, fl, dp = coefficients(asm, res.w, n_u)
        print(f"\nDFG 2D-1:  c_D = {coeff * fd:.4f}   (ref 5.5700-5.5900)")
        print(f"           c_L = {coeff * fl:.4f}   (ref 0.0104-0.0110)")
        print(f"           dP  = {dp:.4f}   (ref 0.1172-0.1176)")
        return

    # ---- 2D-2: BDF2 time stepping through the shedding limit cycle ----
    # Forces/pressure probes are evaluated ON DEVICE inside the fused scan
    # (utils.functionals.make_device_functional): drag/lift/dP ride the
    # time loop as 4 scalars per step, so post-processing costs zero
    # per-step host round trips — the previous per-step callback (full-state
    # d2h + host residual) dominated the whole step on the remote TPU.
    from fenapack_tpu.fem import mesh as meshmod
    from fenapack_tpu.solvers.unsteady import UnsteadySolver
    from fenapack_tpu.utils.functionals import make_device_functional
    us = UnsteadySolver(asm, bcs, cfg, dt=args.dt, scheme="bdf2",
                        ap_hierarchy=ap_h, velocity_hierarchy=v_h)
    fn = make_device_functional(asm, [meshmod.CYLINDER],
                                points=[(0.15, 0.2), (0.25, 0.2)],
                                scheme="bdf2", dt=args.dt)
    n_steps = int(round(args.t_end / args.dt))
    auto_chunk = str(args.chunk) == "auto"
    # the probe chunk is 1: a single step can already sit near the ~120 s
    # service execution kill at fine levels (chunk=2 at l2 crashed the
    # worker reproducibly before any measurement existed)
    chunk = 1 if auto_chunk else max(1, min(int(args.chunk), n_steps))
    hist = []          # (t, cD, cL, dP) accumulated across chunks

    def summarize(final=False):
        t = np.array([h[0] for h in hist])
        cl = np.array([h[2] for h in hist])
        half = t > 0.5 * t[-1]
        # Strouhal from mean zero-upcrossing period of the established lift
        s = cl[half] - cl[half].mean()
        up = np.where((s[:-1] < 0) & (s[1:] >= 0))[0]
        lead = "\nDFG 2D-2: " if final else "   so far: "
        if up.size >= 2:
            period = (t[half][up[-1]] - t[half][up[0]]) / (up.size - 1)
            print(f"{lead} St = {D / (period * UBAR[100]):.4f}   "
                  f"(ref 0.2950-0.3050)", flush=True)
        if final or up.size >= 2:
            sel = [h for h in hist if h[0] > 0.5 * t[-1]]
            print(f"           c_Dmax = {max(h[1] for h in sel):.4f}"
                  f"   (ref 3.2200-3.2400)")
            print(f"           c_Lmax = {max(h[2] for h in sel):.4f}"
                  f"   (ref 0.9900-1.0100)", flush=True)

    if dtype == "mixed":
        # chunked whole-loop scan: each chunk is ONE device program
        # (semi-implicit BDF2, the reference demo's 'picard' setting;
        # state carried in f64); history flushes to --hist per chunk so a
        # worker fault/timeout loses at most one chunk
        import jax.numpy as jnp
        w = us.initial_state()
        kr = cfg.krylov.recycle
        carry = (w, w[:n_u], us.initial_recycle() if kr else jnp.zeros(0))
        done = 0
        ckpt = args.ckpt or (args.hist + ".ckpt.npz")
        # chunk is NOT part of the key: it only shapes the device program,
        # so a resumed run may re-derive a different (auto) chunk size.
        # --block IS: the RCM relabeling changes the state layout.
        ck_key = (f"l{args.level}_dt{args.dt:g}_{dtype}"
                  + (f"_b{args.block}" if args.block else ""))
        if not args.no_resume and os.path.exists(ckpt):
            ck = np.load(ckpt, allow_pickle=False)
            if str(ck["key"]) == ck_key and int(ck["done"]) < n_steps:
                carry = tuple(jnp.asarray(ck[f"c{i}"]) for i in range(3))
                done = int(ck["done"])
                if auto_chunk and "chunk" in ck:
                    chunk = int(ck["chunk"])  # skip re-measuring compiles
                with open(args.hist) as f:
                    next(f)
                    hist.extend(tuple(float(v) for v in ln.split(","))
                                for ln in f if ln.strip())
                hist[:] = hist[:done]
                # the csv may hold rows from a chunk that crashed before
                # its checkpoint landed — rewrite it consistent with done
                with open(args.hist, "w") as f:
                    f.write("t,cD,cL,dP\n")
                    for r in hist:
                        f.write(",".join(f"{v:.10g}" for v in r) + "\n")
                print(f"resumed from {ckpt} at step {done} "
                      f"(t={done * args.dt:.3f})", flush=True)
        if done == 0 and args.warm_from:
            # prolong (u, p, u_prev) from the coarser run's checkpoint:
            # vertex/edge FE interpolation P2->P2, parent-pair P1->P1.
            # BDF2 continues cleanly — the carried u_prev pair replaces
            # the implicit-Euler impulsive start.
            from fenapack_tpu.solvers.gmg import (P1Transfer, P2Transfer,
                                                  _VectorTransfer)
            ckw = np.load(args.warm_from, allow_pickle=False)
            hier = v_h.hier
            mc = hier.meshes[-2]
            t2 = P2Transfer(mc, hier.meshes[-1], jnp.float64)
            n2c = t2.n_coarse
            n1c = mc.num_vertices
            vt = _VectorTransfer(t2, n2c, asm.n2, d=2)
            t1 = P1Transfer(hier.parents[-1], n1c, jnp.float64)
            wc = np.asarray(ckw["c0"], dtype=np.float64)
            assert wc.shape[0] == 2 * n2c + n1c, (wc.shape, n2c, n1c)
            u = vt.prolong(jnp.asarray(wc[:2 * n2c]))
            p = t1.prolong(jnp.asarray(wc[2 * n2c:]))
            if asm.n1 > p.shape[0]:
                p = jnp.pad(p, (0, asm.n1 - p.shape[0]))
            u_prev = vt.prolong(jnp.asarray(
                np.asarray(ckw["c1"], dtype=np.float64)))
            rankV = getattr(asm.W.V, "rank", None)
            if rankV is not None:
                # --block reorder: the natural-ordered prolongation must be
                # relabeled into the solver's RCM layout (old id -> rank)
                rV = np.asarray(rankV)
                rQ = np.asarray(asm.W.Q.rank)
                perm_u = np.concatenate([a * asm.n2 + rV
                                         for a in range(2)])
                u = jnp.zeros_like(u).at[jnp.asarray(perm_u)].set(u)
                p = jnp.zeros_like(p).at[jnp.asarray(rQ)].set(
                    p[:rQ.shape[0]])
                u_prev = jnp.zeros_like(u_prev).at[
                    jnp.asarray(perm_u)].set(u_prev)
            carry = (jnp.concatenate([u, p]), u_prev, carry[2])
            print(f"warm start: prolonged {args.warm_from} "
                  f"({2 * n2c + n1c} -> {n_u + asm.n1} dofs, coarse step "
                  f"{int(ckw['done'])})", flush=True)
        if done == 0:
            with open(args.hist, "w") as f:
                f.write("t,cD,cL,dP\n")
        full = us.make_full_unsteady(chunk, functional=fn,
                                     external_carry=True)
        import time as _time
        calls = 0
        while done < n_steps:
            t0 = _time.perf_counter()
            carry, rns, its, vals = full(carry)
            vals = np.asarray(vals)
            rows = [(args.dt * (done + j + 1), coeff * vals[j, 0],
                     coeff * vals[j, 1], vals[j, 2] - vals[j, 3])
                    for j in range(chunk)]
            hist.extend(rows)
            with open(args.hist, "a") as f:
                for r in rows:
                    f.write(",".join(f"{v:.10g}" for v in r) + "\n")
            done += chunk
            np.savez(ckpt + ".tmp.npz", key=ck_key, done=done, chunk=chunk,
                     **{f"c{i}": np.asarray(c) for i, c in enumerate(carry)})
            os.replace(ckpt + ".tmp.npz", ckpt)
            wall = _time.perf_counter() - t0
            print(f"t={rows[-1][0]:7.3f}  cD={rows[-1][1]:.4f}  "
                  f"cL={rows[-1][2]:+.4f}  "
                  f"iters/step={float(np.mean(np.asarray(its))):.1f}  "
                  f"[{wall:.1f}s/chunk]", flush=True)
            calls += 1
            if auto_chunk and calls == 2 and done < n_steps:
                # call 1 paid the compile; call 2 is the warm measurement.
                # Size the device call to ~45 s — comfortably inside the
                # ~120 s service execution kill (doc/tpu_design.md), with
                # headroom for slow early chunks while the wake develops.
                per_step = wall / chunk
                new_chunk = int(max(1, min(64, 45.0 / max(per_step, 1e-9))))
                if new_chunk != chunk:
                    chunk = new_chunk
                    full = us.make_full_unsteady(chunk, functional=fn,
                                                 external_carry=True)
                    print(f"auto-chunk: {per_step:.1f}s/step measured -> "
                          f"chunk {chunk} (one recompile)", flush=True)
            if done * 2 >= n_steps:
                summarize()
    else:
        prev = {"u": None}
        from fenapack_tpu.utils.functionals import boundary_reaction, eval_p1

        def record(k, t, w):
            # host-path reference recording (backward-difference du/dt)
            u = w[:n_u]
            du_dt = None if prev["u"] is None else (u - prev["u"]) / args.dt
            prev["u"] = u
            F = boundary_reaction(asm, u, w[n_u:], [meshmod.CYLINDER],
                                  du_dt=du_dt)
            dp = eval_p1(asm, np.asarray(w[n_u:]),
                         [(0.15, 0.2), (0.25, 0.2)])
            hist.append((t, coeff * F[0], coeff * F[1], dp[0] - dp[1]))
            if (k + 1) % 80 == 0:
                print(f"t={t:7.3f}  cD={hist[-1][1]:.4f}  "
                      f"cL={hist[-1][2]:+.4f}", flush=True)

        us.solve(args.t_end, picard_iters=3, callback=record)
    summarize(final=True)


if __name__ == "__main__":
    main()
